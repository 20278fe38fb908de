"""SQL-surface parity: the registered views answer pure-SQL queries
identically to the DataFrame API they wrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.views import register_analytics_views


def test_views_register_and_answer_sql(spark, sf_dir):
    names = register_analytics_views(spark, sf_dir)
    assert {"events", "documents", "user_sessions",
            "doc_quality_features", "doc_repetition_features",
            "doc_fingerprints"} <= set(names)

    # Pure-SQL cross-view join: high-quality docs with low repetition
    sql_rows = spark.sql("""
        SELECT q.doc_id
        FROM doc_quality_features q
        JOIN doc_repetition_features r ON q.doc_id = r.doc_id
        WHERE q.quality_score >= 0.5 AND r.top_bigram_frac < 0.2
        ORDER BY q.doc_id
    """).collect()
    assert len(sql_rows) > 0

    # matches the DataFrame composition exactly
    from reddit_hn_etl_spark.functions import text as textfn
    from reddit_hn_etl_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    df_rows = (
        textfn.quality_features(docs, "doc_id", "text")
        .where(F.col("quality_score") >= 0.5)
        .join(
            textfn.repetition_features(docs, "doc_id", "text").where(
                F.col("top_bigram_frac") < 0.2
            ),
            "doc_id",
        )
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    )
    assert [r.doc_id for r in sql_rows] == [r.doc_id for r in df_rows]

    # sessions view: SQL aggregate over the derived rollup
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM user_sessions WHERE n_events > 1"
    ).collect()[0]["n"]
    assert n > 0
