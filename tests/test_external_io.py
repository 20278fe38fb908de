"""CSV roundtrip with the reference's NULL sentinel."""

from __future__ import annotations

from pyspark.sql import types as T

from reddit_hn_etl_spark.sources import external

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_roundtrip_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, r"\N-literal", 0.0)], SCHEMA
    )
    path = str(tmp_path / "csv_out")
    external.write_csv(df, path)
    back = external.read_csv(spark, path, SCHEMA)
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got[0] == (1, "a", 1.5)
    assert got[1] == (2, None, None)  # \N sentinel survived as NULL
    assert got[2][2] == 0.0


def test_staging_schema_evolution_merge(spark, tmp_path):
    # Additive schema evolution: a later batch gains a column; the
    # merged read surfaces it as NULL on old rows, and the default
    # (no-merge) read still works on the stable prefix.
    import datetime as dt

    from reddit_hn_etl_spark.sources import batches

    root = str(tmp_path / "staging")
    batches.write_staging_batch(
        spark.createDataFrame([(1, "a")], "id long, name string"),
        root, dt.datetime(2024, 1, 1, 10, 0, 0),
    )
    batches.write_staging_batch(
        spark.createDataFrame(
            [(2, "b", 0.9)], "id long, name string, score double"
        ),
        root, dt.datetime(2024, 1, 2, 10, 0, 0),
    )
    merged = batches.read_staging(spark, root, merge_schema=True)
    assert "score" in merged.columns
    got = {r.id: r.score for r in merged.collect()}
    assert got == {1: None, 2: 0.9}
    # default read remains usable for the common columns
    plain = batches.read_staging(spark, root)
    assert {r.id for r in plain.select("id").collect()} == {1, 2}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.sources import external

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "c", None)],
        "id long, name string, score double",
    )
    path = str(tmp_path / "orc_out")
    external.write_orc(df, path)

    back = external.read_orc(spark, path)
    rows = {r.id: (r.name, r.score) for r in back.collect()}
    assert rows == {1: ("a", 1.5), 2: (None, 2.5), 3: ("c", None)}

    # filter + projection reach the ORC scan (same contract as parquet)
    plan = (
        back.where(F.col("id") > 1)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan
    assert "struct<id:bigint>" in plan
