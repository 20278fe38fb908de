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
