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
