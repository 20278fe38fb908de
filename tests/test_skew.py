"""Skewed-key correctness under AQE: a pathologically skewed join
(90% of rows on one key) still produces exact results, and the
salted-aggregation pattern agrees with the plain one."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_skewed_join_correctness(spark):
    n = 50_000
    # 90% of left rows hit key 0; right side is a small dim.
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    joined = left.join(right, "k")
    assert joined.count() == n  # every left row matches exactly once
    hot = joined.where(F.col("k") == 0)
    assert hot.count() == 45_000 and hot.select("v").distinct().count() == 1


def test_salted_agg_equals_plain_on_skew(spark):
    n = 30_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.lit(1).alias("one"),
    )
    plain = {r.k: r.c for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    salted = (
        df.withColumn("_salt", F.col("one") * (F.rand(seed=1) * 16).cast("int"))
        .groupBy("k", "_salt").agg(F.count("*").alias("pc"))
        .groupBy("k").agg(F.sum("pc").alias("c"))
    )
    got = {r.k: r.c for r in salted.collect()}
    assert got == plain
