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


def test_salted_join_equals_plain(spark):
    """operators/joins.salted_join is result-identical to the plain
    join (inner AND left, unmatched rows preserved), and the physical
    join really runs on (key, _salt)."""
    from reddit_hn_etl_spark.operators.joins import salted_join

    n = 20_000
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
    )
    # dim covers only even keys → odd-key rows are unmatched
    right = spark.range(0, 50, 2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )

    for how in ("inner", "left"):
        plain = left.join(right, on="k", how=how)
        salted = salted_join(left, right, key="k", salt_buckets=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how

    plan = salted_join(
        left, right, key="k", salt_buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
