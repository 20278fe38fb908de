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


def test_aqe_skew_join_splits_partitions(spark):
    """SCALING.md's skew posture leans on AQE's skew-join for the
    automatic path (salting is the manual fallback): with a planted
    hot key and the skew thresholds lowered to laptop sizes, the
    final adaptive plan must mark the sort-merge join as skew=true
    (OptimizeSkewedJoin split the hot partition) and the join result
    must equal the no-AQE run."""
    import pyspark.sql.functions as F

    hot = spark.range(0, 60_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = hot.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution, so the
        # inspected plan is the finalized adaptive one (count() would
        # finalize a different wrapped plan)
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        assert joined.count() == n
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
