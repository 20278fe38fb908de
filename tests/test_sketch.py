"""operators/sketch.py: mergeable heavy-hitters guarantees on a
planted distribution, including partitioning invariance of the
bounds (the estimates themselves may legally differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators.sketch import heavy_hitters


def _planted(spark, parts: int):
    rows = (
        [("a",)] * 100
        + [("b",)] * 50
        + [(f"tail{i}",) for i in range(40)]
    )
    return spark.createDataFrame(rows, "item string").repartition(parts)


def test_heavy_hitters_bounds_any_partitioning(spark):
    n = 190
    k = 8
    bound = n / (k + 1)
    exact = {"a": 100, "b": 50}
    for parts in (1, 3, 7):
        est = {
            r.item: r.est
            for r in heavy_hitters(_planted(spark, parts), "item", k=k).collect()
        }
        # Presence: both true heavy hitters exceed N/(k+1) ≈ 21.
        assert "a" in est and "b" in est, parts
        for item, true_cnt in exact.items():
            assert est[item] <= true_cnt, (parts, item)
            assert est[item] >= true_cnt - bound, (parts, item)
        # Never an overcount for ANY reported item.
        assert all(v <= exact.get(i, 1) for i, v in est.items()), parts


def test_heavy_hitters_single_partition_is_exact(spark):
    est = {
        r.item: r.est
        for r in heavy_hitters(_planted(spark, 1), "item", k=8).collect()
    }
    assert est["a"] == 100 and est["b"] == 50


def test_heavy_hitters_summary_is_bounded(spark):
    df = _planted(spark, 5)
    out = heavy_hitters(df, "item", k=8)
    # Merged summary holds at most parts*k distinct items.
    assert out.count() <= 5 * 8
    # Partial summaries respect the per-partition cap.
    from reddit_hn_etl_spark.operators.sketch import partial_topk_counts

    per = (
        partial_topk_counts(df, "item", 8)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]
        .m
    )
    assert per <= 8
