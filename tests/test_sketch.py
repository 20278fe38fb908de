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


def test_bloom_zero_false_negatives_and_packing(spark):
    """Every inserted member must test positive (Bloom theorem), and
    the packed-word popcount equals the number of distinct set
    positions computed independently."""
    import hashlib

    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.operators import sketch

    m_bits, k = 512, 3
    vals = list(range(0, 400, 7))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    words = sketch.bloom_words(df, "v", m_bits, k)
    wm = sketch.bloom_words_map(words)
    probes = spark.createDataFrame([(v,) for v in range(400)], "v long")
    hit = (
        probes.crossJoin(F.broadcast(wm))
        .select(
            "v",
            sketch.bloom_contains(F.col("v"), m_bits, k, F.col("m")).alias("h"),
        )
        .collect()
    )
    got = {r["v"]: r["h"] for r in hit}
    assert all(got[v] for v in vals), "false negative!"
    # independent position model
    def positions(v):
        return {
            int(hashlib.md5(f"{v}#{i}".encode()).hexdigest()[:8], 16) % m_bits
            for i in range(k)
        }

    set_pos = set()
    for v in vals:
        set_pos |= positions(v)
    popcount = sum(
        bin(r["word"]).count("1") for r in words.collect()
    )
    assert popcount == len(set_pos)
    # verdict parity with the set model for every probe
    for v in range(400):
        assert got[v] == positions(v).issubset(set_pos)


def test_quantile_summary_rank_bound_any_partitioning(spark):
    """The rank-error theorem (|est_rank − target| ≤ N/k + P) holds
    under several repartitionings, and summary weights always sum to
    N (no value lost or double-counted)."""
    import math

    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.operators.sketch import (
        quantile_estimates,
        quantile_summary,
    )

    vals = [(int(((i * 2654435761) % 97) * 100 + i),) for i in range(2000)]
    df = spark.createDataFrame(vals, "cents long")
    xs = sorted(v[0] for v in vals)
    n = len(xs)
    k = 32
    for parts in (1, 3, 8):
        d = df.repartition(parts)
        summ = quantile_summary(d, "cents", k=k)
        wsum = summ.agg(F.sum("weight")).collect()[0][0]
        assert wsum == n
        est = quantile_estimates(summ, [0.1, 0.5, 0.9]).collect()
        bound = n / k + parts
        for r in est:
            v = r["est_value"]
            lt = sum(1 for x in xs if x < v)
            le = sum(1 for x in xs if x <= v)
            t = max(1, math.ceil(r["p_target"] * n))
            assert lt + 1 <= t + bound and le >= t - bound, (parts, r)
