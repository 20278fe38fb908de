"""Distributed k-means (operators/kmeans.py).

The oracle-checked faces (assignment, quantized update, prototypes)
live in tests/test_oracle.py via the registry; here we verify the
parts a SQL oracle cannot: the full Lloyd LOOP (floats drift across
iterations by construction), the empty-cluster rule, the
monotone-inertia guarantee, and agreement with an independent numpy
reference wherever the argmin margin makes float noise irrelevant.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators import kmeans
from reddit_hn_etl_spark.sources.tables import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, x


def _np_assign(x: np.ndarray, cents: np.ndarray):
    """Independent reference: squared L2 + lowest-index argmin."""
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d


def test_assign_matches_numpy_on_clear_margins(emb, emb_np):
    ids, x = emb_np
    cents = kmeans.seeded_centroids(x.shape[1], 8, seed=11)
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist_sq"])
        for r in kmeans.assign(emb, cents).collect()
    }
    lab, d = _np_assign(x, np.array(cents))
    d_sorted = np.sort(d, axis=1)
    margin = d_sorted[:, 1] - d_sorted[:, 0]
    checked = 0
    for i, vid in enumerate(ids):
        cid, dist = got[int(vid)]
        assert dist == pytest.approx(d[i].min(), rel=1e-9)
        if margin[i] > 1e-9:  # numpy sums pairwise; skip knife-edge ties
            assert cid == lab[i], f"vec {vid}"
            checked += 1
    assert checked >= len(ids) - 2  # margins are clear on real data


def test_assign_tie_breaks_to_lowest_index(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # centroids 0 and 2 are exactly equidistant; 0 must win
    cents = [[1.0, 0.0], [5.0, 5.0], [-1.0, 0.0]]
    row = kmeans.assign(df, cents).first()
    assert row["cluster_id"] == 0 and row["dist_sq"] == 1.0


def test_cluster_means_quantized_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.25, -2.0]), (0, [0.75, 4.0]), (1, [10.0, 0.5])],
        "cluster_id int, embedding array<float>",
    )
    rows = {
        (r["cluster_id"], r["pos"]): (r["n_members"], r["mean_q"])
        for r in kmeans.cluster_means_quantized(df).collect()
    }
    assert rows[(0, 0)] == (2, 1.0)
    assert rows[(0, 1)] == (2, 1.0)
    assert rows[(1, 0)] == (1, 10.0)
    assert rows[(1, 1)] == (1, 0.5)


def test_update_keeps_previous_for_empty_cluster(spark):
    df = spark.createDataFrame(
        [(0, [2.0, 2.0]), (0, [4.0, 6.0])],
        "cluster_id int, embedding array<float>",
    )
    prev = [[0.0, 0.0], [9.0, 9.0]]
    out = kmeans.update_centroids(df, prev)
    assert out[0] == [3.0, 4.0]
    assert out[1] == [9.0, 9.0]  # untouched: no members


def test_lloyd_inertia_monotone_and_stable(emb):
    _, _, inertia1 = kmeans.lloyd(emb, k=8, n_iter=1, seed=11)
    assigned3, cents3, inertia3 = kmeans.lloyd(emb, k=8, n_iter=3, seed=11)
    _, _, inertia4 = kmeans.lloyd(emb, k=8, n_iter=4, seed=11)
    assert inertia3 <= inertia1 + 1e-9
    assert inertia4 <= inertia3 + 1e-9
    # every point assigned, exactly once, to a valid cluster
    n = emb.count()
    assert assigned3.count() == n
    ks = [r["cluster_id"] for r in assigned3.select("cluster_id").distinct().collect()]
    assert set(ks) <= set(range(8))
    assert len(cents3) == 8


def test_lloyd_matches_numpy_reference(emb, emb_np):
    """Same init, same rules, 3 rounds: centroids agree to float
    tolerance and assignments agree wherever margins are clear."""
    ids, x = emb_np
    k, rounds = 8, 3
    cents = np.array(kmeans.seeded_centroids(x.shape[1], k, seed=11))
    for _ in range(rounds):
        lab, _ = _np_assign(x, cents)
        for j in range(k):
            if (lab == j).any():
                cents[j] = x[lab == j].mean(axis=0)
    assigned, got_cents, _ = kmeans.lloyd(emb, k=k, n_iter=rounds, seed=11)
    np.testing.assert_allclose(np.array(got_cents), cents, rtol=1e-7, atol=1e-9)
    lab_final, d = _np_assign(x, cents)
    d_sorted = np.sort(d, axis=1)
    margin = d_sorted[:, 1] - d_sorted[:, 0]
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    mismatched = sum(
        1
        for i, vid in enumerate(ids)
        if margin[i] > 1e-6 and got[int(vid)] != lab_final[i]
    )
    assert mismatched == 0


def test_prototypes_one_per_cluster_nearest(emb):
    cents = kmeans.seeded_centroids(64, 8, seed=11)
    assigned = kmeans.assign(emb, cents)
    protos = kmeans.prototypes(assigned).collect()
    best = {
        r["cluster_id"]: r["md"]
        for r in assigned.groupBy("cluster_id")
        .agg(F.min("dist_sq").alias("md"))
        .collect()
    }
    assert len(protos) == len(best)
    for p in protos:
        assert p["dist_sq"] == best[p["cluster_id"]]


def test_assign_plan_is_shuffle_free(emb):
    cents = kmeans.seeded_centroids(64, 8, seed=11)
    plan = kmeans.assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_minibatch_update_from_zero_equals_lloyd_step(emb):
    """With all counts zero and the full corpus as the batch, the
    mini-batch update IS one Lloyd update step: c' = mean of members
    (the n_old·c term vanishes). Empty cells keep their previous
    centroid in both paths."""
    dim = len(emb.select("embedding").first()[0])
    cents = kmeans.seeded_centroids(dim, 8, seed=11)
    assigned = kmeans.assign(emb, cents)
    want = kmeans.update_centroids(assigned, cents)
    got, counts = kmeans.update_centroids_minibatch(
        emb, cents, [0] * 8
    )
    for c in range(8):
        for p in range(dim):
            assert abs(got[c][p] - want[c][p]) <= 1e-9
    n = emb.count()
    assert sum(counts) == n


def test_minibatch_update_weighted_mean_counts_and_validation(spark):
    """Hand-checkable case: one prior cell with mass n_old=4 at
    [0,0]; a batch of two vectors near it and one near the other
    cell. The updated centroid is the exact count-weighted mean, the
    untouched coordinate path for the other cell applies its own
    batch member, and counts accumulate per cell. Mismatched counts
    length raises."""
    import pytest as _pytest

    cents = [[0.0, 0.0], [10.0, 10.0]]
    counts = [4, 1]
    batch = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 2.0]), (3, [12.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    got, new_counts = kmeans.update_centroids_minibatch(
        batch, cents, counts
    )
    # cell 0: (4*0 + 2+0)/6, (4*0 + 0+2)/6
    assert got[0] == [2.0 / 6.0, 2.0 / 6.0]
    # cell 1: (1*10 + 12)/2, (1*10 + 10)/2
    assert got[1] == [11.0, 10.0]
    assert new_counts == [6, 2]
    # input centroids untouched (pure function)
    assert cents == [[0.0, 0.0], [10.0, 10.0]]
    with _pytest.raises(ValueError, match="cells"):
        kmeans.update_centroids_minibatch(batch, cents, [4])


def test_minibatch_update_moves_toward_drifted_batch(spark):
    """The drift-loop property: feeding a drifted batch moves the
    assigned cell's centroid strictly toward the batch mean, and
    repeated batches converge it there (old mass decays as
    n_old/(n_old+Σ n_new))."""
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    counts = [10, 10]
    drift = [(i, [3.0, 4.0]) for i in range(20)]
    batch = spark.createDataFrame(
        drift, "vec_id long, embedding array<double>"
    )
    d0 = (cents[0][0] - 3.0) ** 2 + (cents[0][1] - 4.0) ** 2
    c1, n1 = kmeans.update_centroids_minibatch(batch, cents, counts)
    d1 = (c1[0][0] - 3.0) ** 2 + (c1[0][1] - 4.0) ** 2
    c2, n2 = kmeans.update_centroids_minibatch(batch, c1, n1)
    d2 = (c2[0][0] - 3.0) ** 2 + (c2[0][1] - 4.0) ** 2
    assert d1 < d0 and d2 < d1
    # cell 1 never assigned -> untouched
    assert c2[1] == [-1.0, 0.0] and n2[1] == 10
    # exact decay: after the first batch, weight on old mass 10/30
    assert abs(c1[0][0] - (10 * 1.0 + 20 * 3.0) / 30) <= 1e-12
