"""kNN-Shapley data valuation (operators/similarity.knn_shapley).

The closed form (Jia et al., PVLDB 2019, Theorem 1) is verified
against the DEFINITION: brute-force Shapley values computed by
enumerating all N! permutations of a tiny training set, with the
K-NN utility v(S) = (# of the min(K,|S|) nearest points in S with
the test label) / K. Also checks the efficiency property on real
testdata: per test point, Σᵢ sᵢ = v(full set).
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators import similarity

_FP = 1099511627776.0  # 2^40, mirrors similarity._SHAP_FP


def _brute_force_shapley(dists, matches, k):
    """Exact Shapley by permutation enumeration. dists[i]: distance
    of train point i to the test point (all distinct); matches[i]:
    1 if its label equals the test label. v(S) = (# matching among
    the min(K,|S|) nearest in S) / K."""
    n = len(dists)

    def v(subset):
        nearest = sorted(subset, key=lambda i: dists[i])[:k]
        return sum(matches[i] for i in nearest) / k

    shap = [0.0] * n
    for perm in itertools.permutations(range(n)):
        seen = []
        prev = 0.0
        for i in perm:
            seen.append(i)
            cur = v(seen)
            shap[i] += cur - prev
            prev = cur
    return [s / math.factorial(n) for s in shap]


def test_closed_form_matches_permutation_definition(spark):
    # 7 train points on a line, test point at the origin: cosine to
    # (1, d) decreases with d, so distances are distinct and known.
    train_pts = [
        (10, [1.0, 0.1], 0),
        (11, [1.0, 0.3], 1),
        (12, [1.0, 0.6], 0),
        (13, [1.0, 1.0], 0),
        (14, [1.0, 1.5], 1),
        (15, [1.0, 2.1], 1),
        (16, [1.0, 2.8], 0),
    ]
    k = 2
    corpus = spark.createDataFrame(
        train_pts, "vec_id long, embedding array<double>, label int"
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)],
        "query_id long, embedding array<double>, qlabel int",
    )
    out = {
        r["vec_id"]: r["s_fp"] / _FP
        for r in similarity.knn_shapley(
            corpus, queries, query_label_col="qlabel", k=k
        ).collect()
    }
    dists = [p[1][1] for p in train_pts]  # monotone with cosine rank
    matches = [1 if p[2] == 0 else 0 for p in train_pts]
    expected = _brute_force_shapley(dists, matches, k)
    for idx, (vid, _, _) in enumerate(train_pts):
        assert out[vid] == pytest.approx(expected[idx], abs=len(train_pts) / _FP + 1e-12), (
            vid,
            out[vid],
            expected[idx],
        )


def test_efficiency_property_on_testdata(spark, sf_dir):
    from reddit_hn_etl_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    k = 5
    tests = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("label").alias("qlabel"),
    )
    train = emb.where(F.col("vec_id") >= 3)
    vals = similarity.knn_shapley(
        train, tests, query_label_col="qlabel", k=k
    )
    # Σᵢ sᵢ per test point equals v(D) = (matching among K nearest)/K.
    sums = {
        r["query_id"]: r["tot"] / _FP
        for r in vals.groupBy("query_id")
        .agg(F.sum("s_fp").alias("tot"))
        .collect()
    }
    knn = similarity.knn_cosine_bruteforce(
        train, tests.select("query_id", "embedding"), k=k
    )
    labels = {r["vec_id"]: r["label"] for r in train.select("vec_id", "label").collect()}
    qlabels = {r["query_id"]: r["qlabel"] for r in tests.select("query_id", "qlabel").collect()}
    topk = {}
    for r in knn.collect():
        topk.setdefault(r["query_id"], []).append(labels[r["vec_id"]])
    n = train.count()
    for qid, ls in topk.items():
        expected = sum(1 for l in ls if l == qlabels[qid]) / k
        assert sums[qid] == pytest.approx(expected, abs=n / _FP + 1e-9), (
            qid,
            sums[qid],
            expected,
        )
