"""Curation-depth operators: quality-ranked cluster representatives,
repetition signals, deterministic weighted sampling, simhash↔Jaccard
consistency. The driver oracle checks these end-to-end on testdata;
here we pin the operator semantics on hand-built frames where the
expected answer is computable by eye.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.functions.text import repetition_features
from reddit_hn_etl_spark.operators.graph import (
    connected_components,
    keep_best_per_cluster,
)


def test_keep_best_per_cluster_prefers_quality(spark):
    # cluster {1,2,3}: doc 2 has the best score → sole representative;
    # cluster {7,8}: tie on score → lowest id (7) wins.
    cc = connected_components(
        spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
        )
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (7, 0.4), (8, 0.4)],
        "doc_id long, quality_score double",
    )
    out = {
        r.doc_id: (r.component, r.is_rep)
        for r in keep_best_per_cluster(cc, scores).collect()
    }
    assert out == {
        1: (1, False),
        2: (1, True),
        3: (1, False),
        7: (7, True),
        8: (7, False),
    }
    # exactly one representative per component
    reps = [d for d, (_, is_rep) in out.items() if is_rep]
    assert sorted(reps) == [2, 7]


def test_repetition_features_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # tokens [a,a,a,b,c,a]: "a" ×4 of 6 → 0.6667; bigrams
            # [a a, a a, a b, b c, c a]: "a a" ×2 of 5 → 0.4;
            # distinct {a,b,c} → 3/6 = 0.5
            (1, "a a a b c a"),
            # no repetition: all fractions 1/4, distinct 1.0
            (2, "w x y z"),
            # single token: no bigrams → top_bigram_frac 0.0
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.asDict() for r in repetition_features(df, "doc_id", "text").collect()
    }
    assert out[1]["n_tokens"] == 6
    assert out[1]["top_unigram_frac"] == 0.6667
    assert out[1]["top_bigram_frac"] == 0.4
    assert out[1]["distinct_ratio"] == 0.5
    assert out[2]["top_unigram_frac"] == 0.25
    assert out[2]["distinct_ratio"] == 1.0
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["top_unigram_frac"] == 1.0


def test_repetition_flags_degenerate_doc(spark):
    # a looping generation lights up every signal vs normal prose
    df = spark.createDataFrame(
        [
            (1, "the same thing " * 20),
            (2, "a quick brown fox jumps over the lazy dog near a river"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_features(df, "doc_id", "text").collect()}
    assert out[1].top_bigram_frac > 0.3 > out[2].top_bigram_frac
    assert out[1].distinct_ratio < 0.1 < out[2].distinct_ratio


def test_weighted_sample_determinism_and_bias(spark, sf_dir):
    """The A-ES draw must be identical across runs (content-hashed u)
    and biased toward heavier (longer) docs vs a uniform draw."""
    from reddit_hn_etl_spark.plans.queries import QUERIES

    a = QUERIES["weighted_doc_sample"](spark, sf_dir).collect()
    b = QUERIES["weighted_doc_sample"](spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 20
    from reddit_hn_etl_spark.sources.tables import read_table

    corpus_avg = (
        read_table(spark, sf_dir, "documents")
        .select(F.avg(F.size(F.split(F.trim("text"), r"\s+"))).alias("m"))
        .collect()[0]["m"]
    )
    sample_avg = sum(r.n_tokens for r in a) / len(a)
    assert sample_avg > corpus_avg  # weighting by n_tokens shows up


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from reddit_hn_etl_spark.plans.queries import QUERIES

    rows = QUERIES["leakage_safe_split"](spark, sf_dir).collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(rows) == n_docs  # every doc assigned exactly once
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
    # split is a CLUSTER property: no component spans train and val
    assert all(len(s) == 1 for s in by_comp.values())
    # non-vacuous: both splits occur, and at least one real cluster
    # (size > 1) got assigned
    assert {r.split for r in rows} == {"train", "val"}
    sizes = {}
    for r in rows:
        sizes[r.component] = sizes.get(r.component, 0) + 1
    assert max(sizes.values()) > 1
