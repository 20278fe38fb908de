"""Planted-corpus tests for operators/search.py: exact phrase
matching, overlap counting, repeated-token phrases, and the
no-match/short-doc edges."""

from __future__ import annotations

from reddit_hn_etl_spark.operators import search


def _counts(spark, docs, phrases):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = search.phrase_match_counts(df, phrases)
    return {(r["phrase"], r["doc_id"]): r["n_matches"] for r in out.collect()}


def test_planted_phrases(spark):
    docs = [
        (1, "alpha beta gamma alpha beta"),
        (2, "beta alpha beta gamma"),
        (3, "gamma gamma gamma gamma"),
        (4, "alpha"),
        (5, ""),
    ]
    got = _counts(spark, docs, ["alpha beta", "gamma gamma", "beta gamma"])
    assert got == {
        ("alpha beta", 1): 2,
        ("alpha beta", 2): 1,
        ("beta gamma", 2): 1,
        ("beta gamma", 1): 1,
        # overlapping occurrences count separately: positions 0,1,2
        ("gamma gamma", 3): 3,
    }


def test_repeated_token_phrase_needs_all_offsets(spark):
    # "x y x" requires x at start AND start+2 — a doc with "x y z"
    # must not match even though both phrase tokens appear.
    docs = [(1, "x y x y x"), (2, "x y z x y")]
    got = _counts(spark, docs, ["x y x"])
    assert got == {("x y x", 1): 2}


def test_three_gram_and_case_normalization(spark):
    docs = [(1, "The Quick BROWN fox"), (2, "quick brown quick brown fox")]
    got = _counts(spark, docs, ["quick brown fox"])
    assert got == {("quick brown fox", 1): 1, ("quick brown fox", 2): 1}


def test_phrase_longer_than_doc(spark):
    docs = [(1, "a b")]
    got = _counts(spark, docs, ["a b c d"])
    assert got == {}
