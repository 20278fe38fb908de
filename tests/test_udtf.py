"""Unit tests for the Python UDTF surface (functions/udtfs.py):
edge shapes the oracle's docs subset can't hit — NULL text, empty
text, exact-size docs, tail emission — plus LATERAL wiring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.functions.udtfs import ChunkTokens, register_udtfs


def _chunks(text, size=16, stride=12):
    return list(ChunkTokens.func().eval(text, size, stride))


def test_null_and_empty_emit_nothing():
    assert _chunks(None) == []
    assert _chunks("") == []
    assert _chunks("   ") == []


def test_exact_size_single_chunk():
    text = " ".join(f"t{i}" for i in range(16))
    out = _chunks(text)
    assert out == [(0, 16, text)]


def test_tail_partial_chunk_kept():
    toks = [f"t{i}" for i in range(20)]
    out = _chunks(" ".join(toks))
    assert len(out) == 2
    assert out[0] == (0, 16, " ".join(toks[:16]))
    assert out[1] == (1, 8, " ".join(toks[12:20]))


def test_short_doc_single_partial_chunk():
    out = _chunks("a b c")
    assert out == [(0, 3, "a b c")]


def test_lateral_join_expands_rows(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, None)],
        "id long, text string",
    )
    df.createOrReplaceTempView("_udtf_test_docs")
    rows = spark.sql(
        """
        SELECT d.id, c.chunk_idx, c.n_chunk_tokens
        FROM _udtf_test_docs d, LATERAL chunk_tokens(d.text, 16, 12) c
        """
    ).collect()
    got = sorted((r.id, r.chunk_idx, r.n_chunk_tokens) for r in rows)
    assert got == [(1, 0, 16), (1, 1, 8)]
