"""Line-level boilerplate removal: df thresholding, order-preserving
reassembly, and the degenerate all-boilerplate / empty-line cases."""

from __future__ import annotations

from reddit_hn_etl_spark.operators import cleaning

CORPUS = [
    # Every doc carries the same header; bodies are unique; doc 3 also
    # has a rare promo line; doc 4 is NOTHING BUT the header; doc 5 has
    # blank lines around its body.
    (1, "visit our site\nalpha body one\nmore alpha text"),
    (2, "visit our site\nbeta body two"),
    (3, "visit our site\ngamma body three\nrare promo line"),
    (4, "visit our site"),
    (5, "\nvisit our site\n\n  delta body five  \n"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_doc_lines_trims_and_keeps_positions(spark):
    rows = (
        cleaning.doc_lines(_df(spark), "doc_id", "text")
        .where("doc_id = 5")
        .orderBy("pos")
        .collect()
    )
    # Blank lines dropped, but pos still reflects the original index.
    assert [(r.pos, r.line) for r in rows] == [
        (1, "visit our site"),
        (3, "delta body five"),
    ]


def test_boilerplate_lines_threshold(spark):
    lines = cleaning.doc_lines(_df(spark), "doc_id", "text")
    boiler = {
        r.line: r.doc_freq
        for r in cleaning.boilerplate_lines(lines, "doc_id", 5).collect()
    }
    assert boiler == {"visit our site": 5}


def test_strip_reassembles_in_order(spark):
    out = {
        r.doc_id: r
        for r in cleaning.strip_boilerplate_lines(
            _df(spark), "doc_id", "text", min_doc_freq=4
        ).collect()
    }
    assert out[1].clean_text == "alpha body one\nmore alpha text"
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    # Rare promo survives a df-4 threshold.
    assert out[3].clean_text == "gamma body three\nrare promo line"
    # All-boilerplate doc: NULL clean_text, fully removed.
    assert out[4].clean_text is None
    assert out[4].n_lines == 1 and out[4].n_removed == 1
    # Blank lines don't count as lines; body is trimmed.
    assert out[5].clean_text == "delta body five"
    assert out[5].n_lines == 2 and out[5].n_removed == 1


def test_normalize_unicode_forms(spark):
    """NFC fuses combining sequences; NFKC additionally folds
    compatibility characters (ligature, fullwidth digits) — the form
    hash-dedup pipelines want."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.operators.cleaning import normalize_unicode

    rows = [
        (1, "café"),          # decomposed é
        (2, "ﬁle"),            # ﬁ ligature
        (3, "１２three"),   # fullwidth 12
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: (r["nfc"], r["nfkc"])
        for r in df.select(
            "id",
            normalize_unicode("t", "NFC").alias("nfc"),
            normalize_unicode("t", "NFKC").alias("nfkc"),
        ).collect()
    }
    assert got[1] == ("café", "café")
    assert got[2] == ("ﬁle", "file")      # NFC keeps the ligature
    assert got[3] == ("１２three", "12three")
    assert got[4] == (None, None)
