"""Positional phrase search over a tokenized corpus.

`bm25_doc_search` (plans/queries.py) covers bag-of-words relevance;
this module adds the other classic retrieval primitive the engine
lacked: EXACT PHRASE matching from a positional inverted index — the
thing bag-of-words provably cannot express ("hash join" ≠ docs
containing "hash" and "join").

Algorithm (one join, any number of phrases, any phrase length):

1. Build word-level positional postings ``(doc, pos, token)``
   (`dedup.positional_shingles` with n=1), filtered to the combined
   phrase vocabulary — the filter sits directly on the token column,
   so the corpus fans out only for query-relevant words.
2. Join against a tiny literal table ``(phrase, offset, token,
   phrase_len)`` — one row per token occurrence in each phrase. The
   join emits a candidate ``start = pos − offset`` per match.
3. A phrase occurs at ``(doc, start)`` iff ALL ``phrase_len``
   offsets matched there — and because postings are unique by
   ``(doc, pos)``, each offset can contribute at most one row to a
   ``(phrase, doc, start)`` group, so the check is just
   ``COUNT(*) = phrase_len``. Repeated tokens inside a phrase
   ("batch batch") are handled for free by the same argument.
   Overlapping occurrences count separately, matching the
   list-scan oracle semantics.

Scale shape: the phrase table is kilobytes and broadcasts; the only
corpus-sized stage is the postings projection + one shuffle on
``(phrase, doc, start)`` whose input is |query-vocabulary postings|,
not |corpus tokens|. The second aggregate (counts per doc) runs on
matched starts only. This is the standard sharded-search plan: the
index side never moves, the query side ships to it.

(The reference repo has no search surface; SURVEY §2.12 extension —
the retrieval family next to `bm25_doc_search`.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from . import dedup


def phrase_match_counts(
    df: DataFrame,
    phrases: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Occurrences of each phrase in each document:
    ``(phrase, doc_id, n_matches)`` with ``n_matches > 0`` only
    (absent rows mean zero). Tokenization = `dedup.tokens`
    (lowercase, whitespace split) so results line up with every
    other text operator in the engine."""
    spark = df.sparkSession
    phrase_rows = []
    vocab: set[str] = set()
    for p in phrases:
        toks = [t for t in p.lower().split() if t]
        assert toks, f"empty phrase: {p!r}"
        for off, t in enumerate(toks):
            phrase_rows.append((p, off, t, len(toks)))
            vocab.add(t)
    ptab = spark.createDataFrame(
        phrase_rows, "phrase string, off int, token string, phrase_len int"
    )

    postings = (
        dedup.positional_shingles(df, id_col, text_col, n=1)
        .withColumnRenamed("shingle", "token")
        .where(F.col("token").isin(*sorted(vocab)))
    )
    starts = (
        postings.join(F.broadcast(ptab), "token")
        .select(
            "phrase",
            F.col(id_col),
            (F.col("pos") - F.col("off")).alias("start"),
            "phrase_len",
        )
        .where(F.col("start") >= 0)
        .groupBy("phrase", id_col, "start", "phrase_len")
        .agg(F.count(F.lit(1)).alias("n_off"))
        .where(F.col("n_off") == F.col("phrase_len"))
    )
    return starts.groupBy("phrase", id_col).agg(
        F.count(F.lit(1)).alias("n_matches")
    )
