"""Corpus cleaning operators: line-level boilerplate removal.

Training-data pipelines strip lines that recur across many documents
(navigation chrome, cookie banners, footers — the CCNet/RefinedWeb
line-dedup step): a line's *document frequency* is the signal, and
lines above a df threshold are boilerplate regardless of their
content. This module implements that as three composable DataFrame
stages, all native-expression (no Python row UDFs):

  1. ``doc_lines``           — posexplode the text into
                               (id, pos, line), trimmed, empties
                               dropped, original order kept via pos;
  2. ``boilerplate_lines``   — df per distinct line, thresholded;
  3. ``strip_boilerplate_lines`` — flag+drop boilerplate lines and
                               reassemble each document in original
                               line order.

Scale shape (100 TB): stage 1 is a pure projection; stage 2 is one
hash shuffle on the line content with map-side partial aggregation;
the boilerplate set is then *small by construction* — at df threshold
``k`` it holds at most total_lines/k entries — so stage 3 joins it
broadcast and the only remaining shuffle is the per-document
reassembly groupBy on the id. A document's own lines always fit in
one task (a document fits in memory by definition), so the
collect_list reassembly is bounded.

The reference pipeline has no line-level cleaning (its HN titles are
single-line); this operator is part of the LLM-data extension
surface, verified against a DuckDB oracle on a deterministically
planted multi-line corpus (see plans/queries.py
``doc_boilerplate_strip``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode documents into (id, pos, line) rows.

    Lines are split on ``\\n`` and trimmed; empty (all-whitespace)
    lines are dropped but ``pos`` still reflects the original line
    number, so reassembly preserves relative order. Projection only —
    no shuffle.
    """
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    return exploded.withColumn("line", F.trim("line")).where(F.col("line") != "")


def boilerplate_lines(lines: DataFrame, id_col: str, min_doc_freq: int) -> DataFrame:
    """Distinct lines occurring in ≥ ``min_doc_freq`` documents.

    Output: (line, doc_freq). One hash shuffle on the line content;
    COUNT(DISTINCT id) is the two-phase expand+agg Spark plans
    natively. The result is small by construction (≤ total_lines /
    min_doc_freq rows), which is what makes the downstream broadcast
    join safe at any corpus size.
    """
    return (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_doc_freq)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int,
) -> DataFrame:
    """Remove boilerplate lines and reassemble each document.

    Returns one row per input document:
      (id, clean_text, n_lines, n_removed)
    where ``clean_text`` is the surviving lines joined by ``\\n`` in
    original order (NULL when every line was boilerplate),
    ``n_lines`` counts the document's non-empty lines and
    ``n_removed`` how many of them were stripped.

    Plan: explode (projection) → df-threshold agg (one shuffle on
    line) → broadcast left join of the small boilerplate set →
    one groupBy on the id for reassembly. Two shuffles total; the
    broadcast is bounded by construction, not by luck.
    """
    lines = doc_lines(df, id_col, text_col)
    boiler = boilerplate_lines(lines, id_col, min_doc_freq).select(
        "line", F.lit(True).alias("_is_boiler")
    )
    flagged = lines.join(F.broadcast(boiler), on="line", how="left").withColumn(
        "_is_boiler", F.coalesce("_is_boiler", F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("_is_boiler"), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            # collect_list skips NULLs → only kept lines; array_sort on
            # the (pos, line) struct restores original order.
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.getField("line"),
                ),
            ).alias("_joined"),
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("_is_boiler"), 1).otherwise(0)).alias("n_removed"),
        )
        # concat_ws over zero elements yields '' — normalize to NULL so
        # "everything was boilerplate" is distinguishable from a
        # one-empty-line document (the oracle's string_agg does the same).
        .withColumn(
            "clean_text", F.when(F.col("_joined") != "", F.col("_joined"))
        )
        .select(id_col, "clean_text", "n_lines", "n_removed")
    )


def normalize_unicode(col: str | Column, form: str = "NFC") -> Column:
    """Unicode normalization as an Arrow-batched pandas UDF (Spark has
    no built-in normalizer; the per-batch vectorized str.normalize
    keeps it off the row-at-a-time path). NFC is the cross-engine
    differential-testable form (DuckDB ships nfc_normalize); NFKC/NFD
    etc. are the same one-argument call for pipeline use."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        return s.str.normalize(form)

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c)
