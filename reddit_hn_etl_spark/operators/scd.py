"""Slowly-changing-dimension (type 2) history construction.

The reference's mart layer keeps only current state (full-refresh
upsert, `sql/mart/02_marts.sql`); warehouses that need AS-OF
reconstruction keep SCD2 validity intervals instead. This operator
derives them from an ordered change feed: one row per version with
[effective_from, effective_to) and an is_current flag — the table the
`pit_user_features`/`asof_rates` join family would read at scale.

Scale shape: one hash exchange on the key; the tie-dedup and the
lead() interval construction share the same (key, ts) sort. Nothing
global, nothing iterative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build SCD2 validity intervals from a change feed.

    Same-instant updates collapse to the LAST writer (ordered by
    ``tiebreak_col``, the audit last-writer-wins rule); each surviving
    change opens a version effective until the next change's
    timestamp (exclusive), the final version has effective_to NULL
    and is_current TRUE. version_n numbers versions 1..n per key in
    time order.
    """
    keys = [F.col(k) for k in key_cols]
    last_per_instant = (
        changes.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys, F.col(ts_col)).orderBy(
                    *([F.desc(tiebreak_col)] if tiebreak_col else [F.lit(1)])
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_ver = Window.partitionBy(*keys).orderBy(ts_col)
    return last_per_instant.select(
        *key_cols,
        F.row_number().over(w_ver).cast("int").alias("version_n"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w_ver).alias("effective_to"),
        F.lead(ts_col).over(w_ver).isNull().alias("is_current"),
        *attr_cols,
    )


def sequence_pattern_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first: str,
    second: str,
    third: str,
    max_span_micros: int,
    tiebreak_col: str,
) -> DataFrame:
    """Ordered three-step sequence detection (MATCH_RECOGNIZE-style):
    for every ``third``-type event, the latest preceding ``second``
    event and the latest ``first`` event preceding THAT, emitted when
    the whole chain fits in ``max_span_micros``.

    The nesting is resolved with two frame-bounded IGNORE NULLS
    last_value passes over ONE (key, ts, tiebreak) sort: pass 1
    carries the running last ``first`` timestamp; pass 2 carries, for
    each ``second`` event, the pair (its ts, the captured ``first``
    ts) — so by the time a ``third`` event looks back it sees the
    latest B and the A that was current when B happened, which is
    exactly the strict A<B<C ordering. Single shuffle on the key;
    both windows share the sort.

    Output: (key, first_ts, second_ts, third_ts, span_micros).
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    prec = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(type_col)
    with_a = events.withColumn(
        "_last_a",
        F.last(F.when(t == first, F.col(ts_col)), ignorenulls=True).over(prec),
    )
    pair = F.when(
        (t == second) & F.col("_last_a").isNotNull(),
        F.struct(F.col(ts_col).alias("b_ts"), F.col("_last_a").alias("a_ts")),
    )
    with_b = with_a.withColumn(
        "_last_ab", F.last(pair, ignorenulls=True).over(prec)
    )
    um = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    span = um(F.col(ts_col)) - um(F.col("_last_ab.a_ts"))
    return (
        with_b.where((t == third) & F.col("_last_ab").isNotNull())
        .where(span <= max_span_micros)
        .select(
            F.col(key_col),
            F.col("_last_ab.a_ts").alias("first_ts"),
            F.col("_last_ab.b_ts").alias("second_ts"),
            F.col(ts_col).alias("third_ts"),
            span.alias("span_micros"),
        )
    )
