"""Batch sessionization: gap-based sessions via lag + running sum.

Streaming uses the native ``session_window`` (streaming/ingest.py);
the batch twin below is pure window algebra so it is portable to any
SQL engine (DuckDB-oracle-checkable) and produces *stable session
numbers* (1..n per key in time order), which session_window does not
expose.

Plan: one shuffle on the key; two window passes over the same sort
order (Catalyst collapses them into a single sort).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a session number per key: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``.

    Output: input columns + ``session_no`` (1-based, per key).
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_no", F.sum(new_sess).over(run).cast("long"))


def session_summary(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sessions rolled up: (keys..., session_no, session_start,
    session_end, n_events)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(*[F.col(c) for c in key_cols], F.col("session_no")).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
