"""Distributed (hierarchical) prefix sum / row numbering / ntile.

A global running sum, row_number, or ntile expressed as
`Window.orderBy(...)` plans a SinglePartition exchange — every row
through ONE task, the classic 100 TB scale-killer. The textbook fix
is hierarchical: range-partition on the order key(s), compute LOCAL
running values per partition, then add each partition's cumulative
offset (the sum of all earlier partitions' totals — a table with one
row per partition, never per row). Same algebra, no single-task
bottleneck.

Absent in the reference (its corpora fit one node); needed by the
token-budget sharder (`pack_token_budget`), the RFM quartile scorer,
and any exporter that cuts a corpus into fixed-budget files in a
stable order.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_pfx_pid"
_LOCAL = "_pfx_local"
_OFFSET = "_pfx_offset"
_ONES = "_pfx_ones"


def _order_exprs(
    order_cols: Sequence[str], descending: Sequence[bool] | None
) -> list[Column]:
    if descending is None:
        descending = [False] * len(order_cols)
    assert len(descending) == len(order_cols)
    return [
        F.col(c).desc() if d else F.col(c).asc()
        for c, d in zip(order_cols, descending)
    ]


def prefix_sum(
    df: DataFrame,
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
    checkpoint: bool = True,
    descending: Sequence[bool] | None = None,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """(order cols…, carry cols…, value_col, out_col) with out_col the
    running sum of value_col in (order_col, descending) order. NULL
    values add 0 (the `SUM ... OVER` convention); columns outside
    order/carry/value are dropped — list what you need in
    ``carry_cols`` (free pass-through: they ride the same batches)
    rather than joining back.

    Plan: ONE full-data exchange (rangepartitioning on the order keys)
    + an in-partition sort; the Arrow-batched local cumsum streams
    each partition once; partition totals (|partitions| rows) make the
    offsets via a window that IS single-partition but over a
    per-partition-count input, then broadcast back. The tagged local
    result is lazily localCheckpoint-ed so the totals branch does not
    re-run the scan+shuffle. Exact for integer values (int64 both
    engines)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    carry = [c for c in carry_cols if c not in order_cols and c != value_col]
    cols = [*order_cols, *carry, value_col]
    order_by = _order_exprs(order_cols, descending)

    proj = (
        df.select(*cols)
        .repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
    )
    schema = ", ".join(
        [f"{c} {proj.schema[c].dataType.simpleString()}" for c in cols]
        + [f"{_LOCAL} bigint", f"{_PID} int"]
    )

    def local_cumsum(batches: Iterator) -> Iterator:
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            vals = pdf[value_col].fillna(0).astype("int64")
            run = vals.cumsum() + acc
            if len(run):
                acc = int(run.iloc[-1])
            out = pd.DataFrame({c: pdf[c] for c in cols})
            out[_LOCAL] = run
            out[_PID] = pid
            yield out

    # Lazy local checkpoint: materialized on first action, shared by
    # the offsets branch and the final join — without it each branch
    # would re-run the scan + range shuffle + Python pass.
    # (``checkpoint=False`` keeps full lineage for plan inspection.)
    # Rejected alternative: aggregate spark_partition_id() over `proj`
    # directly and rely on ReusedExchange to share the shuffle. That
    # drops the checkpoint and the totals-branch Python pass, but its
    # correctness hinges on both branches seeing identical partition
    # ids — an optimizer behavior (exchange reuse + consistent AQE
    # coalescing), not a semantic guarantee. If reuse ever fails to
    # fire, range-bound sampling can differ per shuffle and the
    # offsets silently attach to the wrong rows. The checkpoint costs
    # one extra materialization but is correct by construction.
    tagged = proj.mapInPandas(local_cumsum, schema)
    if checkpoint:
        tagged = tagged.localCheckpoint(eager=False)

    # Partition total = sum of the values (NOT max of the local run —
    # negative values make the run non-monotonic).
    totals = tagged.groupBy(_PID).agg(
        F.sum(F.coalesce(value_col, F.lit(0))).alias("_pfx_total")
    )
    # Window over one row per partition — thousands of rows at most,
    # NOT data-sized: the whole point of the hierarchy.
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        _PID,
        F.coalesce(F.sum("_pfx_total").over(w_off), F.lit(0)).alias(_OFFSET),
    )

    return (
        tagged.join(F.broadcast(offsets), _PID)
        .select(
            *cols,
            (F.col(_LOCAL) + F.col(_OFFSET)).alias(out_col),
        )
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rn",
    descending: Sequence[bool] | None = None,
    carry_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """`row_number() OVER (ORDER BY …)` without the SinglePartition
    funnel: a hierarchical prefix sum of ones. The order should be a
    total order (add a unique tiebreak column) — equal keys get an
    arbitrary but deterministic-given-partitioning order otherwise,
    exactly like Spark's row_number."""
    ones = df.withColumn(_ONES, F.lit(1))
    out = prefix_sum(
        ones,
        order_col=order_cols,
        value_col=_ONES,
        out_col=out_col,
        num_partitions=num_partitions,
        descending=descending,
        carry_cols=carry_cols,
    )
    return out.drop(_ONES)


def global_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence[str],
    out_col: str = "bucket",
    descending: Sequence[bool] | None = None,
    carry_cols: Sequence[str] = (),
    num_partitions: int | None = None,
    total_rows: int | None = None,
) -> DataFrame:
    """`ntile(n) OVER (ORDER BY …)` from the hierarchical row number
    plus the closed-form bucket assignment Spark/ANSI use: with N rows
    the first N % n buckets get ⌈N/n⌉ rows, the rest ⌊N/n⌋. The row
    count joins in as a broadcast 1-row scalar — no second pass over
    the ordered data. Callers chaining several ntiles over the SAME
    rows should count once and pass ``total_rows``: it replaces the
    per-call count aggregate + broadcast with a literal (the count is
    a 1-row driver probe, the sanctioned kind)."""
    rn = global_row_number(
        df, order_cols, out_col="_pfx_rn", descending=descending,
        carry_cols=carry_cols, num_partitions=num_partitions,
    )
    if total_rows is not None:
        big = F.floor(F.lit(total_rows) / n) + 1
        n_big = F.lit(total_rows % n)
        cut = n_big * big
        bucket = F.when(
            F.col("_pfx_rn") <= cut,
            F.floor((F.col("_pfx_rn") - 1) / big) + 1,
        ).otherwise(
            n_big
            + F.floor((F.col("_pfx_rn") - cut - 1) / F.floor(F.lit(total_rows) / n))
            + 1
        )
        return rn.withColumn(out_col, bucket.cast("int")).drop("_pfx_rn")
    total = rn.agg(F.max("_pfx_rn").alias("_pfx_n"))
    big = F.floor(F.col("_pfx_n") / n) + 1  # rows in the larger buckets
    n_big = F.col("_pfx_n") % n
    cut = n_big * big  # rows covered by the larger buckets
    bucket = F.when(
        F.col("_pfx_rn") <= cut,
        F.floor((F.col("_pfx_rn") - 1) / big) + 1,
    ).otherwise(
        n_big + F.floor((F.col("_pfx_rn") - cut - 1)
                        / F.floor(F.col("_pfx_n") / n)) + 1
    )
    return (
        rn.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_pfx_rn", "_pfx_n")
    )
