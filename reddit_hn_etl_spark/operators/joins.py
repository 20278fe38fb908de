"""Join operators beyond Spark's built-ins: as-of and interval joins.

Absent in the reference (SURVEY.md §2.6 lists them as extension
surface) but first-class in time-series engines; both are implemented
as compositions of existing DataFrame ops — no UDFs, no Catalyst
internals — with plans that survive 100 TB:

  * as-of join: union + window (single shuffle on the key), instead
    of the naive per-row subquery;
  * interval join: time-bucket blocking (shuffle on (key, bucket))
    instead of the quadratic theta join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of LEFT join: each left row gets the right row with
    the greatest ``right_ts`` <= ``left_ts`` for the same key (ties on
    the timestamp DO match: ``<=``, not ``<``). With ``strict=True``
    the match is ``right_ts < left_ts`` — a same-instant right row is
    NOT visible (the point-in-time contract; see ``pit_join``).

    Plan: tag both sides, union, one window pass per key ordered by
    (ts, side) carrying the latest right row forward as a single
    struct (atomic: all matched values come from the SAME right row,
    even when some of its columns are null). ONE shuffle on the key —
    same cost as a plain equi-join, versus the quadratic naive
    formulation. Matches DuckDB ``ASOF JOIN`` semantics
    (oracle-checked in plans/queries.py).

    ``right`` should be unique per (key, right_ts) — pre-dedup with
    dedup_keep_last for determinism.

    Output: all left columns + ``value_cols`` (null when no match) +
    ``matched_ts`` (the matched right timestamp).
    """
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]

    r_struct_type = T.StructType(
        [T.StructField("matched_ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(None).cast(r_struct_type).alias("_rrow"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("_asof_ts"),
        F.struct(
            F.col(right_ts).alias("matched_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_rrow"),
    ).select(*l_tag.columns)  # align column order for unionByName

    # Right rows sort BEFORE left rows at equal ts (side 0 < 1) so a
    # tie matches — the `<=` contract. Strict mode flips the tie so a
    # same-instant right row sorts AFTER the left row — invisible.
    side_order = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *[F.col(c) for c in left.columns],
        F.col(_SIDE),
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    )
    return carried.where(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        F.col("_m.matched_ts").alias("matched_ts"),
    )


def pit_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Point-in-time join — the feature-store / training-data variant
    of the as-of join: each left row sees only right rows STRICTLY
    before its timestamp (no same-instant lookahead — a feature
    written at the event's own instant is leakage), optionally within
    a freshness ``tolerance_sec`` (a stale feature is no feature).

    Same single-shuffle union+window plan as ``asof_join``; the
    tolerance is a post-projection on the matched struct, so rows
    whose only match is too old keep their left columns with null
    features — they are NOT dropped (the left surface is the training
    spine and must stay intact).
    """
    out = asof_join(
        left, right, on=on, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, strict=True,
    )
    if tolerance_sec is None:
        return out
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != right_ts]
    fresh = F.col("matched_ts") >= (
        F.col(left_ts) - F.expr(f"INTERVAL {int(tolerance_sec)} SECOND")
    )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.when(fresh, F.col(c)).alias(c) for c in value_cols],
        F.when(fresh, F.col("matched_ts")).alias("matched_ts"),
    )


def interval_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int | Column,
    upper: int | Column,
    bucket_seconds: int,
    count_alias: str = "matches",
) -> DataFrame:
    """For each left row, COUNT right rows of the same key with
    ``right_ts`` in [left_ts + lower, left_ts + upper] seconds.

    Blocking plan: the right side is bucketed by
    floor(epoch/bucket_seconds); each left row is replicated to every
    candidate bucket its window overlaps, equi-joined on
    (key, bucket), then exact-range filtered. Each right row lives in
    exactly one bucket, so no double counting. Shuffle carries
    O(rows × window/bucket) instead of the quadratic theta join —
    choose ``bucket_seconds`` ≈ the window width.

    ``left`` must contain a unique key among its columns (the final
    groupBy is over all left columns).
    """
    on = list(on)
    lo = lower if isinstance(lower, Column) else F.lit(int(lower))
    hi = upper if isinstance(upper, Column) else F.lit(int(upper))

    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))

    lb = left.select(
        *[F.col(c) for c in left.columns],
        F.explode(
            F.sequence(
                F.floor((l_epoch + lo) / bucket_seconds),
                F.floor((l_epoch + hi) / bucket_seconds),
            )
        ).alias("_bucket"),
        l_epoch.alias("_l_epoch"),
    )
    rb = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in on],
        F.floor(r_epoch / bucket_seconds).alias("_bucket"),
        r_epoch.alias("_r_epoch"),
    )
    cond = [F.col(c) == F.col(f"_r_{c}") for c in on] + [
        lb["_bucket"] == rb["_bucket"],
        F.col("_r_epoch") >= F.col("_l_epoch") + lo,
        F.col("_r_epoch") <= F.col("_l_epoch") + hi,
    ]
    joined = lb.join(rb, cond, "left")
    return (
        joined.groupBy(*[F.col(c) for c in left.columns])
        .agg(F.count("_r_epoch").alias(count_alias))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_by: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: spread each hot key of ``left`` over
    ``salt_buckets`` sub-keys and replicate the (small) ``right`` side
    once per bucket, so no single task receives a whole hot key.

    The left row's bucket comes from ``salt_by`` (default: xxhash64
    over the whole row — deterministic, uniform); the right side is
    exploded ``salt_buckets``× and the join runs on (key, salt). The
    result is EXACTLY the plain join — salting only changes row
    placement — which is what makes the operator oracle-checkable
    against an unsalted SQL join.

    Scale shape: right grows by the salt factor (keep it the dim
    side); the shuffle hash-partitions on (key, salt), giving
    ``salt_buckets``× the parallelism on hot keys. This is the manual
    fallback when AQE's skew-join split cannot apply (e.g. the
    aggregation-after-join pins the partitioning, or the skew is in
    a broadcast-ineligible mid-sized dim).

    Only inner/left joins are offered: a right/full join would need
    per-bucket dedup of the replicated right rows.
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    if salt_by is None:
        salt_by = F.xxhash64(*[F.col(c) for c in left.columns])
    lsalted = left.withColumn("_salt", F.pmod(salt_by, F.lit(salt_buckets)))
    rsalted = right.withColumn(
        "_salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    out = lsalted.join(rsalted, on=[key, "_salt"], how=how)
    return out.drop("_salt")
