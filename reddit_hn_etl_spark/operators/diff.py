"""Table diff: reconcile two versions of a keyed table.

The ops question after every backfill/migration/vendor switch: what
actually changed? ``table_diff`` full-outer-joins old and new on the
key (null-safe) and classifies every key as inserted / deleted /
updated / unchanged; ``diff_report`` reduces that to a tall
(metric, n) summary including per-column change counts — the
data-diff tool (Datafold-style) as one Spark plan.

Scale shape: ONE full-outer shuffle join on the key (same cost class
as the MERGE operator it complements — `operators/merge.py` applies
changes, this one explains them); the per-column comparisons are
projections on the joined row; the report is a single partial/final
aggregation whose output is O(columns). All counts are integers —
the driver hash-compare is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key diff classification.

    Output: key columns + ``diff_status`` ∈ {inserted, deleted,
    updated, unchanged} + one boolean ``chg_<col>`` per compared
    column (NULL-safe inequality; false for inserted/deleted rows).
    Comparison columns default to the non-key columns present on BOTH
    sides.
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    changed = [
        (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).alias(f"chg_{c}")
        for c in compare_cols
    ]
    any_change = None
    for c in compare_cols:
        e = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        any_change = e if any_change is None else any_change | e
    status = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(any_change if any_change is not None else F.lit(False),
              F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[F.coalesce(f"_ok_{k}", f"_nk_{k}").alias(k) for k in keys],
        status.alias("diff_status"),
        *[
            (in_old & in_new & chg).alias(f"chg_{c}")
            for c, chg in zip(compare_cols, changed)
        ],
    )
    return out


def diff_report(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Tall (metric, n) reconciliation summary: the four status counts
    plus ``col:<name>`` change counts. One aggregation over the diff."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    d = table_diff(old, new, keys, compare_cols)
    aggs = [
        F.sum(F.when(F.col("diff_status") == s, 1).otherwise(0)).alias(s)
        for s in ("inserted", "deleted", "updated", "unchanged")
    ] + [
        F.sum(F.when(F.col(f"chg_{c}"), 1).otherwise(0)).alias(f"col:{c}")
        for c in compare_cols
    ]
    wide = d.agg(*aggs)
    metrics = [
        "inserted", "deleted", "updated", "unchanged",
        *[f"col:{c}" for c in compare_cols],
    ]
    # wide → tall with a stack expression (no shuffle: 1-row input)
    pairs = ", ".join(f"'{m}', `{m}`" for m in metrics)
    return wide.selectExpr(
        f"stack({len(metrics)}, {pairs}) as (metric, n)"
    )
