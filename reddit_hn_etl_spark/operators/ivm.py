"""Incremental view maintenance (IVM) for aggregated join views.

The reference pipeline refreshes its marts by full recompute
(`src/mart/build_mart.py` rebuilds every aggregate each run, then
upserts — see `reddit_hn_etl_spark/sources/publish.py` for the
Spark-first port of that path). `incremental_daily_metrics` already
maintains a SINGLE-TABLE aggregate by merging (count, decimal-sum)
states over delta batches. This module closes the remaining gap:
maintaining an aggregate over a JOIN without rescanning the joined
history — the classic delta-join expansion used by every IVM engine
(DBSP/Materialize/Feldera lineage, and Spark's own streaming
stream-stream join maintenance):

    γ((A ∪ ΔA) ⋈ (B ∪ ΔB)) = γ(A⋈B) ⊕ γ(ΔA⋈B) ⊕ γ(A⋈ΔB) ⊕ γ(ΔA⋈ΔB)

so a refresh touches three DELTA-SIDED joins instead of recomputing
the base join. Correct-by-construction requires every aggregate to
be expressed in mergeable state space — here: SUM-mergeable states
(counts as SUM(1), sums as decimal SUMs; averages/ratios re-derive
from merged states downstream, never merged themselves).

Scale notes (100 TB posture):

* Maintenance cost is O(Δ ⋈ base), never O(base ⋈ base): each delta
  term joins a small delta against one base table, which AQE
  broadcasts when the delta is small and degrades to a shuffle join
  when it is not (no forced broadcast hints — the r1 lesson).
* The persisted view is O(groups) state rows, not O(rows); merging
  a delta into it is one union + one partial/final hash aggregate
  on the group keys.
* Insert-only deltas. Updates/deletes follow the counting algorithm
  (rows carry a ±1 sign multiplied into every state column before
  summing) — the states here are already linear, so a caller can
  express retractions by negating the state expressions; the engine
  surface for keyed upserts remains `operators/merge.py`.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def join_agg_states(
    a: DataFrame,
    b: DataFrame,
    on: Column,
    group_by: Sequence[str],
    state_cols: Mapping[str, Column],
) -> DataFrame:
    """γ(a ⋈ b) in mergeable state space: one inner join, then
    ``SUM(expr)`` per state column grouped by ``group_by``. Every
    expression must be a per-joined-row value (counts are
    ``F.lit(1)``), so the resulting states merge by plain SUM."""
    joined = a.join(b, on)
    return joined.groupBy(*group_by).agg(
        *[F.sum(expr).alias(name) for name, expr in state_cols.items()]
    )


def merge_states(
    states: Sequence[DataFrame],
    group_by: Sequence[str],
    state_names: Sequence[str],
) -> DataFrame:
    """⊕ over state tables: union + one partial/final hash aggregate.
    Groups appearing in only some inputs merge correctly because SUM
    ignores absent rows (no COALESCE dance needed)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_by).agg(
        *[F.sum(n).alias(n) for n in state_names]
    )


def delta_states(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Column,
    group_by: Sequence[str],
    state_cols: Mapping[str, Column],
) -> DataFrame:
    """The view delta for insert-only deltas on both join sides:
    γ(ΔA⋈B) ⊕ γ(A⋈ΔB) ⊕ γ(ΔA⋈ΔB). Only delta-sided joins — the
    base join is never recomputed."""
    names = list(state_cols)
    terms = [
        join_agg_states(a_delta, b_old, on, group_by, state_cols),
        join_agg_states(a_old, b_delta, on, group_by, state_cols),
        join_agg_states(a_delta, b_delta, on, group_by, state_cols),
    ]
    return merge_states(terms, group_by, names)


def apply_delta(
    view: DataFrame,
    delta: DataFrame,
    group_by: Sequence[str],
    state_names: Sequence[str],
) -> DataFrame:
    """Merge a view delta into the persisted view states."""
    return merge_states([view, delta], group_by, state_names)
