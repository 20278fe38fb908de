"""Order-based relational analytics: skyline (Pareto front) and
market-basket co-occurrence.

Both operators replace a naive quadratic formulation with a
sort/aggregate plan:

* ``skyline_2d`` — the classic 2-D skyline (Börzsönyi et al., ICDE
  2001 "The Skyline Operator") is definable as a NOT EXISTS
  dominance anti-join, which is O(n²) pairs. The sort-based plan
  here computes it with one aggregation plus one window pass —
  O(n log n) and shuffle-bounded by the group keys, which is the
  only formulation that survives 100 TB. The DuckDB oracle for the
  query layer runs the quadratic NOT EXISTS definition, so the two
  independently-derived answers cross-check each other.

* ``cooccurrence_pairs`` — frequent-pair mining (the support /
  lift step of association rules). Pair generation is a self-join
  *within basket*, so the blow-up is Σ c(b)² over basket sizes c(b),
  not n². Group to a coarse item dimension (e.g. brand) and/or cap
  basket size upstream to bound c(b); the join itself is a shuffle
  on the basket key, never a cross join.

Reference parity: the reference has no skyline/basket operators —
these extend the analytics surface over the same mart-style tables
(reference marts: `sql/mart/02_marts.sql`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Rows not dominated within their group: keep row r unless some
    row s in the same group has s[min_col] <= r[min_col] AND
    s[max_col] >= r[max_col] with at least one strict inequality.

    Plan: per (group, min_col) keep the best max_col (``gmax``);
    a window ordered by min_col yields the best max_col over all
    STRICTLY smaller min_col values (``prevmax``). A row is dominated
    iff prevmax >= its max_col (dominator strictly cheaper) or
    gmax > its max_col (same cost, strictly better). Exactly two
    shuffles (group-by, window) on keys of group cardinality ×
    distinct min_col — no pair explosion at any scale. Ties on both
    coordinates are mutually non-dominating and all kept, matching
    the NOT EXISTS definition.
    """
    gcols = list(group_cols)
    g = df.groupBy(*gcols, min_col).agg(F.max(max_col).alias("_gmax"))
    w = (
        Window.partitionBy(*gcols)
        .orderBy(F.asc(min_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("_prevmax", F.max("_gmax").over(w))
    dominated = (
        F.col("_prevmax").isNotNull() & (F.col("_prevmax") >= F.col(max_col))
    ) | (F.col("_gmax") > F.col(max_col))
    return (
        df.join(g, gcols + [min_col])
        .where(~dominated)
        .drop("_gmax", "_prevmax")
    )


def cooccurrence_pairs(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Per-pair co-occurrence counts with per-item basket counts and
    lift, over distinct (basket, item) incidences.

    Output: (item_a, item_b, pair_baskets, baskets_a, baskets_b,
    n_baskets, lift) with item_a < item_b. lift =
    P(a,b) / (P(a)·P(b)) computed as one double expression from the
    four exact integer counts — identical bits on any engine that
    evaluates the same expression tree.

    Scale: the self-join shuffles on the basket key only; item and
    basket totals are tiny aggregates broadcast back. Pair fan-out is
    Σ c(b)² — bounded when the item dimension is coarse (brands, not
    SKUs) or baskets are capped upstream.
    """
    # Materialize the incidence list ONCE (r13): it feeds both pair
    # sides, the item totals, and the n_baskets count — the count is
    # its own driver job, so without the checkpoint the upstream
    # pipeline (e.g. brand_copurchase_lift's lineitem ⋈ part +
    # distinct) executed once for the count and again for the main
    # action. The incidence list is (basket, item) distinct — the
    # compact co-purchase index a production pipeline persists.
    inc = df.select(basket_col, item_col).distinct().localCheckpoint(
        eager=True
    )
    a = inc.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_a")
    )
    b = inc.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(b, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
    )
    item_counts = inc.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("_icnt")
    )
    n_baskets = inc.select(basket_col).distinct().count()
    ca = item_counts.select(
        F.col(item_col).alias("item_a"), F.col("_icnt").alias("baskets_a")
    )
    cb = item_counts.select(
        F.col(item_col).alias("item_b"), F.col("_icnt").alias("baskets_b")
    )
    out = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .withColumn("n_baskets", F.lit(n_baskets))
    )
    lift = (
        F.col("pair_baskets").cast("double")
        * F.col("n_baskets").cast("double")
    ) / (
        F.col("baskets_a").cast("double") * F.col("baskets_b").cast("double")
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_baskets",
        "baskets_a",
        "baskets_b",
        "n_baskets",
        lift.alias("lift"),
    )
