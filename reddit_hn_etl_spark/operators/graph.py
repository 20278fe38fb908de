"""Connected components on DataFrames: transitive dedup clusters.

Near-duplicate detection yields PAIRS; correct dedup needs CLUSTERS
(a~b, b~c ⇒ {a,b,c} keep one). This module computes connected
components with the iterated min-label propagation ("hash-to-min"
style) entirely in DataFrame algebra — no GraphFrames dependency, no
driver-side graph:

    label(v) ← min(label(v), min over neighbors' labels)

repeated until no label changes. Each iteration is one join + one
aggregation (two shuffles); convergence takes O(diameter) iterations
— near-dup graphs are unions of small cliques, so diameter is tiny
(2-3). A ``max_iter`` guard bounds pathological chains; at planetary
scale switch to the alternating small-star/large-star optimization
(same primitive ops, fewer rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component =
    the minimum vertex id reachable from it.

    Deterministic: labels are ids, min is order-free.
    """
    # Materialize the symmetric edge set ONCE: it is re-read every
    # round, and `edges` may itself be an expensive pipeline (the
    # near-dup candidate join in curate_documents) that must not be
    # recomputed per iteration.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("vertex")).distinct().select(
        "vertex", F.col("vertex").alias("component")
    )

    prev_sum: int | None = None
    for _ in range(max_iter):
        # neighbor-min pass: smallest label among each vertex's
        # neighborhood (including itself)
        neigh = (
            sym.join(labels, sym.v == labels.vertex)
            .select(F.col("u").alias("vertex"), F.col("component"))
            .unionByName(labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
        )
        # Checkpoint FIRST (one materialization, cut lineage), then
        # probe convergence on the materialized frame. Labels are
        # monotone non-increasing (min over a set that includes the
        # current label), so Σcomponent is strictly decreasing until
        # the fixpoint: an unchanged sum IS convergence. That makes
        # the probe a single scalar aggregate over the checkpointed
        # frame instead of a labels⋈labels diff join per round.
        new_labels = neigh.localCheckpoint(eager=True)
        new_sum = new_labels.agg(
            F.sum("component").cast("long").alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """From near-dup pairs to a drop-list: every vertex whose cluster
    representative (min id in its component) is not itself.

    Output: (<src> alias 'drop_id', component) — anti-join your
    corpus against drop_id to keep exactly one doc per cluster.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.where(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("drop_id"), F.col("component")
    )


def keep_best_per_cluster(
    cc: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-ranked cluster representative: instead of keeping the
    min-id doc per near-dup cluster (``dedup_clusters``), keep the
    HIGHEST-``score_col`` doc (ties → lowest id) — what a curation
    pipeline actually wants when duplicates differ in quality
    (truncation, boilerplate, OCR noise).

    Inputs: ``cc`` = (vertex, component) from
    ``connected_components``; ``scores`` = (id_col, score_col).
    Output: (id_col, component, score_col, is_rep) — one True per
    component, deterministic.

    Plan: one broadcast-or-shuffle join on the vertex id + one window
    over ``component`` (single shuffle; cluster sizes are tiny so no
    skew hazard).
    """
    joined = cc.join(scores, cc["vertex"] == scores[id_col]).select(
        scores[id_col], cc["component"], scores[score_col]
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.col(id_col)
    )
    return joined.select(
        id_col,
        "component",
        score_col,
        (F.row_number().over(w) == 1).alias("is_rep"),
    )
