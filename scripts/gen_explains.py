"""Regenerate EXPLAINS.md: annotated physical plans of headline queries.

    python scripts/gen_explains.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_hn_etl_spark.plans.queries import QUERIES  # noqa: E402
from reddit_hn_etl_spark.session import get_session  # noqa: E402

NOTES = {
    "pricing_summary": "Filter pushed into parquet scan (PushedFilters), 7-col pruned ReadSchema, map-side partial_sum, ONE exchange on the group keys.",
    "segment_revenue": "Dim side broadcast (BroadcastHashJoin BuildRight) — no shuffle for the join; single exchange for the final agg.",
    "brand_revenue": "Two chained broadcast joins over the fact scan; only the 4 needed lineitem columns read.",
    "local_supplier_volume": "Full dim chain (region→nation→supplier + orders⋈customer) broadcast; region filter prunes before broadcast.",
    "dedup_keep_last": "WindowGroupLimit Partial BEFORE the exchange + Final after — top-1-per-key pushdown keeps the shuffle tiny.",
    "merge_upsert": "Full-outer SortMergeJoin on null-safe key (cannot broadcast a full-outer); source pre-deduped with WindowGroupLimit.",
    "asof_rates": "Union of tagged sides + ONE hash shuffle on the key; the window carries the last right-row struct forward.",
    "interval_purchases_near_errors": "Left rows replicated to candidate time buckets; equi-join on (key,bucket) replaces the quadratic theta join.",
    "sessionize": "Single shuffle on the key; lag + running-sum windows share one sort.",
    "top_orders": "TakeOrderedAndProject — global top-k without a full sort.",
    "knn_cosine": "Query side broadcast; corpus scanned once, no shuffle to score; windowed top-k per query.",
    "doc_exact_dedup": "md5 projection then partial+final hash agg — one shuffle of (hash, id) pairs only.",
    "cheapest_order_per_customer": "Correlated MIN subquery as a window min + filter — one shuffle, no self-join.",
    "large_volume_orders": "IN-over-grouped-HAVING as a semi join against the aggregated key set.",
    "orders_above_global_avg": "Global scalar threshold broadcast; decimal-exact on both engines.",
    "shipping_priority": "r2: `F.broadcast(orders)` removed — orders is fact-sized (~half survives the status filter). The optimizer picks the join from size estimates (broadcast at sf0.1, shuffle at scale); top-k remains TakeOrderedAndProject, never a global sort.",
    "min_cost_supplier": "TPC-H Q2 shape, decorrelated: the correlated MIN subquery becomes a window MIN over l_partkey — ONE exchange on the correlation key (shared by the window and nothing else), then equality filter and two broadcast dim joins. No self-join re-scan of lineitem.",
    "sole_late_suppliers": "TPC-H Q21 shape: EXISTS → left-semi, NOT EXISTS → left-anti, both self-joins on l_orderkey so they reuse one hash partitioning of lineitem; the lateness predicate is evaluated inside the join conditions; supplier dim broadcast at the end.",
    "not_in_null_semantics": "Null-aware NOT IN from the SQL surface: the poisoned variant plans `BroadcastHashJoin ... LeftAnti, BuildRight, true` — the trailing flag is `isNullAwareAntiJoin`, the three-valued-logic-correct anti join a plain DataFrame `left_anti` cannot express; the null-free variant gets the ordinary LeftAnti.",
    "top_revenue_supplier": "Q15 shape: the revenue aggregate feeds BOTH the MAX scalar (1-row broadcast, cross join on the normalized float key) and the equality filter; under AQE the aggregation exchange is computed once and reused, so the 'view' is not re-scanned.",
    "benchmark_contamination": "Single-pass decontamination: one Generate (shingle explode) per side with the doc_id predicates PUSHED BELOW the explode into the scans (bench side explodes 10 docs, not the corpus), one broadcast left join with a hit indicator, and overlap+size from the same partial/final hash aggregate.",
    "disjunctive_part_revenue": "Q19 OR-of-ANDs: derivable single-side residuals pushed into BOTH scans (quantity-range union on lineitem, brand/size union on part — see PushedFilters); only the cross-side disjunction stays as the join filter.",
    "order_priority_check": "Q4 EXISTS as LeftSemi BroadcastHashJoin: both date and returnflag filters pushed; only the key column shuffles/broadcasts.",
    "volume_shipping": "Q7 double-role nation dim joined twice (supplier/customer side), both broadcast; the bidirectional pair predicate lands post-join; facts stay shuffle-side for AQE.",
    "small_qty_revenue": "Q17 correlated per-part AVG decorrelated to a window over l_partkey — ONE shuffle, no self-join of lineitem.",
    "doc_chunking": "Zero-exchange plan: tokenize → Generate(sequence) → Project. Embarrassingly parallel at any scale.",
    "pack_token_budget": "Global running sum = one SinglePartition exchange (documented trade-off; hierarchical prefix-sum is the 100 TB path); agg piggybacks on the existing partitioning — no second exchange.",
    "doc_repetition": "ONE corpus scan: unigrams+bigrams explode together as type-tagged grams (single Generate), partial-agg map-side, one shuffle on (doc_id, t, gram), then conditional aggregates split the types back out — no second read of the text at 100 TB, no join at all.",
    "weighted_doc_sample": "A-ES weighted sample: pure projection (md5→uniform→ln(u)/w key) + top-k. The rank filter pushes a TakeOrderedAndProject(limit=20) BELOW the window — 20 rows reach the row_number, never a global sort.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = io.StringIO()
    out.write(
        "# EXPLAINS — physical-plan audit of headline queries "
        f"({os.path.basename(sf_dir)}, local[8])\n\n"
        "Generated by scripts/gen_explains.py; regenerate after plan\n"
        "changes. Each section: why the plan is the one you'd want at\n"
        "100 TB, then the `explain()` output.\n\n"
    )
    for name, note in NOTES.items():
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()
        out.write(f"## {name}\n\n{note}\n\n```\n{buf.getvalue().strip()}\n```\n\n")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "EXPLAINS.md"), "w", encoding="utf-8") as f:
        f.write(out.getvalue())
    print("EXPLAINS.md regenerated")


if __name__ == "__main__":
    main()
