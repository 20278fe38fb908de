"""Empirical scaling probe: do the headline plans scale LINEARLY?

SCALING.md argues each operator family is linear (modulo the
documented quadratic-candidate knobs). This script MEASURES it:
replicate the sf0.1 tables k× into /tmp with offset keys and salted
text (so near-dup structure grows linearly — copies must not
cross-match), then time a single-table query set at 1× and k× and
print the time ratio. A linear plan shows ratio ≈ k (usually less,
because fixed overheads amortize); a quadratic one shows ≈ k².

    python scripts/scaling_probe.py [k] [sf_dir]

Writes nothing outside /tmp; results go to stdout (paste the table
into SCALING.md when it changes materially).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from reddit_hn_etl_spark.plans.queries import QUERIES

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BASE = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = f"/tmp/scaling_probe/x{K}"

# single-table queries only: the replica set offsets each table's own
# keys but does NOT maintain cross-table referential integrity
PROBES = [
    "pricing_summary",        # lineitem: scan + group agg
    "top_orders",             # orders: global top-k
    "daily_metrics",          # events: cast + date agg
    "sessionize",             # events: keyed window
    "user_value_ema",         # events: per-key Arrow fold
    "doc_exact_dedup",        # documents: hash dedup
    "doc_minhash_pairs",      # documents: signatures + LSH + bound check
    "doc_simhash_pairs",      # documents: votes + pigeonhole + exact check (r6 blocks=4)
    "doc_boilerplate_strip",  # documents: line df + reassembly
    "doc_dsir_weights",       # documents: bucket models + ordered fold
    "kmeans_assign",          # embeddings: literal-centroid map
    "kmeans_update_step",     # embeddings: posexplode + combinable agg
    "customer_graph_pagerank",  # customer: per-round join+agg x3
    # r4 sixth session additions
    "customer_revenue_gini",    # orders: hierarchical global rank
    "event_value_auc",          # events: distinct-score window
    "daily_value_cusum",        # events: daily agg + ordered fold
    "order_value_equidepth_hist",  # orders: global_ntile + bucket agg
    "referral_reach_bfs",       # customer: frontier rounds
    "parts_price_size_skyline",  # part: group+window skyline
    # semantic_dedup_kmeans / cluster pair queries are EXCLUDED like
    # doc_token_jaccard: replicated vectors are exact cosine twins, so
    # pair output grows k^2 by construction, not by plan defect
    # r4 seventh session additions
    "embedding_covariance",     # embeddings: mapInPandas partial Gram
    "pca_project_top1",         # embeddings: full PCA chain + scan
    "phrase_search_positional",  # documents: filtered postings join
    "daily_value_holt_winters",  # events: daily agg + 2-state fold
    "event_value_bootstrap_se",  # events: x32 fan-out partial agg
    "daily_value_changepoint",  # events: prefix moments + argmin
    "bigram_pmi_collocations",  # documents: two count aggs + scoring
    # r4 eighth session additions
    "bloom_customer_screen",    # customer: bit_or agg + broadcast probe
    "cms_selfjoin_size_estimate",  # lineitem: cell agg + KB join
    "doc_bigram_lm_logprob",    # documents: stat maps + ordered fold
    "doc_token_dropout",        # documents: pure filter() projection
    "cdc_user_state_apply",     # events: one keyed window pass
    "value_conformal_intervals",  # events: split + per-type rank
    "referral_weighted_sssp",   # customer: Bellman-Ford rounds
    "daily_mann_kendall",       # events: grain agg + bounded pair join
    # copurchase_kcore / mutual_knn_pairs are EXCLUDED like the
    # semantic-dedup pair queries: the lineitem replica offsets
    # l_orderkey but NOT l_partkey, so co-purchase degrees grow k×
    # and the k=65 peel measures a different (denser) graph, and
    # embedding replicas are unsalted exact-twin vectors that
    # rewrite every top-5 list. Measure those across real SFs.
    # r5 additions
    "peak_concurrent_sessions",  # events: boundary union + keyed sweep
    "type_daily_twap",          # events: LEAD window + partial agg
    # customer_nearest_supplier_geo EXCLUDED like the pair queries:
    # replicated keys hash to k× denser cells, so candidates/cell
    # grow by construction, not by plan defect. Measure across SFs.
    # r5 continuation additions (statistics / corpus-science block)
    "value_ks_test",            # events: distinct-value agg + cum windows
    "value_mannwhitney_test",   # events: same state, midrank algebra
    "purchase_cem_att",         # events: one conditional agg to strata
    "purchase_ipw_ate",         # events: same shape, Hajek weights
    "daily_value_its",          # events: date rollup + 2-row OLS
    "signup_purchase_logrank",  # events: KM durations + day windows
    "value_qte",                # events: per-arm group quantiles
    "covariate_balance_smd",    # events: union projection + 4-key agg
    "user_markov_surprisal",    # events: LEAD window + model broadcast
    "uplift_qini_deciles",      # events: per-user agg + global_ntile
    "corpus_heaps_fit",         # documents: prefix sums + int moments
    "term_burstiness",          # documents: explode + term-keyed moments
    "heldout_oov_rate",         # documents: trigram split-vocab join
    "corpus_textrank_keywords", # documents: bigram graph + pagerank
    "lang_id_kappa",            # documents: confusion agg + exact kappa
    "embedding_isotropy_audit", # embeddings: posexplode + dim-keyed agg
    "cluster_label_purity",     # embeddings: assignment + cell windows
    # knn_shapley / knn_label_diagnostics / mmr / source_overlap /
    # source_loo / embedding_knn_join / pq_knn_join /
    # pq_residual_knn_join (r10) / ivf_index_knn_join (r11)
    # EXCLUDED like the other pair-surface queries:
    # replicated embeddings are exact twins and salted text keeps
    # jaccard pairs linear but the probes' interest is the new
    # statistic algebra, already covered by the singles above.
    # r9 additions: per-token salting keeps replicas copy-distinct,
    # so each replica's INTERNAL repeated spans persist while copies
    # never cross-match — the duplicated-gram head and covered
    # positions grow k×, probe count stays O(log max_len).
    "corpus_repeated_span_occurrences",  # documents: binary-search LRS
    "doc_exact_substring_trim",  # documents: gram agg + trim rebuild
    "doc_quality_logistic",      # documents: 3 scans -> 1-row reduces
    "url_canonical_dedup",       # events: native string project + key agg
]


def build_replicas(spark: SparkSession) -> None:
    if os.path.isdir(OUT):
        return
    os.makedirs(OUT, exist_ok=True)
    try:
        for name, idcols, salt_text in (
            ("lineitem", ["l_orderkey"], False),
            ("orders", ["o_orderkey", "o_custkey"], False),
            ("events", ["event_id", "user_id"], False),
            ("documents", ["doc_id"], True),
            ("embeddings", ["vec_id"], False),
            ("customer", ["c_custkey"], False),
            ("part", ["p_partkey"], False),
        ):
            base = spark.read.parquet(f"{BASE}/{name}.parquet")
            parts = []
            for i in range(K):
                df = base
                for c in idcols:
                    df = df.withColumn(c, F.col(c) + F.lit(i * 100_000_000))
                if salt_text and i > 0:
                    # copies must not near-match each other, or pair
                    # output grows k² by construction instead of k.
                    # r6: salt EVERY token (a single trailing salt
                    # token left J ≈ 0.98 between copies — the pair
                    # surface silently grew k² anyway); a per-token
                    # suffix makes every shingle copy-distinct.
                    df = df.withColumn(
                        "text",
                        F.regexp_replace(
                            "text", r"(\S+)", rf"$1c{i}"
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    except BaseException:
        shutil.rmtree(OUT, ignore_errors=True)
        raise


def time_query(name: str, sf_dir: str, spark: SparkSession) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replicas(spark)
    # one warmup pass so JVM/codegen startup doesn't pollute the 1× run
    time_query("pricing_summary", BASE, spark)
    print(f"{'query':28s} {'t(1x)':>8s} {'t(' + str(K) + 'x)':>8s} "
          f"{'ratio':>6s}  verdict (k={K})")
    for name in PROBES:
        t1 = time_query(name, BASE, spark)
        tk = time_query(name, OUT, spark)
        ratio = tk / max(t1, 1e-9)
        verdict = (
            "~linear" if ratio <= K * 1.6 else
            "SUPERLINEAR" if ratio < K * K * 0.6 else "~quadratic"
        )
        print(f"{name:28s} {t1:8.2f} {tk:8.2f} {ratio:6.2f}  {verdict}")


if __name__ == "__main__":
    main()
