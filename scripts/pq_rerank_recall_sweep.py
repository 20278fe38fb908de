"""Recall/cost curve for the PQ kNN-join exact-rerank stage
(VERDICT r11 #6 — the IVFPQR shape: ADC orders a candidate pool,
exact squared-L2 re-scores the top-c, the cut to k happens on exact
distance). Unlike plain IVF (where candidates are already scored
exactly and the only dial is the probed fraction), PQ has TWO error
sources: probe coverage and ADC quantization error. The rerank
multiplier c/k buys back ONLY the quantization half — the curve
therefore also prints the probe-coverage ceiling (rerank = all
candidates) so the two are never conflated.

Usage: python scripts/pq_rerank_recall_sweep.py [sf_dir]
SCALING.md §Similarity records the output next to the IVF curve.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators import kmeans, similarity
from reddit_hn_etl_spark.sources.tables import read_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

K = 10
CC = kmeans.seeded_centroids(dim=64, k=8, seed=11)
CB = similarity.pq_codebooks(dim=64, n_sub=8, k=16, seed=101)

emb = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
n = emb.count()
qall = emb.select(F.col("vec_id").alias("query_id"), "embedding")

# exact squared-L2 ground truth: broadcast the query side, one corpus
# scan, per-query top-k window — same shape as knn_cosine_bruteforce
t0 = time.perf_counter()
sq = F.aggregate(
    F.zip_with(
        F.col("_qv"),
        F.col("embedding"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    ),
    F.lit(0.0),
    lambda acc, v: acc + v,
)
w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("vec_id"))
exact = (
    emb.join(
        F.broadcast(
            qall.select("query_id", F.col("embedding").alias("_qv"))
        )
    )
    .select("query_id", "vec_id", sq.alias("_d"))
    .withColumn("_r", F.row_number().over(w))
    .where(F.col("_r") <= K)
    .select("query_id", "vec_id")
    .localCheckpoint(eager=True)
)
t_exact = time.perf_counter() - t0
print(f"corpus n={n}, nprobe=3/8 cells, exact L2 brute-force {t_exact:.1f}s")


def recall(approx, wall, label):
    hit_counts = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .count()
    )
    hits = hit_counts.agg(F.sum("count")).first()[0] or 0
    mn = hit_counts.agg(F.min("count")).first()[0]
    print(
        f"{label:22s} recall@10={hits / (K * n):.4f} min_hits={mn} "
        f"wall={wall:.1f}s ({wall / t_exact:.2f}x of exact)"
    )


t0 = time.perf_counter()
adc = (
    similarity.pq_knn_join(emb, qall, CC, CB, nprobe=3, k=K)
    .select("query_id", "vec_id")
    .localCheckpoint(eager=True)
)
recall(adc, time.perf_counter() - t0, "ADC only (no rerank)")

for label, c in [
    ("rerank c=2k", 2 * K),
    ("rerank c=4k", 4 * K),
    ("rerank c=8k", 8 * K),
    ("rerank c=16k", 16 * K),
    ("rerank c=all (ceil)", n),
]:
    t0 = time.perf_counter()
    rr = (
        similarity.pq_knn_join(
            emb, qall, CC, CB, nprobe=3, k=K, rerank=c
        )
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    recall(rr, time.perf_counter() - t0, label)
spark.stop()
