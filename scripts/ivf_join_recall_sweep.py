"""Recall/cost curve for the distributed IVF kNN-join (VERDICT r10 #3).

The kNN-join scores probed candidates by EXACT cosine already, so the
only recall dial is the probed fraction (n_probe / n_cells): "probe a
3-5x larger candidate pool, then rerank exact" is, for plain IVF,
exactly "raise n_probe". This sweep measures corpus-wide mean
recall@10 AND wall time at several probed fractions so the operating
point is chosen on a measured Pareto curve, not asserted
(SCALING.md records the output).

Usage: python scripts/ivf_join_recall_sweep.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators import similarity
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

emb = read_table(spark, sf_dir, "embeddings")
n = emb.count()
n_cells = max(16, round(math.sqrt(n)))
qall = emb.select(F.col("vec_id").alias("query_id"), "embedding")

t0 = time.perf_counter()
exact = (
    similarity.knn_cosine_bruteforce(emb, qall, k=10)
    .select("query_id", "vec_id")
    .localCheckpoint(eager=True)
)
t_exact = time.perf_counter() - t0
print(f"corpus n={n}, n_cells(auto)={n_cells}, exact brute-force {t_exact:.1f}s")

for frac_name, n_probe in [
    ("1/4 (auto)", max(4, round(n_cells / 4))),
    ("3/8", max(4, round(3 * n_cells / 8))),
    ("1/2", max(4, round(n_cells / 2))),
    ("3/4", max(4, round(3 * n_cells / 4))),
    ("1 (all)", n_cells),
]:
    t0 = time.perf_counter()
    approx = similarity.knn_cosine_ivf(
        emb, qall, dim=64, k=10, n_cells=n_cells, n_probe=n_probe,
        iters=3, distributed_queries=True,
    ).select("query_id", "vec_id").localCheckpoint(eager=True)
    wall = time.perf_counter() - t0
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    mn = (
        exact.join(approx, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id").count().agg(F.min("count")).first()[0]
    )
    print(
        f"probe {frac_name:10s} n_probe={n_probe:3d} "
        f"recall@10={hits / (10 * n):.4f} min_hits={mn} wall={wall:.1f}s "
        f"({wall / t_exact:.2f}x of exact)"
    )
spark.stop()
