"""Solo-time a list of registry queries with the noop sink.

    python scripts/time_queries.py q1 q2 ... [--reps N] [--sf DIR]

Prints one JSON line per query: {"name": ..., "runs": [s, ...],
"best": s}. Methodology matches bench.py (noop sink, warm session,
per-query job description) but times ONE query at a time with
repeats, for the optimization loop — bench.py stays the official
cross-round record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from reddit_hn_etl_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-queries")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["table_counts"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        runs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps({"name": name, "runs": runs, "best": min(runs)}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
