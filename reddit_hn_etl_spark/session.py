"""SparkSession factory pinned for deterministic, scale-ready execution.

The reference (`RCepenco/reddit-hn-etl`) delegates all planning to
PostgreSQL and pandas; our engine delegates to Catalyst. The session
config below is the *entire* "optimizer configuration" surface we need
(SURVEY.md §4.2):

- ``spark.sql.session.timeZone=UTC``: the reference builds timestamptz
  values from UTC epochs (`src/transform/hn_transform.py:88`) and
  day-buckets with ``::date`` (`sql/mart/02_marts.sql:13`). Identical
  day-bucketing requires a UTC session.
- AQE on (+ skew-join + partition coalescing): runtime re-planning for
  skewed grouping keys (author/domain at 100 TB) and small shuffles.
- ``shuffle.partitions`` sized by env (default 32 for local[32]); on a
  real cluster this is set to ~2-3x total cores by the submitter.
- Arrow enabled for any pandas-interop path (Pandas UDFs in the
  north-star text/similarity ops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_session(
    app_name: str = "reddit-hn-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's pinned config.

    Config keys already fixed in an existing session are left as-is
    (Spark ignores builder config for an already-running session), so
    tests share one JVM safely.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
