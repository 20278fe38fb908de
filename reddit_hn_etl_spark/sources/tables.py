"""Table readers over the driver testdata and staged parquet layouts.

Reference analogue: the parquet scan (`src/load/hn_load.py:78`) and the
postgres table scans implicit in every mart query
(`sql/mart/02_marts.sql:17`) — SURVEY.md §2.1 S5/S6.

At scale: ``spark.read.parquet`` gives vectorized columnar scans with
predicate pushdown and column pruning for free; callers should filter
and select immediately after reading so Catalyst can push both into
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (`TESTDATA.md`) as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which the
    Spark vectorized reader rejects. We read it via the
    ``nanosAsLong`` escape hatch and truncate to microseconds with
    *integer* division (nanos since epoch exceed 2^53, so double
    division would silently lose precision) — matching DuckDB's
    nanos→micros truncation.
    """
    # Date bucketing (F6) must be UTC regardless of who built the
    # session (the driver builds its own): runtime conf, cheap to pin.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
