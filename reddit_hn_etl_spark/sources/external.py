"""External format / database IO (K3 parity surface).

The reference's load path serializes pandas → CSV text and bulk-COPYs
into PostgreSQL (`src/load/hn_load.py:85-98`). Spark-native design
keeps parquet end-to-end (SURVEY.md §1.3), but users of the reference
expect the CSV and database seams to exist, so both are provided:

  * CSV read/write with the reference's NULL convention (``\\N``,
    `src/load/hn_load.py:87`) — schema always explicit, never inferred;
  * a JDBC upsert-shaped sink: Spark's ``jdbc`` writer only appends/
    overwrites, so the merge happens engine-side (operators/merge.py)
    and the reconciled state is written back — same observable result
    as the reference's tmp-table + MERGE protocol, minus the
    row-by-row conflict handling Postgres did.

The JDBC writer is exercised for plan construction only and gated at
call time (no JDBC driver jar in the container). The MERGE semantics
and the CSV/COPY seam ARE verified against a real PostgreSQL 15
server: tests/test_postgres_local_parity.py self-provisions a
throwaway cluster from the container's server binaries and runs the
reference's literal ON CONFLICT protocol head-to-head (r6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_NULL = r"\N"  # `src/load/hn_load.py:87`


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """K3: CSV serialize with the reference's NULL sentinel."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("nullValue", CSV_NULL)
        # RFC 4180 doubled-quote escaping — Spark's default escape
        # char is backslash, which Postgres COPY (the reference's
        # loader) reads as a literal; caught live by
        # tests/test_postgres_local_parity.py (r6)
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True) -> DataFrame:
    """CSV scan with explicit schema (never inferSchema — an extra
    full pass and nondeterministic types) and the same NULL sentinel."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("nullValue", CSV_NULL)
        .option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar interchange beyond parquet: ORC write (zstd). ORC is
    built into Spark (no extra package) and is the interchange format
    Hive/Trino deployments expect next to parquet — the engine's
    staging/publish layers stay parquet (SURVEY.md §1.3), this is the
    export seam."""
    df.write.mode("overwrite").option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC scan; pass ``schema`` to pin types (same no-infer policy
    as CSV — ORC carries its own schema, so this is a projection/
    compatibility contract, not inference). Predicate pushdown and
    column pruning work like parquet (PushedFilters in the plan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_jdbc_reconciled(
    merged: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write the engine-side merged state to a JDBC table.

    The reference's COPY-into-UNLOGGED-tmp + SQL MERGE
    (`sql/load/02_tmp.sql`, `sql/load/03_merge.sql`) is replaced by:
    merge in Spark (merge_upsert) → single set-based write here.
    ``overwrite`` with ``truncate=true`` preserves the target's DDL.
    """
    writer = merged.write.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
