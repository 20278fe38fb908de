"""Batch manifest: deterministic batch selection, raw reads, staging writes.

Reference semantics (SURVEY.md §2.1 S4/S7/S8, §2.2 K1/K2):
  * latest batch chosen by *lexicographic name order*, never mtime
    (`src/common/files.py:6-17`, `src/load/hn_load.py:30-34`);
  * batch timestamp parsed from the file name
    (`src/transform/hn_transform.py:29-36`), pattern
    ``hn_raw_YYYYMMDD_HHMMSS.json``;
  * staging written as parquet, one batch per write
    (`src/transform/hn_transform.py:121-133`).

Scale design: instead of encoding the batch in the file *name*, the
staging layout is ``batch=<ts>/`` hive partitions — partition pruning
gives the "read only latest batch" access path for free, and a
date-partitioned final table replaces the reference's time-first
B-tree indexes (SURVEY.md §4.1).
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import RAW_SCHEMA

RAW_NAME_RE = re.compile(r"hn_raw_(\d{8}_\d{6})\.json$")
TS_FORMAT = "%Y%m%d_%H%M%S"


def latest_file_by_name(directory: str, pattern: str) -> str:
    """Deterministic latest-batch selection: lexicographic max of the
    glob — by *name*, not mtime (`src/common/files.py:6-17`)."""
    matches = sorted(glob.glob(os.path.join(directory, pattern)))
    if not matches:
        raise FileNotFoundError(f"no files matching {pattern} in {directory}")
    return matches[-1]


def parse_ts_from_raw_filename(path: str) -> dt.datetime:
    """`hn_raw_YYYYMMDD_HHMMSS.json` → UTC datetime
    (`src/transform/hn_transform.py:29-36`)."""
    m = RAW_NAME_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"cannot parse batch timestamp from {path!r}")
    return dt.datetime.strptime(m.group(1), TS_FORMAT).replace(
        tzinfo=dt.timezone.utc
    )


def read_raw_batch(spark: SparkSession, path: str) -> DataFrame:
    """S4: one raw batch file (JSON array of item dicts) → DataFrame
    with the explicit RAW_SCHEMA (never inferSchema) plus a ``_seq``
    column preserving intra-file order for keep-last dedup parity
    (pandas ``keep="last"`` is file-order dependent, SURVEY.md §7.3d).

    The array-file form the reference writes
    (`src/extract/hn_extract.py:62-71`) is parsed via whole-file text
    + ``from_json(ArrayType) `` + ``posexplode``: position IS the
    file order, and literal ``null`` entries in the array survive as
    all-null rows for the P1 filter (Spark's multiLine JSON reader
    chokes on them). Batch files are bounded (one extract run); for
    firehose-scale raw feeds use JSONL + ``read_raw_jsonl`` instead.
    """
    txt = spark.read.text(path, wholetext=True)
    arr = F.from_json(F.col("value"), T.ArrayType(RAW_SCHEMA))
    return txt.select(
        F.posexplode(arr).alias("_seq", "_item")
    ).select("_item.*", F.col("_seq").cast("long"))


def read_raw_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited raw feed (the at-scale layout): splittable,
    parallel scan, explicit schema. File order is not defined across
    a distributed read, so ``_seq`` is not attached — dedup falls
    back to content ordering (see plans/hn_pipeline.transform_raw).
    """
    return spark.read.schema(RAW_SCHEMA).json(path)


def write_staging_batch(df: DataFrame, root: str, batch_ts: dt.datetime) -> str:
    """K2: staging parquet write, one hive partition per batch."""
    ts = batch_ts.strftime(TS_FORMAT)
    path = os.path.join(root, f"batch={ts}")
    df.write.mode("overwrite").parquet(path)
    return path


def read_staging(
    spark: SparkSession, root: str, merge_schema: bool = False
) -> DataFrame:
    """All staged batches (the accumulating staging table).

    ``merge_schema=True`` unions the per-batch parquet schemas —
    the additive-evolution read path: when the upstream starts
    emitting a new column, older batches surface it as NULL instead
    of the read failing or silently pinning the first batch's schema.
    Off by default: schema merging lists every file's footer, which
    is a real metadata cost on a table with thousands of batches —
    turn it on for the migration window, then backfill.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(root)
