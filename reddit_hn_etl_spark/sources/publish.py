"""Atomic multi-table publish (D5): all-or-nothing mart refresh.

The reference commits all four mart scripts in ONE transaction
(`src/mart/hn_mart.py:59-74`); vanilla Spark writes are per-directory
and not transactional across tables. We restore atomicity with a
versioned-pointer protocol:

    root/
      v=20240101_120000/     <- one immutable version dir per publish
        daily_story_metrics/ <- parquet table
        ...
      _CURRENT               <- single small file naming the live version

Writers produce a complete new version directory, then atomically
replace ``_CURRENT`` (os.replace — atomic on POSIX). Readers resolve
``_CURRENT`` first; a crashed publish leaves a dangling version dir
but never a torn view. This is the same recovery contract as the
reference's rollback (`src/mart/hn_mart.py:71-73`): failed publishes
are invisible.

At cluster scale the pointer lives on the object store /
HDFS (single-object PUT is atomic) and old versions give time travel
until vacuumed.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_CURRENT"


def publish_tables(
    tables: dict[str, DataFrame], root: str, version: str | None = None
) -> str:
    """Write every table to a fresh version dir, then atomically
    promote it. Returns the version id."""
    if version is None:
        version = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    vdir = os.path.join(root, f"v={version}")
    try:
        for name, df in tables.items():
            df.write.mode("errorifexists").parquet(os.path.join(vdir, name))
    except Exception:
        shutil.rmtree(vdir, ignore_errors=True)  # rollback: version never visible
        raise
    tmp = os.path.join(root, f".{CURRENT}.tmp")
    os.makedirs(root, exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, os.path.join(root, CURRENT))  # the commit point
    return version


def current_version(root: str) -> str:
    with open(os.path.join(root, CURRENT), encoding="utf-8") as f:
        return f.read().strip()


def read_published(spark: SparkSession, root: str, table: str) -> DataFrame:
    """Resolve the live version via the pointer, then read the table."""
    version = current_version(root)
    return spark.read.parquet(os.path.join(root, f"v={version}", table))


def vacuum(root: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` versions (never the live one)."""
    live = current_version(root)
    versions = sorted(
        d[2:] for d in os.listdir(root) if d.startswith("v=")
    )
    victims = [v for v in versions[:-keep] if v != live]
    for v in victims:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return victims


def list_versions(root: str) -> list[str]:
    """All retained version ids, oldest → newest (lexicographic ==
    chronological by construction of the version stamp)."""
    return sorted(d[2:] for d in os.listdir(root) if d.startswith("v="))


def read_version(
    spark: SparkSession, root: str, table: str, version: str
) -> DataFrame:
    """Time travel: read ``table`` as of a retained ``version`` —
    immutable version dirs make every un-vacuumed publish readable
    forever, the parquet-lake equivalent of `SELECT … VERSION AS OF`.
    Raises FileNotFoundError with the retained versions listed when
    the requested one is gone (vacuumed or never existed)."""
    vdir = os.path.join(root, f"v={version}", table)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {version!r} of {table!r} not retained; "
            f"available: {list_versions(root)}"
        )
    return spark.read.parquet(vdir)


def rollback(root: str, version: str) -> str:
    """Re-point ``_CURRENT`` at an older retained version (the
    incident-response path: bad publish → one atomic pointer swap
    back, no data rewrite). Returns the previous live version."""
    if not os.path.isdir(os.path.join(root, f"v={version}")):
        raise FileNotFoundError(
            f"cannot roll back to missing version {version!r}; "
            f"available: {list_versions(root)}"
        )
    prev = current_version(root)
    tmp = os.path.join(root, f".{CURRENT}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, os.path.join(root, CURRENT))
    return prev
