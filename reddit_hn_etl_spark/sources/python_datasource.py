"""Custom Python DataSource (Spark 4 DataSource API) for HN items.

The reference fetches items with a sequential per-id loop
(`src/extract/hn_extract.py:57-59`). `sources/http.py` already
distributes that via ``mapInPandas``; this module re-expresses the
same source as a REGISTERED Spark data source — the modern extension
point — so it composes like any built-in format:

    spark.dataSource.register(HNItemsDataSource)
    df = (spark.read.format("hn_items")
          .option("ids", "1000-1100").option("mode", "fake").load())

What the API buys over the mapInPandas shim:
  * PARTITION PLANNING lives in the source: ``partitions()`` splits
    the id range into chunks, so parallelism is declared once and the
    scheduler sees a real scan with N input splits, not a repartition
    of a driver-built id table;
  * schema is owned by the source (no caller-side schema threading);
  * downstream pruning/filters compose like any DSv2 scan.

``mode=fake`` (default) yields DETERMINISTIC synthetic items derived
from the id alone — the offline-testable twin of ``mode=live``
(which does the real HTTP fetch via sources/http.py and therefore
needs network + requests). Same schema either way, so pipelines are
developed against fake and flipped to live by one option.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "id long, type string, by string, time long, text string, "
    "url string, score long, title string, descendants long"
)

_TYPES = ("story", "comment", "job", "poll")


def _fake_item(item_id: int) -> tuple:
    """Deterministic synthetic HN item: every field is a pure function
    of the id (stable across runs, partitionings, and machines)."""
    h = (item_id * 2654435761) % (1 << 32)  # Knuth multiplicative hash
    typ = _TYPES[h % 4]
    return (
        item_id,
        typ,
        f"user{h % 97}",
        1_700_000_000 + (h % 100_000),
        f"body of item {item_id}" if typ == "comment" else None,
        f"https://example.com/{item_id}" if typ == "story" else None,
        (h >> 8) % 500,
        f"Item {item_id} headline" if typ != "comment" else None,
        (h >> 16) % 50,
    )


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class HNItemsReader(DataSourceReader):
    def __init__(self, options):
        ids = options.get("ids", "1-50")
        if "-" in ids:
            lo, hi = ids.split("-", 1)
            self.ids = list(range(int(lo), int(hi) + 1))
        else:
            self.ids = [int(x) for x in ids.split(",") if x.strip()]
        self.chunk = max(1, int(options.get("chunk_size", "25")))
        self.mode = options.get("mode", "fake")

    def partitions(self):
        # one input split per id chunk — the scheduler's parallelism
        return [
            _IdRange(i, min(i + self.chunk, len(self.ids)))
            for i in range(0, len(self.ids), self.chunk)
        ]

    def read(self, partition: _IdRange):
        ids = self.ids[partition.start : partition.end]
        if self.mode == "fake":
            for i in ids:
                yield _fake_item(i)
            return
        # live mode: real point lookups, executor-side
        from . import http

        for i in ids:
            item = http.http_get_json(f"{http.BASE_URL}/item/{i}.json")
            if item:
                yield (
                    item.get("id"),
                    item.get("type"),
                    item.get("by"),
                    item.get("time"),
                    item.get("text"),
                    item.get("url"),
                    item.get("score"),
                    item.get("title"),
                    item.get("descendants"),
                )


class HNItemsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hn_items"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HNItemsReader:
        return HNItemsReader(self.options)

    def simpleStreamReader(self, schema) -> "HNItemsStreamReader":
        return HNItemsStreamReader(self.options)


class HNItemsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the source (Spark 4
    `SimpleDataSourceStreamReader`): the reference's polling loop —
    "ask for maxitem, fetch what's new since last poll"
    (`src/extract/hn_extract.py` runs it batch-by-batch from cron) —
    becomes a real streaming source with engine-managed offsets.

    Offsets are `{"next_id": N}`: each micro-batch reads at most
    ``items_per_poll`` new ids up to ``max_id`` and returns the next
    offset; `readBetweenOffsets` replays any committed range
    DETERMINISTICALLY (fake items are pure functions of the id), so
    checkpoint recovery re-produces byte-identical batches — the
    exactly-once replay contract the foreachBatch sinks build on.

    The simplified (driver-side) reader is the right fit: discovery
    polling is low-rate by nature; the heavy per-id fan-out stays in
    the batch reader's partition-planned path.
    """

    def __init__(self, options):
        self.start_id = int(options.get("start_id", "1"))
        self.max_id = int(options.get("max_id", "200"))
        self.per_poll = max(1, int(options.get("items_per_poll", "50")))
        self.mode = options.get("mode", "fake")

    def initialOffset(self) -> dict:
        return {"next_id": self.start_id}

    def _ids(self, lo: int, hi: int):
        return range(lo, min(hi, self.max_id + 1))

    def read(self, start: dict):
        lo = int(start["next_id"])
        hi = min(lo + self.per_poll, self.max_id + 1)
        return iter([_fake_item(i) for i in self._ids(lo, hi)]), {
            "next_id": hi
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_fake_item(i) for i in self._ids(int(start["next_id"]), int(end["next_id"]))]
        )




# ---------------------------------------------------------------------------
# Writer side of the Python DataSource API: a JSONL sink with the
# two-phase commit protocol (executor tasks write temp files and
# return commit messages; the driver's commit() atomically promotes
# them and records a manifest; abort() removes the orphans). The
# reference writes raw JSON batches driver-side (src/extract/
# hn_extract.py); this is the distributed, crash-safe form.
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class JsonlAuditWriter(DataSourceWriter):
    """Task-side: each partition streams to ``_tmp.<uuid>.jsonl``
    under the target dir (on a cluster this is shared storage);
    driver-side commit() renames every temp file to its final
    ``part-<i>.jsonl`` name and writes a ``_MANIFEST`` with row
    counts — readers treat the manifest as the commit point, so a
    crashed write leaves only invisible temp files."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit writer requires option 'path'")

    def write(self, iterator):
        _os.makedirs(self.path, exist_ok=True)
        tmp = f"_tmp.{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, tmp), "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = _os.path.join(self.path, f"part-{i:05d}.jsonl")
            _os.replace(_os.path.join(self.path, m.tmp_name), final)
            total += m.n_rows
        manifest = {
            "n_files": sum(1 for m in messages if m is not None),
            "n_rows": total,
        }
        tmp = _os.path.join(self.path, "._MANIFEST.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(_json.dumps(manifest))
        _os.replace(tmp, _os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(_os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir)
    .mode("append").save()`` — Python data sources accept only
    Append/Overwrite save modes (the default ErrorIfExists is
    rejected at the JVM boundary), and this one is append-only."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "jsonl_audit is append-only (atomic manifest commit); "
                "write to a fresh directory per batch"
            )
        return JsonlAuditWriter(self.options)
