"""HTTP extract (S1-S3): HN Firebase API → raw batch records.

Reference behavior (`src/extract/hn_extract.py`):
  * ``http_get_json`` with 3 retries + linear backoff (`:28-48`)
  * top-N story ids (`:51-54`), per-id item fetch (`:57-59`)
  * skip empty items (`:90-92`), timestamped raw batch file (`:62-71`)

Spark-first shape: the id list is tiny (driver fetch); the N point
lookups are the parallelizable part — ``fetch_items_distributed``
ships id partitions to executors via ``mapInPandas`` so a 1000-id
batch fans out instead of the reference's sequential loop. Network
access is gated behind import-try: environments without ``requests``
(or without network) can still import the module; calls raise.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - availability depends on environment
    import requests  # type: ignore
except Exception:  # pragma: no cover
    requests = None

BASE_URL = "https://hacker-news.firebaseio.com/v0"
TIMEOUT_SEC = 15  # `src/extract/hn_extract.py:9-10`
RETRIES = 3
BACKOFF_SEC = 1.0


def http_get_json(url: str, retries: int = RETRIES, backoff_sec: float = BACKOFF_SEC):
    """GET with raise-for-status and linear backoff
    (`src/extract/hn_extract.py:28-48`)."""
    if requests is None:
        raise RuntimeError("requests not available in this environment")
    last: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            resp = requests.get(url, timeout=TIMEOUT_SEC)
            resp.raise_for_status()
            return resp.json()
        except Exception as exc:  # noqa: BLE001 - parity with reference
            last = exc
            if attempt < retries:
                time.sleep(backoff_sec * attempt)
    raise RuntimeError(f"GET {url} failed after {retries} attempts") from last


def fetch_top_story_ids(limit: int = 50) -> list[int]:
    """S2 (`src/extract/hn_extract.py:51-54`)."""
    ids = http_get_json(f"{BASE_URL}/topstories.json")
    return list(ids)[:limit]


def fetch_items_distributed(
    spark: SparkSession, ids: Iterable[int], partitions: int = 8
) -> DataFrame:
    """S3 at scale: distribute per-id point lookups across executors.

    Returns a DataFrame of raw JSON strings (one per fetched item);
    parse with ``spark.read.schema(RAW_SCHEMA).json(df.rdd...)`` or
    ``F.from_json``. Empty/null items are skipped
    (`src/extract/hn_extract.py:90-92`).
    """
    import pandas as pd  # local import: keep module import light

    ids_df = spark.createDataFrame(
        [(int(i),) for i in ids], "item_id long"
    ).repartition(partitions)

    def fetch(batches):
        for pdf in batches:
            rows = []
            for item_id in pdf["item_id"]:
                item = http_get_json(f"{BASE_URL}/item/{item_id}.json")
                if item:
                    rows.append(json.dumps(item, ensure_ascii=False))
            yield pd.DataFrame({"raw_json": rows})

    return ids_df.mapInPandas(fetch, "raw_json string")


def save_raw_batch(records: list[dict], out_dir: str, now: dt.datetime | None = None) -> str:
    """K1: timestamped JSON array file, name carries the batch id
    (`src/extract/hn_extract.py:62-71`)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"hn_raw_{now.strftime('%Y%m%d_%H%M%S')}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(records, f, ensure_ascii=False)
    return path
