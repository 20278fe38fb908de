"""Which registry queries still lack a hard driver CORRECTNESS row?

The driver verifies exactly the first 50 entries of ``queries()`` per
round (CORRECTNESS_r{N}.json). This audit diffs the union of all
recorded rounds against the current registry and prints, in
registration order:

  * GREEN     — has at least one green driver row (rows+schema+hash)
  * ROWS-ONLY — driver saw it but only as a rows-only check
  * NEVER     — never inside any round's 50-entry window

plus the current window's composition, so rotating `_DRIVER_WINDOW`
for the next round is a mechanical edit: keep one representative per
§2 family, fill the rest from the NEVER list.

Usage: python scripts/window_audit.py   (no Spark session needed)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Importing the registry module pulls pyspark for type hints only —
# no session is built at import time.
from reddit_hn_etl_spark.plans.queries import ORACLES, QUERIES  # noqa: E402

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
green: set[str] = set()
seen: set[str] = set()
for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
    with open(path, encoding="utf-8") as f:
        rows = json.load(f)
    for name, r in rows.items():
        seen.add(name)
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match"):
            green.add(name)

names = list(QUERIES)
window = names[:50]
never = [n for n in names if n not in seen]
rows_only_seen = sorted(seen - green)

print(f"registry: {len(names)} queries, {len(ORACLES)} oracles")
print(f"driver-green ever: {len(green)}; seen-not-green: {len(rows_only_seen)}")
print(f"never driver-checked: {len(never)}")
print("\n-- NEVER (rotation candidates, registration order) --")
for n in never:
    tag = "" if n in ORACLES else "  [no oracle → rows-only]"
    print(f"  {n}{tag}")
if rows_only_seen:
    print("\n-- seen but not green --")
    for n in rows_only_seen:
        print(f"  {n}")
print("\n-- current window[:50] --")
for n in window:
    print(f"  {'GREEN' if n in green else 'fresh'}  {n}")
