"""Drive the driver contract exactly as the driver would:
(usage: python scripts/driver_emulation.py [sf_dir] — default sf0.01)
vanilla SparkSession (no engine session factory), import
__spark_entry__, smoke entry(), then run every queries() entry at
sf0.01 against its oracle_sql() via DuckDB with pre-registered views.
"""

import datetime
import decimal
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e

# --- smoke ---
t0 = time.time()
df = e.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def norm(v):
    if v is None:
        return "~"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in idx) for r in rows)


qs = e.queries()
oracles = e.oracle_sql()
if len(sys.argv) > 2:  # optional comma-separated subset for iteration
    only = set(sys.argv[2].split(","))
    missing = only - set(qs)
    assert not missing, f"unknown query names: {missing}"
    qs = {k: v for k, v in qs.items() if k in only}
print(f"{len(qs)} queries, {len(oracles)} with oracles")
fails = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        if name not in oracles:
            n = sdf.count()
            print(f"OK(rows-only) {name}: {n} rows in {time.time()-t0:.1f}s")
            continue
        # Driver-canonicalizability: the REAL driver sorts a pandas
        # frame over all columns before hashing — array/map/struct
        # cells raise `unhashable type` there even though this
        # emulation's norm() could serialize them (the r7 pq_codes
        # failure mode). Flag them as FAIL here so a window slot is
        # never burned on a schema the driver cannot hash.
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            print(
                f"FAIL {name}: driver-unhashable columns {complex_cols} "
                "(array/map/struct — join to CSV or explode)"
            )
            fails += 1
            continue
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
    except Exception as ex:
        print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:200]}")
        fails += 1
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"OK(rows-only) {name}: {len(srows)} rows in {dt:.1f}s")
        continue
    cur = con.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    ok_schema = sorted(scols) == sorted(dcols)
    ok_count = len(srows) == len(drows)
    ok_vals = rowset(scols, srows) == rowset(dcols, drows)
    if ok_schema and ok_count and ok_vals:
        vac = "  [WARN: 0-row result — vacuous match]" if not srows else ""
        print(f"MATCH {name}: {len(srows)} rows in {dt:.1f}s{vac}")
    else:
        print(f"FAIL {name}: schema={ok_schema} count={ok_count}({len(srows)}/{len(drows)}) vals={ok_vals}")
        fails += 1

print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
