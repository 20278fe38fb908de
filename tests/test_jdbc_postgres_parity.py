"""K3/K4 parity against a REAL mutable store (env-gated).

The engine replaces the reference's COPY-into-tmp + SQL MERGE
(`sql/load/02_tmp.sql`, `sql/load/03_merge.sql:1-32`) with an
engine-side join merge (operators/merge.py) plus one set-based JDBC
write (sources/external.write_jdbc_reconciled). The sandbox has no
database, so the merge SEMANTICS are normally enforced only by the
merge-operator oracle (`merge_upsert` driver rows). This test closes
the remaining gap — *does the engine-side merge land the same table
state and the same (inserted, updated) counts as Postgres's own
ON CONFLICT protocol?* — whenever a real Postgres is reachable.

Gate: set ``SPARK_GRAFT_PG_URL`` to a JDBC url
(``jdbc:postgresql://host:port/db``) with credentials in
``SPARK_GRAFT_PG_USER`` / ``SPARK_GRAFT_PG_PASSWORD``, and put the
postgresql JDBC driver on the Spark classpath (``spark.jars`` or
``--packages org.postgresql:postgresql:42.7.x``). psycopg2 must be
importable for the reference-protocol side. Absent any of those, the
test SKIPS cleanly (documented: VERDICT r4 #7).
"""

from __future__ import annotations

import os

import pytest

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL", "")
PG_USER = os.environ.get("SPARK_GRAFT_PG_USER", "")
PG_PASSWORD = os.environ.get("SPARK_GRAFT_PG_PASSWORD", "")

try:  # pragma: no cover - absent in the sandbox
    import psycopg2  # noqa: F401

    HAVE_PSYCOPG2 = True
except Exception:  # pragma: no cover
    HAVE_PSYCOPG2 = False

pytestmark = pytest.mark.skipif(
    not (PG_URL and HAVE_PSYCOPG2),
    reason=(
        "Postgres parity needs SPARK_GRAFT_PG_URL (+ USER/PASSWORD), "
        "the postgresql JDBC driver on the Spark classpath, and "
        "psycopg2 — none present in this sandbox"
    ),
)

# (id, score, extracted_at-as-epoch) — exercises every MERGE branch:
# fresh update, stale no-op, tie no-op (strict >), pure insert.
TARGET_ROWS = [
    (1, 10, 100),
    (2, 20, 200),
    (3, 30, 300),
]
SOURCE_ROWS = [
    (2, 21, 250),  # fresher  -> updated
    (3, 31, 300),  # equal ts -> kept (strict > in 03_merge.sql:26)
    (3, 32, 299),  # staler   -> kept
    (4, 40, 400),  # new key  -> inserted
    (4, 41, 350),  # same-batch dup, staler -> deduped engine-side
]
EXPECTED_STATE = {1: (10, 100), 2: (21, 250), 3: (30, 300), 4: (40, 400)}


def _pg_dsn() -> str:
    # jdbc:postgresql://host:port/db -> psycopg2 dsn
    rest = PG_URL.split("jdbc:postgresql://", 1)[1]
    hostport, db = rest.split("/", 1)
    host, _, port = hostport.partition(":")
    return (
        f"host={host} port={port or 5432} dbname={db.split('?')[0]} "
        f"user={PG_USER} password={PG_PASSWORD}"
    )


@pytest.fixture()
def pg():
    import psycopg2

    con = psycopg2.connect(_pg_dsn())
    con.autocommit = True
    with con.cursor() as cur:
        cur.execute("DROP TABLE IF EXISTS sg_parity_target")
        cur.execute("DROP TABLE IF EXISTS sg_parity_tmp")
        cur.execute(
            "CREATE TABLE sg_parity_target ("
            "id BIGINT PRIMARY KEY, score BIGINT, extracted_at BIGINT)"
        )
        cur.execute(
            "CREATE UNLOGGED TABLE sg_parity_tmp ("
            "id BIGINT, score BIGINT, extracted_at BIGINT)"
        )
    yield con
    con.close()


def _reference_protocol(pg) -> tuple[int, int]:
    """The literal 03_merge.sql shape over the same inputs."""
    with pg.cursor() as cur:
        cur.executemany(
            "INSERT INTO sg_parity_target VALUES (%s, %s, %s)", TARGET_ROWS
        )
        # the reference dedups per-batch by keeping the freshest row
        # before COPY (hn_transform drop_duplicates keep last)
        src = {}
        for rid, score, ts in SOURCE_ROWS:
            if rid not in src or ts > src[rid][2]:
                src[rid] = (rid, score, ts)
        cur.executemany(
            "INSERT INTO sg_parity_tmp VALUES (%s, %s, %s)",
            sorted(src.values()),
        )
        cur.execute(
            """
            WITH ins AS (
                INSERT INTO sg_parity_target
                SELECT id, score, extracted_at FROM sg_parity_tmp
                ON CONFLICT (id) DO NOTHING
                RETURNING 1
            ),
            upd AS (
                UPDATE sg_parity_target t
                SET score = s.score, extracted_at = s.extracted_at
                FROM sg_parity_tmp s
                WHERE t.id = s.id AND s.extracted_at > t.extracted_at
                RETURNING 1
            )
            SELECT (SELECT COUNT(*) FROM ins) AS inserted,
                   (SELECT COUNT(*) FROM upd) AS updated
            """
        )
        return cur.fetchone()


def test_engine_merge_matches_postgres_on_conflict(spark, pg):
    from reddit_hn_etl_spark.operators.merge import merge_upsert
    from reddit_hn_etl_spark.sources.external import write_jdbc_reconciled

    schema = "id long, score long, extracted_at long"
    target = spark.createDataFrame(TARGET_ROWS, schema)
    source = spark.createDataFrame(SOURCE_ROWS, schema)
    merged, metrics = merge_upsert(
        target, source, keys=["id"], freshness_col="extracted_at"
    )
    write_jdbc_reconciled(
        merged,
        PG_URL,
        "sg_parity_engine",
        mode="overwrite",
        user=PG_USER,
        password=PG_PASSWORD,
    )

    ref_inserted, ref_updated = _reference_protocol(pg)
    assert (metrics.inserted, metrics.updated) == (ref_inserted, ref_updated)

    with pg.cursor() as cur:
        cur.execute("SELECT id, score, extracted_at FROM sg_parity_target")
        pg_state = {r[0]: (r[1], r[2]) for r in cur.fetchall()}
        cur.execute("SELECT id, score, extracted_at FROM sg_parity_engine")
        engine_state = {r[0]: (r[1], r[2]) for r in cur.fetchall()}
    assert pg_state == EXPECTED_STATE
    assert engine_state == EXPECTED_STATE
