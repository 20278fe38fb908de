"""Named correctness queries + DuckDB oracles (driver contract).

Each entry pairs a Spark DataFrame plan (built from the engine's
operators) with an ANSI-SQL oracle DuckDB runs on the same parquet
tables. Names, aliases, and value typing are matched on both sides —
the driver compares row count + schema + order-insensitive value hash
(see `__spark_entry__.py`).

Float policy (differential-testing discipline):
  * per-row arithmetic → left raw (bit-identical in both engines);
  * SUM/AVG over the 2-decimal "money" doubles → cast to
    DECIMAL(18,2) *before* summing: decimal summation is exact and
    order-independent, so both engines produce the same rational
    number; the final CAST AS DOUBLE is then bit-identical. (Rounding
    a double sum instead is fragile: engine summation order differs,
    and DuckDB's double→decimal cast rounds via the shortest decimal
    string while Spark uses the exact binary expansion — 102.575
    rounds differently.) AVG = exact decimal sum cast to double, then
    double-divided by COUNT(*) — identical on both sides.
  * cosine similarities → ROUND(x, 4), double accumulation both sides.

Operator coverage map: SURVEY.md §2.12.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import privacy, scalars, text as textfn
from ..operators import (
    checks,
    cleaning,
    dedup,
    graph,
    kmeans,
    merge,
    relational,
    similarity,
)
from ..sources.tables import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (filter → hash agg).
# Exercises P10 predicate, F7 casts, A1-family aggregates. The plan is
# a single scan with pushed filter + partial/final hash aggregation.
# ---------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = price * (F.lit(1) - disc)
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Reference mart analogues on `events` (A1-A3 + F5/F6/F7).
# daily_story_metrics → daily_metrics; top_domains_daily → type_daily;
# user_activity_daily → user_activity (`sql/mart/02_marts.sql:9-46,79-125`).
# ---------------------------------------------------------------------------


@_q(
    "daily_metrics",
    """
    SELECT CAST(ts AS DATE)                   AS metric_date,
           CAST(COUNT(*) AS INTEGER)          AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value,
           MAX(ts)                            AS last_event_ts
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY CAST(ts AS DATE)
    """,
)
def daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return (
        ev.where(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(scalars.to_metric_date("ts").alias("metric_date"))
        .agg(
            F.count("*").cast("int").alias("events_count"),
            F.sum(val).cast("double").alias("total_value"),
            (F.sum(val).cast("double") / F.count("*")).alias("avg_value"),
            F.max("ts").alias("last_event_ts"),
        )
    )


@_q(
    "type_daily",
    """
    SELECT CAST(ts AS DATE)                  AS metric_date,
           COALESCE(event_type, '(unknown)') AS event_type,
           CAST(COUNT(*) AS INTEGER)         AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value,
           MAX(ts)                           AS last_event_ts
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return (
        ev.where(F.col("ts").isNotNull())
        .groupBy(
            scalars.to_metric_date("ts").alias("metric_date"),
            scalars.coalesce_default("event_type", "(unknown)").alias("event_type"),
        )
        .agg(
            F.count("*").cast("int").alias("events_count"),
            (F.sum(val).cast("double") / F.count("*")).alias("avg_value"),
            F.max("ts").alias("last_event_ts"),
        )
    )


@_q(
    "user_activity",
    """
    SELECT CAST(ts AS DATE)                  AS metric_date,
           user_id,
           CAST(COUNT(*) AS INTEGER)         AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value,
           MAX(ts)                           AS last_event_ts
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return (
        ev.where(F.col("ts").isNotNull())
        .groupBy(scalars.to_metric_date("ts").alias("metric_date"), F.col("user_id"))
        .agg(
            F.count("*").cast("int").alias("events_count"),
            F.sum(val).cast("double").alias("total_value"),
            (F.sum(val).cast("double") / F.count("*")).alias("avg_value"),
            F.max("ts").alias("last_event_ts"),
        )
    )


# ---------------------------------------------------------------------------
# String pipeline (F1-F4): the reference's domain-extraction logic
# (`sql/mart/02_marts.sql:56-65`) applied to a synthesized URL column
# (testdata has no URLs), including the NULL / '' → '(no_domain)' branch.
# ---------------------------------------------------------------------------

_URL_SQL = """
        CASE WHEN doc_id % 19 = 0 THEN NULL
             WHEN doc_id % 23 = 0 THEN ''
             ELSE 'https://' || upper(source) || '.Example.com/' || lang
                  || '/' || CAST(doc_id AS VARCHAR)
        END"""


@_q(
    "domain_extract",
    f"""
    WITH urls AS (
        SELECT doc_id, {_URL_SQL} AS url FROM documents
    ),
    domains AS (
        SELECT CASE WHEN url IS NULL OR url = '' THEN '(no_domain)'
                    ELSE split_part(replace(replace(lower(url), 'https://', ''),
                                            'http://', ''), '/', 1)
               END AS domain
        FROM urls
    )
    SELECT domain, COUNT(*) AS url_count FROM domains GROUP BY domain
    """,
)
def domain_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    url = (
        F.when(F.col("doc_id") % 19 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 23 == 0, F.lit(""))
        .otherwise(
            F.concat(
                F.lit("https://"),
                F.upper("source"),
                F.lit(".Example.com/"),
                F.col("lang"),
                F.lit("/"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    return (
        docs.select(scalars.domain_from_url(url).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("url_count"))
    )


@_q(
    "part_type_norm",
    """
    SELECT CASE WHEN p_type IS NULL OR p_type = '' THEN '(none)'
                ELSE split_part(replace(replace(lower(p_type), 'economy', 'eco'),
                                        'standard', 'std'), ' ', 1)
           END                           AS type_norm,
           COUNT(*)                      AS part_count,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price
    FROM part
    GROUP BY 1
    """,
)
def part_type_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    norm = F.split_part(
        F.replace(
            F.replace(F.lower(F.col("p_type")), F.lit("economy"), F.lit("eco")),
            F.lit("standard"),
            F.lit("std"),
        ),
        F.lit(" "),
        F.lit(1),
    )
    type_norm = F.when(
        F.col("p_type").isNull() | (F.col("p_type") == ""), F.lit("(none)")
    ).otherwise(norm)
    return (
        part.select(type_norm.alias("type_norm"), "p_retailprice")
        .groupBy("type_norm")
        .agg(
            F.count("*").alias("part_count"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Checks / scalar aggregates (A4, A5) — `sql/load/04_checks.sql:1-8`.
# ---------------------------------------------------------------------------


@_q(
    "scalar_summary",
    """
    SELECT COUNT(*) AS row_count, MIN(ts) AS min_ts, MAX(ts) AS max_ts FROM events
    """,
)
def scalar_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return checks.table_summary(read_table(spark, sf_dir, "events"), ts_col="ts")


@_q(
    "dup_detect",
    """
    SELECT user_id, CAST(ts AS DATE) AS metric_date,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) > 1
    """,
)
def dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", scalars.to_metric_date("ts").alias("metric_date")
    )
    return checks.duplicate_keys(ev, ["user_id", "metric_date"])


# ---------------------------------------------------------------------------
# Dedup keep-last (A6) — deterministic replacement for pandas
# keep="last" (`src/transform/hn_transform.py:109-111`).
# ---------------------------------------------------------------------------


@_q(
    "dedup_keep_last",
    """
    SELECT event_id, user_id, event_type, value, ts
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t
    WHERE rn = 1
    """,
)
def dedup_keep_last_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return dedup.dedup_keep_last(ev, keys=["user_id"], order_by=["ts", "event_id"]).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )


# ---------------------------------------------------------------------------
# MERGE / upsert with freshness gate (A7) — `sql/load/03_merge.sql:1-32`.
# Two snapshots are derived deterministically from `events`:
#   * source updates every id % 5 == 0 (fresher batch_ts when id even
#     → update; staler when odd → freshness gate keeps target);
#   * source inserts brand-new ids (id + 10000000 for id % 7 == 0).
# ---------------------------------------------------------------------------

_MERGE_SRC_SQL = """
    target AS (
        SELECT event_id, user_id, event_type, value, ts AS batch_ts FROM events
    ),
    source AS (
        SELECT event_id, user_id, event_type, value + 1000 AS value,
               CASE WHEN event_id % 2 = 0 THEN ts + INTERVAL 1 HOUR
                    ELSE ts - INTERVAL 1 HOUR END AS batch_ts
        FROM events WHERE event_id % 5 = 0
        UNION ALL
        SELECT event_id + 10000000, user_id, 'inserted', value, ts
        FROM events WHERE event_id % 7 = 0
    )"""


def _merge_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = read_table(spark, sf_dir, "events")
    target = ev.select(
        "event_id", "user_id", "event_type", "value", F.col("ts").alias("batch_ts")
    )
    updates = ev.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("value") + 1000).alias("value"),
        F.when(
            F.col("event_id") % 2 == 0,
            F.col("ts") + F.expr("INTERVAL 1 HOUR"),
        )
        .otherwise(F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .alias("batch_ts"),
    )
    inserts = ev.where(F.col("event_id") % 7 == 0).select(
        (F.col("event_id") + 10000000).alias("event_id"),
        "user_id",
        F.lit("inserted").alias("event_type"),
        "value",
        F.col("ts").alias("batch_ts"),
    )
    return target, updates.unionByName(inserts)


@_q(
    "merge_upsert",
    f"""
    WITH {_MERGE_SRC_SQL}
    SELECT COALESCE(t.event_id, s.event_id) AS event_id,
           CASE WHEN t.event_id IS NULL
                     OR (s.event_id IS NOT NULL AND s.batch_ts > t.batch_ts)
                THEN s.user_id ELSE t.user_id END AS user_id,
           CASE WHEN t.event_id IS NULL
                     OR (s.event_id IS NOT NULL AND s.batch_ts > t.batch_ts)
                THEN s.event_type ELSE t.event_type END AS event_type,
           CASE WHEN t.event_id IS NULL
                     OR (s.event_id IS NOT NULL AND s.batch_ts > t.batch_ts)
                THEN s.value ELSE t.value END AS value,
           CASE WHEN t.event_id IS NULL
                     OR (s.event_id IS NOT NULL AND s.batch_ts > t.batch_ts)
                THEN s.batch_ts ELSE t.batch_ts END AS batch_ts
    FROM target t FULL JOIN source s ON t.event_id = s.event_id
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    target, source = _merge_frames(spark, sf_dir)
    return merge.merge_resolve(
        target, source, keys=["event_id"], freshness_col="batch_ts"
    )


# ---------------------------------------------------------------------------
# Joins (J1-J3): broadcast equi-join + agg, anti join, 1-row-agg join.
# ---------------------------------------------------------------------------


@_q(
    "segment_revenue",
    """
    SELECT c_mktsegment,
           COUNT(*)                    AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(price).cast("double").alias("total_revenue"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_revenue"),
        )
    )


@_q(
    "customers_no_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 anti join. The r1 form anti-joined against ALL orders and
    matched its oracle on ZERO rows at every driver SF (every
    customer has an order in this data — a vacuous check, caught by
    the r5 0/1-row audit); the predicate now excludes customers with
    no URGENT-priority order, so the anti join produces a large,
    value-bearing result while keeping the identical plan shape
    (filter pushed below the anti join's build side)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@_q(
    "events_last_day",
    """
    WITH last_day AS (SELECT MAX(CAST(ts AS DATE)) AS d FROM events)
    SELECT CAST(e.ts AS DATE) AS metric_date, COUNT(*) AS events_count
    FROM events e JOIN last_day ld ON CAST(e.ts AS DATE) = ld.d
    GROUP BY 1
    """,
)
def events_last_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        scalars.to_metric_date("ts").alias("metric_date")
    )
    last_day = ev.agg(F.max("metric_date").alias("d"))
    return (
        ev.join(F.broadcast(last_day), ev.metric_date == last_day.d)
        .groupBy("metric_date")
        .agg(F.count("*").alias("events_count"))
    )


# ---------------------------------------------------------------------------
# Set ops / top-k (O1, O3) — `sql/mart/03_checks.sql:8-15`, `README.md:78-79`.
# ---------------------------------------------------------------------------


@_q(
    "table_counts",
    """
    SELECT 'orders' AS table_name, COUNT(*) AS row_count FROM orders
    UNION ALL
    SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL
    SELECT 'events', COUNT(*) FROM events
    UNION ALL
    SELECT 'customer', COUNT(*) FROM customer
    """,
)
def table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name in ("orders", "lineitem", "events", "customer"):
        one = read_table(spark, sf_dir, name).agg(
            F.count("*").alias("row_count")
        ).select(F.lit(name).alias("table_name"), "row_count")
        out = one if out is None else out.unionByName(one)
    return out


@_q(
    "top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Window functions (§2.8): top-N per group + lag deltas.
# ---------------------------------------------------------------------------


@_q(
    "top_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY c_mktsegment
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) t
    WHERE rnk <= 3
    """,
)
def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@_q(
    "customer_order_deltas",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           o_totalprice - LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_prev
    FROM orders
    """,
)
def customer_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
    )


# ---------------------------------------------------------------------------
# Projection / JSON scalar path (P3-P5 + json extraction).
# ---------------------------------------------------------------------------


@_q(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate IS NOT NULL AND l_quantity > 30
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R")
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_quantity") > 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@_q(
    "json_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           COALESCE(CAST(json_extract_string(props, '$.missing') AS INTEGER), -1)
               AS prop_missing
    FROM events
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.coalesce(
            F.get_json_object("props", "$.missing").cast("int"), F.lit(-1)
        ).alias("prop_missing"),
    )


@_q(
    "props_variant_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
               AS k_bucket,
           COUNT(*) AS n_events,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def props_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type: the
    JSON props column is parsed ONCE into the binary variant encoding
    (`parse_json`) and fields are read with `variant_get` — the
    lakehouse-native path that avoids per-access JSON re-parsing
    (`json_props` shows the classic get_json_object form). The
    variant value flows through a grouped aggregate, proving the type
    crosses shuffles. The oracle speaks plain JSON SQL — the point is
    identical RESULTS from a different storage encoding."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("pv"))
    k = F.variant_get(F.col("pv"), "$.k", "int")
    return (
        v.select((k % 10).alias("k_bucket"), k.alias("_k"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# North-star: dedup / similarity / text analysis over documents+embeddings.
# ---------------------------------------------------------------------------


@_q(
    "doc_exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(text)
    """,
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs, content_cols=["text"], id_col="doc_id")


@_q(
    "doc_token_jaccard",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 1],
                                     (x, i) -> x || ' ' || w[i + 1])) AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.2
    """,
)
def doc_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-shingle Jaccard: a real near-dup measure. Unigram
    Jaccard over this testdata's small shared vocabulary matches
    nearly ALL pairs (~9M at sf0.1 — quadratic output); bigrams give
    selective shingles, so both the inverted-index join and the
    result stay proportional to true near-duplication."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.2)


@_q(
    "doc_token_jaccard_capped",
    r"""
    WITH salted AS (
        SELECT doc_id,
               text || ' sig' || CAST(doc_id // 2 AS VARCHAR) AS text
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM salted
    ),
    sh AS (SELECT DISTINCT doc_id, unnest(w) AS shingle FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    kept AS (
        SELECT s.doc_id, s.shingle FROM sh s JOIN freq f USING (shingle)
        WHERE f.df <= (SELECT COUNT(*) // 20 FROM documents)
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.005
    """,
)
def doc_token_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-frequency-cap approximation switch for the
    inverted-index Jaccard join, oracle-checked with EXACTLY the
    operator's semantics (full set sizes in the denominator,
    intersections counted over kept shingles only; VERDICT r3 #7 /
    NOTES_r2 candidate).

    The synthetic corpus is degenerate template soup — at sf0.1 every
    natural bigram sits at df 251-500 (measured), so on raw text a
    preserving cap prunes nothing and a pruning cap empties the
    measure. To make the switch's cost/recall contract visible, the
    query salts ONE rare signal token per consecutive doc pair (pure
    SQL, mirrored in the oracle) and runs UNIGRAM Jaccard. Measured
    on this machine (local[32], sf0.1): exact = 12,496,856 pairs in
    153.6s — the r1-observed quadratic scale-killer; capped = 33,619
    pairs in 2.0s — a ~77× cost gap from one knob. (At sf0.01 exact
    matches 124,745 of 124,750 possible pairs.) The cap is
    corpus-relative (COUNT//20 on both sides), so the same query
    discriminates at every SF.

    100 TB: this is the knob that turns the exact inverted index into
    a linear-cost screen; pick the cap from the df histogram (here:
    head at ≥251 docs, signal at df≤2) or switch to
    ``minhash_lsh_pairs`` when hot shingles ARE the signal."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    salted = docs.select(
        "doc_id",
        F.concat(
            "text",
            F.lit(" sig"),
            (F.col("doc_id") / 2).cast("long").cast("string"),
        ).alias("text"),
    )
    return dedup.jaccard_pairs(
        salted, "doc_id", "text", n=1, threshold=0.005,
        df_cap=max(1, n_docs // 20),
    )


@_q(
    "doc_token_jaccard_prefix",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    """,
)
def doc_token_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT similarity join (ppjoin family,
    dedup.jaccard_pairs_prefix): rare-first global shingle order, a
    pair above threshold must collide within each side's
    |X|−⌊t·|X|⌋+1 prefix, so only prefixes feed the candidate join
    and the exact Jaccard is re-verified per candidate. The oracle is
    the PLAIN inverted-index SQL — the whole point is that the pruned
    plan returns the identical answer (unlike df_cap/MinHash, which
    trade the measured set); same 3-gram/0.5 pair set as
    `near_dup_clusters`' edges. Honest caveat: this synthetic corpus
    has a uniform-hot df histogram, so the pruning pays off only on
    Zipfian (natural-language) corpora — see the operator docstring
    for measurements (trigram shingles keep the demo 5× cheaper than
    bigrams here: 12.2s vs 59.7s at sf0.1, full join 2.6s)."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.5)


@_q(
    "doc_containment_pairs",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 1],
                                     (x, i) -> x || ' ' || w[i + 1])) AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / sa.set_size, 4) AS containment
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    WHERE inter / sa.set_size >= 0.5
    """,
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment |A∩B|/|A| over bigram shingles: the
    quote/boilerplate-embedding measure Jaccard under-scores (a short
    doc fully quoted inside a long one has near-zero Jaccard but
    containment 1.0 from the short side). Directional — both (a,b)
    and (b,a) can appear. Same single-reused-exchange inverted-index
    plan as `doc_token_jaccard`; 51 pairs at sf0.01 / 822 at sf0.1
    with the 0.5 threshold (measured), so the output stays
    proportional to true embedding-duplication, not quadratic."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, "doc_id", "text", n=2, threshold=0.5)


@_q(
    "doc_tf_cosine_pairs",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(w[1:len(w) - 1],
                                     (x, i) -> x || ' ' || w[i + 1])) AS gram
        FROM toks
    ),
    tf AS (SELECT doc_id, gram, COUNT(*) AS tf FROM grams GROUP BY 1, 2),
    norms AS (
        SELECT doc_id, SUM(tf * tf) AS nsq FROM tf GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.tf * b.tf) AS dot
        FROM tf a JOIN tf b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 4) AS cosine_tf
    FROM dots
    JOIN norms na ON dots.doc_a = na.doc_id
    JOIN norms nb ON dots.doc_b = nb.doc_id
    WHERE dot / (sqrt(na.nsq) * sqrt(nb.nsq)) >= 0.6
    """,
)
def doc_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse bag-of-words cosine (no embedding model): bigram
    term-FREQUENCY vectors, so repetition-heavy near-dups that
    set-based Jaccard flattens stay separated. Integer dot/norms make
    the measure hash-exact across engines (only the final sqrt/divide
    are double — identical IEEE ops). Bimodal on this corpus: 25
    pairs ≥0.6 at sf0.01, 256 at sf0.1, next mass below 0.6 (measured)
    — the threshold separates true near-dups from template soup."""
    docs = read_table(spark, sf_dir, "documents")
    return similarity.tf_cosine_pairs(docs, "doc_id", "text", n=2, threshold=0.6)


@_q(
    "doc_boilerplate_strip",
    r"""
    WITH corpus AS (
        SELECT doc_id, concat_ws(chr(10),
            'shared header boilerplate',
            text,
            'footer ' || source,
            CASE WHEN doc_id % 37 = 0 THEN 'promo occasional banner' END
        ) AS text
        FROM documents
    ),
    lines AS (
        SELECT doc_id, u.pos, u.line
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       string_split(text, chr(10)),
                       (x, i) -> {'pos': i, 'line': trim(x)})) AS u
            FROM corpus
        )
        WHERE u.line <> ''
    ),
    boiler AS (
        SELECT line FROM lines
        GROUP BY line
        HAVING COUNT(DISTINCT doc_id)
               >= CEIL(0.05 * (SELECT COUNT(*) FROM documents))
    ),
    flagged AS (
        SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS is_boiler
        FROM lines l LEFT JOIN boiler b ON l.line = b.line
    )
    SELECT doc_id,
           string_agg(CASE WHEN NOT is_boiler THEN line END,
                      chr(10) ORDER BY pos) AS clean_text,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
    FROM flagged
    GROUP BY doc_id
    """,
)
def doc_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb line-dedup
    step): lines recurring in ≥5% of documents are chrome, stripped
    wherever they appear; each document is reassembled in original
    line order (operators/cleaning.py).

    The synthetic corpus is single-line word soup, so — like
    `curation_funnel`'s planted dups — the query plants the line
    structure deterministically in BOTH engines: a header shared by
    every doc (df=100% → stripped), a per-source footer (df=5% of the
    corpus at every SF since sources are uniform → stripped, exactly
    at the threshold boundary), and a rare promo line on doc_id%37
    (df≈2.7% → kept). Every doc therefore loses exactly its header +
    footer and keeps its unique body, and the boundary/kept paths are
    both exercised at every SF.

    Plan: projection explode → one line-hash shuffle with partial agg
    for the df threshold → broadcast join of the by-construction-small
    boilerplate set → one doc_id shuffle for reassembly."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    corpus = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("shared header boilerplate"),
            F.col("text"),
            F.concat(F.lit("footer "), F.col("source")),
            F.when(
                F.col("doc_id") % 37 == 0, F.lit("promo occasional banner")
            ),
        ).alias("text"),
    )
    min_df = -(-n_docs // 20)  # ceil(0.05 * n_docs)
    return cleaning.strip_boilerplate_lines(
        corpus, "doc_id", "text", min_doc_freq=min_df
    )


@_q(
    "doc_minhash_pairs",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard,
           TRUE AS est_within
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    """,
)
def doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH, bound-checked against exact Jaccard so the driver
    CAN hash-verify the hash family (VERDICT r1 #6). The output is
    every TRUE 3-gram-Jaccard ≥ 0.5 pair; ``est_within`` asserts that
    LSH banding surfaced the pair as a candidate (recall — at J≥0.5
    with 16 bands × 4 rows the miss probability is ~(1−J⁴)¹⁶ < 1e-9
    per dup pair) AND its MinHash estimate is within 0.2 of the true
    Jaccard (64 hashes → σ ≈ 0.06 at J=0.5). A banding miss or a
    drifting estimator turns the flag false and fails the compare.
    The raw candidate surface stays pinned in
    tests/test_dedup_similarity.py.

    3-gram shingles: discriminative signatures. Unigram shingles over
    a small shared vocabulary degenerate — every doc collides in
    every band and the candidate join goes quadratic (observed:
    12.5M candidate pairs at sf0.1 before this was changed)."""
    docs = read_table(spark, sf_dir, "documents")
    true_pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    )
    est = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        num_hashes=64, bands=16, shingle_n=3, threshold=0.0,
    ).select("doc_a", "doc_b", "est_jaccard")
    return true_pairs.join(est, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "jaccard",
        (
            F.col("est_jaccard").isNotNull()
            & (F.abs(F.col("est_jaccard") - F.col("jaccard")) <= 0.2)
        ).alias("est_within"),
    )


@_q(
    "incremental_near_dup",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE (a.doc_id + b.doc_id) % 2 = 1
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard,
           TRUE AS est_within
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    """,
)
def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-incremental near-dup against a PERSISTED LSH index — the
    operational shape for a growing corpus: even-id docs play the
    already-indexed corpus (`dedup.minhash_index`), odd-id docs the
    incoming batch (`dedup.minhash_pairs_against_index`); only the
    batch is shingled/hashed, the join touches matched (band, bucket)
    rows. Bound-checked exactly like `doc_minhash_pairs`: output is
    every TRUE cross-parity 3-gram-Jaccard ≥ 0.5 pair; `est_within`
    asserts the incremental path surfaced it as a candidate AND its
    estimate sits within 0.2 of the true Jaccard — a banding miss or
    estimator drift (e.g. the batch hashed with a different family
    than the index) turns the flag false and fails the compare."""
    docs = read_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    index = dedup.minhash_index(
        old, "doc_id", "text", num_hashes=64, bands=16, shingle_n=3
    )
    est = dedup.minhash_pairs_against_index(
        new, index, "doc_id", "text",
        num_hashes=64, bands=16, shingle_n=3, threshold=0.0,
    ).select(
        F.least("doc_old", "doc_new").alias("doc_a"),
        F.greatest("doc_old", "doc_new").alias("doc_b"),
        "est_jaccard",
    )
    true_pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).where((F.col("doc_a") + F.col("doc_b")) % 2 == 1)
    return true_pairs.join(est, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "jaccard",
        (
            F.col("est_jaccard").isNotNull()
            & (F.abs(F.col("est_jaccard") - F.col("jaccard")) <= 0.2)
        ).alias("est_within"),
    )


@_q(
    "doc_simhash_pairs",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard,
           TRUE AS simhash_close,
           TRUE AS blocked_ok
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    """,
)
def doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash, bound-checked against exact Jaccard so the driver CAN
    hash-verify the hash family (VERDICT r3 #5, same conversion r2
    applied to doc_minhash_pairs). Output: every TRUE 3-gram-Jaccard
    ≥ 0.5 pair with two verifiable claims about the 64-bit SimHash:

    * ``simhash_close`` — the pair's fingerprint Hamming distance is
      ≤ 20. True near-dups share almost all tokens, so E[hamming] ≈
      64·θ/π ≈ 13 at worst (θ from token-vector cosine ≳ 0.8); a
      RANDOM pair sits at Binomial(64, ½) → 32 ± 4, so ≤ 20 is 3σ
      below random and 8 bits above the worst observed dup (12 at
      sf0.1). A drifting hash family flips the flag and fails the
      driver compare.
    * ``blocked_ok`` — pigeonhole soundness of the candidate
      generator: any pair at hamming ≤ 3 MUST surface from the
      (blocks=4)-chunk equality join (4 > 3 ⇒ some chunk agrees), so
      the flag is ``hamming > 3 OR pair ∈ blocked surface`` — a
      deterministic guarantee, not a probability. blocks=4 (16-bit
      chunks) rather than 8 (8-bit): the guarantee needs only
      max_hamming+1 chunks, and WIDER chunks are the selectivity —
      r6 measured 13.5M candidate pairs (75% of all-pairs, blocking
      vacuous) at 8-bit chunks vs 493k at 16-bit on the shared-
      vocabulary sf0.1 corpus, 6.1s → 1.4s. Extra blocks beyond the
      pigeonhole minimum only ADD candidates — they never prune.

    The raw unbounded candidate surface stays pinned in
    tests/test_dedup_similarity.py."""
    docs = read_table(spark, sf_dir, "documents")
    true_pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    )
    # r12: fingerprint ONCE and materialize. The fps frame is
    # referenced four times (ha, hb, both sides of the pigeonhole
    # block join); Catalyst inlines each reference into its own
    # tokenize + 64-column vote aggregation subtree and the sizes
    # here make the optimizer broadcast rather than reuse the
    # exchange, so the corpus was fingerprinted 4x (the old
    # simhash_near_pairs call even built its own fps from scratch).
    # One localCheckpoint of the (doc_id, int64) fingerprint table —
    # 16 bytes/doc at ANY corpus size, the same artifact a production
    # pipeline would persist — makes every reference read the
    # materialized rows. hamming_near_pairs over the same frame is
    # the identical operator simhash_near_pairs wraps.
    fps = dedup.simhash(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    ha = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_ha"))
    hb = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_hb"))
    blocked = dedup.hamming_near_pairs(
        fps, "doc_id", "simhash", max_hamming=3, blocks=4
    ).select("doc_a", "doc_b", F.lit(True).alias("_found"))
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        true_pairs.join(ha, "doc_a")
        .join(hb, "doc_b")
        .join(blocked, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            (hamming <= 20).alias("simhash_close"),
            ((hamming > 3) | F.coalesce("_found", F.lit(False))).alias(
                "blocked_ok"
            ),
        )
    )


@_q(
    "knn_cosine",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cos
        FROM q CROSS JOIN embeddings e
    )
    SELECT query_id, vec_id, ROUND(cos, 4) AS cosine_sim,
           CAST(rn AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
        FROM scored
    ) t
    WHERE rn <= 10
    """,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.knn_cosine_bruteforce(
        emb, queries, id_col="vec_id", vec_col="embedding", k=10
    )
    return out.withColumnRenamed("rank", "rnk").withColumn(
        "rnk", F.col("rnk").cast("int")
    )


@_q(
    "radius_cosine_search",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 5
    )
    SELECT q.query_id, e.vec_id,
           ROUND(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])),
                 4) AS cosine_sim
    FROM q CROSS JOIN embeddings e
    WHERE list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) >= 0.25
    """,
)
def radius_cosine_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range similarity search (similarity.radius_cosine): everything
    within cosine ≥ 0.25 of each query — the threshold twin of top-k
    kNN for dedup-radius / recall-sweep callers. Queries broadcast,
    corpus scanned once, NO shuffle and (unlike top-k) no per-query
    window — the plan is a pure filtered scan. 0.25 sits above the
    p99 of the non-self cosine distribution (0.29 max-tail measured),
    so the result is selective but non-vacuous at every SF."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.radius_cosine(
        emb, queries, id_col="vec_id", vec_col="embedding", radius=0.25
    )


@_q(
    "knn_cosine_lsh",
    """
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def knn_cosine_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate kNN, bound-checked per query
    (VERDICT r1 #6): plane seeds aren't SQL-portable, but "LSH top-10
    recovers ≥ half of the exact top-10 for every query" is — the
    query computes exact and LSH top-k side by side and emits the
    per-query recall flag the oracle asserts TRUE. The raw LSH
    ranking stays pinned in tests/test_dedup_similarity.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.knn_cosine_bruteforce(emb, queries, k=10).select(
        "query_id", "vec_id"
    )
    # 3 planes/table keeps per-table buckets coarse enough that every
    # query clears the recall floor at ALL test scales (measured min
    # hits: 7 @sf0.001, 8 @sf0.01, 6 @sf0.1; 4 planes dipped to 4).
    approx = similarity.knn_cosine_lsh(
        emb, queries, dim=64, k=10, n_planes=3, n_tables=8
    ).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").groupBy(
        "query_id"
    ).agg(F.count("*").alias("_hits"))
    return queries.select("query_id").join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("_hits"), F.lit(0)) >= 5).alias("recall_ok"),
    )


def _marker_sql(lang: str) -> str:
    pat = r"\b(" + "|".join(textfn.LANG_MARKERS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


@_q(
    "doc_lang_id",
    f"""
    WITH s AS (
        SELECT doc_id,
               {_marker_sql("de")} AS de_s,
               {_marker_sql("en")} AS en_s,
               {_marker_sql("es")} AS es_s,
               {_marker_sql("fr")} AS fr_s
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN GREATEST(de_s, en_s, es_s, fr_s) <= 0 THEN 'unknown'
                WHEN de_s = GREATEST(de_s, en_s, es_s, fr_s) THEN 'de'
                WHEN en_s = GREATEST(de_s, en_s, es_s, fr_s) THEN 'en'
                WHEN es_s = GREATEST(de_s, en_s, es_s, fr_s) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", textfn.lang_id("text").alias("lang_pred"))


@_q(
    "doc_tokens",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS INTEGER) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                AS INTEGER) AS n_tokens_bpe
    FROM documents
    """,
)
def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textfn.token_count_ws("text").cast("int").alias("n_tokens_ws"),
        textfn.token_count_bpe_ish("text").cast("int").alias("n_tokens_bpe"),
    )


@_q(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textfn.fingerprint_md5("text").alias("fingerprint")
    )


@_q(
    "doc_quality",
    rf"""
    WITH t AS (
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x <> '')) AS n_tokens,
               LENGTH(regexp_replace(text, '\s+', '', 'g')) AS nonspace,
               LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               LENGTH(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS punct,
               {_marker_sql("en")} AS stop_hits
        FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ROUND(CASE WHEN n_tokens > 0 THEN nonspace / n_tokens
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS avg_token_len,
           ROUND(CASE WHEN nonspace > 0 THEN alpha / nonspace
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS alpha_ratio,
           ROUND(CASE WHEN nonspace > 0 THEN punct / nonspace
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS punct_ratio,
           ROUND(CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS stopword_ratio,
           ROUND(LEAST(CAST(1.0 AS DOUBLE),
                 CAST(0.4 AS DOUBLE) * (CASE WHEN nonspace > 0 THEN alpha / nonspace
                                             ELSE CAST(0.0 AS DOUBLE) END)
               + CAST(0.4 AS DOUBLE) * (CASE WHEN n_tokens >= 5 THEN CAST(1.0 AS DOUBLE)
                                             ELSE n_tokens / CAST(5.0 AS DOUBLE) END)
               + CAST(0.2 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE),
                     (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens
                           ELSE CAST(0.0 AS DOUBLE) END) * 4)), 4) AS quality_score
    FROM t
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return textfn.quality_features(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Time-series joins: as-of (backward, <=) and bucketed interval join.
# Spark lacks both natively; operators/joins.py builds them from
# window algebra / bucket blocking. DuckDB's native ASOF JOIN is the
# oracle for ours.
# ---------------------------------------------------------------------------


@_q(
    "asof_rates",
    """
    WITH rates AS (
        SELECT user_id, ts AS rate_ts, value AS rate
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'signup'
        ) d WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           r.rate, r.rate_ts AS matched_ts
    FROM events e
    ASOF LEFT JOIN rates r
        ON e.user_id = r.user_id AND e.ts >= r.rate_ts
    """,
)
def asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    ev = read_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts", "value")
    rates = dedup.dedup_keep_last(
        ev.where(F.col("event_type") == "signup"),
        keys=["user_id", "ts"],
        order_by=["event_id"],
    ).select("user_id", F.col("ts").alias("rate_ts"), F.col("value").alias("rate"))
    return asof_join(
        left, rates, on=["user_id"], left_ts="ts", right_ts="rate_ts",
        value_cols=["rate"],
    )


@_q(
    "pit_user_features",
    """
    WITH feats AS (
        SELECT user_id, ts AS feat_ts, value AS feat_value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ) d WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN r.feat_ts >= e.ts - INTERVAL 1 HOUR
                THEN r.feat_value END AS feat_value,
           CASE WHEN r.feat_ts >= e.ts - INTERVAL 1 HOUR
                THEN r.feat_ts END AS matched_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') e
    ASOF LEFT JOIN feats r
        ON e.user_id = r.user_id AND e.ts > r.feat_ts
    """,
)
def pit_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (VERDICT r3 #8 / NOTES_r2 candidate): each
    purchase event is enriched with the user's latest 'view' feature
    tick STRICTLY before the purchase instant (same-instant ticks are
    lookahead leakage and must NOT match — DuckDB's ``ASOF ... ON >``
    is the oracle) and no older than 1 hour (stale features null out,
    but the left spine keeps its rows). This is the feature-store
    contract a training pipeline needs; ``asof_rates`` covers the
    inclusive ``<=`` variant.

    Plan: identical single-shuffle union+window shape as asof_join —
    no per-row subquery, no range join; survives 100 TB because the
    only exchange is hash(user_id)."""
    from ..operators.joins import pit_join

    ev = read_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    feats = dedup.dedup_keep_last(
        ev.where(F.col("event_type") == "view"),
        keys=["user_id", "ts"],
        order_by=["event_id"],
    ).select(
        "user_id",
        F.col("ts").alias("feat_ts"),
        F.col("value").alias("feat_value"),
    )
    return pit_join(
        left, feats, on=["user_id"], left_ts="ts", right_ts="feat_ts",
        value_cols=["feat_value"], tolerance_sec=3600,
    )


@_q(
    "interval_purchases_near_errors",
    """
    SELECT e.event_id, e.user_id, e.ts, COUNT(p.ts) AS purchases_nearby
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN events p
      ON p.user_id = e.user_id AND p.event_type = 'purchase'
     AND FLOOR(epoch(p.ts)) >= FLOOR(epoch(e.ts)) - 300
     AND FLOOR(epoch(p.ts)) <= FLOOR(epoch(e.ts)) + 300
    GROUP BY 1, 2, 3
    """,
)
def interval_purchases_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import interval_join_count

    ev = read_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    return interval_join_count(
        errors, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        lower=-300, upper=300, bucket_seconds=600,
        count_alias="purchases_nearby",
    )


@_q(
    "sessionize",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER w)) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessions import session_summary

    ev = read_table(spark, sf_dir, "events")
    return session_summary(
        ev, key_cols=["user_id"], ts_col="ts", gap_seconds=1800,
        order_tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# Multi-dim aggregation: rollup / cube / pivot / distinct counts /
# exact percentiles — the OLAP layer above the reference's plain
# GROUP BYs.
# ---------------------------------------------------------------------------


@_q(
    "rollup_daily",
    """
    SELECT CAST(ts AS DATE) AS metric_date, event_type,
           COUNT(*) AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (CAST(ts AS DATE), event_type)
    """,
)
def rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return ev.rollup(
        scalars.to_metric_date("ts").alias("metric_date"), F.col("event_type")
    ).agg(
        F.count("*").alias("events_count"),
        F.sum(val).cast("double").alias("total_value"),
    )


@_q(
    "orders_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_count"),
        F.sum(price).cast("double").alias("total_revenue"),
    )


@_q(
    "pivot_daily_types",
    """
    SELECT CAST(ts AS DATE) AS metric_date,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
)
def pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(scalars.to_metric_date("ts").alias("metric_date"))
        .pivot("event_type", types)
        .count()
    )
    return out.select(
        "metric_date",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    )


@_q(
    "distinct_users_daily",
    """
    SELECT CAST(ts AS DATE) AS metric_date,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS events_count
    FROM events
    GROUP BY 1
    """,
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(scalars.to_metric_date("ts").alias("metric_date")).agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("events_count"),
    )


@_q(
    "approx_distinct_users",
    """
    SELECT CAST(ts AS DATE) AS metric_date,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY 1
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct, bound-checked so the driver CAN
    hash-verify it (VERDICT r1 #6): the sketch value itself is
    engine-specific, but |approx − exact| ≤ 5%·exact is a portable
    claim — emitted as a boolean next to the exact count, with the
    oracle asserting TRUE per group. A sketch drifting out of its
    error budget turns a row false and fails the hash compare."""
    ev = read_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    return ev.groupBy(scalars.to_metric_date("ts").alias("metric_date")).agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_5pct"),
    )


@_q(
    "hll_sketch_weekly_users",
    """
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_5pct
    FROM events
    GROUP BY 1
    """,
)
def hll_sketch_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the pattern that makes approximate
    distincts work at 100 TB: per-DAY DataSketches HLL sketches
    (`hll_sketch_agg`) are unioned into weekly estimates
    (`hll_union_agg` → `hll_sketch_estimate`) WITHOUT re-reading raw
    events — the daily sketch table is what a rollup pipeline
    persists, and any calendar regrouping is a cheap merge over it.
    Like `approx_distinct_users`, the engine-specific sketch bytes
    can't cross engines, so the portable claim is the bound: the
    MERGED estimate lands within 5% of the exact weekly distinct,
    emitted as a boolean the oracle asserts TRUE."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        scalars.to_metric_date("ts").alias("_day"),
    ).agg(F.hll_sketch_agg("user_id").alias("_sketch"))
    weekly_est = daily.groupBy("week_start").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sketch")).alias("_est")
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.join(weekly_est, "week_start").select(
        "week_start",
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_within_5pct"),
    )


@_q(
    "value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
    )


@_q(
    "brand_revenue",
    """
    SELECT p_brand,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand
    """,
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_count"),
            F.sum(net).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar / date-function coverage (F6-family extensions).
# ---------------------------------------------------------------------------


@_q(
    "calendar_breakdown",
    """
    SELECT CAST(year(ts) AS INTEGER)  AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(hour(ts) AS INTEGER)  AS h,
           CAST(dayofweek(ts) AS INTEGER) AS dow,
           COUNT(*) AS events_count
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.hour("ts").cast("int").alias("h"),
        # Spark dayofweek: 1=Sunday..7; DuckDB: 0=Sunday..6 — align.
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
    ).agg(F.count("*").alias("events_count"))


@_q(
    "weekly_counts",
    """
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           COUNT(*) AS events_count
    FROM events
    GROUP BY 1
    """,
)
def weekly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
    ).agg(F.count("*").alias("events_count"))


@_q(
    "conditional_agg",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS purchases,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS errors,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               AS purchase_value
    FROM events
    GROUP BY user_id
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.sum(F.when(is_purchase, 1).otherwise(0)).cast("long").alias("purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errors"),
        F.sum(
            F.when(is_purchase, F.col("value").cast("decimal(18,2)")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Scalar subqueries (O2, `sql/mart/03_checks.sql:2-5`) + embedding
# near-dup (north-star: content dedup in embedding space).
# ---------------------------------------------------------------------------


@_q(
    "scalar_subqueries",
    """
    SELECT (SELECT COUNT(*) FROM orders)   AS n_orders,
           (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
           (SELECT COUNT(*) FROM events)   AS n_events
    """,
)
def scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame from independent scalar aggregates — Catalyst
    plans the cross-joins of 1-row aggs as broadcast nested loops."""
    o = read_table(spark, sf_dir, "orders").agg(F.count("*").alias("n_orders"))
    l = read_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_lineitem"))
    e = read_table(spark, sf_dir, "events").agg(F.count("*").alias("n_events"))
    return o.crossJoin(l).crossJoin(e)


@_q(
    "embedding_near_dup",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.e, b.e), 4) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.35
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via the distributed grid
    kernel (block-pair applyInPandas GEMM — no driver collect, no
    full-corpus broadcast; VERDICT r1 #3). Identical output to the
    small-corpus collect kernel (pinned in tests); the sub-quadratic
    approximate path is LSH banding (knn_cosine_lsh)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_grid(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.35
    )


# ---------------------------------------------------------------------------
# Deep relational coverage: TPC-H-style multi-join analytics over the
# full star schema (region/nation dims finally in play), word
# frequencies via explode, statistical aggregates, and a salted
# aggregation (skew-handling pattern; same answer as plain groupBy).
# ---------------------------------------------------------------------------


@_q(
    "local_supplier_volume",
    """
    SELECT n_name,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: one big fact scan; only TRUE dimension tables
    (supplier/nation/region) are broadcast. orders and customer are
    fact-sized at scale — forcing them broadcast OOMs every executor
    at 100 TB (VERDICT r1 #2), so the lineitem⋈orders⋈customer chain
    is left to AQE, which picks shuffle-hash/broadcast from runtime
    sizes and can still convert post-shuffle when a side is small."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("line_count"),
            F.sum(net).cast("double").alias("revenue"),
        )
    )


@_q(
    "shipping_priority",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join, agg, global top-k
    (TakeOrderedAndProject — no full sort). orders is a fact table
    (~half survives the status filter) so it is NOT force-broadcast
    (VERDICT r1 #2); AQE decides the physical join from runtime
    stats."""
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(net).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_q(
    "selective_order_lines",
    """
    SELECT o_orderkey, COUNT(*) AS line_count,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1995-04-01'
    GROUP BY 1
    """,
)
def selective_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter shape (VERDICT r3 #8): a fact-fact join where
    one side carries a highly selective predicate (~2% of orders:
    one priority × one quarter) and the other side has no predicate
    of its own. This is exactly the plan Spark's runtime Bloom-filter
    injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
    default on) targets: a `bloom_filter_agg` over the filtered
    side's join keys is pushed into the lineitem scan as
    `BloomFilterMightContain`, cutting the shuffle to rows that can
    join. Locally the 10 GiB application-side scan threshold keeps
    the filter out (scans are MBs); tests/test_bloom_filter.py lowers
    the thresholds and asserts both the injection and result parity,
    and EXPLAINS.md carries the injected plan. At 100 TB the default
    thresholds fire on precisely this shape — no hint needed."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
    ).select("o_orderkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("line_count"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@_q(
    "top_words",
    r"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
    SELECT word, COUNT(*) AS word_count
    FROM tok GROUP BY word
    ORDER BY word_count DESC, word
    LIMIT 20
    """,
)
def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequency: explode + partial-aggregated count +
    top-k. The canonical explode/lateral-view coverage query."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(dedup.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("word_count"))
        .orderBy(F.desc("word_count"), F.asc("word"))
        .limit(20)
    )


@_q(
    "bpe_merge_pairs",
    r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(w[1:len(w) - 1],
                      (x, i) -> x || ' ' || w[i + 1])) AS pair
        FROM toks
        WHERE len(w) > 1
    )
    SELECT pair, COUNT(*) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: corpus-wide adjacent-pair
    frequencies — one BPE merge iteration is "count every adjacent
    symbol pair across the corpus, merge the most frequent". Here the
    symbols are whitespace tokens (this corpus has no sub-word
    structure); on character- or byte-level symbols the distributed
    shape is identical: ONE Generate (pair explode, multiset — unlike
    `word_shingles`, occurrences are NOT deduped per doc), map-side
    partial counts, one shuffle on the pair key, TakeOrdered top-k.
    Complements `doc_repetition` (per-doc n-gram stats) with the
    corpus-level aggregate; deterministic tiebreak (count desc, pair
    asc) for cross-engine parity."""
    docs = dedup.fan_out_narrow_input(read_table(spark, sf_dir, "documents"))
    w = docs.select(dedup.tokens("text").alias("w"))
    pairs = dedup.ngram_array(F.col("w"), 2)
    return (
        w.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(20)
    )


@_q(
    "value_stats",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(stddev_pop(value), 4)          AS value_stddev,
           ROUND(var_pop(value), 4)             AS value_var,
           ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_value_user
    FROM events
    GROUP BY event_type
    """,
)
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Both engines use numerically-stable
    one-pass (Welford-style) formulas; ROUND(4) absorbs the
    last-ulp summation-order differences."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.stddev_pop("value"), 4).alias("value_stddev"),
        F.round(F.var_pop("value"), 4).alias("value_var"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias(
            "corr_value_user"
        ),
    )


@_q(
    "salted_user_counts",
    """
    SELECT user_id, COUNT(*) AS events_count
    FROM events
    GROUP BY user_id
    """,
)
def salted_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: groupBy (key, salt) then re-agg
    by key. The skew-mitigation pattern for hot keys at 100 TB (AQE
    handles moderate skew automatically; salting is the explicit
    version for pathological keys). Result identical to the plain
    groupBy — which is exactly what the oracle checks.
    """
    ev = read_table(spark, sf_dir, "events")
    salt = (F.col("event_id") % 8).alias("_salt")
    partial = ev.select("user_id", salt).groupBy("user_id", "_salt").agg(
        F.count("*").alias("_c")
    )
    return partial.groupBy("user_id").agg(
        F.sum("_c").cast("long").alias("events_count")
    )


# ---------------------------------------------------------------------------
# Breadth coverage: deterministic array aggregation, string-function
# kitchen sink, null-handling semantics.
# ---------------------------------------------------------------------------


@_q(
    "user_event_type_sets",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS event_types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: collect_set is unordered in
    both engines, so the set is sorted before use. The driver output
    is the *joined string* (comma-separated) rather than the raw
    array — the driver's canonicalizer sorts pandas frames, and
    Python lists are unhashable (red row in CORRECTNESS_r01). The
    raw-array variant is pinned under pytest
    (tests/test_queries_misc.py::test_event_type_sets_array)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.countDistinct("event_type").alias("n_types"),
    )


def user_event_type_sets_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued variant of :func:`user_event_type_sets` — the
    natural Spark output shape (``array<string>``), kept out of the
    driver registry because unhashable list cells break its pandas
    canonicalizer. Covered by pytest instead."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("event_types"),
        F.countDistinct("event_type").alias("n_types"),
    )


@_q(
    "string_kitchen_sink",
    """
    SELECT p_partkey,
           concat_ws('|', p_brand, p_type)              AS brand_type,
           substring(p_name, 1, 8)                      AS name_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0')        AS size_padded,
           reverse(p_brand)                             AS brand_rev,
           translate(p_type, 'AEIOU', 'aeiou')          AS type_lowervowel,
           length(p_name)                               AS name_len,
           CAST(strpos(p_name, 'a') AS INTEGER)         AS first_a
    FROM part
    """,
)
def string_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lowervowel"),
        F.length("p_name").cast("long").alias("name_len"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
    )


@_q(
    "null_semantics",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O')                        AS status_or_null,
           COALESCE(NULLIF(o_orderpriority, ''), '(none)')   AS priority_clean,
           CASE WHEN o_totalprice IS NULL THEN -1.0
                ELSE o_totalprice END                        AS price_nn,
           GREATEST(o_totalprice, 50000.0)                   AS price_floor
    FROM orders
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("(none)")
        ).alias("priority_clean"),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_nn"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("price_floor"),
    )


# ---------------------------------------------------------------------------
# Composed corpus-curation pipeline. The near-dup stage runs in
# "exact_jaccard" mode here so the ENTIRE composition (quality gate →
# exact dedup → transitive near-dup clusters → keep-set) is
# deterministic and hash-checked against a single composed DuckDB
# oracle (assigned below, after the shared pair/CC SQL fragments are
# defined). The production-scale minhash mode of the same pipeline
# stays covered by `curation_funnel` (stage counts), the bound-checked
# `doc_minhash_pairs`/`incremental_near_dup`, and
# tests/test_curation.py's planted-duplicate composition tests.
# ---------------------------------------------------------------------------


@_q("curate_documents")  # oracle assigned after _CC_BY_RECURSIVE_CTE below
def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation via `curate_corpus`: quality >= 0.3 gate,
    exact md5 dedup (min-id keep), exact 3-gram-Jaccard >= 0.5 near-dup
    pairs, connected-component clusters, min-id representative kept.
    Every stage is the pipeline's own operator — the oracle recomputes
    the same stages in SQL (recursive CTE for the transitive closure),
    so this row certifies the COMPOSITION, not just the parts."""
    from .llm_data_pipeline import CurationConfig, curate_corpus

    docs = read_table(spark, sf_dir, "documents")
    kept, _fate = curate_corpus(
        docs,
        config=CurationConfig(
            min_quality=0.3,
            minhash_threshold=0.5,
            near_dup_method="exact_jaccard",
        ),
    )
    return kept.select(
        "doc_id", "quality_score", "lang_pred", "n_tokens_bpe", "fingerprint"
    )


@_q(
    "try_cast_semantics",
    """
    SELECT doc_id,
           TRY_CAST(substring(source, 4) AS INTEGER)  AS source_num,
           TRY_CAST(lang AS INTEGER)                  AS lang_num,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS chars_roundtrip
    FROM documents
    """,
)
def try_cast_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient-cast parity (the P5 semantic as a standalone surface):
    malformed input → NULL in both engines, never a job abort."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring("source", 4, 2147483647).try_cast("int").alias("source_num"),
        F.col("lang").try_cast("int").alias("lang_num"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_roundtrip"),
    )


# ---------------------------------------------------------------------------
# Semi joins (completing the join-type matrix: inner/broadcast,
# anti, full-outer-merge, as-of, interval — and now semi).
# ---------------------------------------------------------------------------


@_q(
    "customers_with_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@_q(
    "orders_with_heavy_lines",
    """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    """,
)
def orders_with_heavy_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional semi join: the filter rides on the probe side and
    is pushed into the lineitem scan before the join."""
    orders = read_table(spark, sf_dir, "orders")
    heavy = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") > 45
    ).select("l_orderkey")
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Correlated / nested subquery shapes (TPC-H Q2 / Q13 / Q16 / Q22
# analogues on the available tables).
# ---------------------------------------------------------------------------


@_q(
    "cheapest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice = (
        SELECT MIN(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def cheapest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar MIN subquery. Spark plan: window
    min over the partition + equality filter — one shuffle, no
    self-join (Catalyst decorrelates the SQL form the same way).
    Ties: all tied rows returned, matching SQL semantics."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("_min_price", F.min("o_totalprice").over(w))
        .where(F.col("o_totalprice") == F.col("_min_price"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@_q(
    "customer_order_distribution",
    """
    SELECT order_count, COUNT(*) AS cust_count
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY order_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left join + per-entity count + distribution over
    the counts (two-level aggregation)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count("*").alias("cust_count"))


@_q(
    "suppliers_outside_region",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey NOT IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2
    )
    """,
)
def suppliers_outside_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN over a non-null subquery = anti join (the
    null-free case; with nullable keys NOT IN needs the null-aware
    anti join, which Spark plans from the SQL form)."""
    supp = read_table(spark, sf_dir, "supplier")
    asia_nations = read_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 2
    ).select("n_nationkey")
    return supp.join(
        asia_nations, supp.s_nationkey == asia_nations.n_nationkey, "left_anti"
    ).select("s_suppkey", "s_name")


@_q(
    "orders_above_global_avg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM orders WHERE o_totalprice > 0
    )
    """,
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: filter against a global scalar aggregate. The
    threshold uses the decimal-sum-to-double discipline so both
    engines compare against the bit-identical value."""
    orders = read_table(spark, sf_dir, "orders")
    avg_df = orders.where(F.col("o_totalprice") > 0).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("_avg")
    )
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey", "o_totalprice")
    )


@_q(
    "knn_cosine_ivf",
    """
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def knn_cosine_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means cells + probe) approximate kNN, bound-checked per
    query like knn_cosine_lsh: the cells are engine-internal, but
    "IVF top-10 recovers ≥7 of the exact top-10 per query" is
    portable (measured min hits at the auto √N-cells / quarter-probe
    operating point: 8 at every test scale; r9's fixed 16 cells gave
    panel recall@10 0.716 vs auto's 0.926; k-means init is id-ordered
    → deterministic)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.knn_cosine_bruteforce(emb, queries, k=10).select(
        "query_id", "vec_id"
    )
    approx = similarity.knn_cosine_ivf(
        emb, queries, dim=64, k=10, n_cells="auto", n_probe="auto", iters=3
    ).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").groupBy(
        "query_id"
    ).agg(F.count("*").alias("_hits"))
    return queries.select("query_id").join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("_hits"), F.lit(0)) >= 7).alias("recall_ok"),
    )


@_q(
    "brand_value_concentration",
    """
    SELECT p_brand, sum_value
    FROM (
        SELECT p_brand,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
        FROM part GROUP BY p_brand
    ) t
    WHERE sum_value > (
        SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) * 0.042
        FROM part
    )
    """,
)
def brand_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: HAVING against a global scalar fraction (groups
    holding >4.2% of total value — discriminating on this data:
    25 brands average 4% each). Decimal-exact sums on both levels."""
    part = read_table(spark, sf_dir, "part")
    price = F.col("p_retailprice").cast("decimal(18,2)")
    per_brand = part.groupBy("p_brand").agg(
        F.sum(price).cast("double").alias("sum_value")
    )
    total = part.agg((F.sum(price).cast("double") * 0.042).alias("_threshold"))
    return (
        per_brand.crossJoin(F.broadcast(total))
        .where(F.col("sum_value") > F.col("_threshold"))
        .select("p_brand", "sum_value")
    )


@_q(
    "large_volume_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
    )
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN over a grouped-HAVING subquery → semi join
    against the aggregated key set."""
    orders = read_table(spark, sf_dir, "orders")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    heavy = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(qty).cast("double").alias("_sq"))
        .where(F.col("_sq") > 150)
        .select("l_orderkey")
    )
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


def _synth_bmp_media(docs: DataFrame) -> DataFrame:
    """(media_id, payload) of REAL uncompressed BMPs with per-doc
    VARIABLE geometry: width 8..16 (``8 + doc_id % 9``), height 16,
    R ramps with x (step 16), G with y, B constant ``doc_id % 256``.
    Every channel statistic has a closed form DuckDB can state, and
    the varying width makes the recovered values non-constant per
    row — a vacuous-constant compare can't pass by accident."""
    from ..functions import multimodal as mm

    base = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(8) + F.col("doc_id") % 9).cast("int").alias("w"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_bmp(int(w), 16, int(b)))
                for m, w, b in zip(pdf["media_id"], pdf["w"], pdf["blue"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return base.mapInPandas(synth, "media_id long, payload binary")


@_q(
    "media_features",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 9 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(8 * (7 + doc_id % 9) AS INTEGER) AS mean_r,
           CAST(16 * (7 + doc_id % 9) AS INTEGER) AS max_r,
           CAST(120 AS INTEGER) AS mean_g,
           CAST(doc_id % 256 AS INTEGER) AS mean_b
    FROM documents
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal featurizer, exact-value verified (VERDICT r3 #6):
    synthesize a REAL variable-width BMP per doc, decode it back
    through the real struct+numpy path (``multimodal._decode_bmp``)
    inside the Arrow-batched featurizer, and emit the RECOVERED
    geometry and channel stats. Closed forms (x ramp of step 16 over
    width w): mean_r = 8(w−1), max_r = 16(w−1), mean_g = 120 (h=16),
    mean_b = doc_id — all exact integers, so a padding bug, BGR/RGB
    swap, or row-order flip fails the driver hash compare.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF (output is ~150 bytes/row)."""
    from ..functions.multimodal import extract_image_features

    docs = read_table(spark, sf_dir, "documents")
    feats = extract_image_features(_synth_bmp_media(docs))
    chan = lambda i: F.round(  # noqa: E731
        F.col("features")[i] * 255, 0
    ).cast("int")
    return feats.select(
        "media_id",
        "width",
        "height",
        chan(0).alias("mean_r"),
        chan(3).alias("max_r"),
        chan(4).alias("mean_g"),
        chan(8).alias("mean_b"),
    )


@_q(
    "media_frames",
    """
    SELECT doc_id AS media_id, frame_idx,
           CAST(FLOOR(length(text) * (frame_idx * 2 + 1) / 8.0) AS BIGINT)
               AS frame_offset_ms
    FROM documents
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS frame_idx) f
    WHERE length(text) > 0
    """,
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan over driver data: synthesize a
    duration (text length as ms) into the typed media metadata, then
    emit evenly spaced frame offsets — pure native expressions, and
    (unlike the decode stages) fully SQL-expressible, so it gets a
    real oracle. FLOOR in the oracle mirrors Spark's truncating
    double→long cast (DuckDB's CAST rounds)."""
    from ..functions.multimodal import sample_frame_offsets

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length("text").cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    return sample_frame_offsets(media, n_frames=4)


@_q(
    "media_resize",
    """
    SELECT doc_id AS media_id,
           'image/bmp' AS mime,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(2 * list_aggregate(
                    list_transform(generate_series(0, 7),
                                   j -> (j * (8 + doc_id % 9)) // 8),
                    'sum') AS INTEGER) AS mean_r,
           CAST(112 AS INTEGER) AS mean_g,
           CAST(doc_id % 256 AS INTEGER) AS mean_b
    FROM documents
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize, exact-value verified (VERDICT r3
    #6): synthesize variable-width BMPs, resize to 8×8 through the
    real numpy index-map path (``multimodal.resize_images``), then
    decode the RESIZED payload back and emit its recovered geometry
    and channel means. The oracle states the resample in closed form:
    column j of the output samples source column ⌊j·w/8⌋, so
    mean_r = 2·Σ_j ⌊j·w/8⌋ (R step 16 over 8 samples), mean_g = 112
    (y samples 0,2,…,14 of the step-16 ramp), B passes through. A
    wrong index map, a off-by-one in the sampling grid, or a re-encode
    bug shifts the recovered means and fails the hash compare. The
    ``mime`` column additionally pins that the REAL bmp path ran, not
    the labeled stub fallback."""
    from ..functions.multimodal import extract_image_features, resize_images

    docs = read_table(spark, sf_dir, "documents")
    media = _synth_bmp_media(docs)
    resized = resize_images(media, 8, 8)
    feats = extract_image_features(
        resized.select("media_id", "payload")
    )
    chan = lambda i: F.round(  # noqa: E731
        F.col("features")[i] * 255, 0
    ).cast("int")
    return (
        feats.join(resized.select("media_id", "meta.mime"), "media_id")
        .select(
            "media_id",
            "mime",
            "width",
            "height",
            chan(0).alias("mean_r"),
            chan(4).alias("mean_g"),
            chan(8).alias("mean_b"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations beyond UNION (INTERSECT / EXCEPT — absent in the
# reference, SURVEY §2.7) and window frames (running / moving
# aggregates, first_value).
# ---------------------------------------------------------------------------


@_q(
    "users_purchase_and_error",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def users_purchase_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("user_id")
    e = ev.where(F.col("event_type") == "error").select("user_id")
    return p.intersect(e)


@_q(
    "users_purchase_no_error",
    """
    SELECT user_id, CAST(ts AS DATE) AS metric_date
    FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id, CAST(ts AS DATE)
    FROM events WHERE event_type = 'error'
    """,
)
def users_purchase_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT at (user, day) grain — at the coarser user grain every
    user eventually does everything in this data (vacuous result)."""
    ev = read_table(spark, sf_dir, "events")
    day = scalars.to_metric_date("ts").alias("metric_date")
    p = ev.where(F.col("event_type") == "purchase").select("user_id", day)
    e = ev.where(F.col("event_type") == "error").select("user_id", day)
    return p.subtract(e)  # EXCEPT (set semantics), not EXCEPT ALL


@_q(
    "running_user_value",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE)       AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                                                          AS moving3_value,
           FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS first_type
    FROM events
    """,
)
def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running + moving decimal-exact sums and
    first_value, all over one partition sort."""
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving3 = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(val).over(running).cast("double").alias("running_value"),
        F.sum(val).over(moving3).cast("double").alias("moving3_value"),
        F.first("event_type").over(w).alias("first_type"),
    )


# ---------------------------------------------------------------------------
# Final breadth batch: Q7-style nation-volume join, UNPIVOT,
# ntile/percent_rank, width_bucket histogram.
# ---------------------------------------------------------------------------


@_q(
    "nation_trade_volume",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS volume
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation trade volume by year — the same nation
    dim joined twice under different roles. Only the nation-role dims
    are broadcast; the fact chain (lineitem-orders-customer) stays
    shuffle-side so AQE picks the strategy by observed size — a forced
    fact broadcast would OOM executors at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count("*").alias("line_count"),
            F.sum(net).cast("double").alias("volume"),
        )
    )


@_q(
    "unpivot_daily_types",
    """
    WITH p AS (
        SELECT CAST(ts AS DATE) AS metric_date,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY 1
    )
    SELECT metric_date, event_type, events_count
    FROM p UNPIVOT (events_count FOR event_type IN (click, purchase, view))
    """,
)
def unpivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → UNPIVOT roundtrip: wide per-type counts melted back to
    long form (Spark ``unpivot`` == SQL stack)."""
    ev = read_table(spark, sf_dir, "events")
    types = ["click", "purchase", "view"]
    wide = (
        ev.groupBy(scalars.to_metric_date("ts").alias("metric_date"))
        .pivot("event_type", types)
        .count()
        .select(
            "metric_date",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
        )
    )
    return wide.unpivot(
        ids=["metric_date"],
        values=types,
        variableColumnName="event_type",
        valueColumnName="events_count",
    )


@_q(
    "order_price_ranks",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS INTEGER)        AS price_quartile,
           ROUND(percent_rank() OVER w, 6)         AS price_pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def order_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over a deterministic sort (unique
    o_orderkey tiebreak — rank functions are only portable under a
    total order)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
    )


@_q(
    "value_histogram",
    """
    SELECT CASE WHEN value < 0 THEN 0
                WHEN value >= 200 THEN 11
                ELSE CAST(FLOOR(value / 20) AS INTEGER) + 1 END AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket; the oracle spells out
    the bucket arithmetic (DuckDB 1.0 has no width_bucket) — same
    semantics: out-of-range values land in buckets 0 / n+1."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.width_bucket("value", F.lit(0), F.lit(200), F.lit(10))
        .cast("int")
        .alias("bucket")
    ).agg(F.count("*").alias("n"))


@_q(
    "quarter_hour_counts",
    """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket_start,
           COUNT(*) AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def quarter_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling: epoch-aligned 15-minute buckets via
    the batch ``window`` function (same operator the streaming marts
    use, here oracle-checked against DuckDB's time_bucket)."""
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("events_count"),
            F.sum(val).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "events_count", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# TPC-H correlated-subquery family (VERDICT r1 #5): the relational
# shapes a warehouse user hits weekly — correlated min (Q2), NOT IN
# (Q16), IN over grouped HAVING (Q20), EXISTS + NOT EXISTS self-joins
# (Q21), NOT EXISTS + scalar avg subquery (Q22). Adapted to the
# testdata star schema (no partsupp/comment/phone columns); the
# *decorrelation patterns* are the point: Catalyst rewrites each to
# the same join shape the oracle's subquery planner picks.
# ---------------------------------------------------------------------------


@_q(
    "min_cost_supplier",
    """
    SELECT l.l_partkey, p.p_brand, l.l_suppkey, s.s_name,
           l.l_extendedprice AS min_price
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 4
      AND l.l_extendedprice = (
          SELECT MIN(l2.l_extendedprice)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-per-group subquery in WHERE.

    Decorrelated the way Catalyst (and every modern planner) does it:
    a window MIN over the correlation key, then an equality filter —
    ONE shuffle on l_partkey, no self-join re-scan of the fact table.
    Ties all survive, exactly like the correlated form. Double
    equality is safe: the min is a selected value, not arithmetic.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").where(F.col("p_size") <= 4).select(
        "p_partkey", "p_brand"
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("_min_price", F.min("l_extendedprice").over(w))
        .where(F.col("l_extendedprice") == F.col("_min_price"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "l_partkey", "p_brand", "l_suppkey", "s_name",
            F.col("l_extendedprice").alias("min_price"),
        )
    )


@_q(
    "part_supplier_counts",
    """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'small%'
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN over a subquery + distinct-count agg.

    NOT IN compiles to a broadcast LEFT ANTI join (s_suppkey is a
    non-null key, so NOT IN ≡ anti join; with nullable probe columns
    you'd need the null-aware variant Catalyst plans for literal
    NOT IN). Exclusion list is dim-sized → broadcast.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        read_table(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#1") & ~F.col("p_type").like("small%"))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_supp = read_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp),
                li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "bulk_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%ol%'
        )
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 5000
    )
    """,
)
def bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN → IN-with-HAVING nesting. Inner IN is a
    broadcast semi join (part dim pre-filtered), the grouped HAVING
    is a partial-agg shuffle on l_suppkey, and the outer IN is a
    semi join against that tiny aggregate — no correlated re-scan."""
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    parts = read_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%ol%")
    ).select("p_partkey")
    heavy = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 5000)
        .select("l_suppkey")
    )
    return supp.join(
        F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi"
    )


@_q(
    "sole_late_suppliers",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      )
    GROUP BY s.s_name
    """,
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + correlated NOT EXISTS over the same
    fact self-join — "suppliers who were the ONLY late shipper on a
    multi-supplier finished order" (lateness = shipped >365 days
    after order date; testdata has no commit/receipt dates).

    Spark shape: the EXISTS is a left-semi self-join on orderkey with
    a non-equal supplier predicate; the NOT EXISTS is the same join
    left-anti with the lateness predicate folded in. Both shuffle on
    l_orderkey — the natural co-partitioning — and the dim join
    (supplier) is broadcast at the end.
    """
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # Both columns are TIMESTAMP in the testdata: timestamp + interval
    # keeps time-of-day (date_add would truncate and diverge from the
    # oracle's `+ INTERVAL 365 DAY`).
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")

    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
        F.col("l_shipdate").alias("r_shipdate"),
    )
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey")),
        "left_semi",
    )
    sole_late = exists_other.join(
        l2,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey"))
        & (F.col("r_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supp),
                       F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_q(
    "rich_idle_customers",
    """
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    GROUP BY c_nationkey
    """,
)
def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery threshold + correlated
    NOT EXISTS — above-average-balance customers with no big-ticket
    order, grouped by nation.

    The scalar subquery is a 1-row agg cross-joined (broadcast nested
    loop — free); the NOT EXISTS is a left-anti join on o_custkey
    with the price predicate pushed into the anti side's scan. AVG is
    decimal-sum→double / COUNT(*) on both engines (float-parity
    policy in the module docstring)."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("_avg")
    )
    big_orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(F.broadcast(big_orders),
              cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q15/Q8-style shapes (view + max scalar; share-of-total per year) and
# training-data selection ops: deterministic content-hash splits and
# benchmark decontamination — the selection stages of an LLM data
# pipeline that are pure relational algebra (no model in the loop).
# ---------------------------------------------------------------------------


@_q(
    "top_revenue_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue "view" consumed twice — once for the
    MAX scalar subquery, once for the equality filter. Spark shape:
    ONE aggregation (shuffle on l_suppkey), its 1-row MAX cross-joined
    back broadcast — the view is not recomputed (both consumers hang
    off the same frame; AQE reuses the exchange). Ties all survive,
    like the SQL. Equality on the decimal-sum→double revenue is exact:
    both consumers read the identical aggregated value."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(net).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "nation_share_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_3'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    GROUP BY 1
    """,
)
def nation_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: share-of-total via conditional aggregation per
    year. Both the numerator (CASE-gated) and denominator are exact
    decimal sums cast to double before the single division — the only
    float op, identical on both engines. One fact shuffle (the
    groupBy); supplier/nation broadcast."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    gated = F.when(F.col("n_name") == "NATION_3", net).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(gated).cast("double") / F.sum(net).cast("double"))
            .alias("mkt_share")
        )
    )


@_q(
    "train_val_split_counts",
    """
    WITH assigned AS (
        SELECT doc_id,
               CASE WHEN substring(md5(text), 1, 1)
                         IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs
    FROM assigned GROUP BY split
    """,
)
def train_val_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val split — the standard
    large-corpus pattern (split must be stable across re-runs and
    machines, never random()): first md5 hex nibble of the CONTENT
    buckets each doc 12/16 train, 4/16 val. Pure projection +
    aggregation; md5 is bit-identical across engines. Splitting on
    content (not doc_id) also keeps exact duplicates in the same
    split — no train/val leakage through dup pairs."""
    docs = read_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("text").cast("binary")), 1, 1)
    split = F.when(
        nibble.isin(*"0123456789ab"), F.lit("train")
    ).otherwise(F.lit("val"))
    return docs.select(split.alias("split")).groupBy("split").agg(
        F.count("*").alias("n_docs")
    )


@_q(
    "benchmark_contamination",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    bench AS (SELECT shingle FROM sh WHERE doc_id < 10),
    hits AS (
        SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS overlap
        FROM sh s JOIN (SELECT DISTINCT shingle FROM bench) b
          ON s.shingle = b.shingle
        WHERE s.doc_id >= 10
        GROUP BY s.doc_id
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM sh
        WHERE doc_id >= 10 GROUP BY doc_id
    )
    SELECT h.doc_id, h.overlap,
           ROUND(h.overlap / z.n_shingles, 4) AS contamination
    FROM hits h JOIN sizes z ON h.doc_id = z.doc_id
    WHERE h.overlap / z.n_shingles >= 0.1
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose 3-gram
    shingle overlap with a benchmark set (here: doc_id < 10) exceeds
    a contamination threshold (10% — 8 flagged docs at sf0.01, 59 at
    sf0.1: discriminating, not vacuous) — the screen every serious training
    corpus runs before training. Shape: benchmark shingles are a
    broadcast semi-joinable set (benchmarks are tiny vs the corpus);
    overlap is a distinct-count per doc, one shuffle on doc_id.
    Int/int division is exact in double for these magnitudes —
    identical in both engines."""
    docs = dedup.fan_out_narrow_input(
        read_table(spark, sf_dir, "documents")
    )
    sh = dedup.word_shingles(docs, "doc_id", "text", n=3)
    bench = (
        sh.where(F.col("doc_id") < 10)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # One pass over the exploded corpus: left-join the (distinct,
    # broadcast) benchmark shingle set as an indicator, then overlap
    # and size come from the SAME groupBy — shingles are distinct per
    # doc already (word_shingles), so count(_hit) == distinct overlap.
    # (The first cut computed hits and sizes as two aggregations over
    # two explode passes — 2x the dominant cost.)
    corpus = sh.where(F.col("doc_id") >= 10)
    agg = (
        corpus.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("overlap"),
        )
    )
    return (
        agg.where(F.col("overlap") / F.col("n_shingles") >= 0.1)
        .select(
            "doc_id",
            "overlap",
            F.round(F.col("overlap") / F.col("n_shingles"), 4)
            .alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Null-aware NOT IN (the semantics trap), GROUPING SETS, and a
# bound-checked approximate percentile — relational breadth r2.
# ---------------------------------------------------------------------------


@_q(
    "not_in_null_semantics",
    """
    SELECT 'null_poisoned' AS variant, COUNT(*) AS n
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_suppkey END
        FROM supplier
    )
    UNION ALL
    SELECT 'null_free' AS variant, COUNT(*) AS n
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
    )
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a nullable in-list — the classic three-valued-logic
    trap: ONE null in the subquery makes `x NOT IN (...)` never-true,
    so the poisoned variant counts 0 while the null-free variant
    counts real rows. Expressed through the engine's SQL surface
    (spark.sql) because this is precisely where DataFrame `left_anti`
    is WRONG — Catalyst plans a null-aware anti join
    (BroadcastNestedLoop under the hood) only from the SQL form.
    Both variants in one result so the driver check is
    discriminating, not a vacuous 0-row match."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT 'null_poisoned' AS variant, COUNT(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_suppkey END
            FROM supplier
        )
        UNION ALL
        SELECT 'null_free' AS variant, COUNT(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
        )
        """
    )


@_q(
    "status_priority_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond rollup/cube, which are its
    special cases): per-status, per-priority, and per-pair aggregates
    in one pass — Spark expands to a single Expand + hash aggregate,
    not three scans."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@_q(
    "approx_value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           TRUE AS approx_within
    FROM events
    GROUP BY event_type
    """,
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch), bound-checked like
    the HLL query: the sketch value is engine-specific, but
    |approx − exact| ≤ 2% of the per-group value RANGE is portable —
    emitted as a boolean next to the exact percentile. At 100 TB the
    sketch is the only option (exact percentile is a full sort);
    the bound is what makes it trustworthy."""
    ev = read_table(spark, sf_dir, "events")
    exact = F.expr("percentile(value, 0.5)")
    approx = F.expr("approx_percentile(value, 0.5, 10000)")
    rng = F.max("value") - F.min("value")
    return ev.groupBy("event_type").agg(
        F.round(exact, 4).alias("exact_p50"),
        (F.abs(approx - exact) <= 0.02 * rng).alias("approx_within"),
    )


# ---------------------------------------------------------------------------
# Time-series depth r2: forward fill (LOCF), RANGE window frames, and
# calendar gap detection — the ops a metrics/observability user runs
# daily that plain aggregates don't cover.
# ---------------------------------------------------------------------------


@_q(
    "user_value_ema",
    """
    WITH ordered AS (
        SELECT event_id, user_id, ts, value,
               list(value) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS vals
        FROM events
    )
    SELECT event_id, user_id, ts, value,
           list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc) AS ema
    FROM ordered
    """,
)
def user_value_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average at every event — the
    irreducibly SEQUENTIAL recurrence no window rewrite expresses
    (operators/sequential.ema_per_key): one shuffle on user_id, each
    user's ordered history folded inside one Arrow batch with the
    EXACT float expression the oracle's list_reduce lambda evaluates,
    so the hash match is bit-level with no tolerance. The oracle pays
    a quadratic prefix-list window for the same fold — affordable for
    DuckDB at sf0.01, which is precisely why the engine side uses
    applyInPandas instead."""
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    from ..operators.sequential import ema_per_key

    return ema_per_key(
        events, "user_id", ("ts", "event_id"), "value", alpha=0.5
    )


@_q(
    "forward_fill_values",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL
                           ELSE value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_filled
    FROM events
    """,
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / LOCF: error readings are gaps (NULL) carried
    over by the last observed value per user — ``last(...,
    ignorenulls=True)`` over an unbounded-preceding frame. The
    standard sensor-gap repair; one shuffle on the partition key,
    total order (ts, event_id) for determinism. Values pass through
    unfilled or copied — no arithmetic, so parity is exact."""
    ev = read_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(gap, ignorenulls=True).over(w).alias("value_filled"),
    )


@_q(
    "value_range_frame_sums",
    """
    SELECT event_id, event_type, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY event_type ORDER BY value
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS near_value_sum
    FROM events
    """,
)
def value_range_frame_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per event
    type, the sum of all values within 5 units below the current
    row's value. RANGE frames include ORDER-BY peers, so the result
    is deterministic even with duplicate values — the reason to
    prefer RANGE over ROWS when the frame is defined by the data, not
    position. Decimal window sum for cross-engine exactness."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(-5, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("near_value_sum"),
    )


@_q(
    "user_missing_days",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    eligible AS (
        SELECT user_id FROM active GROUP BY user_id HAVING COUNT(*) >= 25
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS d
    )
    SELECT e.user_id, s.d AS missing_date
    FROM eligible e CROSS JOIN spine s
    LEFT JOIN active a ON a.user_id = e.user_id AND a.d = s.d
    WHERE a.user_id IS NULL
    """,
)
def user_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap detection: for near-daily-active users (≥25
    active days in the window), which days are MISSING — a date-spine
    cross join anti-joined with observed activity. The spine is a
    tiny generated literal (broadcast); the anti join shuffles on
    (user_id, date). The canonical "find the holes" time-series op
    that pure aggregation cannot express."""
    ev = read_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    eligible = (
        active.groupBy("user_id").agg(F.count("*").alias("_days"))
        .where(F.col("_days") >= 25)
        .select("user_id")
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    return (
        eligible.crossJoin(F.broadcast(spine))
        .join(active, ["user_id", "d"], "left_anti")
        .select("user_id", F.col("d").alias("missing_date"))
    )


# ---------------------------------------------------------------------------
# Completing the TPC-H shape family. With these, every one of the 22
# TPC-H query archetypes has a representative (adapted to this schema:
# no partsupp/commitdate/shipmode columns):
#   Q1 pricing_summary, Q2 min_cost_supplier, Q3 shipping_priority,
#   Q4 order_priority_check, Q5 local_supplier_volume,
#   Q6 revenue_forecast, Q7 volume_shipping, Q8 nation_share_by_year,
#   Q9 product_type_profit, Q10 returned_item_revenue,
#   Q11 brand_value_concentration, Q12 conditional_agg (CASE-count),
#   Q13 customer_order_distribution, Q14 promo_revenue_share,
#   Q15 top_revenue_supplier, Q16 part_supplier_counts,
#   Q17 small_qty_revenue, Q18 large_volume_orders,
#   Q19 disjunctive_part_revenue, Q20 bulk_suppliers,
#   Q21 sole_late_suppliers, Q22 rich_idle_customers.
# ---------------------------------------------------------------------------


@_q(
    "order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-gated count by category → left-semi join
    then hash agg. The lineitem side is pre-filtered and projected to
    the join key only, so the semi join shuffles the minimal column
    set; the agg is partial+final on a 5-value grouping key."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_orderpriority")
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey,
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_q(
    "revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+scalar agg — the canonical
    predicate-pushdown showcase. All four predicates reach the parquet
    scan (PushedFilters); only 4 columns are read. n_lines is emitted
    alongside so a vacuous empty-filter result would be visible."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_4')
       OR (n1.n_name = 'NATION_4' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume. The
    nation table joins twice under different roles (supplier side /
    customer side) — both broadcast; the disjunctive nation-pair
    predicate lands after both joins and AQE prunes the fact side.
    orders and customer stay shuffle-side (fact-sized at scale)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation")
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_4")
    ) | (
        (F.col("supp_nation") == "NATION_4") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("_n1key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("_n2key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(net).cast("double").alias("revenue"))
    )


@_q(
    "product_type_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for a
    name-pattern part subset (no ps_supplycost in this schema, so
    profit = net revenue). part is filtered BEFORE its broadcast —
    the LIKE prunes ~1/8 of parts, and the join then prunes the fact
    scan via AQE; supplier/nation broadcast; orders stays
    shuffle-side."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount",
    )
    part = read_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(net).cast("double").alias("profit"))
    )


@_q(
    "returned_item_revenue",
    """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking — fact-fact join chain,
    group by customer, global top-20 (TakeOrderedAndProject, no full
    sort). Ties on the exact decimal-sum revenue break by c_custkey,
    so the top-20 set is deterministic on both engines."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(net).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "promo_revenue_share",
    """
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio after a dim join. Both
    sums are exact decimals cast to double; the percent division is
    the single float op (identical on both engines). part broadcasts;
    the month filter is pushed to the fact scan."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(net).cast("double")
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#7'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average → decorrelated as
    a window AVG over l_partkey (one shuffle, no self-join). Float
    safety: quantities are integer-valued doubles, so the window
    SUM/COUNT — and hence AVG — are exact in both engines regardless
    of accumulation order; the 0.5× comparison is then deterministic."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#7"
    ).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn("_avg_qty", F.avg("l_quantity").over(w))
    return (
        flagged.where(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double") / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "disjunctive_part_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    pushes the derivable single-side residuals (quantity 1-40, the
    brand/size union) below the join while keeping the cross-side
    disjunction as the join filter — the plan to check in
    EXPLAINS.md."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10) & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20) & (q <= 40)
        )
    )
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.sum(net).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Verification depth for previously rows-only surfaces (r2 cont.):
# the curation pipeline's SQL-expressible stage funnel, a planted-pair
# recall bound for simhash, and the audit last-writer-wins view over a
# deterministic literal fixture.
# ---------------------------------------------------------------------------


@_q(
    "curation_funnel",
    f"""
    WITH oq AS ({ORACLES["doc_quality"]}),
    ol AS ({ORACLES["doc_lang_id"]}),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id < 25
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
    ann AS (
        SELECT c.doc_id, oq.quality_score, ol.lang_pred,
               k.doc_id IS NOT NULL AS is_keep
        FROM corpus c
        JOIN oq ON oq.doc_id = CASE WHEN c.doc_id >= 1000000
                                    THEN c.doc_id - 1000000 ELSE c.doc_id END
        JOIN ol ON ol.doc_id = CASE WHEN c.doc_id >= 1000000
                                    THEN c.doc_id - 1000000 ELSE c.doc_id END
        LEFT JOIN keep k ON k.doc_id = c.doc_id
    )
    SELECT COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN quality_score >= 0.82 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality_pass,
           CAST(SUM(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lang_en_total,
           CAST(SUM(CASE WHEN quality_score >= 0.82 AND lang_pred = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_pass,
           CAST(SUM(CASE WHEN quality_score >= 0.82 AND lang_pred = 'en'
                         AND is_keep
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_survivors
    FROM ann
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts of the curation pipeline's
    SQL-expressible prefix (quality gate → language filter → exact
    dedup), built from the SAME building blocks `curate_corpus` chains
    (functions/text.quality_features, lang_id; operators/dedup.
    dedup_exact) — so the driver hash-checks the pipeline stages
    themselves, not a parallel reimplementation. 25 planted exact
    duplicates make the dedup stage non-vacuous at every scale (the
    raw data has natural dups only at sf0.1). Only the minhash
    near-dup stage stays rows-only (hash-family, in
    `curate_documents`). One projection + one hash shuffle (the md5
    groupBy) + one broadcast-able keep-set join: scales linearly.

    On this synthetic data every quality>=0.82 doc is also 'en', so
    the cumulative n_lang_pass alone could not catch a broken lang
    stage; n_lang_en_total checks the language axis independently."""
    docs = read_table(spark, sf_dir, "documents")
    planted = docs.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    src_id = F.when(
        F.col("doc_id") >= 1000000, F.col("doc_id") - 1000000
    ).otherwise(F.col("doc_id"))
    feats = textfn.quality_features(docs, "doc_id", "text").select(
        F.col("doc_id").alias("_fid"), "quality_score"
    )
    keep = dedup.dedup_exact(corpus, ["text"], "doc_id").select(
        F.col("keep_doc_id").alias("_kid"), F.lit(True).alias("_is_keep")
    )
    ann = (
        corpus.withColumn("_sid", src_id)
        .join(feats, F.col("_sid") == F.col("_fid"))
        .withColumn("lang_pred", textfn.lang_id("text"))
        .join(keep, F.col("doc_id") == F.col("_kid"), "left")
        .withColumn("_is_keep", F.coalesce("_is_keep", F.lit(False)))
    )
    q_pass = F.col("quality_score") >= 0.82
    l_pass = q_pass & (F.col("lang_pred") == "en")
    one = F.lit(1)
    zero = F.lit(0)
    return ann.agg(
        F.count("*").alias("n_input"),
        F.sum(F.when(q_pass, one).otherwise(zero)).alias("n_quality_pass"),
        F.sum(F.when(F.col("lang_pred") == "en", one).otherwise(zero)).alias(
            "n_lang_en_total"
        ),
        F.sum(F.when(l_pass, one).otherwise(zero)).alias("n_lang_pass"),
        F.sum(F.when(l_pass & F.col("_is_keep"), one).otherwise(zero)).alias(
            "n_exact_survivors"
        ),
    )


@_q(
    "simhash_planted_recall",
    """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id < 25
    ),
    h AS (SELECT doc_id, md5(text) AS hh FROM corpus)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, TRUE AS found
    FROM h a JOIN h b ON a.hh = b.hh AND a.doc_id < b.doc_id
    """,
)
def simhash_planted_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall bound for the simhash pipeline (NOTES_r2 candidate):
    every identical-content pair (25 planted + any natural md5 dups)
    MUST surface from simhash_near_pairs — identical text ⇒ identical
    fingerprint ⇒ hamming 0, and the pigeonhole blocking ALWAYS emits
    a hamming-0 pair (all chunks agree). The oracle enumerates the
    expected pair set relationally; extra near-pairs the hash family
    finds are out of scope (that direction is data-dependent, pinned
    by tests/test_dedup_similarity.py). Keeps `doc_simhash_pairs`
    rows-only for the unbounded variant."""
    docs = read_table(spark, sf_dir, "documents")
    planted = docs.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    hashed = corpus.select("doc_id", F.md5("text").alias("_h"))
    a = hashed.select(F.col("doc_id").alias("doc_a"), F.col("_h"))
    b = hashed.select(F.col("doc_id").alias("doc_b"), F.col("_h"))
    expected = a.join(b, "_h").where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b"
    )
    found = dedup.simhash_near_pairs(
        corpus, "doc_id", "text", max_hamming=0, blocks=4
    ).select("doc_a", "doc_b", F.lit(True).alias("_found"))
    return expected.join(found, ["doc_a", "doc_b"], "left").select(
        "doc_a", "doc_b", F.coalesce("_found", F.lit(False)).alias("found")
    )


@_q(
    "audit_current_state",
    """
    WITH raw(run_id, phase, started_at, finished_at, status,
             rows_copied, error_message) AS (
        VALUES
        ('r1', 'load',  TIMESTAMP '2024-01-01 10:00:00',
         CAST(NULL AS TIMESTAMP), 'running',
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
        ('r1', 'load',  TIMESTAMP '2024-01-01 10:00:00',
         TIMESTAMP '2024-01-01 10:05:00', 'success',
         CAST(100 AS BIGINT), CAST(NULL AS VARCHAR)),
        ('r2', 'merge', TIMESTAMP '2024-01-01 11:00:00',
         CAST(NULL AS TIMESTAMP), 'running',
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
        ('r2', 'merge', TIMESTAMP '2024-01-01 11:00:00',
         TIMESTAMP '2024-01-01 11:02:00', 'failed',
         CAST(NULL AS BIGINT), 'boom'),
        ('r3', 'mart',  TIMESTAMP '2024-01-01 12:00:00',
         CAST(NULL AS TIMESTAMP), 'running',
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR))
    )
    SELECT run_id, phase, started_at, finished_at, status,
           rows_copied, error_message
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY run_id
            ORDER BY finished_at DESC NULLS LAST, status DESC) AS rn
        FROM raw
    ) t WHERE rn = 1
    """,
)
def audit_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit log's last-writer-wins view (K5) over a deterministic
    literal fixture: a finished run (success), a failed run, and an
    in-flight run. Exercises audit.latest_state — the exact window the
    production view uses — against a relational oracle (NOTES_r2
    candidate). sf-independent by design: the contract under test is
    the state-resolution semantics, not table contents."""
    import datetime as dt

    from .. import audit as auditmod

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        ("r1", "load", dt.datetime(2024, 1, 1, 10, 0), None, "running",
         None, None),
        ("r1", "load", dt.datetime(2024, 1, 1, 10, 0),
         dt.datetime(2024, 1, 1, 10, 5), "success", 100, None),
        ("r2", "merge", dt.datetime(2024, 1, 1, 11, 0), None, "running",
         None, None),
        ("r2", "merge", dt.datetime(2024, 1, 1, 11, 0),
         dt.datetime(2024, 1, 1, 11, 2), "failed", None, "boom"),
        ("r3", "mart", dt.datetime(2024, 1, 1, 12, 0), None, "running",
         None, None),
    ]
    schema = (
        "run_id string, phase string, started_at timestamp, "
        "finished_at timestamp, status string, rows_copied long, "
        "error_message string"
    )
    raw = spark.createDataFrame(rows, schema=schema)
    return auditmod.latest_state(raw)


# ---------------------------------------------------------------------------
# Training-data preparation ops, continued: chunking long documents
# into overlapping context windows, sharding a corpus into
# ~fixed-token-budget files, deterministic stratified / fixed-k
# sampling, and PII redaction. All are pure projections or single
# window/shuffle plans — the shapes a 100 TB pretraining pipeline
# runs daily.
# ---------------------------------------------------------------------------


@_q(
    "doc_chunking",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) / 40 AS INTEGER) AS chunk_idx,
           array_to_string(w[start:start + 49], ' ') AS chunk_text,
           CAST(least(50, len(w) - start + 1) AS INTEGER) AS n_chunk_tokens
    FROM toks, unnest(generate_series(1, len(w), 40)) AS t(start)
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into 50-token
    windows with stride 40 (10-token overlap) — the standard
    long-document → context-window preprocessing step. Pure
    projection: tokenize once, explode a generated start-offset
    sequence, slice. No shuffle at all; scales embarrassingly."""
    docs = read_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    toks = docs.select("doc_id", w.alias("w"))
    return (
        toks.where(F.size("w") > 0)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w"), F.lit(40))
            ).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / 40).cast("int").alias("chunk_idx"),
            F.array_join(F.slice("w", F.col("start"), 50), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(50), F.size("w") - F.col("start") + 1)
            .cast("int")
            .alias("n_chunk_tokens"),
        )
    )


@_q(
    "pack_token_budget",
    r"""
    WITH toks AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                   AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS running
        FROM toks
    )
    SELECT CAST((running - 1) // 2000 AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY 1
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus sharding by token budget: assign docs (in stable doc_id
    order) to ~2000-BPE-token shards via a running token sum — how a
    pretraining exporter cuts a corpus into fixed-budget files.

    r4: the running sum is the HIERARCHICAL prefix sum
    (operators/prefix.py) — range-partition on doc_id, per-partition
    local cumsums, cumulative offsets broadcast back — replacing the
    r2 single-partition window that funneled the whole corpus through
    one task (the trade-off r2 documented; now closed). Same algebra,
    same oracle, no single-task bottleneck at 100 TB."""
    from ..operators.prefix import prefix_sum

    docs = read_table(spark, sf_dir, "documents")
    n_tok = textfn.token_count_bpe_ish("text")
    cum = prefix_sum(
        docs.select("doc_id", n_tok.alias("n_tok")),
        order_col="doc_id",
        value_col="n_tok",
        out_col="running",
    )
    return (
        cum.groupBy(
            F.floor((F.col("running") - 1) / 2000).cast("long").alias(
                "shard_id"
            )
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@_q(
    "stratified_sample_counts",
    """
    WITH flagged AS (
        SELECT lang,
               substring(md5(text), 1, 2) <
                   CASE WHEN lang = 'en' THEN '80' ELSE '40' END AS sampled
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled
    FROM flagged
    GROUP BY lang
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates
    (50% en, 25% others) decided by a content-hash threshold — the
    reproducible, cluster-order-independent way to downsample a
    corpus (same doc always gets the same verdict; no RNG state per
    task). Lexicographic compare of the md5 hex prefix == numeric
    compare of the first byte. Pure projection + one small agg."""
    docs = read_table(spark, sf_dir, "documents")
    thresh = F.when(F.col("lang") == "en", F.lit("80")).otherwise(F.lit("40"))
    sampled = F.substring(F.md5("text"), 1, 2) < thresh
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("long").alias("n_sampled"),
    )


@_q(
    "sample_k_per_group",
    """
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rnk
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents
    ) t WHERE rn <= 10
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample: exactly k=10 docs per language,
    chosen by content-hash order — a deterministic stand-in for
    uniform without-replacement sampling (hash order is
    pseudo-random but reproducible across runs/engines). One shuffle
    on the stratum key; rank truncation prunes early via the window
    TopK optimization."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), F.col("doc_id"))
    return (
        docs.select(
            "doc_id", "lang", F.row_number().over(w).alias("rnk")
        )
        .where(F.col("rnk") <= 10)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


@_q(
    "pii_redaction",
    r"""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                         || '@example.com or admin@test.org'
                    ELSE text END AS text2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               text2, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+')) AS INTEGER)
               AS n_emails,
           md5(regexp_replace(text2, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+',
                              '[EMAIL]', 'g')) AS redacted_md5
    FROM planted
    WHERE doc_id % 7 = 0
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: find + mask email addresses, the privacy pass
    every training corpus needs. The synthetic corpus contains no
    natural emails, so the query plants deterministic ones on every
    7th doc and verifies detection count AND the redacted output
    (by md5) — i.e. both the matcher and the replacement are
    hash-checked. The regex sticks to the Java∩RE2 common subset so
    both engines match identically. Pure projection."""
    docs = read_table(spark, sf_dir, "documents")
    pat = "[A-Za-z0-9_.]+@[A-Za-z0-9.]+"
    text2 = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or admin@test.org"),
        ),
    ).otherwise(F.col("text"))
    return (
        docs.select("doc_id", text2.alias("text2"))
        .where(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            F.regexp_count("text2", F.lit(pat)).cast("int").alias("n_emails"),
            F.md5(F.regexp_replace("text2", pat, "[EMAIL]")).alias(
                "redacted_md5"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Skew-resistant join, time-series interpolation, embedding
# quantization (r2 cont.).
# ---------------------------------------------------------------------------


@_q(
    "salted_event_enrichment",
    """
    WITH dim AS (
        SELECT user_id, MIN(ts) AS first_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, d.first_signup
    FROM events e JOIN dim d ON e.user_id = d.user_id
    """,
)
def salted_event_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant enrichment via operators/joins.salted_join: the
    oracle is the PLAIN join — salting must be invisible in the
    result (it only respreads rows), and the driver hash-check proves
    exactly that. The dim side (first-signup per user) is replicated
    salt_buckets×; each hot user's events spread over 8 sub-keys.
    (This synthetic events table is only mildly skewed; the operator
    is the point — the mechanism a 100 TB job reaches for when one
    key holds 5% of the fact table and AQE's split can't kick in.)"""
    from ..operators.joins import salted_join

    ev = read_table(spark, sf_dir, "events")
    dim = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    out = salted_join(
        ev.select("event_id", "user_id", "event_type"),
        dim,
        key="user_id",
        salt_buckets=8,
    )
    return out.select("event_id", "user_id", "event_type", "first_signup")


@_q(
    "interpolate_missing_values",
    """
    WITH planted AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    framed AS (
        SELECT event_id, user_id, ts, v,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_t,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_t
        FROM planted
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
                      * (CAST(epoch_us(ts) - prev_t AS DOUBLE)
                         / CAST(next_t - prev_t AS DOUBLE))
             WHEN prev_v IS NOT NULL THEN prev_v
             ELSE next_v
           END AS v_interp
    FROM framed
    WHERE v IS NULL
    """,
)
def interpolate_missing_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor values — the time-series
    repair op LOCF (forward_fill_values) cannot express: each gap is
    filled proportionally between its nearest non-null neighbors in
    event time, falling back to one-sided fill at series edges. NULLs
    are planted deterministically (every 5th event) since the
    synthetic table has none.

    Spark shape: one shuffle on user_id; four window functions over
    the same (user_id, ts) sort — Catalyst shares a single Sort for
    all frames. Microsecond epochs keep the time fractions exact
    integers before ONE double division (engine-identical)."""
    ev = read_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("value")
    )
    # Spark 4.1 rejects unix_micros on TIMESTAMP_NTZ; the session TZ is
    # pinned UTC, so the cast to TIMESTAMP is value-preserving.
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    back = base.rowsBetween(Window.unboundedPreceding, -1)
    fwd = base.rowsBetween(1, Window.unboundedFollowing)
    planted = ev.select("event_id", "user_id", "ts", v.alias("v"))
    t_known = F.when(F.col("v").isNotNull(), t_us)
    framed = planted.select(
        "event_id", "user_id", "ts", "v",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.last(t_known, ignorenulls=True).over(back).alias("prev_t"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(t_known, ignorenulls=True).over(fwd).alias("next_t"),
    )
    frac = (t_us - F.col("prev_t")).cast("double") / (
        F.col("next_t") - F.col("prev_t")
    ).cast("double")
    interp = (
        F.when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
        )
        .when(F.col("prev_v").isNotNull(), F.col("prev_v"))
        .otherwise(F.col("next_v"))
    )
    return framed.where(F.col("v").isNull()).select(
        "event_id", "user_id", "ts", interp.alias("v_interp")
    )


@_q(
    "quantize_embeddings_int8",
    """
    WITH scaled AS (
        SELECT vec_id,
               CAST(list_aggregate(list_transform(embedding, y -> abs(y)),
                                   'max') AS DOUBLE) AS max_abs,
               embedding
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, max_abs,
               CASE WHEN max_abs > 0 THEN
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / max_abs * 127
                                       + 0.5) AS INTEGER))
               END AS qvec
        FROM scaled
    )
    SELECT vec_id, max_abs,
           CAST(list_aggregate(qvec, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(qvec, 'min') AS INTEGER) AS q_min,
           CAST(list_aggregate(qvec, 'max') AS INTEGER) AS q_max
    FROM q
    """,
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step before an ANN index ships to serving. Per-vector
    max-abs scale, halfway-up rounding via floor(x·s + 0.5) (spelled
    out so both engines agree; built-in round() differs: Spark
    half-even vs DuckDB half-away). All elementwise double ops in
    identical order → bit parity without any rounding fudge. Pure
    projection, zero shuffle; the checksums (sum/min/max of the
    quantized vector) make the driver hash cover every component."""
    emb = read_table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(
        F.transform("embedding", lambda x: F.abs(x))
    ).cast("double")
    scaled = emb.select("vec_id", max_abs.alias("max_abs"), "embedding")
    qvec = F.when(
        F.col("max_abs") > 0,
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") / F.col("max_abs") * 127 + F.lit(0.5)
            ).cast("int"),
        ),
    )
    q = scaled.select("vec_id", "max_abs", qvec.alias("qvec"))
    return q.select(
        "vec_id",
        "max_abs",
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.array_min("qvec").alias("q_min"),
        F.array_max("qvec").alias("q_max"),
    )


# ---------------------------------------------------------------------------
# Curation depth (round 2 continuation): the connected-components
# operator becomes DRIVER-CHECKABLE here — DuckDB reproduces the
# min-label clustering with a recursive CTE over the same exact
# bigram-Jaccard pair set, so the iterative DataFrame algebra in
# operators/graph.py is hash-compared end to end, not just
# pytest-pinned. On top of it: quality-ranked cluster representatives,
# Gopher-style repetition signals, deterministic weighted sampling
# (Efraimidis–Spirakis), and a simhash↔Jaccard consistency bound.
# ---------------------------------------------------------------------------

# Exact 3-gram Jaccard ≥ 0.5 near-dup pairs (doc_a, doc_b) — the
# selective pair set the cluster queries build on. Trigram shingles
# keep the inverted-index join proportional to true near-duplication
# (bigrams over this testdata's 31-word vocabulary collide broadly:
# the same clusters cost ~8× more to generate).
def _jaccard_pairs_sql(src: str = "documents", threshold: float = 0.5) -> str:
    """Exact 3-gram-Jaccard ≥ threshold pair SQL over any (doc_id,
    text) relation — the DuckDB twin of ``dedup.jaccard_pairs(n=3)``.
    Parameterized so composed oracles (``curate_documents``) can run
    the same pair join over an already-filtered pool CTE."""
    return rf"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x <> '') AS w
            FROM {src}
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(w[1:len(w) - 2],
                          (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                       AS shingle
            FROM toks
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh
                  GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON inter.doc_a = sa.doc_id
        JOIN sizes sb ON inter.doc_b = sb.doc_id
        WHERE inter / (sa.set_size + sb.set_size - inter) >= {threshold}
"""


_TRUE_PAIRS_3G_05 = _jaccard_pairs_sql("documents", 0.5)

# Recursive-CTE connected components over a CTE named `pairs`
# (doc_a, doc_b): min reachable id per vertex == the min-label
# fixpoint computed by graph.connected_components. Clusters here are
# small near-dup cliques, so the reachability set stays tiny.
# MATERIALIZED is load-bearing: without it DuckDB re-evaluates the
# (expensive) pairs pipeline inside every recursive iteration
# (measured 75s → 1.8s at sf0.1).
_CC_BY_RECURSIVE_CTE = """
    sym AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    verts AS (SELECT u AS vx FROM sym UNION SELECT v FROM sym),
    reach(vx, r) AS (
        SELECT vx, vx FROM verts
        UNION
        SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.vx
    ),
    cc AS (SELECT vx AS vertex, MIN(r) AS component FROM reach GROUP BY vx)
"""

# Composed oracle for `curate_documents` (declared earlier, before
# these shared fragments existed): re-runs every pipeline stage in
# SQL over the same parquet — per-doc quality/lang/token/fingerprint
# (the already-green stage oracles, reused verbatim), the min-id exact
# keep-set over the FULL corpus (the pipeline computes exact dups
# before the quality gate's pool), the exact 3-gram-Jaccard >= 0.5
# pair join restricted to the post-gate pool, and the recursive-CTE
# transitive closure with min-id representatives.
ORACLES["curate_documents"] = f"""
    WITH RECURSIVE
    q AS MATERIALIZED ({ORACLES["doc_quality"]}),
    l AS ({ORACLES["doc_lang_id"]}),
    tk AS ({ORACLES["doc_tokens"]}),
    fp AS ({ORACLES["doc_fingerprint"]}),
    exact_keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    pool AS MATERIALIZED (
        SELECT d.doc_id, d.text
        FROM documents d
        JOIN q ON d.doc_id = q.doc_id
        JOIN exact_keep k ON d.doc_id = k.doc_id
        WHERE q.quality_score >= 0.3
    ),
    pairs AS MATERIALIZED ({_jaccard_pairs_sql("pool", 0.5)}),
    {_CC_BY_RECURSIVE_CTE},
    drops AS (SELECT vertex FROM cc WHERE vertex <> component)
    SELECT p.doc_id, q.quality_score, l.lang_pred, tk.n_tokens_bpe,
           fp.fingerprint
    FROM pool p
    JOIN q  ON p.doc_id = q.doc_id
    JOIN l  ON p.doc_id = l.doc_id
    JOIN tk ON p.doc_id = tk.doc_id
    JOIN fp ON p.doc_id = fp.doc_id
    LEFT JOIN drops dr ON p.doc_id = dr.vertex
    WHERE dr.vertex IS NULL
"""


@_q(
    "near_dup_clusters",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_TRUE_PAIRS_3G_05}),
    {_CC_BY_RECURSIVE_CTE}
    SELECT vertex, component FROM cc
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over exact 3-gram-Jaccard ≥ 0.5
    pairs: (vertex, component) with component = min reachable doc_id.
    Exercises graph.connected_components (iterated min-label
    propagation, localCheckpoint per round) against a DuckDB
    recursive-CTE oracle — the first driver-green row for the
    iterative operator family. O(diameter) rounds of join+agg; the
    candidate pair set is the output of the inverted-index join, so
    nothing here is all-pairs."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return graph.connected_components(pairs).select("vertex", "component")


@_q(
    "near_dup_triangles",
    f"""
    WITH pairs AS MATERIALIZED ({_TRUE_PAIRS_3G_05}),
    und AS (
        SELECT DISTINCT least(doc_a, doc_b) AS u,
                        greatest(doc_a, doc_b) AS v
        FROM pairs WHERE doc_a <> doc_b
    ),
    deg AS (
        SELECT vertex, COUNT(*) AS degree FROM (
            SELECT u AS vertex FROM und
            UNION ALL
            SELECT v AS vertex FROM und
        ) GROUP BY vertex
    ),
    tris AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM und e1
        JOIN und e2 ON e1.v = e2.u
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tpv AS (
        SELECT vertex, COUNT(*) AS triangles FROM (
            SELECT x AS vertex FROM tris
            UNION ALL SELECT y FROM tris
            UNION ALL SELECT z FROM tris
        ) GROUP BY vertex
    )
    SELECT deg.vertex, deg.degree,
           COALESCE(tpv.triangles, 0) AS triangles,
           ROUND(CASE WHEN deg.degree > 1
                      THEN 2.0 * COALESCE(tpv.triangles, 0)
                           / (deg.degree * (deg.degree - 1))
                      ELSE 0.0 END, 4) AS clustering
    FROM deg LEFT JOIN tpv ON deg.vertex = tpv.vertex
    """,
)
def near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle census of the near-dup candidate graph
    (graph.triangle_stats): degree, triangle participation, local
    clustering coefficient. High-clustering vertices sit in genuine
    duplicate cliques; high-degree/low-clustering vertices are
    boilerplate-style bridges worth re-scoring. Spark enumerates via
    the degree-ordered orientation (each out-neighborhood O(√m), skew
    immune — the Suri–Vassilvitskii shape); the oracle counts the
    same triangles from the unoriented u<v<w join, so the hash match
    is algorithm-independent. 47 vertices / 1 triangle at sf0.01,
    477 / 13 at sf0.1 (measured)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return graph.triangle_stats(pairs)


@_q(
    "value_drift_weekly",
    """
    WITH hist AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
               CAST(LEAST(GREATEST(FLOOR(value / 10), 0), 11) AS INTEGER)
                   AS bucket,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    paired AS (
        SELECT CAST(COALESCE(c.week_start, p.week_start + INTERVAL 7 DAY)
                    AS DATE) AS week_start,
               COALESCE(c.n, 0) AS n_curr,
               COALESCE(p.n, 0) AS n_prev
        FROM hist c
        FULL OUTER JOIN hist p
          ON c.week_start = p.week_start + INTERVAL 7 DAY
         AND c.bucket = p.bucket
        WHERE COALESCE(c.week_start, p.week_start + INTERVAL 7 DAY)
              IN (SELECT week_start FROM hist)
          AND COALESCE(c.week_start - INTERVAL 7 DAY, p.week_start)
              IN (SELECT week_start FROM hist)
    )
    SELECT week_start,
           CAST(SUM(ABS(n_curr - n_prev)) AS BIGINT) AS l1_distance,
           CAST(SUM(n_curr) AS BIGINT) AS n_events
    FROM paired
    GROUP BY week_start
    """,
)
def value_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (data-quality op): fixed-bucket
    value histograms per week, L1 distance between each week and the
    previous — the pipeline tripwire for "the upstream changed units/
    semantics". All-integer (bucket counts and absolute differences),
    so the hash match is exact. Weeks with no predecessor in the data
    are excluded on BOTH sides (the full-outer join otherwise invents
    a comparison against an empty histogram). Plan: one grouped agg
    (map-side partial), then a self-join of the tiny (week, bucket)
    histogram table — the drift stage costs O(weeks × buckets),
    independent of event count."""
    ev = read_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.least(
            F.greatest(F.floor(F.col("value") / 10), F.lit(0)), F.lit(11)
        ).cast("int").alias("bucket"),
    ).agg(F.count("*").alias("n"))
    weeks = hist.select("week_start").distinct()
    c = hist.select(
        F.col("week_start").alias("_wc"), "bucket", F.col("n").alias("n_curr")
    )
    p = hist.select(
        F.date_add("week_start", 7).alias("_wp"),
        "bucket",
        F.col("n").alias("n_prev"),
    )
    paired = (
        c.join(
            p, (F.col("_wc") == F.col("_wp")) & (c.bucket == p.bucket), "full"
        )
        .select(
            F.coalesce("_wc", "_wp").alias("week_start"),
            F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
        )
        .join(F.broadcast(weeks), "week_start", "left_semi")
        .join(
            F.broadcast(
                weeks.select(F.date_add("week_start", 7).alias("week_start"))
            ),
            "week_start",
            "left_semi",
        )
    )
    return paired.groupBy("week_start").agg(
        F.sum(F.abs(F.col("n_curr") - F.col("n_prev"))).alias("l1_distance"),
        F.sum("n_curr").alias("n_events"),
    )


@_q(
    "orders_version_diff",
    """
    WITH oldv AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ),
    newv AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 101 <> 0
        UNION ALL
        SELECT o_orderkey + 900000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 103 = 0
    ),
    j AS (
        SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
               o.o_totalprice AS op, n.o_totalprice AS np,
               o.o_orderstatus AS os, n.o_orderstatus AS ns
        FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
    )
    SELECT 'inserted' AS metric, COUNT(*) AS n FROM j WHERE ok IS NULL
    UNION ALL
    SELECT 'deleted', COUNT(*) FROM j WHERE nk IS NULL
    UNION ALL
    SELECT 'updated', COUNT(*) FROM j
    WHERE ok IS NOT NULL AND nk IS NOT NULL
      AND (op IS DISTINCT FROM np OR os IS DISTINCT FROM ns)
    UNION ALL
    SELECT 'unchanged', COUNT(*) FROM j
    WHERE ok IS NOT NULL AND nk IS NOT NULL
      AND op IS NOT DISTINCT FROM np AND os IS NOT DISTINCT FROM ns
    UNION ALL
    SELECT 'col:o_totalprice', COUNT(*) FROM j
    WHERE ok IS NOT NULL AND nk IS NOT NULL AND op IS DISTINCT FROM np
    UNION ALL
    SELECT 'col:o_orderstatus', COUNT(*) FROM j
    WHERE ok IS NOT NULL AND nk IS NOT NULL AND os IS DISTINCT FROM ns
    """,
)
def orders_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data reconciliation (Datafold-style diff) between two versions
    of a keyed table — the post-backfill "what actually changed"
    report (operators/diff.py). The second version is planted
    deterministically in BOTH engines: ~1% of keys deleted (%101),
    ~1% price-shifted (%97), ~1% inserted under offset keys (%103).
    ONE full-outer shuffle join on the key + one aggregation; output
    is O(columns) metric rows, all integer counts. Complements the
    MERGE operator: merge APPLIES changes, diff EXPLAINS them."""
    from ..operators.diff import diff_report

    orders = read_table(spark, sf_dir, "orders")
    oldv = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    newv = (
        oldv.where(F.col("o_orderkey") % 101 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 10
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            oldv.where(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return diff_report(oldv, newv, keys=["o_orderkey"])


@_q(
    "shipping_lag_stats",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           MIN(datediff('day', o.o_orderdate, l.l_shipdate)) AS min_lag_days,
           MAX(datediff('day', o.o_orderdate, l.l_shipdate)) AS max_lag_days,
           CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS total_lag_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def shipping_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority (the ops question
    behind TPC-H Q4/Q12's lateness predicates, as a statistic instead
    of a filter): integer day arithmetic only — count/min/max/total of
    DATEDIFF — so the grouped row hash is exact. Fact-fact join on
    l_orderkey with both scans pruned to three columns; lag days are
    computed post-join (they need both sides), then one partial/final
    agg on the 5-value priority key."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.min(lag).alias("min_lag_days"),
            F.max(lag).alias("max_lag_days"),
            F.sum(lag).alias("total_lag_days"),
        )
    )


@_q(
    "customer_revenue_pareto",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS revenue_cents
        FROM orders GROUP BY o_custkey
    ),
    run AS (
        SELECT o_custkey, revenue_cents,
               CAST(SUM(revenue_cents)
                    OVER (ORDER BY revenue_cents DESC, o_custkey)
                    AS BIGINT) AS running_cents,
               CAST(SUM(revenue_cents) OVER () AS BIGINT) AS total_cents
        FROM per
    )
    SELECT o_custkey, revenue_cents, running_cents,
           running_cents / total_cents          AS cum_share,
           running_cents / total_cents <= 0.8   AS in_top80
    FROM run
    """,
)
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (cumulative-share) analysis: customers ranked by
    revenue, running share of total, 80%-tier flag — the classic
    concentration query whose naive form is a GLOBAL ORDER BY + full-
    data window. Here the running sum is the hierarchical prefix sum
    (operators/prefix.py) over exact integer CENTS (decimal sum ×100
    → int64: cumsum is order-exact, and the final share division is
    the same int64/int64 → double on both engines — no float-sum
    drift anywhere). Only the 1-row grand total crosses as a
    broadcast; no data-sized SinglePartition window."""
    from ..operators.prefix import prefix_sum

    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
        ).cast("bigint").alias("revenue_cents")
    ).withColumn("_rev", F.col("revenue_cents"))
    cum = prefix_sum(
        per,
        order_col=["revenue_cents", "o_custkey"],
        value_col="_rev",
        out_col="running_cents",
        descending=[True, False],
    )
    total = cum.agg(F.sum("_rev").alias("_total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "revenue_cents",
            "running_cents",
            (F.col("running_cents") / F.col("_total")).alias("cum_share"),
            (F.col("running_cents") / F.col("_total") <= 0.8).alias("in_top80"),
        )
    )


@_q(
    "source_dup_matrix",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b,
               ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS j
        FROM inter
        JOIN sizes sa ON inter.doc_a = sa.doc_id
        JOIN sizes sb ON inter.doc_b = sb.doc_id
        WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    )
    SELECT least(da.source, db.source)    AS src_a,
           greatest(da.source, db.source) AS src_b,
           COUNT(*)                       AS n_pairs,
           MIN(j)                         AS min_jaccard,
           MAX(j)                         AS max_jaccard
    FROM pairs
    JOIN documents da ON pairs.doc_a = da.doc_id
    JOIN documents db ON pairs.doc_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — provenance analytics over the
    near-dup pair set: which source pairs share content, how much,
    and how close (n_pairs + min/max Jaccard; no float SUMS — counts
    and extrema of bit-identical doubles keep the row hash exact).
    The mirror-site / scraped-twice signal a crawl curation pipeline
    acts on before dedup weights sampling. Plan: the (small) pair set
    joins the doc→source projection twice, then one grouped agg on
    the unordered source pair."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")),
            "doc_b",
        )
    )
    return (
        labeled.select(
            F.least("_sa", "_sb").alias("src_a"),
            F.greatest("_sa", "_sb").alias("src_b"),
            "jaccard",
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


@_q(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_TRUE_PAIRS_3G_05}),
    {_CC_BY_RECURSIVE_CTE},
    member AS (
        SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
        FROM documents d LEFT JOIN cc ON cc.vertex = d.doc_id
    )
    SELECT doc_id, component,
           CASE WHEN substring(md5(CAST(component AS VARCHAR)), 1, 1)
                     IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                THEN 'train' ELSE 'val' END AS split
    FROM member
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val split: the whole NEAR-dup cluster lands
    in one split. Content-hash splitting (`train_val_split_counts`)
    already pins exact duplicates together, but near-duplicates hash
    differently — a paraphrased doc in train with its twin in val is
    eval contamination. Assignment hashes the cluster REPRESENTATIVE
    id (min reachable doc_id from connected components), so split
    membership is a cluster property by construction; singleton docs
    are their own cluster. One CC pass + a broadcast-able join of the
    (small) paired-vertex set; the split itself is a projection."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    cc = graph.connected_components(pairs).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("_comp")
    )
    member = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("_comp", "doc_id").alias("component")
    )
    nibble = F.substring(
        F.md5(F.col("component").cast("string").cast("binary")), 1, 1
    )
    return member.select(
        "doc_id",
        "component",
        F.when(nibble.isin(*"0123456789ab"), F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )


@_q(
    "cluster_keep_best",
    f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_TRUE_PAIRS_3G_05}),
    {_CC_BY_RECURSIVE_CTE},
    q AS ({ORACLES["doc_quality"]})
    SELECT cc.vertex AS doc_id, cc.component, q.quality_score,
           (ROW_NUMBER() OVER (PARTITION BY cc.component
                               ORDER BY q.quality_score DESC, cc.vertex)
            = 1) AS is_rep
    FROM cc JOIN q ON q.doc_id = cc.vertex
    """,
)
def cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked representative per near-dup cluster
    (graph.keep_best_per_cluster): the doc with the highest
    quality_score survives, ties → lowest doc_id. This is the keep
    policy a real curation pipeline wants (duplicates differ by
    truncation/boilerplate); ordering compares the ROUNDED score so
    both engines rank identically."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    cc = graph.connected_components(pairs)
    scores = textfn.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    return graph.keep_best_per_cluster(cc, scores)


@_q(
    "doc_repetition",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    uni AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(w) AS g FROM toks) t
        GROUP BY doc_id, g
    ),
    uni_f AS (
        SELECT doc_id, SUM(c) AS total, MAX(c) AS top,
               COUNT(*) AS n_distinct
        FROM uni GROUP BY doc_id
    ),
    bi AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(w[1:len(w) - 1],
                          (x, i) -> x || ' ' || w[i + 1])) AS g
            FROM toks
        ) t
        GROUP BY doc_id, g
    ),
    bi_f AS (
        SELECT doc_id, SUM(c) AS total, MAX(c) AS top FROM bi
        GROUP BY doc_id
    )
    SELECT u.doc_id, CAST(u.total AS INTEGER) AS n_tokens,
           ROUND(CASE WHEN u.total > 0 THEN u.top / u.total
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS top_unigram_frac,
           COALESCE(ROUND(CASE WHEN b.total > 0 THEN b.top / b.total
                               ELSE CAST(0.0 AS DOUBLE) END, 4),
                    CAST(0.0 AS DOUBLE)) AS top_bigram_frac,
           ROUND(CASE WHEN u.total > 0 THEN u.n_distinct / u.total
                      ELSE CAST(0.0 AS DOUBLE) END, 4) AS distinct_ratio
    FROM uni_f u LEFT JOIN bi_f b ON u.doc_id = b.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-unigram / top-bigram token
    fraction + distinct-token ratio per doc
    (functions/text.repetition_features). Boilerplate and degenerate
    generations light up these signals; they complement quality_score
    (which sees ratios, not repetition)."""
    docs = read_table(spark, sf_dir, "documents")
    return textfn.repetition_features(docs, "doc_id", "text")


@_q(
    "weighted_doc_sample",
    r"""
    WITH keyed AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x <> '')) AS n_tokens,
               ln((CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) + 1)
                  / 4294967296.0)
                   / len(list_filter(string_split_regex(lower(trim(text)),
                                                        '\s+'),
                                     x -> x <> '')) AS k
        FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS INTEGER)
               AS rnk
    FROM keyed
    ORDER BY rnk
    LIMIT 20
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): key = ln(u)/w with u a content-hash
    uniform in (0,1] and w = token count; the top-k keys ARE a
    w-weighted sample. Hash-derived u (md5 first 8 hex chars) makes
    the draw reproducible across runs, engines, and partitionings —
    the only sane way to sample a 100 TB corpus (rand() differs per
    task attempt). Emits integer columns only; the float key is
    internal. Plan: pure projection + TakeOrderedAndProject top-k —
    no global sort."""
    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(dedup.tokens("text"))
    u = (
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)
    key = F.log(u) / n_tok
    return (
        docs.select(
            "doc_id",
            n_tok.cast("int").alias("n_tokens"),
            key.alias("_k"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("_k"), F.col("doc_id"))
            ).cast("int"),
        )
        .where(F.col("rnk") <= 20)
        .drop("_k")
    )


@_q(
    "simhash_jaccard_consistency",
    rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.set_size + sb.set_size - inter), 4) AS jaccard,
           TRUE AS hamming_ok
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE inter / (sa.set_size + sb.set_size - inter) >= 0.5
    """,
)
def simhash_jaccard_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash is only useful if similar docs land at small Hamming
    distance; this pins that contract where the driver can see it:
    every TRUE 3-gram-Jaccard ≥ 0.5 pair must have 64-bit simhash
    Hamming ≤ 16. Measured headroom on the deterministic testdata:
    max observed Hamming is 5 (sf0.01), 9 (sf0.001), 12 (sf0.1) —
    the 16 bound holds at every scale with ≥4 bits of margin.
    Hamming is computed directly on the known pair set (fingerprint
    join by id, bit_count(a^b)) — no blocking involved, so this
    checks the hash family itself, complementing
    simhash_planted_recall (which checks the pigeonhole blocking at
    hamming 0)."""
    docs = read_table(spark, sf_dir, "documents")
    true_pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    )
    fps = dedup.simhash(docs, "doc_id", "text")
    fa = fps.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_ha")
    )
    fb = fps.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_hb")
    )
    return (
        true_pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            (
                F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= 16
            ).alias("hamming_ok"),
        )
    )


@_q(
    "doc_distinctive_token",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)),
                                                     '\s+'),
                      x -> x <> '')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
           GROUP BY doc_id, tok),
    idf AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
            GROUP BY tok)
    SELECT doc_id, tok AS top_token,
           CAST(tf AS INTEGER) AS tf, CAST(df AS INTEGER) AS df
    FROM (
        SELECT t.doc_id, t.tok, t.tf, i.df,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY t.tf DESC, i.df, t.tok) AS rn
        FROM tf t JOIN idf i ON t.tok = i.tok
    ) ranked
    WHERE rn = 1
    """,
)
def doc_distinctive_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction, integer-exact: per document the most
    DISTINCTIVE token — maximize term frequency, tie-break by lowest
    document frequency (the tf-idf ordering without the float idf:
    for fixed tf, idf is monotone in -df), then lexicographic. The
    ordering is pure integer/string comparison, so both engines rank
    identically — no float-parity caveats.

    Plan: explode → two partial-agg groupBys; the df side aggregates
    to vocabulary size (tiny) and broadcasts into the join; the
    per-doc window reuses the (doc_id)-hash partitioning of the tf
    aggregate. At 100 TB the vocab dim stays broadcastable (natural
    vocabularies are ≪ executor memory) and nothing else is
    corpus-wide."""
    docs = dedup.fan_out_narrow_input(
        read_table(spark, sf_dir, "documents")
    )
    toks = docs.select(
        "doc_id", F.explode(dedup.tokens("text")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    idf = toks.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("tok")
    )
    return (
        tf.join(F.broadcast(idf), "tok")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_token"),
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
        )
    )


@_q(
    "corpus_mix_allocation",
    """
    WITH spec(lang, pct) AS (
        VALUES ('en', 40), ('de', 20), ('fr', 20), ('es', 20)
    ),
    avail AS (SELECT lang, COUNT(*) AS n_avail FROM documents
              GROUP BY lang)
    SELECT a.lang, a.n_avail,
           CAST(200 * s.pct // 100 AS BIGINT) AS n_target,
           CAST(LEAST(a.n_avail, 200 * s.pct // 100) AS BIGINT) AS n_alloc,
           ROUND(LEAST(a.n_avail, 200 * s.pct // 100) / a.n_avail, 4)
               AS keep_rate
    FROM avail a JOIN spec s ON a.lang = s.lang
    """,
)
def corpus_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix rebalancing: given a target language mix (40/20/20/20
    over a 200-doc budget), compute the per-language allocation and
    downsampling keep-rate — the planning step before a weighted
    export of a pretraining mix. All-integer allocation arithmetic
    (budget·pct//100, never share×budget in doubles — 0.2 isn't
    binary-exact and floor() would diverge between engines); the
    keep_rate is the only division.

    Plan: one partial-agg groupBy on lang + a broadcast join against
    the literal spec dim — the corpus is touched once, everything
    after the agg is vocabulary-sized."""
    docs = read_table(spark, sf_dir, "documents")
    spec = spark.createDataFrame(
        [("en", 40), ("de", 20), ("fr", 20), ("es", 20)], "lang string, pct int"
    )
    budget = 200
    avail = docs.groupBy("lang").agg(F.count("*").alias("n_avail"))
    n_target = (F.lit(budget) * F.col("pct") / 100).cast("long")
    joined = avail.join(F.broadcast(spec), "lang")
    return joined.select(
        "lang",
        "n_avail",
        n_target.alias("n_target"),
        F.least("n_avail", n_target).cast("long").alias("n_alloc"),
        F.round(
            F.least("n_avail", n_target) / F.col("n_avail"), 4
        ).alias("keep_rate"),
    )


@_q(
    "audio_wav_metrics",
    """
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(200 + (doc_id % 5) * 100 AS BIGINT) AS duration_ms,
           TRUE AS rms_ok, TRUE AS zcr_ok, TRUE AS centroid_ok
    FROM documents WHERE doc_id < 60
    """,
)
def audio_wav_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, physics-verified: synthesize a sine-tone WAV
    per media row (stdlib ``wave`` writer inside the UDF), decode it
    back with the real PCM path (``multimodal._decode_wav``: numpy
    RMS / zero-crossing rate / FFT spectral centroid), and check each
    decoded metric against the closed-form value for a sine of that
    frequency: RMS = A/√2, ZCR = f, centroid ≈ f. Nothing here is a
    stub — a wrong byte order, a dropped frame, or a misread header
    turns a flag false and fails the driver compare. Exact fields
    (sample_rate, duration_ms) round-trip bit-exactly.

    Scale shape: synth and decode both run in one mapInPandas pass —
    payloads never shuffle; only ~60-byte metric rows leave the UDF.
    """
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (200 + (F.col("doc_id") % 10) * 100).cast("double").alias("freq"),
        (200 + (F.col("doc_id") % 5) * 100).cast("int").alias("dur_ms"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_wav(float(f), int(d)), float(f))
                for m, f, d in zip(pdf["media_id"], pdf["freq"], pdf["dur_ms"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload", "freq"])

    wav = base.mapInPandas(
        synth, "media_id long, payload binary, freq double"
    )
    metrics = mm.extract_wav_metrics(wav)
    joined = metrics.join(
        wav.select("media_id", "freq"), "media_id"
    )
    a_rms = F.lit(0.5 / 2 ** 0.5)
    return joined.select(
        "media_id",
        "sample_rate",
        "duration_ms",
        (F.abs(F.col("rms") - a_rms) <= 0.02).alias("rms_ok"),
        (
            F.abs(F.col("zcr_hz") - F.col("freq"))
            <= F.greatest(F.lit(5.0), F.col("freq") * 0.02)
        ).alias("zcr_ok"),
        (
            F.abs(F.col("centroid_hz") - F.col("freq"))
            <= F.greatest(F.lit(10.0), F.col("freq") * 0.10)
        ).alias("centroid_ok"),
    )


@_q(
    "image_bmp_metrics",
    """
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(120 AS INTEGER) AS mean_r,
           CAST(120 AS INTEGER) AS mean_g,
           CAST(doc_id AS INTEGER) AS mean_b
    FROM documents WHERE doc_id < 60
    """,
)
def image_bmp_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, exact-value verified: synthesize a 16×16
    uncompressed BMP per media row (R ramps with x → channel mean
    exactly 120; G ramps with y → 120; B constant = doc_id), decode
    it back through the real struct+numpy path
    (``multimodal._decode_bmp``), and emit the RECOVERED dimensions
    and per-channel means as integers. No bounds needed — an
    uncompressed gradient has closed-form pixel statistics, so a
    padding bug, a BGR/RGB swap (mean_r≠mean_b), or a flipped row
    order changes the emitted values and fails the hash compare.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_bmp(16, 16, int(b)))
                for m, b in zip(pdf["media_id"], pdf["blue"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    bmp = base.mapInPandas(synth, "media_id long, payload binary")
    feats = mm.extract_image_features(bmp)
    chan = lambda i: F.round(  # noqa: E731
        F.col("features")[i] * 255, 0
    ).cast("int")
    return feats.select(
        "media_id",
        "width",
        "height",
        chan(0).alias("mean_r"),
        chan(4).alias("mean_g"),
        chan(8).alias("mean_b"),
    )


@_q(
    "session_funnel",
    """
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER w))
                            > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, event_type,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g
    ),
    fv AS (
        SELECT user_id, session_no,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        FROM s GROUP BY 1, 2
    ),
    flags AS (
        SELECT f.user_id, f.session_no,
               f.first_view IS NOT NULL AS has_view,
               MAX(CASE WHEN s.event_type = 'purchase'
                             AND f.first_view IS NOT NULL
                             AND s.ts >= f.first_view
                        THEN 1 ELSE 0 END) AS converted
        FROM fv f JOIN s ON s.user_id = f.user_id
                        AND s.session_no = f.session_no
        GROUP BY 1, 2, 3
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN has_view THEN 1 ELSE 0 END) AS BIGINT)
               AS view_sessions,
           CAST(SUM(converted) AS BIGINT) AS converted_sessions,
           ROUND(SUM(converted)
                 / SUM(CASE WHEN has_view THEN 1 ELSE 0 END), 4)
               AS view_to_purchase_rate
    FROM flags
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel over gap-sessionized activity: of all
    sessions, how many contain a product view, and how many convert
    (a purchase at-or-after the session's first view). The staple
    product-analytics query: sessionization (one shuffle + window),
    per-session conditional min, self-join back for the ordered
    exists, global conditional aggregate. Counts are integer-exact;
    the single rate divides two exact ints."""
    from ..operators.sessions import sessionize as sess_op

    ev = read_table(spark, sf_dir, "events")
    s = sess_op(
        ev.select("user_id", "ts", "event_id", "event_type"),
        key_cols=["user_id"], ts_col="ts", gap_seconds=1800,
        order_tiebreak=["event_id"],
    )
    fv = s.groupBy("user_id", "session_no").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("first_view")
    )
    flags = (
        fv.join(s, ["user_id", "session_no"])
        .groupBy(
            "user_id", "session_no",
            F.col("first_view").isNotNull().alias("has_view"),
        )
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("first_view").isNotNull()
                    & (F.col("ts") >= F.col("first_view")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return flags.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("has_view"), 1).otherwise(0))
        .cast("long")
        .alias("view_sessions"),
        F.sum("converted").cast("long").alias("converted_sessions"),
        F.round(
            F.sum("converted")
            / F.sum(F.when(F.col("has_view"), 1).otherwise(0)),
            4,
        ).alias("view_to_purchase_rate"),
    )


@_q(
    "weekly_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        FROM events
    )
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST((FLOOR(epoch(a.wk)) - FLOOR(epoch(f.cohort_week)))
                / 604800 AS INTEGER) AS week_offset,
           COUNT(*) AS n_users
    FROM active a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each subsequent active week — the other staple
    warehouse query. Two aggregations over one scan lineage (first
    week per user, distinct active weeks per user) joined on the
    user id; the week offset is exact integer arithmetic on
    week-truncated UTC epochs (both engines truncate to Monday)."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (
                (
                    F.unix_timestamp("wk")
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@_q(
    "near_dup_edit_distance",
    rf"""
    WITH pairs AS ({_TRUE_PAIRS_3G_05})
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist
    FROM pairs p
    JOIN documents a ON a.doc_id = p.doc_a
    JOIN documents b ON b.doc_id = p.doc_b
    """,
)
def near_dup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verification of the shingle-based near-dup
    candidates: Levenshtein distance for every true 3-gram-Jaccard
    ≥ 0.5 pair — the classic fuzzy-match second opinion (cheap here
    because it runs on the CANDIDATE pairs, never all-pairs; at
    100 TB this is the standard re-rank stage after blocking). Both
    engines implement the textbook DP, so the integers agree
    exactly."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select("doc_a", "doc_b")
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb")
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_ta", "_tb").cast("int").alias("edit_dist"),
        )
    )


@_q(
    "user_engagement_rank",
    """
    WITH e AS (
        SELECT user_id, COUNT(DISTINCT event_type) AS n_types
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_types AS INTEGER) AS n_types,
           CAST(RANK() OVER (ORDER BY n_types DESC) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (ORDER BY n_types DESC) AS INTEGER)
               AS drnk
    FROM e
    """,
)
def user_engagement_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ranking semantics: users ranked by distinct event
    types (a 1..5-valued key → massive ties), with both RANK (gaps
    after tie groups) and DENSE_RANK (no gaps). Both functions assign
    by VALUE, so ties need no tiebreak for determinism — the pair of
    columns pins the two tie semantics against each other.

    r4 scale fix: a global `RANK() OVER (ORDER BY …)` window funnels
    every user through ONE task. Because rank/dense_rank assign by
    value, they equal cumulative counts over the VALUE DIMENSION:
    rank(v) = 1 + Σ count(v') for v' ranked earlier, dense_rank(v) =
    the value's position. The window therefore runs over the distinct
    n_types values (≤ |event types| rows — dimension-sized, not
    user-sized) and broadcast-joins back. For high-cardinality order
    keys use operators/prefix.global_row_number instead."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.groupBy("user_id").agg(
        F.count_distinct("event_type").alias("n_types")
    )
    counts = e.groupBy("n_types").agg(F.count("*").alias("_c"))
    w_prev = Window.orderBy(F.desc("n_types")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranks = counts.select(
        "n_types",
        (F.coalesce(F.sum("_c").over(w_prev), F.lit(0)) + 1)
        .cast("int")
        .alias("rnk"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_types")))
        .cast("int")
        .alias("drnk"),
    )
    return e.join(F.broadcast(ranks), "n_types").select(
        "user_id",
        F.col("n_types").cast("int").alias("n_types"),
        "rnk",
        "drnk",
    )


@_q(
    "customer_rfm_segments",
    """
    WITH base AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders)
    SELECT o_custkey AS custkey,
           CAST(date_diff('day', last_order, max_date) AS INTEGER)
               AS recency_days,
           CAST(frequency AS INTEGER) AS frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY
                date_diff('day', last_order, max_date), o_custkey)
                AS INTEGER) AS r_score,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)
                AS INTEGER) AS f_score,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey)
                AS INTEGER) AS m_score
    FROM base, anchor
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics staple: per
    customer, days since last order (vs the corpus max date),
    order count, and exact-decimal total spend, each quartiled with
    NTILE(4) under a fully deterministic ordering (customer-id
    tiebreak; the monetary double is bit-identical cross-engine by
    the decimal-sum rule, so its ordering is too).

    r4 scale fix: the three `NTILE(4) OVER (ORDER BY …)` windows each
    funneled every customer through ONE task. Each is now the
    hierarchical `global_ntile` (operators/prefix.py): range
    partition, per-partition row counts, closed-form bucket from the
    broadcast total — chained with carry columns so the three
    orderings need zero join-backs. Identical results (ntile is
    positional and the orderings are total)."""
    from ..operators.prefix import global_ntile

    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("max_date"))
    j = base.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.datediff("max_date", "last_order").cast("int").alias(
            "recency_days"
        ),
        F.col("frequency").cast("int").alias("frequency"),
        "monetary",
    )
    # One driver-side count shared by the three quartile passes: each
    # ntile's bucket formula needs |rows|, and a literal beats three
    # count-aggregate + broadcast subtrees (same trick as the
    # group-count probes that size applyInPandas fan-outs).
    n_cust = j.count()
    r = global_ntile(
        j, 4, ["recency_days", "custkey"], out_col="r_score",
        carry_cols=["frequency", "monetary"], total_rows=n_cust,
    )
    f = global_ntile(
        r, 4, ["frequency", "custkey"], descending=[True, False],
        out_col="f_score",
        carry_cols=["recency_days", "monetary", "r_score"],
        total_rows=n_cust,
    )
    m = global_ntile(
        f, 4, ["monetary", "custkey"], descending=[True, False],
        out_col="m_score",
        carry_cols=["recency_days", "frequency", "r_score", "f_score"],
        total_rows=n_cust,
    )
    return m.select(
        "custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


# ---------------------------------------------------------------------------
# Span-level exact dedup (round 4, fourth session): the Lee et al.
# 2022 duplicated-substring primitive at k-token resolution. Doc-level
# dedup (exact/minhash/simhash above) drops whole documents; span
# detection finds the SHARED PASSAGES — boilerplate, licenses, quoted
# text — inside otherwise-distinct documents, which is what a
# training-data pipeline actually excises.
# ---------------------------------------------------------------------------


@_q(
    "duplicate_token_spans",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(w[1:len(w) - 4],
                      (x, i) -> struct_pack(
                          pos := i - 1,
                          shingle := x || ' ' || w[i + 1] || ' ' || w[i + 2]
                                       || ' ' || w[i + 3] || ' ' || w[i + 4]
                      ))) AS g
        FROM toks
    ),
    pos AS (SELECT doc_id, g.pos AS pos, g.shingle AS shingle FROM grams),
    dup AS (
        SELECT shingle FROM pos
        GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (shingle)),
    isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM hits
    )
    SELECT doc_id,
           CAST(MIN(pos) AS INTEGER) AS span_start,
           CAST(MAX(pos) + 4 AS INTEGER) AS span_end,
           CAST(MAX(pos) + 4 - MIN(pos) + 1 AS INTEGER) AS span_tokens
    FROM isl
    GROUP BY doc_id, grp
    """,
)
def duplicate_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated spans at 5-token resolution
    (`dedup.duplicate_spans`): positions whose 5-gram occurs in >= 2
    documents, merged into maximal runs per doc via gaps-and-islands.
    The oracle rebuilds the identical span algebra in SQL, so the
    match certifies positional shingling, the document-frequency
    filter, the hit join, and the island merge together. On this
    corpus only genuinely duplicated passages collide (31-word vocab
    but 31^5 gram space vs ~17.5k grams total)."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, "doc_id", "text", k=5, min_docs=2)


# ---------------------------------------------------------------------------
# Lexical retrieval: Okapi BM25 over the documents table — the
# keyword-search complement to the embedding ANN family (kNN / LSH /
# IVF above). Corpus statistics (N, Σdl, per-term df) come from ONE
# tiny aggregate broadcast back over the scored scan; nothing global
# materializes. Float discipline: tf/dl/df/N are exact integers, so
# every double below is produced by the identical expression tree in
# both engines; ln() is the one libm call (verified bit-equal on
# these inputs; final ROUND(.,4) guards the comparison regardless).
# ---------------------------------------------------------------------------

_BM25_TERMS = ("dup", "spark", "vector")


def _bm25_term_sql(t: str) -> str:
    tf = f"tf_{t}"
    idf = (
        f"ln(CAST(1 AS DOUBLE) + (n_docs - df_{t} + CAST(0.5 AS DOUBLE))"
        f" / (df_{t} + CAST(0.5 AS DOUBLE)))"
    )
    return (
        f"{idf} * ({tf} * CAST(2.2 AS DOUBLE))"
        f" / ({tf} + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)"
        f" + CAST(0.75 AS DOUBLE) * dl / avgdl))"
    )


_BM25_TF_SQL = ", ".join(
    "len(list_filter(string_split_regex(lower(trim(text)), "
    + r"'\s+'), x -> x = '" + t + f"')) AS tf_{t}"
    for t in _BM25_TERMS
)
_BM25_DF_SQL = ", ".join(
    f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
    for t in _BM25_TERMS
)
_BM25_OUT_SQL = ", ".join(
    f"CAST(tf_{t} AS INTEGER) AS tf_{t}" for t in _BM25_TERMS
)
_BM25_SCORE_SQL = " + ".join(_bm25_term_sql(t) for t in _BM25_TERMS)


@_q(
    "bm25_doc_search",
    rf"""
    WITH base AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x <> '')) AS dl,
               {_BM25_TF_SQL}
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {_BM25_DF_SQL}
        FROM base
    )
    SELECT doc_id,
           CAST(dl AS INTEGER) AS dl,
           {_BM25_OUT_SQL},
           ROUND({_BM25_SCORE_SQL}, 4)
               AS bm25
    FROM base, stats
    """,
)
def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) scores for the fixed query
    {dup, spark, vector} — one rare term (df≈6% of docs) and two
    common ones, so idf weighting visibly dominates raw tf. Plan: one
    tokenizing projection, one 1-row stats aggregate broadcast back
    (AQE picks broadcast for the 1-row side), zero extra shuffles —
    at 100 TB the stats row is still one row."""
    docs = read_table(spark, sf_dir, "documents")
    toks = dedup.tokens("text")

    def tf_col(term: str):
        # NB: the lambda must stay single-arg — a two-arg lambda makes
        # F.filter pass (element, index) and the term binds the index.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_col(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def term_score(t: str):
        tf = F.col(f"tf_{t}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        return (
            idf
            * (tf * F.lit(2.2))
            / (
                tf
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
            )
        )

    score = term_score(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + term_score(t)
    return base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[F.col(f"tf_{t}") for t in _BM25_TERMS],
        F.round(score, 4).alias("bm25"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection over the event stream: per user,
# each value against the trailing-window mean/std — the monitoring
# primitive behind data-quality alerting. Exactness: values go to
# integer CENTS, the frame's Σx and Σx² are exact integer window
# sums, and variance is the single division of exact integers
# (n·Σx² − (Σx)²) / (n·(n−1)) — no Welford-vs-naive engine drift,
# and IEEE sqrt is correctly rounded in both engines.
# ---------------------------------------------------------------------------


@_q(
    "rolling_zscore_anomalies",
    """
    WITH c AS (
        SELECT event_id, user_id, ts, value,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, ts, value, cents,
               COUNT(*) OVER fr AS n_prev,
               SUM(cents) OVER fr AS s1,
               SUM(cents * cents) OVER fr AS s2
        FROM c
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value,
           CAST(n_prev AS INTEGER) AS window_n,
           ROUND((cents - CAST(s1 AS DOUBLE) / n_prev)
                 / sqrt((n_prev * s2 - s1 * s1)
                        / (CAST(n_prev AS DOUBLE) * (n_prev - 1))), 4)
               AS zscore
    FROM w
    WHERE n_prev >= 12 AND n_prev * s2 - s1 * s1 > 0
      AND ABS((cents - CAST(s1 AS DOUBLE) / n_prev)
              / sqrt((n_prev * s2 - s1 * s1)
                     / (CAST(n_prev AS DOUBLE) * (n_prev - 1)))) > 2.0
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits > 2 sample standard deviations from
    the trailing 20-event per-user mean (minimum 12 prior events).
    The frame excludes the current row, so an anomaly cannot mask
    itself. Plan: one shuffle on user_id, one pass per partition —
    the per-key window never sees more than one user's history."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    c = ev.select("event_id", "user_id", "ts", "value", cents.alias("cents"))
    w = c.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "cents",
        F.count(F.lit(1)).over(fr).alias("n_prev"),
        F.sum("cents").over(fr).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(fr).alias("s2"),
    )
    var_num = F.col("n_prev") * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("cents") - F.col("s1").cast("double") / F.col("n_prev")) / F.sqrt(
        var_num / (F.col("n_prev").cast("double") * (F.col("n_prev") - 1))
    )
    return (
        w.where((F.col("n_prev") >= 12) & (var_num > 0) & (F.abs(z) > 2.0))
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("n_prev").cast("int").alias("window_n"),
            F.round(z, 4).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1): the rule-based
# document filter a pretraining pipeline runs BEFORE model-based
# scoring — word-count bounds, mean-word-length bounds, alphabetic-
# word fraction, and stopword coverage, each surfaced as its own flag
# so downstream can audit which rule fired. Complements the
# continuous `doc_quality` score with hard verdicts.
# ---------------------------------------------------------------------------


@_q(
    "doc_gopher_rules",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(w) AS n_words,
               len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                   AS n_alpha_words,
               len(array_to_string(w, '')) AS n_word_chars,
               CAST(list_contains(w, 'the') AS INTEGER)
                   + CAST(list_contains(w, 'a') AS INTEGER) AS n_stop_distinct
        FROM t
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           n_word_chars / n_words AS mean_word_len,
           n_alpha_words / CAST(n_words AS DOUBLE) AS alpha_word_frac,
           CAST(n_stop_distinct AS INTEGER) AS n_stop_distinct,
           n_words BETWEEN 30 AND 5000 AS r_word_count,
           n_word_chars / n_words BETWEEN 3.0 AND 5.0 AS r_mean_word_len,
           n_alpha_words / CAST(n_words AS DOUBLE) >= 0.9 AS r_alpha_words,
           n_stop_distinct >= 2 AS r_stopwords,
           (n_words BETWEEN 30 AND 5000)
               AND (n_word_chars / n_words BETWEEN 3.0 AND 5.0)
               AND (n_alpha_words / CAST(n_words AS DOUBLE) >= 0.9)
               AND (n_stop_distinct >= 2) AS gopher_pass
    FROM m
    WHERE n_words > 0
    """,
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule flags. All ratios are single
    divisions of exact integer counts (identical doubles in both
    engines), so the BETWEEN boundaries compare bit-identical values
    — no rounding needed before the verdicts. Pure projection: zero
    shuffles at any scale."""
    docs = read_table(spark, sf_dir, "documents")
    w = dedup.tokens("text")
    n_words = F.size(w)
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    n_chars = F.length(F.array_join(w, ""))
    n_stop = F.array_contains(w, "the").cast("int") + F.array_contains(
        w, "a"
    ).cast("int")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_alpha.alias("n_alpha_words"),
        n_chars.alias("n_word_chars"),
        n_stop.alias("n_stop_distinct"),
    ).where(F.col("n_words") > 0)
    mean_len = F.col("n_word_chars") / F.col("n_words")
    alpha_frac = F.col("n_alpha_words") / F.col("n_words").cast("double")
    r_wc = F.col("n_words").between(30, 5000)
    r_mwl = mean_len.between(3.0, 5.0)
    r_alpha = alpha_frac >= 0.9
    r_stop = F.col("n_stop_distinct") >= 2
    return m.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        F.col("n_stop_distinct").cast("int").alias("n_stop_distinct"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_mwl & r_alpha & r_stop).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): embedding-space dedup — cheap cell
# partition, exact cosine pairs within cells only, transitive
# clusters, min-id representative. Cells here are sign-LSH codes from
# literal hyperplanes (the paper's k-means cells play the same role);
# the plane constants are inlined into the oracle SQL, so the ENTIRE
# pipeline — cell assignment, pair join, closure, keep-set — is
# hash-compared, unlike the recall-bound-checked LSH/IVF kNN queries.
# ---------------------------------------------------------------------------

_SEMDEDUP_PLANES = similarity.random_hyperplanes(dim=64, n_planes=6, seed=7)


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


_SEMDEDUP_CELL_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(e, {_plane_sql(p)}) >= 0"
    f" THEN {1 << j} ELSE 0 END)"
    for j, p in enumerate(_SEMDEDUP_PLANES)
)


@_q(
    "semantic_dedup_cells",
    f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cells AS MATERIALIZED (
        SELECT vec_id, e, {_SEMDEDUP_CELL_SQL} AS cell FROM v
    ),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM cells a JOIN cells b ON a.cell = b.cell
                                 AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.25
    ),
    {_CC_BY_RECURSIVE_CTE}
    SELECT v.vec_id,
           COALESCE(cc.component, v.vec_id) AS component,
           COALESCE(cc.component, v.vec_id) = v.vec_id AS is_rep
    FROM v LEFT JOIN cc ON v.vec_id = cc.vertex
    """,
)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`similarity.semantic_dedup` over the embeddings table: 64
    sign-LSH cells (6 literal planes, seed 7), exact cosine ≥ 0.25
    within-cell pairs, connected components, min-id representative;
    singletons are their own reps. The sign-cell parity relies on the
    same empirical property as the green `radius_cosine_search`
    (identical double inputs through either engine's dot product);
    the 0.25 radius matches that query's measured p99 threshold."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, _SEMDEDUP_PLANES, id_col="vec_id", vec_col="embedding",
        threshold=0.25,
    )


# ---------------------------------------------------------------------------
# Warehouse-history + sequence-analytics breadth (round 4, fourth
# session): SCD2 validity intervals (the table the as-of/PIT join
# family reads at scale), MATCH_RECOGNIZE-style ordered sequence
# detection, and the CCNet-style unigram-LM quality score.
# ---------------------------------------------------------------------------


@_q(
    "scd2_user_state",
    """
    WITH d AS (
        SELECT user_id, ts, event_type, value FROM (
            SELECT user_id, ts, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version_n,
           ts AS effective_from,
           LEAD(ts) OVER w AS effective_to,
           LEAD(ts) OVER w IS NULL AS is_current,
           event_type, value
    FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history built from the event change feed
    (`operators/scd.scd2_history`): last-writer-wins per instant
    (event_id tiebreak, the audit rule), then [effective_from,
    effective_to) intervals via lead() and an is_current flag — the
    dimension-history complement of the current-state-only mart
    upserts (reference `sql/mart/02_marts.sql` keeps current state
    only). One shuffle on user_id; both windows share one sort."""
    from ..operators.scd import scd2_history

    ev = read_table(spark, sf_dir, "events")
    return scd2_history(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value"],
        tiebreak_col="event_id",
    )


@_q(
    "event_sequence_funnel",
    """
    WITH a AS (
        SELECT user_id, ts, event_type, event_id,
               last_value(CASE WHEN event_type = 'signup' THEN ts END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS last_a
        FROM events
    ),
    b AS (
        SELECT *,
               last_value(CASE WHEN event_type = 'purchase'
                               AND last_a IS NOT NULL
                               THEN struct_pack(b_ts := ts, a_ts := last_a)
                          END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS last_ab
        FROM a
    )
    SELECT user_id,
           last_ab.a_ts AS first_ts,
           last_ab.b_ts AS second_ts,
           ts AS third_ts,
           epoch_us(ts) - epoch_us(last_ab.a_ts) AS span_micros
    FROM b
    WHERE event_type = 'error' AND last_ab IS NOT NULL
      AND epoch_us(ts) - epoch_us(last_ab.a_ts) <= 604800000000
    """,
)
def event_sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sequence detection signup → purchase → error within 7
    days (`operators/scd.sequence_pattern_matches`) — the
    MATCH_RECOGNIZE-style row-pattern primitive Spark lacks natively,
    expressed as two frame-bounded IGNORE-NULLS last_value passes
    that share ONE (user, ts, event_id) sort: pass 1 carries the
    running last signup, pass 2 carries (purchase ts, signup-at-that-
    purchase), so each error event sees the strictly ordered chain.
    span in exact integer microseconds (no interval arithmetic)."""
    from ..operators.scd import sequence_pattern_matches

    ev = read_table(spark, sf_dir, "events")
    return sequence_pattern_matches(
        ev,
        key_col="user_id",
        ts_col="ts",
        type_col="event_type",
        first="signup",
        second="purchase",
        third="error",
        max_span_micros=604_800_000_000,
        tiebreak_col="event_id",
    )


@_q(
    "doc_unigram_logprob",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(w) AS term,
               unnest(range(1, len(w) + 1)) AS pos
        FROM t
    ),
    counts AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT SUM(cnt) AS tot FROM counts),
    lp AS (
        SELECT tok.doc_id, tok.pos, ln(c.cnt / tot) AS lnp
        FROM tok JOIN counts c USING (term), total
    ),
    agg AS (
        SELECT doc_id,
               list_reduce(list(lnp ORDER BY pos), (a, b) -> a + b) AS s,
               COUNT(*) AS n
        FROM lp GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           ROUND(s / n, 4) AS logprob_per_token
    FROM agg
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM score per document (the CCNet/
    RefinedWeb "perplexity filter" shape with the engine's own corpus
    as the LM): mean ln p(token) under corpus unigram frequencies.
    Determinism: the corpus stats are exact integers broadcast as ONE
    tiny map row; the per-doc sum folds the doc's OWN token array in
    array order (F.aggregate), and the oracle folds the identically
    ordered list (list_reduce over list(... ORDER BY pos)) — IEEE
    left-folds starting 0.0+x₁ ≡ x₁, so both engines add the same
    doubles in the same order. No order-dependent engine aggregation
    anywhere."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", dedup.tokens("text").alias("w")).where(
        F.size("w") > 0
    )
    counts = (
        t.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    stats = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "cnt"))
        ).alias("m"),
        F.sum("cnt").alias("tot"),
    )
    lp = F.aggregate(
        F.col("w"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.log(F.element_at(F.col("m"), x) / F.col("tot")),
    )
    return (
        t.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.size("w").cast("int").alias("n_tokens"),
            F.round(lp / F.size("w"), 4).alias("logprob_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable frequent-items summary (operators/sketch.py) — the
# heavy-hitters counterpart of the HLL row: per-partition bounded
# top-k summaries with the Misra–Gries N/(k+1) undercount guarantee,
# merged by plain summation. The oracle checks the GUARANTEES
# (partitioning-invariant theorems), not the partitioning-dependent
# raw estimates — same policy as the LSH recall bounds.
# ---------------------------------------------------------------------------


@_q(
    "heavy_hitters_sketch",
    """
    WITH s AS (
        SELECT user_id FROM events
        UNION ALL
        SELECT -1 AS user_id FROM events WHERE event_id % 3 = 0
    ),
    e AS (SELECT user_id, COUNT(*) AS exact_count FROM s GROUP BY user_id)
    SELECT user_id, exact_count,
           TRUE AS present_ok, TRUE AS estimate_ok
    FROM e ORDER BY exact_count DESC, user_id LIMIT 5
    """,
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over a planted-skew stream (every third event
    re-attributed to synthetic user −1, so one key owns ~25% of a
    4N/3-row stream at every SF — comfortably above the N_total/(k+1)
    detection threshold at k=16). The query computes the sketch AND
    the exact counts, then emits, for the true top-5 keys, the two
    Misra–Gries theorems as booleans: the key is present in the
    merged summary (or is below the guarantee threshold), and the
    estimate is within [exact − N/(k+1), exact]. Both hold under ANY
    partitioning — which is exactly what makes them oracle-safe while
    the raw estimates are not."""
    from ..operators import sketch

    k = 16
    ev = read_table(spark, sf_dir, "events")
    hot = ev.where(F.col("event_id") % 3 == 0).select(
        F.lit(-1).cast("long").alias("user_id")
    )
    stream = ev.select("user_id").unionByName(hot)
    hh = sketch.heavy_hitters(stream, "user_id", k=k)
    exact = stream.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    total = stream.agg(F.count("*").alias("_n"))
    top5 = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(5)
    bound = F.col("_n") / F.lit(k + 1)
    return (
        top5.crossJoin(F.broadcast(total))
        .join(hh, "user_id", "left")
        .select(
            "user_id",
            "exact_count",
            (
                F.col("est").isNotNull() | (F.col("exact_count") <= bound)
            ).alias("present_ok"),
            (
                F.col("est").isNull()
                | (
                    (F.col("est") <= F.col("exact_count"))
                    & (F.col("est") >= F.col("exact_count") - bound)
                )
            ).alias("estimate_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Warehouse operations breadth: ANALYZE-style per-column statistics
# (what a CBO ingests) and an order-insensitive table checksum (the
# cross-system migration-verification primitive; diff EXPLAINS
# per-row changes, the checksum certifies per-group equality cheaply).
# ---------------------------------------------------------------------------


@_q(
    "orders_column_stats",
    """
    WITH s AS (
        SELECT 'o_custkey' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(o_custkey) AS n_nulls,
               COUNT(DISTINCT o_custkey) AS ndv,
               CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
               CAST(MAX(o_custkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
               COUNT(DISTINCT o_orderstatus),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
               COUNT(DISTINCT o_orderpriority),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
    )
    SELECT * FROM s
    """,
)
def orders_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (row count, null count,
    exact NDV, min/max) in ONE scan: a single multi-aggregate pass
    unpivoted with stack() — the stats a cost-based optimizer ingests
    for join ordering and broadcast decisions. String-cast extrema
    restricted to int/text columns (double→string formatting is not
    portable across engines and has no place in a differential row).
    At 100 TB: exact NDV becomes approx_count_distinct (HLL) — the
    swap is one expression; the scan count stays one."""
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count("o_custkey")).alias("nn_ck"),
        F.count_distinct(F.col("o_custkey")).alias("ndv_ck"),
        F.min("o_custkey").cast("string").alias("min_ck"),
        F.max("o_custkey").cast("string").alias("max_ck"),
        (F.count("*") - F.count("o_orderstatus")).alias("nn_st"),
        F.count_distinct(F.col("o_orderstatus")).alias("ndv_st"),
        F.min("o_orderstatus").alias("min_st"),
        F.max("o_orderstatus").alias("max_st"),
        (F.count("*") - F.count("o_orderpriority")).alias("nn_pr"),
        F.count_distinct(F.col("o_orderpriority")).alias("ndv_pr"),
        F.min("o_orderpriority").alias("min_pr"),
        F.max("o_orderpriority").alias("max_pr"),
    )
    return agg.select(
        F.expr(
            "stack(3, "
            "'o_custkey', n, nn_ck, ndv_ck, min_ck, max_ck, "
            "'o_orderstatus', n, nn_st, ndv_st, min_st, max_st, "
            "'o_orderpriority', n, nn_pr, ndv_pr, min_pr, max_pr) "
            "AS (column_name, n_rows, n_nulls, ndv, min_value, max_value)"
        )
    )


@_q(
    "orders_group_checksum",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST('0x' || substring(
                    md5(CAST(o_orderkey AS VARCHAR) || '|'
                        || CAST(o_custkey AS VARCHAR) || '|'
                        || o_orderpriority), 1, 15) AS BIGINT))
                % 2305843009213693951 AS BIGINT) AS checksum
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def orders_group_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-group table checksum: per-row md5 over a
    canonical '|'-joined int/text projection, first 60 bits as an
    integer, summed exactly in a wide intermediate (DECIMAL(38,0) /
    HUGEINT) then reduced mod 2^61−1 so the TERMINAL column is plain
    BIGINT (uncast HUGEINT/DECIMAL outputs are the r4 driver
    hash-fail class). Summation commutes, so the checksum is
    independent of partitioning and row order — equal checksums
    certify group equality across engines/migrations without moving
    rows (`orders_version_diff` then EXPLAINS any group that
    disagrees). One partial-agg shuffle of (status, sum) pairs; row
    hashes never leave their partition."""
    orders = read_table(spark, sf_dir, "orders")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderpriority"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        (F.sum(row_hash) % F.lit(2305843009213693951))
        .cast("long")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL-surface breadth: recursive CTE (hierarchical chain
# rollup — the BOM/org-chart recursion pattern; Spark 4 supports
# UNION ALL recursion, so the hierarchy must be acyclic: connected
# components stay on the iterative operator, see graph.py) and
# LATERAL correlated subqueries (per-row top-N, the shape plain SQL
# needs a window or lateral for).
# ---------------------------------------------------------------------------


@_q(
    "customer_chain_rollup",
    """
    WITH RECURSIVE chain(custkey, cur, depth, bal_sum) AS (
        SELECT c_custkey, c_custkey, 1,
               CAST(c_acctbal AS DECIMAL(18,2))
        FROM customer
        UNION ALL
        SELECT ch.custkey, c.c_custkey, ch.depth + 1,
               CAST(ch.bal_sum + CAST(c.c_acctbal AS DECIMAL(18,2))
                    AS DECIMAL(18,2))
        FROM chain ch JOIN customer c ON c.c_custkey = ch.cur // 2
        WHERE ch.cur > 1
    )
    SELECT custkey, CAST(depth AS INTEGER) AS depth,
           CAST(bal_sum AS DOUBLE) AS chain_balance
    FROM chain WHERE cur = 1
    """,
)
def customer_chain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical chain rollup via Spark 4's native WITH RECURSIVE
    (UNION ALL recursion): every customer walks a deterministic
    heap-shaped referral tree (parent = custkey div 2) to the root,
    accumulating chain length and the exact-decimal balance along the
    path — the BOM explosion / org-chart rollup pattern. Depth is
    O(log n), so the recursion runs ~log2(n) joined iterations; each
    iteration is an ordinary broadcast/shuffle join round, which is
    exactly how the engine executes it at scale. Spark and DuckDB run
    the IDENTICAL recursion (modulo `div`/`//` spelling)."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_chain_customer"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, cur, depth, bal_sum) AS (
            SELECT c_custkey, c_custkey, 1,
                   CAST(c_acctbal AS DECIMAL(18,2))
            FROM _chain_customer
            UNION ALL
            SELECT ch.custkey, c.c_custkey, ch.depth + 1,
                   CAST(ch.bal_sum + CAST(c.c_acctbal AS DECIMAL(18,2))
                        AS DECIMAL(18,2))
            FROM chain ch JOIN _chain_customer c
              ON c.c_custkey = ch.cur div 2
            WHERE ch.cur > 1
        )
        SELECT custkey, CAST(depth AS INT) AS depth,
               CAST(bal_sum AS DOUBLE) AS chain_balance
        FROM chain WHERE cur = 1
        """
    )


@_q(
    "lateral_recent_orders",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           top.o_orderkey, top.o_totalprice, top.o_orderdate
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 2
    ) top
    """,
)
def lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-row top-N through the SQL LATERAL surface: each
    customer's two most recent orders. Catalyst decorrelates the
    lateral subquery into a ranked window over one join — the same
    physical plan the DataFrame formulation gets — so the feature
    costs nothing over `top_orders_per_segment`-style windows; it
    exists for SQL users porting PostgreSQL/DuckDB lateral queries
    (reference mart README documents psql usage throughout)."""
    spark_ = spark
    read_table(spark_, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    read_table(spark_, sf_dir, "orders").createOrReplaceTempView(
        "_lat_orders"
    )
    return spark_.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               top.o_orderkey, top.o_totalprice, top.o_orderdate
        FROM _lat_customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM _lat_orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 2
        ) top
        """
    )


# ---------------------------------------------------------------------------
# Distributed k-means (operators/kmeans.py) — the real SemDeDup /
# cluster-curation cell structure (`semantic_dedup_cells` uses
# sign-LSH as the cheap stand-in). The centroid matrix is a literal
# constant on BOTH engines (repr round-trip, the `_SEMDEDUP_PLANES`
# pattern), so the assignment argmin, the quantized update step, and
# the per-cluster prototype rule are all hash-compared end to end.
# The full Lloyd LOOP is invariant-tested in tests/test_kmeans.py
# (floats drift across iterations by construction — same policy as
# connected components vs its convergence probe).
# ---------------------------------------------------------------------------

_KMEANS_CENTROIDS = kmeans.seeded_centroids(dim=64, k=8, seed=11)

_KMEANS_CENTROID_VALUES = ", ".join(
    f"({j}, [" + ", ".join(repr(x) for x in c) + "])"
    for j, c in enumerate(_KMEANS_CENTROIDS)
)

# Shared oracle prefix: per-(vector, centroid) squared L2 folded in
# array order from the first term (list_reduce seeds with element 1;
# Spark folds 0.0+t₁ ≡ t₁ — identical IEEE sequence).
_KMEANS_DIST_CTES = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT * FROM (VALUES {_KMEANS_CENTROID_VALUES}) AS t(cid, cv)),
    d AS (
        SELECT vec_id, e, cid,
               list_reduce(
                   list_transform(e, (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS dist_sq
        FROM v CROSS JOIN c
    ),
    best AS (
        SELECT vec_id, e, cid AS cluster_id, dist_sq
        FROM d
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist_sq, cid) = 1
    )
"""


@_q(
    "kmeans_assign",
    f"""
    WITH {_KMEANS_DIST_CTES}
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cluster_id,
           ROUND(dist_sq, 6) AS dist_sq
    FROM best
    """,
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Voronoi) assignment of every embedding to the
    literal k=8 seed centroids — `kmeans.assign`, the shuffle-free
    half of Lloyd's algorithm and the final pass of any clustered
    curation pipeline. Distances round to 6 decimals: DuckDB's
    codegen CONTRACTS the (x−c)·(x−c) lambda into FMA (measured: ~10
    of 64 terms off by 1 ulp per vector, and materializing the diff
    list in a nested list_transform does not stop the fusion), so
    term-level bit-equality — which `doc_unigram_logprob` gets from
    its ln() terms — does not hold for fused arithmetic; ±1-ulp on a
    O(1) distance is 9 orders below the rounding grid. The argmin
    tie-break is the lowest centroid index on both sides."""
    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans.assign(emb, _KMEANS_CENTROIDS).select(
        "vec_id", "cluster_id", F.round("dist_sq", 6).alias("dist_sq")
    )


@_q(
    "kmeans_update_step",
    f"""
    WITH {_KMEANS_DIST_CTES},
    x AS (
        SELECT cluster_id,
               CAST(u.pos AS INTEGER) AS pos,
               CAST(FLOOR(u.x * 1000000.0) AS BIGINT) AS q
        FROM best,
             LATERAL (SELECT unnest(e) AS x,
                             unnest(range(0, len(e))) AS pos) u
    )
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id, pos,
           COUNT(*) AS n_members,
           CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*)
               AS mean_q
    FROM x GROUP BY cluster_id, pos
    """,
)
def kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd centroid-update round in exact integer arithmetic
    (`kmeans.cluster_means_quantized`): coordinates floored onto a
    1e-6 grid, per-(cluster, position) int64 sums — order-free under
    any partitioning — and the mean re-derived by one fixed double
    expression. The map-side partial aggregation bounds the shuffle
    at k·dim rows per task regardless of N (the 100 TB shape; see the
    module docstring)."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = kmeans.assign(emb, _KMEANS_CENTROIDS)
    return kmeans.cluster_means_quantized(assigned).select(
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.col("pos").cast("int").alias("pos"),
        "n_members",
        "mean_q",
    )


@_q(
    "kmeans_prototypes",
    f"""
    WITH {_KMEANS_DIST_CTES}
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id, vec_id,
           ROUND(dist_sq, 6) AS dist_sq
    FROM best
    QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY dist_sq, vec_id) = 1
    """,
)
def kmeans_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster prototype — the member nearest its centroid
    (`kmeans.prototypes`, SemDeDup's keep-the-prototype rule and the
    cluster-labeling primitive). One window over per-cluster
    candidates with (dist, id) tie-break; upstream assignment is the
    same shuffle-free literal-centroid scan as `kmeans_assign`, and
    the emitted distance rounds to 6 decimals for the same
    FMA-contraction reason documented there (the WINDOW orders by
    each engine's raw distance — a 1-ulp tie flip would need two
    members at identical distance to 1e-15, unobserved at any SF)."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = kmeans.assign(emb, _KMEANS_CENTROIDS)
    return kmeans.prototypes(assigned).select(
        F.col("cluster_id").cast("int").alias("cluster_id"),
        "vec_id",
        F.round("dist_sq", 6).alias("dist_sq"),
    )


@_q(
    "semantic_dedup_kmeans",
    f"""
    WITH RECURSIVE
    {_KMEANS_DIST_CTES},
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM best a JOIN best b ON a.cluster_id = b.cluster_id
                                AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.25
    ),
    {_CC_BY_RECURSIVE_CTE}
    SELECT v.vec_id,
           COALESCE(cc.component, v.vec_id) AS component,
           COALESCE(cc.component, v.vec_id) = v.vec_id AS is_rep
    FROM v LEFT JOIN cc ON v.vec_id = cc.vertex
    """,
)
def semantic_dedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with TRUE k-means cells — the paper's actual
    construction (`kmeans.semantic_dedup_kmeans`): nearest-centroid
    assignment to the literal k=8 seeds, exact cosine ≥ 0.25 pairs
    within a cell only, transitive clusters, min-id representative.
    The END-TO-END composition — argmin cell assignment, pair join,
    recursive closure, keep-set — is hash-compared; the sign-LSH
    sibling `semantic_dedup_cells` stays as the hash-cell variant.
    Same 100 TB shape: the pair join shuffles on the cell key, never
    all-pairs."""
    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans.semantic_dedup_kmeans(
        emb, _KMEANS_CENTROIDS, id_col="vec_id", vec_col="embedding",
        threshold=0.25,
    )


@_q(
    "cluster_balanced_sample",
    f"""
    WITH {_KMEANS_DIST_CTES}
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id, vec_id,
           CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT cluster_id, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster_id
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM best
    )
    WHERE rk <= 40
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced selection (the diversity-preserving sampling
    step cluster-based curation pipelines run after SemDeDup): cap
    every k-means cell at 40 members, chosen by deterministic content
    hash (md5 of the id — partitioning-invariant, reproducible, no
    RNG), so dominant clusters stop drowning out rare ones. Composes
    the shuffle-free `kmeans.assign` with the per-group windowed cap;
    WindowGroupLimit keeps only 40 rows per cell past the sort. The
    cap is the mix dial — exactly `sample_k_per_group` applied to
    learned cells instead of given categories."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = kmeans.assign(emb, _KMEANS_CENTROIDS)
    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 40)
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "vec_id",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the FAISS-style
# compressed ANN path: per-subspace codebooks inlined as literals on
# both engines (the centroid pattern), so encoding, reconstruction
# error, and the ADC search are all hash-compared. The ADC lookup
# table is computed ONCE driver-side and inlined into BOTH the Spark
# plan and the oracle, and every fold is ordered — est_dist is
# bit-equal across engines, so the top-k ranking cannot flip.
# ---------------------------------------------------------------------------

_PQ_CODEBOOKS = similarity.pq_codebooks(dim=64, n_sub=8, k=16, seed=101)
_PQ_QUERY = kmeans.seeded_centroids(dim=64, k=1, seed=999)[0]
_PQ_SUB = 8

_PQ_CB_VALUES = ", ".join(
    f"({s}, {cid}, [" + ", ".join(repr(x) for x in cv) + "])"
    for s, cb in enumerate(_PQ_CODEBOOKS)
    for cid, cv in enumerate(cb)
)

_PQ_LUT_VALUES = ", ".join(
    f"({s}, {cid}, {similarity._fold_sq_dist(_PQ_QUERY[s * _PQ_SUB:(s + 1) * _PQ_SUB], cv)!r})"
    for s, cb in enumerate(_PQ_CODEBOOKS)
    for cid, cv in enumerate(cb)
)

_PQ_QUERY_SQL = "[" + ", ".join(repr(x) for x in _PQ_QUERY) + "]"

_PQ_ENCODE_CTES = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    d AS (
        SELECT vec_id, e, s, cid,
               list_reduce(
                   list_transform(e[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM v CROSS JOIN cb
    ),
    best AS (
        SELECT vec_id, e, s, cid, ds
        FROM d
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    )
"""


@_q(
    "pq_codes",
    f"""
    WITH {_PQ_ENCODE_CTES}
    SELECT vec_id,
           array_to_string(list(cid ORDER BY s), ',') AS codes_csv,
           ROUND(list_reduce(list(ds ORDER BY s), (a, b) -> a + b), 6)
               AS recon_err
    FROM best GROUP BY vec_id
    """,
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize every embedding against the literal 8×16
    codebooks (`similarity.pq_encode`): 64 floats compress to 8 small
    codes — the 32× storage cut that keeps billion-vector candidate
    sets memory-resident. Shuffle-free literal-codebook argmin per
    subspace; reconstruction error folds the per-subspace minima in
    subspace order on both engines and rounds to 6 (the
    FMA-contraction policy from `kmeans_assign`). The code vector is
    emitted as a CSV string (`codes_csv`) rather than array<int> —
    same information, but hashable by the driver's order-insensitive
    pandas canonicalizer (array cells broke the r7 driver row)."""
    emb = read_table(spark, sf_dir, "embeddings")
    enc = similarity.pq_encode(emb, _PQ_CODEBOOKS)
    return enc.select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
        F.round("recon_err", 6).alias("recon_err"),
    )


@_q(
    "pq_adc_topk",
    f"""
    WITH {_PQ_ENCODE_CTES},
    lut AS (SELECT s, cid, CAST(lv AS DOUBLE) AS lv
            FROM (VALUES {_PQ_LUT_VALUES}) AS t(s, cid, lv)),
    est AS (
        SELECT b.vec_id,
               list_reduce(list(l.lv ORDER BY b.s), (a, b) -> a + b)
                   AS est_raw
        FROM best b JOIN lut l ON l.s = b.s AND l.cid = b.cid
        GROUP BY b.vec_id
    ),
    td AS (
        SELECT vec_id,
               list_reduce(
                   list_transform(e, (x, i) -> (x - ({_PQ_QUERY_SQL})[i])
                                             * (x - ({_PQ_QUERY_SQL})[i])),
                   (a, b) -> a + b) AS tdist
        FROM v
    )
    SELECT est.vec_id, ROUND(est.est_raw, 6) AS est_dist,
           ROUND(td.tdist, 6) AS true_dist,
           CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT vec_id, est_raw,
               ROW_NUMBER() OVER (ORDER BY est_raw, vec_id) AS rk
        FROM est
    ) est JOIN td USING (vec_id)
    WHERE rk <= 20
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-20 for a literal query vector
    (`similarity.pq_adc_scores`): the m×k lookup table of
    query-to-codeword distances is computed once driver-side and
    inlined as a constant in BOTH engines, so scoring a candidate is
    8 integer-indexed lookups + ordered adds — bit-equal est_dist,
    deterministic ranking. Emits the exact distance alongside so the
    quantization gap is visible in the checked output. At scale this
    runs inside IVF cells over PQ codes only — raw vectors are never
    touched during scan."""
    emb = read_table(spark, sf_dir, "embeddings")
    enc = similarity.pq_encode(emb, _PQ_CODEBOOKS)
    adc = similarity.pq_adc_scores(enc, _PQ_CODEBOOKS, _PQ_QUERY)
    # exact distance via the same ordered fold as the engines' other
    # distance expressions
    q_lit = F.lit([float(x) for x in _PQ_QUERY])
    tdist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            q_lit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    td = emb.select("vec_id", tdist.alias("tdist"))
    # global top-k as TakeOrderedAndProject (never a full sort /
    # SinglePartition window over the corpus); the rank window then
    # runs over 20 rows
    top = adc.orderBy(F.asc("est_dist"), F.asc("vec_id")).limit(20)
    w = Window.orderBy(F.asc("est_dist"), F.asc("vec_id"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .join(td, "vec_id")
        .select(
            "vec_id",
            F.round("est_dist", 6).alias("est_dist"),
            F.round("tdist", 6).alias("true_dist"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


_IVF_PROBED = sorted(
    range(len(_KMEANS_CENTROIDS)),
    key=lambda i: (
        similarity._fold_sq_dist(_PQ_QUERY, _KMEANS_CENTROIDS[i]),
        i,
    ),
)[:3]


@_q(
    "ivf_pq_knn",
    f"""
    WITH {_KMEANS_DIST_CTES},
    cand AS (
        SELECT vec_id, e, cluster_id FROM best
        WHERE cluster_id IN ({", ".join(str(i) for i in _IVF_PROBED)})
    ),
    pcb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    pd AS (
        SELECT vec_id, cluster_id, s, cid,
               list_reduce(
                   list_transform(e[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM cand CROSS JOIN pcb
    ),
    pbest AS (
        SELECT vec_id, cluster_id, s, cid FROM pd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    ),
    lut AS (SELECT s, cid, CAST(lv AS DOUBLE) AS lv
            FROM (VALUES {_PQ_LUT_VALUES}) AS t(s, cid, lv)),
    est AS (
        SELECT b.vec_id, b.cluster_id,
               list_reduce(list(l.lv ORDER BY b.s), (a, b) -> a + b)
                   AS est_raw
        FROM pbest b JOIN lut l ON l.s = b.s AND l.cid = b.cid
        GROUP BY b.vec_id, b.cluster_id
    )
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cell,
           ROUND(est_raw, 6) AS est_dist
    FROM est
    QUALIFY ROW_NUMBER() OVER (ORDER BY est_raw, vec_id) <= 10
    """,
)
def ivf_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 for the literal query
    (`similarity.ivf_pq_search`) — the billion-scale ANN capstone
    composing the coarse k-means cells with the PQ/ADC path: the
    probed-cell set (3 nearest of 8, from the literal query and
    centroids) is a compile-time constant pruning candidates BEFORE
    any scoring, the ADC table is the same inlined constant as
    `pq_adc_topk`, and the whole search is one scan → filter →
    lookup-adds → TakeOrderedAndProject. est_dist is bit-equal on
    both engines (ordered folds of identical literals), so the
    top-10 membership cannot flip."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_pq_search(
        emb, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, _PQ_QUERY, nprobe=3, k=10
    )
    return out.select(
        "vec_id", "cell", F.round("est_dist", 6).alias("est_dist")
    )


@_q(
    "hopping_window_counts",
    """
    WITH w AS (
        SELECT time_bucket(INTERVAL 10 MINUTE, ts)
                   - k.k * INTERVAL 10 MINUTE AS window_start,
               value
        FROM events, (SELECT unnest(range(3)) AS k) k
    )
    SELECT window_start,
           window_start + INTERVAL 30 MINUTE AS window_end,
           COUNT(*) AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w
    GROUP BY 1
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) time windows — 30-minute windows sliding
    every 10: the batch face of the streaming sliding-window mart
    (`ingest.windowed_event_counts(slide=...)`), oracle-checked: each
    event lands in exactly window/slide = 3 windows, which the oracle
    builds by explicit replication (time_bucket − k·slide) while
    Spark's `window(ts, 30m, 10m)` generates the same assignment
    internally. One Generate + one partial/final agg — replication
    factor is the constant window/slide ratio, so cost scales
    linearly with events at any corpus size."""
    ev = read_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("events_count"),
            F.sum(val).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "events_count",
            "total_value",
        )
    )


@_q(
    "array_map_kitchen_sink",
    """
    WITH u AS (
        SELECT user_id,
               list_sort(list(DISTINCT event_type)) AS types,
               list_sort(list(DISTINCT CAST(value AS DECIMAL(18,2)))) AS vals
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id,
           len(types) AS n_types,
           list_contains(types, 'purchase') AS has_purchase,
           array_to_string(list_sort(list_intersect(
               types, ['purchase', 'error', 'signup'])), ',') AS funnel_types,
           array_to_string(list_filter(types, t -> t <> 'view'), ',')
               AS non_view_types,
           CAST(list_reduce(list_transform(vals, v -> CAST(v AS DOUBLE)),
                            (a, b) -> a + b) AS DOUBLE) AS distinct_value_sum,
           CAST(vals[1] AS DOUBLE) AS min_distinct_value,
           CAST(vals[-1] AS DOUBLE) AS max_distinct_value
    FROM u
    """,
)
def array_map_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function SQL-surface breadth (the collection analogue of
    `string_kitchen_sink`): collect_set → sorted arrays, membership,
    intersection against a literal, lambda filter, ordered
    higher-order fold over distinct decimals (exact, so the sum is
    order-safe on both engines via the sorted array), and negative
    indexing via element_at(-1). One shuffle (the per-user agg);
    everything after is projection."""
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types"),
        F.array_sort(
            F.collect_set(F.col("value").cast("decimal(18,2)"))
        ).alias("vals"),
    )
    funnel = F.array(F.lit("purchase"), F.lit("error"), F.lit("signup"))
    return u.select(
        "user_id",
        F.size("types").alias("n_types"),
        F.array_contains("types", "purchase").alias("has_purchase"),
        F.array_join(
            F.array_sort(F.array_intersect("types", funnel)), ","
        ).alias("funnel_types"),
        F.array_join(
            F.filter("types", lambda t: t != "view"), ","
        ).alias("non_view_types"),
        F.aggregate(
            F.transform("vals", lambda v: v.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("distinct_value_sum"),
        F.element_at("vals", 1).cast("double").alias("min_distinct_value"),
        F.element_at("vals", -1).cast("double").alias("max_distinct_value"),
    )


@_q(
    "pq_residual_codes",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    cc AS (SELECT * FROM (VALUES {_KMEANS_CENTROID_VALUES}) AS t(ccid, ccv)),
    cd AS (
        SELECT vec_id, e, ccid, ccv,
               list_reduce(
                   list_transform(e, (x, i) -> (x - ccv[i]) * (x - ccv[i])),
                   (a, b) -> a + b) AS ds
        FROM v CROSS JOIN cc
    ),
    bestc AS (
        SELECT vec_id, e, ccid AS cluster_id, ccv FROM cd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ds, ccid) = 1
    ),
    rv AS (
        SELECT vec_id, cluster_id,
               list_transform(e, (x, i) -> x - ccv[i]) AS re
        FROM bestc
    ),
    pcb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    pd AS (
        SELECT vec_id, cluster_id, s, cid,
               list_reduce(
                   list_transform(re[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM rv CROSS JOIN pcb
    ),
    pbest AS (
        SELECT vec_id, cluster_id, s, cid, ds FROM pd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    )
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cluster_id,
           array_to_string(list(cid ORDER BY s), ',') AS codes_csv,
           ROUND(list_reduce(list(ds ORDER BY s), (a, b) -> a + b), 6)
               AS recon_err
    FROM pbest GROUP BY vec_id, cluster_id
    """,
)
def pq_residual_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual PQ encode (`similarity.pq_encode_residual`) — the
    production IVF-PQ detail: quantize x − coarse_centroid[cell]
    against the shared codebooks. The coarse argmin, literal-matrix
    centroid lookup, subtraction, and 8 subspace argmins fuse into
    ONE shuffle-free stage; the whole composition (cell + codes +
    residual reconstruction error) is hash-compared. Codes are
    emitted CSV-joined (`codes_csv`) so the driver's pandas
    canonicalizer can sort/hash them (array cells broke the r7 row)."""
    emb = read_table(spark, sf_dir, "embeddings")
    enc = similarity.pq_encode_residual(
        emb, _KMEANS_CENTROIDS, _PQ_CODEBOOKS
    )
    return enc.select(
        "vec_id",
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
        F.round("recon_err", 6).alias("recon_err"),
    )


_IVF_RES_LUT_VALUES = ", ".join(
    f"({c}, {s}, {cid}, "
    + repr(
        similarity._fold_sq_dist(
            [
                q - cc
                for q, cc in zip(
                    _PQ_QUERY[s * _PQ_SUB : (s + 1) * _PQ_SUB],
                    _KMEANS_CENTROIDS[c][s * _PQ_SUB : (s + 1) * _PQ_SUB],
                )
            ],
            cw,
        )
    )
    + ")"
    for c in _IVF_PROBED
    for s, cb in enumerate(_PQ_CODEBOOKS)
    for cid, cw in enumerate(cb)
)


@_q(
    "ivf_pq_residual_knn",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    cc AS (SELECT * FROM (VALUES {_KMEANS_CENTROID_VALUES}) AS t(ccid, ccv)),
    cd AS (
        SELECT vec_id, e, ccid, ccv,
               list_reduce(
                   list_transform(e, (x, i) -> (x - ccv[i]) * (x - ccv[i])),
                   (a, b) -> a + b) AS ds
        FROM v CROSS JOIN cc
    ),
    bestc AS (
        SELECT vec_id, e, ccid AS cluster_id, ccv FROM cd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ds, ccid) = 1
    ),
    rv AS (
        SELECT vec_id, cluster_id,
               list_transform(e, (x, i) -> x - ccv[i]) AS re
        FROM bestc
        WHERE cluster_id IN ({", ".join(str(i) for i in _IVF_PROBED)})
    ),
    pcb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    pd AS (
        SELECT vec_id, cluster_id, s, cid,
               list_reduce(
                   list_transform(re[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM rv CROSS JOIN pcb
    ),
    pbest AS (
        SELECT vec_id, cluster_id, s, cid FROM pd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    ),
    lut AS (SELECT cell, s, cid, CAST(lv AS DOUBLE) AS lv
            FROM (VALUES {_IVF_RES_LUT_VALUES}) AS t(cell, s, cid, lv)),
    est AS (
        SELECT b.vec_id, b.cluster_id,
               list_reduce(list(l.lv ORDER BY b.s), (a, b) -> a + b)
                   AS est_raw
        FROM pbest b
        JOIN lut l ON l.cell = b.cluster_id AND l.s = b.s AND l.cid = b.cid
        GROUP BY b.vec_id, b.cluster_id
    )
    SELECT vec_id, CAST(cluster_id AS INTEGER) AS cell,
           ROUND(est_raw, 6) AS est_dist
    FROM est
    QUALIFY ROW_NUMBER() OVER (ORDER BY est_raw, vec_id) <= 10
    """,
)
def ivf_pq_residual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-mode IVF-PQ top-10
    (`similarity.ivf_pq_search_residual`): per-cell ADC tables over
    centered residuals — the full production FAISS search path. The
    probe filter runs before any scoring, the nprobe×m×k table is a
    plan literal, and est_dist is bit-equal across engines (ordered
    folds of identical literal doubles), so the top-10 is
    hash-checked like its raw-vector sibling `ivf_pq_knn`."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_pq_search_residual(
        emb, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, _PQ_QUERY, nprobe=3, k=10
    )
    return out.select(
        "vec_id", "cell", F.round("est_dist", 6).alias("est_dist")
    )


# ---------------------------------------------------------------------------
# Temporal (validity-interval) join against the SCD2 history — the
# warehouse AS-OF pattern: each fact row joins the dimension state
# whose [effective_from, effective_to) interval contains its event
# time. Registered after scd2_user_state so its oracle text can be
# embedded as a CTE.
# ---------------------------------------------------------------------------


def _register_purchases_asof_state() -> None:
    scd2_sql = ORACLES["scd2_user_state"]

    @_q(
        "purchases_asof_state",
        f"""
        WITH s AS ({scd2_sql}),
        p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts,
               s.version_n, s.event_type AS state_type,
               s.value AS state_value
        FROM p JOIN s
          ON p.user_id = s.user_id
         AND p.ts >= s.effective_from
         AND (s.effective_to IS NULL OR p.ts < s.effective_to)
        """,
    )
    def purchases_asof_state(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Validity-interval (AS OF) join: every purchase picks the
        SCD2 state row whose [effective_from, effective_to) interval
        contains its timestamp — exactly one match per fact because
        the intervals tile each user's timeline (the purchase itself
        is an event, so a containing interval always exists). Plan:
        ONE hash shuffle on user_id with the interval predicate as a
        residual join filter — per-user history is the bounded
        dimension side, so there is no range-join blowup; this is the
        read pattern `scd2_user_state` exists to serve, and the
        inclusive-start convention is the one `pit_user_features`'s
        strict-< leakage rule deliberately excludes (state AT the
        instant is visible; FUTURE features are not — different
        semantics for different consumers, both tested)."""
        from ..operators.scd import scd2_history

        ev = read_table(spark, sf_dir, "events")
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", F.col("user_id").alias("p_user"), "ts"
        )
        states = scd2_history(
            ev,
            key_cols=["user_id"],
            ts_col="ts",
            attr_cols=["event_type", "value"],
            tiebreak_col="event_id",
        )
        return (
            purchases.join(
                states,
                (F.col("p_user") == F.col("user_id"))
                & (F.col("ts") >= F.col("effective_from"))
                & (
                    F.col("effective_to").isNull()
                    | (F.col("ts") < F.col("effective_to"))
                ),
            )
            .select(
                "event_id",
                "user_id",
                "ts",
                "version_n",
                F.col("event_type").alias("state_type"),
                F.col("value").alias("state_value"),
            )
        )


_register_purchases_asof_state()


@_q(
    "doc_unicode_normalize",
    """
    WITH d AS (
        SELECT doc_id,
               substring(text, 1, 40) || ' cafe' || chr(769)
                   || ' nai' || chr(776) || 've' AS decorated
        FROM documents
    )
    SELECT doc_id,
           length(decorated) AS len_decorated,
           length(nfc_normalize(decorated)) AS len_normalized,
           nfc_normalize(decorated) AS normalized
    FROM d
    """,
)
def doc_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (`cleaning.normalize_unicode`) — the
    text-canonicalization step upstream of every hash-based dedup
    (decomposed 'é' and composed 'é' must fingerprint identically).
    The synthetic corpus is pure ASCII, so the query appends
    DECOMPOSED combining sequences (e + U+0301, i + U+0308) to each
    doc; normalization must fuse them — lengths shrink by exactly the
    combining-mark count and the normalized strings hash-match
    DuckDB's nfc_normalize. The UDF is an Arrow-batched vectorized
    str.normalize — the one Python-touching text op in the cleaning
    family, batched like the multimodal decoders."""
    docs = read_table(spark, sf_dir, "documents")
    # DECOMPOSED escapes (e + combining acute, i + combining
    # diaeresis) matching the oracle chr(769)/chr(776) - a
    # composed source literal would make this a no-op
    decorated = F.concat(
        F.substring("text", 1, 40),
        F.lit(" cafe\u0301 nai\u0308ve"),
    )
    d = docs.select("doc_id", decorated.alias("decorated"))
    norm = cleaning.normalize_unicode(F.col("decorated"), form="NFC")
    return d.select(
        "doc_id",
        F.length("decorated").cast("int").alias("len_decorated"),
        F.length(norm).cast("int").alias("len_normalized"),
        norm.alias("normalized"),
    )


def _register_dsir_gumbel_sample() -> None:
    dsir_sql = ORACLES["doc_dsir_weights"]

    @_q(
        "dsir_gumbel_sample",
        f"""
        WITH w AS ({dsir_sql}),
        keyed AS (
            SELECT w.doc_id, w.is_target, w.log_weight,
                   w.log_weight
                   - ln(-ln((CAST(('0x' || substring(md5(d.text), 1, 8))
                              AS BIGINT) + 1) / 4294967296.0)) AS k
            FROM w JOIN documents d ON w.doc_id = d.doc_id
        )
        SELECT doc_id, is_target, log_weight,
               CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS INTEGER)
                   AS rnk
        FROM keyed
        ORDER BY rnk
        LIMIT 20
        """,
    )
    def dsir_gumbel_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The DSIR resampling step via the paper's own Gumbel
        top-k: draw ∝ exp(log_weight) by ranking
        log_weight + Gumbel(u), Gumbel = −ln(−ln u) with u the
        content-hash uniform — composing the green importance
        weights with the A-ES machinery WITHOUT any exp() call
        (ln is the empirically bit-equal transcendental across
        these engines; exp is unproven, so the key stays in log
        space). Deterministic and partitioning-invariant; on this
        synthetic corpus the langs share one vocabulary, so the
        weights are small vs the Gumbel noise and the skew is mild —
        the planted-domain unit test is where the selection pressure
        is visible (test_queries_misc).
        Plan: the dsir scoring subtree + one broadcast-joined hash
        projection + TakeOrderedAndProject(20)."""
        docs = read_table(spark, sf_dir, "documents")
        w = textfn.dsir_log_weights(
            docs, F.col("lang") == "en", id_col="doc_id",
            text_col="text", n_buckets=256,
        )
        u = (
            F.conv(
                F.substring(F.md5(F.col("text").cast("binary")), 1, 8),
                16, 10,
            ).cast("long")
            + 1
        ) / F.lit(4294967296.0)
        keyed = w.join(
            docs.select("doc_id", u.alias("_u")), "doc_id"
        ).select(
            "doc_id",
            "is_target",
            "log_weight",
            (F.col("log_weight") - F.log(-F.log(F.col("_u")))).alias("_k"),
        )
        top = keyed.orderBy(F.desc("_k"), F.asc("doc_id")).limit(20)
        rw = Window.orderBy(F.desc("_k"), F.asc("doc_id"))
        return (
            top.withColumn("rnk", F.row_number().over(rw).cast("int"))
            .select("doc_id", "is_target", "log_weight", "rnk")
        )


@_q(
    "related_customers_ppr",
    """
    WITH e0 AS (
        SELECT c_custkey AS src, c_custkey // 2 AS dst
        FROM customer WHERE c_custkey > 1
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
    p AS (SELECT v, CASE WHEN v IN (1, 2, 3)
                         THEN 1.0 / 3.0 ELSE 0.0 END AS pv FROM deg),
    r0 AS (SELECT v, pv AS r FROM p),
    i1 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r0 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r1 AS (SELECT p.v, 0.125 * p.pv + 0.875 * COALESCE(i1.s, 0.0) AS r
           FROM p LEFT JOIN i1 ON p.v = i1.v),
    i2 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r1 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r2 AS (SELECT p.v, 0.125 * p.pv + 0.875 * COALESCE(i2.s, 0.0) AS r
           FROM p LEFT JOIN i2 ON p.v = i2.v),
    i3 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r2 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r3 AS (SELECT p.v, 0.125 * p.pv + 0.875 * COALESCE(i3.s, 0.0) AS r
           FROM p LEFT JOIN i3 ON p.v = i3.v)
    SELECT v AS vertex, ROUND(r, 12) + 0.0 AS pagerank
    FROM r3 WHERE r > 0
    """,
)
def related_customers_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from seeds {1,2,3} over the undirected
    referral tree (`graph.pagerank(personalization=...)`) — the
    related-item / recommendation ranking: teleport mass stays on
    the seed set, so rank measures proximity to the seeds rather
    than global centrality. Same per-round join+agg shape and
    ROUND(,12) float policy as the uniform sibling; vertices the
    mass hasn't reached (rank exactly 0 after 3 rounds) are filtered
    on BOTH sides, keeping the output the reachable neighborhood.
    + 0.0 canonicalizes negative zero, like `doc_dsir_weights`."""
    cust = read_table(spark, sf_dir, "customer")
    edges = cust.where(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
    )
    pr = graph.pagerank(
        edges, n_iter=3, damping=0.875, undirected=True,
        personalization=[1, 2, 3],
    )
    return pr.where(F.col("pagerank") > 0).select(
        "vertex",
        (F.round("pagerank", 12) + F.lit(0.0)).alias("pagerank"),
    )


@_q(
    "kfold_split_counts",
    """
    WITH f AS (
        SELECT doc_id, n_chars,
               CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8) AS BIGINT) % 5 AS INTEGER)
                   AS fold
        FROM documents
    )
    SELECT fold, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM f GROUP BY fold
    """,
)
def kfold_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment by content hash (portable
    md5 bucket of the id, k=5) — the k-way generalization of the
    green `train_val_split_counts`: deterministic, partitioning-
    invariant, reproducible on any engine, no RNG state. Every doc
    lands in exactly one fold by construction; the per-fold counts /
    char totals are what a CV harness consumes. One partial/final
    agg; the fold column itself is a pure projection usable as a
    filter (fold != i → training shard i)."""
    docs = read_table(spark, sf_dir, "documents")
    fold = (
        textfn.hashed_bucket(F.col("doc_id").cast("string"), 5)
        .cast("int")
        .alias("fold")
    )
    return (
        docs.select(fold, "doc_id", "n_chars")
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR importance weighting (Xie et al. 2023) — the data-selection
# scorer between raw crawl and target domain. Hashed-unigram bucket
# models on both engines via the portable md5 bucket; per-doc sums
# fold the doc's own token array in order (the doc_unigram_logprob
# determinism pattern).
# ---------------------------------------------------------------------------


@_q(
    "doc_dsir_weights",
    r"""
    WITH t AS (
        SELECT doc_id, lang = 'en' AS is_target,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id, is_target,
               CAST('0x' || substring(md5(unnest(w)), 1, 8) AS BIGINT)
                   % 256 AS b,
               unnest(range(1, len(w) + 1)) AS pos
        FROM t
    ),
    stats AS (
        SELECT b, COUNT(*) AS r_cnt,
               count_if(is_target) AS t_cnt
        FROM tok GROUP BY b
    ),
    tot AS (SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM stats),
    lp AS (
        SELECT tok.doc_id, tok.pos,
               ln((s.t_cnt + 1.0) / (tot.t_tot + 256.0))
             - ln((s.r_cnt + 1.0) / (tot.r_tot + 256.0)) AS c
        FROM tok JOIN stats s USING (b), tot
    ),
    agg AS (
        SELECT doc_id,
               list_reduce(list(c ORDER BY pos), (a, b) -> a + b) AS s,
               COUNT(*) AS n
        FROM lp GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(agg.n AS INTEGER) AS n_tokens, t.is_target,
           ROUND(agg.s, 4) + 0.0 AS log_weight
    FROM t JOIN agg USING (doc_id)
    """,
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over the documents table with the
    English subset as the target distribution
    (`functions/text.dsir_log_weights`): log p_target/p_raw under
    256-bucket hashed-unigram models, Laplace-smoothed. Bucket counts
    are two ≤256-row aggs broadcast back as one map row; scoring is a
    shuffle-free per-row fold. Resampling by exp(log_weight) is the
    already-green `weighted_doc_sample` A-ES operator — together they
    form the full DSIR select-then-sample pipeline."""
    docs = read_table(spark, sf_dir, "documents")
    return textfn.dsir_log_weights(
        docs, F.col("lang") == "en", id_col="doc_id", text_col="text",
        n_buckets=256,
    )


_register_dsir_gumbel_sample()


# ---------------------------------------------------------------------------
# PageRank (operators/graph.pagerank) — link-analysis centrality for
# provenance/citation graphs, run here over the deterministic
# heap-shaped customer referral tree (the `customer_chain_rollup`
# graph) taken undirected. Both engines run the IDENTICAL 3 unrolled
# power-iteration rounds; damping 7/8 is binary-exact and ranks
# round to 12 decimals (float-noise analysis in the operator
# docstring).
# ---------------------------------------------------------------------------


@_q(
    "customer_graph_pagerank",
    """
    WITH e0 AS (
        SELECT c_custkey AS src, c_custkey // 2 AS dst
        FROM customer WHERE c_custkey > 1
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
    nt AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT v, 1.0 / nt.n AS r FROM deg, nt),
    i1 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r0 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r1 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i1.s, 0.0) AS r
           FROM deg LEFT JOIN i1 ON deg.v = i1.v, nt),
    i2 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r1 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r2 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i2.s, 0.0) AS r
           FROM deg LEFT JOIN i2 ON deg.v = i2.v, nt),
    i3 AS (SELECT e.dst AS v, SUM(r.r / d.d) AS s
           FROM e JOIN r2 r ON r.v = e.src JOIN deg d ON d.v = e.src
           GROUP BY e.dst),
    r3 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i3.s, 0.0) AS r
           FROM deg LEFT JOIN i3 ON deg.v = i3.v, nt)
    SELECT v AS vertex, ROUND(r, 12) AS pagerank FROM r3
    """,
)
def customer_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected customer referral tree (parent =
    custkey div 2): 3 power-iteration rounds, damping 7/8, uniform
    init. Each round is one join + one partial/final agg — the
    100 TB per-round shape shared with connected components; the
    edge+degree side is checkpointed once. Rank mass is conserved at
    exactly 1 (undirected ⇒ no dangling correction), asserted by the
    property tests; the root (custkey 1) is the hub."""
    cust = read_table(spark, sf_dir, "customer")
    edges = cust.where(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
    )
    pr = graph.pagerank(edges, n_iter=3, damping=0.875, undirected=True)
    return pr.select(
        F.col("vertex"), F.round("pagerank", 12).alias("pagerank")
    )


# ---------------------------------------------------------------------------
# Declarative data-quality suite (operators/checks.constraint_report)
# — the deequ/dbt-test surface generalizing the reference's
# hand-written post-load checks (`sql/load/04_checks.sql`,
# `sql/mart/03_checks.sql`): N rules verified in ONE scan with SQL
# CHECK semantics (NULL passes), plus a referential rule via anti
# join, unioned into one report.
# ---------------------------------------------------------------------------


@_q(
    "orders_constraint_report",
    """
    WITH base AS (
        SELECT COUNT(*) AS n_rows,
               count_if(NOT COALESCE(o_totalprice > 0, TRUE))
                   AS v_totalprice_positive,
               count_if(NOT COALESCE(o_orderstatus IN ('O','F','P'), TRUE))
                   AS v_status_known,
               count_if(NOT COALESCE(o_orderstatus IN ('O','F'), TRUE))
                   AS v_status_closed_only,
               count_if(NOT COALESCE(
                   regexp_matches(o_orderpriority, '^[1-5]-'), TRUE))
                   AS v_priority_format,
               count_if(NOT COALESCE(
                   o_orderdate < TIMESTAMP '2000-01-01', TRUE))
                   AS v_orderdate_before_y2k,
               count_if(NOT COALESCE(o_custkey IS NOT NULL, TRUE))
                   AS v_custkey_present
        FROM orders
    ),
    stacked AS (
        SELECT 'totalprice_positive' AS "constraint", n_rows,
               v_totalprice_positive AS n_violations FROM base
        UNION ALL SELECT 'status_known', n_rows, v_status_known FROM base
        UNION ALL SELECT 'status_closed_only', n_rows,
                         v_status_closed_only FROM base
        UNION ALL SELECT 'priority_format', n_rows,
                         v_priority_format FROM base
        UNION ALL SELECT 'orderdate_before_y2k', n_rows,
                         v_orderdate_before_y2k FROM base
        UNION ALL SELECT 'custkey_present', n_rows,
                         v_custkey_present FROM base
        UNION ALL SELECT 'custkey_fk', n_rows,
                         (SELECT COUNT(*) FROM orders o
                          WHERE o.o_custkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM customer c
                                            WHERE c.c_custkey = o.o_custkey))
                   FROM base
    )
    SELECT "constraint", n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM stacked
    """,
)
def orders_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint verification suite over orders in one scan plus
    one anti-join row: domain, format, range, NOT NULL, and FK rules,
    with `status_closed_only` and `orderdate_before_y2k` deliberately
    violated by the data so the report discriminates (the all-green
    report is vacuous). All boolean rules share a single
    partial-aggregatable pass regardless of rule count — adding a
    rule costs one aggregate expression, not a scan."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    report = checks.constraint_report(
        orders,
        {
            "totalprice_positive": F.col("o_totalprice") > 0,
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
            "status_closed_only": F.col("o_orderstatus").isin("O", "F"),
            "priority_format": F.col("o_orderpriority").rlike(r"^[1-5]-"),
            "orderdate_before_y2k": F.col("o_orderdate")
            < F.to_timestamp(F.lit("2000-01-01")),
            "custkey_present": F.col("o_custkey").isNotNull(),
        },
    )
    fk = checks.referential_violations(
        orders, cust, fk="o_custkey", pk="c_custkey", constraint="custkey_fk"
    )
    return report.unionByName(fk)


# ---------------------------------------------------------------------------
# Skyline / Pareto-front operator (operators/relational.skyline_2d):
# the sort-based O(n log n) plan vs the oracle's textbook O(n²)
# NOT EXISTS dominance definition — two independently-derived
# formulations cross-checking each other. Dominance here: within a
# brand, a part is dominated if another part is no more expensive
# AND no smaller, strictly better on at least one.
# ---------------------------------------------------------------------------


@_q(
    "parts_price_size_skyline",
    """
    SELECT p_brand, p_partkey, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_brand = a.p_brand
          AND b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
)
def parts_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline of (retail price ↓, size ↑). The operator's
    plan is two key-bounded shuffles (group-by + window) regardless
    of row count — the NOT EXISTS pair formulation the oracle runs
    would be a quadratic theta-join at scale. Raw double price is
    compared, never arithmetic'd, so no float policy is needed."""
    part = read_table(spark, sf_dir, "part")
    return relational.skyline_2d(
        part,
        group_cols=["p_brand"],
        min_col="p_retailprice",
        max_col="p_size",
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (operators/relational.cooccurrence_
# pairs): support + lift over brands bought in the same order — the
# frequent-pair step of association-rule mining (Agrawal &
# Srikant, VLDB 1994), grouped to the brand dimension so the
# within-basket pair fan-out stays bounded at any scale.
# ---------------------------------------------------------------------------


@_q(
    "brand_copurchase_lift",
    """
    WITH inc AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               COUNT(*) AS pair_baskets
        FROM inc a JOIN inc b ON a.b = b.b AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    ic AS (SELECT item, COUNT(*) AS icnt FROM inc GROUP BY item),
    nb AS (SELECT COUNT(DISTINCT b) AS n FROM inc)
    SELECT p.item_a, p.item_b, p.pair_baskets,
           ca.icnt AS baskets_a, cb.icnt AS baskets_b,
           CAST(nb.n AS INTEGER) AS n_baskets,
           (CAST(p.pair_baskets AS DOUBLE) * CAST(nb.n AS DOUBLE))
               / (CAST(ca.icnt AS DOUBLE) * CAST(cb.icnt AS DOUBLE))
               AS lift
    FROM pairs p
    JOIN ic ca ON ca.item = p.item_a
    JOIN ic cb ON cb.item = p.item_b
    CROSS JOIN nb
    WHERE p.pair_baskets >= 5
    """,
)
def brand_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand pairs co-purchased in the same order, with lift. The
    pair join shuffles on the ORDER key (bounded ~6 brand pairs per
    4-line order); brand totals are broadcast back. lift is one
    double product/quotient of four exact integer counts — the same
    expression tree on both engines is bit-identical, no rounding
    needed."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    inc = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    out = relational.cooccurrence_pairs(inc, basket_col="basket", item_col="item")
    return out.where(F.col("pair_baskets") >= 5).select(
        "item_a",
        "item_b",
        "pair_baskets",
        "baskets_a",
        "baskets_b",
        F.col("n_baskets").cast("int").alias("n_baskets"),
        "lift",
    )


# ---------------------------------------------------------------------------
# Multi-source BFS (operators/graph.bfs_distances) over the customer
# referral tree: min-hop distance from a scattered seed set, capped.
# The frontier-expansion rounds are the Pregel shape; the oracle is
# the textbook bounded recursive CTE with MIN(d).
# ---------------------------------------------------------------------------


@_q(
    "referral_reach_bfs",
    """
    WITH RECURSIVE
    e0 AS (
        SELECT c_custkey AS src, CAST(c_custkey // 2 AS BIGINT) AS dst
        FROM customer WHERE c_custkey > 1
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    reach(v, d) AS (
        SELECT c_custkey, 0 FROM customer WHERE c_custkey % 29 = 0
        UNION
        SELECT e.dst, r.d + 1
        FROM reach r JOIN e ON e.src = r.v
        WHERE r.d < 3
    )
    SELECT v AS vertex, CAST(MIN(d) AS INTEGER) AS dist
    FROM reach GROUP BY v
    """,
)
def referral_reach_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (≤3) from seed customers (custkey % 29 == 0)
    over the undirected referral tree (parent = custkey div 2).
    Frontier BFS: each round joins ONLY the newly-settled frontier
    against the edges and anti-joins the settled set — the frontier
    shrinks as coverage saturates, unlike re-relaxing all vertices
    every round. Output is exact integers; no float policy."""
    cust = read_table(spark, sf_dir, "customer")
    edges = cust.where(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
    )
    seeds = cust.where(F.col("c_custkey") % 29 == 0).select(
        F.col("c_custkey").alias("v")
    )
    out = graph.bfs_distances(edges, seeds, max_hops=3)
    return out.select("vertex", F.col("dist").cast("int").alias("dist"))


# ---------------------------------------------------------------------------
# Exact interpolated percentiles on integer cents, at binary-exact
# quantiles only. q ∈ {0.25, 0.5, 0.75} are exact binary fractions,
# and the interpolation endpoints are integers, so lo + (hi−lo)·f and
# (1−f)·lo + f·hi are the SAME exact rational — Spark's percentile()
# and DuckDB's quantile_cont() agree to the bit even though their
# interpolation formulas differ in association. (q = 0.9 would NOT
# be safe: 0.9 has no finite binary expansion.)
# ---------------------------------------------------------------------------


@_q(
    "order_value_percentiles",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS INTEGER) AS n_orders,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.25) AS p25_cents,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.50) AS p50_cents,
           quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT), 0.75) AS p75_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles of order value per priority, on exact cents. Exact
    percentile is a sort-within-group — fine per group key at any
    scale since groups partition the data (for a single global
    percentile at 100 TB the approx_percentile sketch is the scale
    path; this query is the per-group exact form)."""
    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        orders.select("o_orderpriority", cents.alias("_cents"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_orders"),
            F.percentile("_cents", F.lit(0.25)).alias("p25_cents"),
            F.percentile("_cents", F.lit(0.50)).alias("p50_cents"),
            F.percentile("_cents", F.lit(0.75)).alias("p75_cents"),
        )
    )


# ---------------------------------------------------------------------------
# OLS regression per group from exact integer moment sums: slope /
# intercept / r² of retail price (cents) on size, per brand. All five
# moments are exact int64 SUMs (order-independent), and the closed
# forms are evaluated from those identical integers on both engines;
# ROUND(,6) absorbs any FMA-contraction ulps in the long double
# expressions (the kmeans lesson). Spark's regr_slope/regr_r2
# built-ins are cross-checked against these closed forms in pytest.
# ---------------------------------------------------------------------------


@_q(
    "brand_price_regression",
    """
    WITH m AS (
        SELECT p_brand,
               COUNT(*) AS n,
               SUM(CAST(p_size AS BIGINT)) AS sx,
               SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS sy,
               SUM(CAST(p_size AS BIGINT)
                   * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS sxy,
               SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS sxx,
               SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS syy
        FROM part GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS INTEGER) AS n_parts,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS slope_cents_per_size,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS intercept_cents,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS r2
    FROM m
    """,
)
def brand_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of price-cents on size via the five-moment
    closed form. One partial/final integer aggregation per brand —
    the classic single-pass distributed regression; the driver never
    sees row data. n·Σy² (~6e19 at sf0.1) exceeds int64, so every
    closed form converts the EXACT integer moments to double first —
    both engines see identical inputs."""
    part = read_table(spark, sf_dir, "part")
    ycents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("bigint")
    x = F.col("p_size").cast("bigint")
    m = part.select("p_brand", x.alias("_x"), ycents.alias("_y")).groupBy(
        "p_brand"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "p_brand",
        F.col("n").cast("int").alias("n_parts"),
        F.round(slope, 6).alias("slope_cents_per_size"),
        F.round(intercept, 6).alias("intercept_cents"),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney 2002): group sizes over a quasi-
# identifier tuple — the privacy-risk check a training-data release
# pipeline runs next to PII redaction. Rows whose QI group has
# fewer than k members are re-identifiable; report the risk mass
# per market segment.
# ---------------------------------------------------------------------------


@_q(
    "customer_kanonymity_risk",
    """
    WITH g AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) / 1000)
                    AS BIGINT) AS bal_bucket,
               COUNT(*) AS gsize
        FROM customer
        GROUP BY c_mktsegment, c_nationkey, bal_bucket
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS INTEGER) AS n_groups,
           CAST(SUM(gsize) AS INTEGER) AS n_rows,
           CAST(count_if(gsize < 5) AS INTEGER) AS n_small_groups,
           CAST(COALESCE(SUM(gsize) FILTER (WHERE gsize < 5), 0)
                AS INTEGER) AS n_rows_at_risk,
           CAST(COALESCE(SUM(gsize) FILTER (WHERE gsize < 5), 0)
                AS DOUBLE) / SUM(gsize) AS risk_frac,
           CAST(MIN(gsize) AS INTEGER) AS min_group_size
    FROM g GROUP BY c_mktsegment
    """,
)
def customer_kanonymity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k=5) over QI = (segment, nation, $1000 balance
    bucket). Two-level aggregation: group sizes shuffle once on the
    QI tuple, the per-segment risk rollup is a second key-bounded
    agg — both partial/final at scale. The bucket edge uses exact
    DECIMAL division so boundary balances land identically on both
    engines; risk_frac is one int/int double division."""
    cust = read_table(spark, sf_dir, "customer")
    bucket = F.floor(
        F.col("c_acctbal").cast("decimal(18,2)") / 1000
    ).cast("bigint")
    g = cust.select(
        "c_mktsegment", "c_nationkey", bucket.alias("bal_bucket")
    ).groupBy("c_mktsegment", "c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).alias("gsize")
    )
    small = F.col("gsize") < 5
    return g.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("int").alias("n_groups"),
        F.sum("gsize").cast("int").alias("n_rows"),
        F.sum(small.cast("int")).cast("int").alias("n_small_groups"),
        F.coalesce(
            F.sum(F.when(small, F.col("gsize"))), F.lit(0)
        ).cast("int").alias("n_rows_at_risk"),
        (
            F.coalesce(F.sum(F.when(small, F.col("gsize"))), F.lit(0)).cast(
                "double"
            )
            / F.sum("gsize")
        ).alias("risk_frac"),
        F.min("gsize").cast("int").alias("min_group_size"),
    )


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2): the line-level and
# document-level heuristics the C4 corpus applied — short-line
# removal, "lorem ipsum" and brace (code) document drops. Like
# doc_boilerplate_strip, the single-line synthetic corpus gets its
# line structure planted deterministically in BOTH engines so every
# rule fires on a known subset at every SF.
# ---------------------------------------------------------------------------


@_q(
    "doc_c4_rules",
    r"""
    WITH built AS (
        SELECT doc_id,
               concat(
                   text,
                   CASE WHEN doc_id % 7 = 0
                        THEN concat(chr(10), 'too short line') END,
                   CASE WHEN doc_id % 11 = 0
                        THEN concat(chr(10),
                                    'lorem ipsum dolor sit amet filler')
                        END,
                   CASE WHEN doc_id % 13 = 0
                        THEN concat(chr(10), 'function() { return code }')
                        END
               ) AS text
        FROM documents
    ),
    lined AS (
        SELECT doc_id, string_split(text, chr(10)) AS lines FROM built
    ),
    m AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               len(list_filter(lines,
                   x -> len(list_filter(string_split_regex(x, '\s+'),
                                        w -> w <> '')) >= 5))
                   AS n_kept_lines,
               contains(lower(array_to_string(lines, chr(10))),
                        'lorem ipsum') AS has_lorem,
               contains(array_to_string(lines, chr(10)), '{') AS has_brace
        FROM lined
    )
    SELECT doc_id,
           CAST(n_lines AS INTEGER) AS n_lines,
           CAST(n_kept_lines AS INTEGER) AS n_kept_lines,
           has_lorem, has_brace,
           CAST(n_kept_lines AS DOUBLE) / n_lines AS kept_line_frac,
           (NOT has_lorem) AND (NOT has_brace) AND n_kept_lines >= 1
               AS c4_keep
    FROM m
    """,
)
def doc_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 document heuristics over a deterministically planted line
    structure: doc_id%7 gains a 3-word line (dropped by the ≥5-word
    line rule), %11 a lorem-ipsum line (document dropped), %13 a
    brace line (document dropped). Pure projection with higher-order
    list functions — zero shuffles at any scale; the ratio is one
    int/int division."""
    docs = read_table(spark, sf_dir, "documents")
    nl = F.lit("\n")
    built = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(nl, F.lit("too short line"))
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(nl, F.lit("lorem ipsum dolor sit amet filler")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(nl, F.lit("function() { return code }")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    lines = F.split(F.col("text"), "\n")
    words = lambda x: F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != "")
    n_lines = F.size(lines)
    n_kept = F.size(F.filter(lines, lambda x: F.size(words(x)) >= 5))
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    return built.select(
        "doc_id",
        n_lines.cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (n_kept.cast("double") / n_lines).alias("kept_line_frac"),
        (~has_lorem & ~has_brace & (n_kept >= 1)).alias("c4_keep"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training (e.g. DPR, Karpukhin
# et al. 2020): for each query vector, the nearest neighbors whose
# LABEL differs — the "looks similar, is different" examples a
# contrastive objective needs. Same broadcast-scored shape as
# knn_cosine with a label-inequality predicate before the top-k.
# ---------------------------------------------------------------------------


@_q(
    "hard_negative_mining",
    """
    WITH q AS (
        SELECT vec_id AS query_id, label AS query_label,
               CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, q.query_label, e.vec_id, e.label AS neg_label,
               list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[]))
                   AS cos
        FROM q JOIN embeddings e ON e.label <> q.query_label
    )
    SELECT query_id, CAST(query_label AS INTEGER) AS query_label,
           vec_id, CAST(neg_label AS INTEGER) AS neg_label,
           ROUND(cos, 4) AS cosine_sim, CAST(rn AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
        FROM scored
    ) t
    WHERE rn <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cross-label neighbors per query. The label filter rides
    the broadcast cross join as a cheap predicate BEFORE scoring, so
    mining negatives costs the same one corpus scan as plain kNN;
    top-k is a windowed rank over the small query dimension."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("_qvec"),
        similarity.l2_norm(F.col("embedding")).alias("_qn"),
    )
    c = emb.select(
        "vec_id",
        F.col("label").alias("neg_label"),
        "embedding",
        similarity.l2_norm(F.col("embedding")).alias("_cn"),
    )
    scored = (
        c.join(
            F.broadcast(q), F.col("neg_label") != F.col("query_label")
        ).select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            (
                similarity.dot(F.col("_qvec"), F.col("embedding"))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id",
            F.col("query_label").cast("int").alias("query_label"),
            "vec_id",
            F.col("neg_label").cast("int").alias("neg_label"),
            F.round("_cos", 4).alias("cosine_sim"),
            F.col("rnk").cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# Training-mixture reweighting: per-source token mass → the sampling
# weight that achieves a target mixture (uniform here), with an
# epoch cap — the bookkeeping step between corpus stats and a
# sampler (the weights feed the existing A-ES weighted sampler).
# ---------------------------------------------------------------------------


@_q(
    "source_mixture_weights",
    r"""
    WITH s AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                        w -> w <> ''))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
                 COUNT(*) AS n_sources FROM s)
    SELECT s.source,
           CAST(s.n_docs AS INTEGER) AS n_docs,
           s.n_tokens,
           CAST(s.n_tokens AS DOUBLE) / t.total AS natural_share,
           (CAST(t.total AS DOUBLE) / t.n_sources) / s.n_tokens
               AS mixture_weight,
           LEAST((CAST(t.total AS DOUBLE) / t.n_sources) / s.n_tokens,
                 2.5) AS capped_weight
    FROM s CROSS JOIN t
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target mixture weights per source: weight =
    target_share / natural_share, capped at 2.5 epochs (the "don't
    repeat a small source forever" guard). One token-count agg per
    source plus a broadcast 1-row total; every share/weight is a
    single double expression over exact integer counts — bit-equal
    cross-engine with no rounding."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    s = docs.select("source", F.size(toks).alias("_nt")).groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_tokens").alias("_total"),
        F.count(F.lit(1)).alias("_n_sources"),
    )
    joined = s.crossJoin(F.broadcast(t))
    weight = (F.col("_total").cast("double") / F.col("_n_sources")) / F.col(
        "n_tokens"
    )
    return joined.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_total")).alias(
            "natural_share"
        ),
        weight.alias("mixture_weight"),
        F.least(weight, F.lit(2.5)).alias("capped_weight"),
    )


# ---------------------------------------------------------------------------
# Python UDTF chunker (Spark 4 UDTF API, functions/udtfs.py): the
# row-multiplying Python extension point, called via SQL LATERAL
# correlation. The DuckDB oracle derives the identical chunk set
# from the closed form K = ceil((n−size)/stride); the
# DataFrame-native `doc_chunking` query remains the scale path.
# ---------------------------------------------------------------------------


@_q(
    "doc_chunks_udtf",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '')
                   AS w
        FROM documents WHERE doc_id % 10 = 0
    ),
    sized AS (
        SELECT doc_id, w, len(w) AS n,
               CASE WHEN len(w) <= 16 THEN 0
                    ELSE CAST(CEIL((len(w) - 16) / 12.0) AS BIGINT) END
                   AS max_k
        FROM toks WHERE len(w) > 0
    ),
    chunks AS (
        SELECT doc_id, k AS chunk_idx,
               list_slice(w, k * 12 + 1, k * 12 + 16) AS c
        FROM sized, LATERAL (
            SELECT unnest(generate_series(0, max_k)) AS k
        ) g
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(c) AS INTEGER) AS n_chunk_tokens,
           array_to_string(c, ' ') AS chunk_text
    FROM chunks
    """,
)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token chunks (window 16, stride 12, tail kept) emitted by the
    ChunkTokens Python UDTF through SQL LATERAL — one Arrow-batched
    Python stage, no shuffle (the expansion happens in-task). The
    docs subset keeps the Python path small; scale chunking uses the
    builtin-only doc_chunking plan."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = read_table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 10 == 0).createOrReplaceTempView(
        "_udtf_chunk_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text
        FROM _udtf_chunk_docs d,
             LATERAL chunk_tokens(d.text, 16, 12) c
        """
    )


# ---------------------------------------------------------------------------
# CUSUM change-point statistic (Page 1954) over the daily value
# series per event type — the sequential drift monitor complementing
# the distribution-level value_drift_weekly. Irreducibly ordered →
# operators/sequential.cusum_per_key (same applyInPandas fold
# contract as ema_per_key); the oracle seeds list_reduce with a
# prepended 0 so both engines evaluate the identical recurrence.
# ---------------------------------------------------------------------------


@_q(
    "daily_value_cusum",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    ref AS (
        SELECT event_type,
               CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mu
        FROM daily GROUP BY event_type
    ),
    ordered AS (
        SELECT d.event_type, d.day, d.cents, r.mu,
               list(CAST(d.cents AS DOUBLE)) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS vals
        FROM daily d JOIN ref r ON r.event_type = d.event_type
    )
    SELECT event_type, day, cents,
           list_reduce(
               list_prepend(0.0, vals),
               (acc, x) -> greatest(0.0, acc + (x - mu))
           ) AS cusum
    FROM ordered
    """,
)
def daily_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM of daily value totals against the type's own
    mean level. Daily totals are exact integer cents; the reference
    level is one exact-int division; the fold is bit-identical to
    the oracle's list_reduce (same lambda, 0-seeded) so the hash
    match needs no tolerance. One shuffle to daily grain, a
    broadcast 25-row reference join, one ordered fold per type."""
    from ..operators.sequential import cusum_per_key

    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"),
                  cents.alias("_c"))
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    ref = daily.groupBy("event_type").agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    joined = daily.join(F.broadcast(ref), "event_type").withColumn(
        "_v", F.col("cents").cast("double")
    )
    out = cusum_per_key(
        joined, "event_type", ("day",), "_v", "mu", out_col="cusum"
    )
    return out.select("event_type", "day", "cents", "cusum")


# ---------------------------------------------------------------------------
# Robust outliers via median/MAD (Iglewicz & Hoaglin 1993 modified
# z-score) — the monitoring twin of rolling_zscore that a single
# extreme value cannot poison (mean/stddev break down at one bad
# point; median/MAD have a 50% breakdown). Exact on integer cents:
# both quantile interpolations land on exact binary fractions.
# ---------------------------------------------------------------------------


@_q(
    "robust_value_outliers",
    """
    WITH base AS (
        SELECT event_id, event_type, value,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT event_type, quantile_cont(cents, 0.5) AS med
        FROM base GROUP BY event_type
    ),
    dev AS (
        SELECT b.*, m.med, ABS(b.cents - m.med) AS adev
        FROM base b JOIN med m ON m.event_type = b.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           ROUND(0.6745 * (d.cents - d.med) / m.mad, 6) AS robust_z
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE m.mad > 0
      AND ABS(ROUND(0.6745 * (d.cents - d.med) / m.mad, 6)) > 3.5
    """,
)
def robust_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score outliers per event type. med and MAD are
    exact percentiles of integers / exact halves (binary-exact
    q=0.5 interpolation), so both engines derive identical doubles;
    the flag threshold compares the ROUNDed score on both sides to
    kill any boundary-ulp disagreement. Two grouped aggs + two
    broadcast joins back — no window over the full table."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    base = ev.select("event_id", "event_type", "value", cents.alias("cents"))
    med = base.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med")
    )
    dev = base.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    z = F.round(
        F.lit(0.6745) * (F.col("cents") - F.col("med")) / F.col("mad"), 6
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.abs(z) > 3.5))
        .select("event_id", "event_type", "value", z.alias("robust_z"))
    )


# ---------------------------------------------------------------------------
# Mergeable aggregate state (the Delta/materialized-view maintenance
# pattern): daily metrics computed as TWO independent partial
# aggregations (split by event-id parity — every day present in both
# halves) whose states are merged, proving sum/count states compose
# and averages must be re-derived from merged sums, never averaged.
# The oracle is the direct single-pass aggregation.
# ---------------------------------------------------------------------------


@_q(
    "incremental_daily_metrics",
    """
    SELECT CAST(ts AS DATE) AS metric_date,
           CAST(COUNT(*) AS INTEGER) AS events_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def incremental_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance semantics: base partition (even ids)
    and delta partition (odd ids) are aggregated independently to
    (count, decimal-sum) states, unioned, and state-merged per day —
    byte-identical to the direct full aggregation because decimal
    sums and counts are associative-exact. The pattern a 100 TB
    nightly pipeline uses to avoid reprocessing history: the base
    states persist, only the delta is scanned."""
    ev = read_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col("ts").cast("date").alias("metric_date"),
                      dec.alias("_v"))
            .groupBy("metric_date")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("_v").alias("_s"),
            )
        )

    base = partial(ev.where(F.col("event_id") % 2 == 0))
    delta = partial(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("metric_date")
        .agg(F.sum("_n").alias("_n"), F.sum("_s").alias("_s"))
    )
    return merged.select(
        "metric_date",
        F.col("_n").cast("int").alias("events_count"),
        F.col("_s").cast("double").alias("total_value"),
        (F.col("_s").cast("double") / F.col("_n")).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram via the hierarchical global ntile
# (operators/prefix.global_ntile): decile boundaries of order value
# without a SinglePartition window — the optimizer-statistics /
# monitoring primitive at fact-table scale.
# ---------------------------------------------------------------------------


@_q(
    "order_value_equidepth_hist",
    """
    WITH t AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey,
               NTILE(10) OVER (ORDER BY
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                   o_orderkey) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS INTEGER) AS n_orders,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM t GROUP BY bucket
    """,
)
def order_value_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of order value. Spark's own NTILE over a
    global ORDER BY funnels 100 TB through ONE task; global_ntile
    replaces it with range-partitioned per-partition ranks plus
    broadcast cumulative offsets (hierarchical prefix sum), then the
    bucket stats are an ordinary partial/final agg. Bit-exact: the
    ANSI ntile closed form is evaluated on exact integer row
    numbers."""
    from ..operators.prefix import global_ntile

    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    t = orders.select(cents.alias("cents"), "o_orderkey")
    bucketed = global_ntile(
        t, 10, order_cols=("cents", "o_orderkey"), out_col="bucket"
    )
    return bucketed.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("int").alias("n_orders"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Entity-resolution scoring: Jaro-Winkler over blocked candidate
# pairs. The engine's one scalar Pandas UDF (functions/text.
# jaro_winkler_pandas_udf) — a from-scratch Python implementation
# differentially tested against DuckDB's independent C++
# jaro_winkler_similarity, far stronger evidence than two calls into
# one library. Blocking first (segment equality + id subsample) is
# what makes the Python path affordable; it is never a cross join.
# ---------------------------------------------------------------------------


@_q(
    "customer_name_jw_pairs",
    """
    WITH c AS (
        SELECT c_custkey, c_mktsegment, c_name FROM customer
        WHERE c_custkey % 10 = 0
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_mktsegment AS segment,
           ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw_sim
    FROM c a JOIN c b
      ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
    WHERE ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.95
    """,
)
def customer_name_jw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching: candidate pairs from segment
    blocking over a 10% id subsample, scored by the Jaro-Winkler
    Pandas UDF, thresholded on the ROUNDed score (both engines
    compare the post-round value, so an ulp at the boundary cannot
    flip membership). Shuffle on the block key only; Arrow-batched
    scoring on the bounded pair set."""
    jw = textfn.jaro_winkler_pandas_udf()
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    )
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_na"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_nb"),
    )
    sim = F.round(jw(F.col("_na"), F.col("_nb")), 6)
    return (
        a.join(b, "segment")
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("jw_sim", sim)
        .where(F.col("jw_sim") >= 0.95)
        .select("key_a", "key_b", "segment", "jw_sim")
    )


# ---------------------------------------------------------------------------
# Exact ROC-AUC (Mann-Whitney with tie correction) of the value
# column as a one-vs-rest classifier per event type — the model-eval
# primitive a quality-scoring pipeline needs. Formulated over the
# DISTINCT-SCORE dimension so the running sum is bounded by the value
# DOMAIN (~50k distinct cents), not the row count; numerator doubled
# into an exact integer so ties (the 0.5 credits) never touch floats
# until the final division.
# ---------------------------------------------------------------------------


@_q(
    "event_value_auc",
    """
    WITH t AS (SELECT DISTINCT event_type FROM events),
    g AS (
        SELECT t.event_type AS label_type,
               CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s,
               count_if(e.event_type = t.event_type) AS pos,
               count_if(e.event_type <> t.event_type) AS neg
        FROM events e CROSS JOIN t
        GROUP BY t.event_type, s
    ),
    r AS (
        SELECT label_type, s, pos, neg,
               COALESCE(SUM(neg) OVER (
                   PARTITION BY label_type ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS neg_below
        FROM g
    )
    SELECT label_type,
           CAST(SUM(pos) AS INTEGER) AS p_count,
           CAST(SUM(neg) AS INTEGER) AS n_count,
           CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS auc_num_x2,
           CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
               / (2.0 * SUM(pos) * SUM(neg)) AS auc
    FROM r GROUP BY label_type
    """,
)
def event_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest AUC of value for each of the 5 event types.
    P(score_pos > score_neg) + 0.5·P(tie), computed from per-score
    pos/neg counts and a running negative count over the score
    dimension. The windowed pass runs over (type × distinct cents) —
    bounded by the DOMAIN at any data scale (the same distinct-value
    -dimension trick as user_engagement_rank); everything else is
    partial/final aggregation. auc_num_x2 is an exact integer; the
    one double division is the same expression both sides."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    types = ev.select(
        F.col("event_type").alias("label_type")
    ).distinct()
    g = (
        ev.select("event_type", cents.alias("s"))
        .crossJoin(F.broadcast(types))
        .groupBy("label_type", "s")
        .agg(
            F.sum(
                (F.col("event_type") == F.col("label_type")).cast("long")
            ).alias("pos"),
            F.sum(
                (F.col("event_type") != F.col("label_type")).cast("long")
            ).alias("neg"),
        )
    )
    w = (
        Window.partitionBy("label_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    num = F.sum(
        F.col("pos") * (F.lit(2) * F.col("neg_below") + F.col("neg"))
    )
    return r.groupBy("label_type").agg(
        F.sum("pos").cast("int").alias("p_count"),
        F.sum("neg").cast("int").alias("n_count"),
        num.alias("auc_num_x2"),
        (
            num.cast("double")
            / (F.lit(2.0) * F.sum("pos") * F.sum("neg"))
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Community detection: deterministic synchronous label propagation
# (graph.label_propagation, Raghavan et al. 2007 with a smallest-
# label tie rule) over the referral tree — the cheap community
# algorithm between connected components (too coarse: one tree = one
# component) and modularity methods (not DataFrame-shaped). The
# oracle unrolls the same two rounds as SQL CTEs.
# ---------------------------------------------------------------------------


@_q(
    "referral_lpa_communities",
    """
    WITH e0 AS (
        SELECT c_custkey AS src, CAST(c_custkey // 2 AS BIGINT) AS dst
        FROM customer WHERE c_custkey > 1
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    l0 AS (SELECT DISTINCT src AS vertex, src AS community FROM e),
    c1 AS (
        SELECT e.dst AS vertex, l.community, COUNT(*) AS n
        FROM e JOIN l0 l ON l.vertex = e.src
        GROUP BY e.dst, l.community
    ),
    l1 AS (
        SELECT vertex, community FROM (
            SELECT vertex, community,
                   ROW_NUMBER() OVER (PARTITION BY vertex
                                      ORDER BY n DESC, community) AS rn
            FROM c1
        ) WHERE rn = 1
    ),
    c2 AS (
        SELECT e.dst AS vertex, l.community, COUNT(*) AS n
        FROM e JOIN l1 l ON l.vertex = e.src
        GROUP BY e.dst, l.community
    )
    SELECT vertex, community FROM (
        SELECT vertex, community,
               ROW_NUMBER() OVER (PARTITION BY vertex
                                  ORDER BY n DESC, community) AS rn
        FROM c2
    ) WHERE rn = 1
    """,
)
def referral_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two LPA rounds over the undirected referral tree. Each round
    is one vertex-keyed join + count agg + per-vertex windowed
    argmax (bounded partitions: a vertex's distinct neighbor labels)
    — the CC/PageRank per-round budget; rounds are checkpointed so
    lineage stays flat. Deterministic by the smallest-label tie
    rule; output is exact integers."""
    cust = read_table(spark, sf_dir, "customer")
    edges = cust.where(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
    )
    return graph.label_propagation(edges, n_iter=2)


# ---------------------------------------------------------------------------
# OHLC downsampling (finance-style bars) per (event_type, day):
# open/close via min_by/max_by on a lexicographic (ts, event_id)
# key — the deterministic-argmin surface — plus high/low/volume.
# ---------------------------------------------------------------------------


@_q(
    "daily_value_ohlc",
    """
    WITH b AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
                   lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
        FROM events
    )
    SELECT event_type, day,
           arg_min(cents, k) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           arg_max(cents, k) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS INTEGER) AS n_events
    FROM b GROUP BY event_type, day
    """,
)
def daily_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type. min_by/max_by pick the first/
    last value by a zero-padded (epoch-micros, event_id) string key —
    total order, so the argmin is deterministic on both engines (a
    bare ts key would tie). One partial-aggregatable shuffle on
    (type, day); min_by/max_by states combine map-side like any
    other agg — the downsampling shape that survives any scale."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    k = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
            20,
            "0",
        ),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    b = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        cents.alias("cents"),
        k.alias("_k"),
    )
    return b.groupBy("event_type", "day").agg(
        F.min_by("cents", "_k").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "_k").alias("close_cents"),
        F.sum("cents").alias("volume_cents"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue — the inequality/concentration
# metric next to the Pareto curve. Needs a GLOBAL revenue rank, so it
# reuses the hierarchical prefix machinery (operators/prefix.
# global_row_number) instead of a SinglePartition window; every term
# of the closed form stays an exact int64 until one final division.
# ---------------------------------------------------------------------------


@_q(
    "customer_revenue_gini",
    """
    WITH rev AS (
        SELECT o_custkey AS custkey,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, custkey) AS i
        FROM rev
    )
    SELECT CAST(COUNT(*) AS INTEGER) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(i * cents) AS BIGINT) AS weighted_cents,
           CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents)
                AS DOUBLE)
               / (COUNT(*) * SUM(cents)) AS gini
    FROM ranked
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini = (2·Σi·x_(i) − (n+1)·Σx) / (n·Σx) over revenue ranked
    ascending (custkey tiebreak → total order). The rank comes from
    the hierarchical prefix sum — range shuffle + per-partition ranks
    + broadcast offsets — never one task holding the fact table. The
    int64 Σi·x products hold to ~1e18; at larger scale the same plan
    switches the accumulator to DECIMAL(38,0) (the group-checksum
    precedent)."""
    from ..operators.prefix import global_row_number

    orders = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    rev = (
        orders.select(F.col("o_custkey").alias("custkey"), cents.alias("_c"))
        .groupBy("custkey")
        .agg(F.sum("_c").alias("cents"))
    )
    ranked = global_row_number(
        rev, order_cols=("cents", "custkey"), out_col="i"
    )
    n = F.count(F.lit(1))
    tot = F.sum("cents")
    wsum = F.sum(F.col("i") * F.col("cents"))
    return ranked.agg(
        n.cast("int").alias("n_customers"),
        tot.alias("total_cents"),
        wsum.alias("weighted_cents"),
        (
            (F.lit(2) * wsum - (n + F.lit(1)) * tot).cast("double")
            / (n * tot)
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over each user's event
# sequence — the product-analytics path model (and the bigram step
# of sequence modeling). Counts are exact; probabilities are one
# int/int division per cell.
# ---------------------------------------------------------------------------


@_q(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    t AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM c GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n,
           t.row_total,
           CAST(c.n AS DOUBLE) / t.row_total AS p
    FROM c JOIN t USING (from_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current) per observed transition. The
    LEAD window partitions by user (bounded per-entity history — the
    sequential.py contract), transition counts partial-aggregate on
    the 25-cell key space, and row totals broadcast back. Exact
    integers everywhere; one double division per cell."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        c.join(F.broadcast(t), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "row_total",
            (F.col("n").cast("double") / F.col("row_total")).alias("p"),
        )
    )


# ---------------------------------------------------------------------------
# Shannon diversity of each source's language mix — the corpus-
# composition metric a multilingual data pipeline monitors. Entropy
# is an order-sensitive float sum, so both engines fold the SAME
# sorted per-language list (the doc_unigram_logprob discipline for
# any float reduction that must hash-match).
# ---------------------------------------------------------------------------


@_q(
    "source_diversity_entropy",
    """
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n
        FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(n) AS tot, COUNT(*) AS n_langs
          FROM c GROUP BY source),
    l AS (
        SELECT c.source,
               list((CAST(c.n AS DOUBLE) / t.tot) *
                    ln(CAST(t.tot AS DOUBLE) / c.n)
                    ORDER BY c.lang) AS terms
        FROM c JOIN t USING (source)
        GROUP BY c.source
    )
    SELECT l.source,
           CAST(t.n_langs AS INTEGER) AS n_langs,
           CAST(t.tot AS INTEGER) AS n_docs,
           ROUND(list_reduce(list_prepend(0.0, terms), (a, b) -> a + b),
                 12) AS entropy_nats
    FROM l JOIN t USING (source)
    """,
)
def source_diversity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H = Σ (n/N)·ln(N/n) per source over its language counts,
    folded in sorted-language order on both engines so the sum order
    is identical; the composed (n/N)·ln(N/n) term itself can differ
    by 1 ulp between engines (unlike bm25's bare ln), so the result
    rounds to 12 decimals — nine orders above the ulp noise. Two
    tiny aggs; the fold runs over ≤ #languages terms per source —
    domain-bounded at any corpus size."""
    docs = read_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_langs")
    )
    term = (F.col("n").cast("double") / F.col("tot")) * F.log(
        F.col("tot").cast("double") / F.col("n")
    )
    l = (
        c.join(t, "source")
        .select("source", F.struct("lang", term.alias("v")).alias("_sv"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("_sv")).alias("_terms"))
        .select(
            "source",
            F.transform(F.col("_terms"), lambda s: s["v"]).alias("terms"),
        )
    )
    return l.join(F.broadcast(t), "source").select(
        "source",
        F.col("n_langs").cast("int").alias("n_langs"),
        F.col("tot").cast("int").alias("n_docs"),
        F.round(
            F.aggregate(F.col("terms"), F.lit(0.0), lambda a, b: a + b),
            12,
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Month-over-month growth per event type: calendar bucketing +
# LAG over the (type, month) dimension — the reporting staple.
# ---------------------------------------------------------------------------


@_q(
    "monthly_value_growth",
    """
    WITH m AS (
        SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, month
    )
    SELECT event_type, month, cents,
           LAG(cents) OVER (PARTITION BY event_type ORDER BY month)
               AS prev_cents,
           CAST(cents - LAG(cents) OVER (
                   PARTITION BY event_type ORDER BY month) AS DOUBLE)
               / LAG(cents) OVER (PARTITION BY event_type ORDER BY month)
               AS growth
    FROM m
    """,
)
def monthly_value_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoM growth of value per event type. The LAG window runs over
    the (type, month) DIMENSION — a handful of rows per type after
    the exact-int rollup, never over raw events; growth is one
    int-difference/int division."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    m = (
        ev.select(
            "event_type",
            F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "month")
        .agg(F.sum("_c").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("month")
    prev = F.lag("cents").over(w)
    return m.select(
        "event_type",
        "month",
        "cents",
        prev.alias("prev_cents"),
        ((F.col("cents") - prev).cast("double") / prev).alias("growth"),
    )


# ---------------------------------------------------------------------------
# Rolling median (windowed order statistic): Spark has no percentile
# window function, so the frame's values collect into an array and
# the median is an exact array expression — affordable because the
# frame is BOUNDED (7 rows); the composition every "rolling p50
# latency" dashboard needs. Exact on integer cents (middle-pair
# average is an exact half).
# ---------------------------------------------------------------------------


@_q(
    "rolling_median_value",
    """
    WITH b AS (
        SELECT event_id, user_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, ts, cents,
               quantile_cont(cents, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS roll_med,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS n_in_frame
        FROM b
    )
    SELECT event_id, user_id, cents,
           CAST(n_in_frame AS INTEGER) AS n_in_frame,
           roll_med
    FROM w WHERE n_in_frame = 7
    """,
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling median over the last 7 events. Spark side:
    collect_list over the bounded frame → array_sort → exact middle
    (odd frame ⇒ element 4 of 7; emitted once the frame is full so
    both engines compute the same order statistic). The array path
    costs O(frame log frame) per row with frame=7 — constant — and
    the window partitions per user; DuckDB's windowed quantile_cont
    is the independent formulation."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    b = ev.select("event_id", "user_id", "ts", cents.alias("cents"))
    frame = F.array_sort(F.collect_list("cents").over(w))
    out = b.select(
        "event_id",
        "user_id",
        "cents",
        F.size(frame).cast("int").alias("n_in_frame"),
        F.element_at(frame, 4).cast("double").alias("roll_med"),
    )
    return out.where(F.col("n_in_frame") == 7)


# ---------------------------------------------------------------------------
# Higher-moment distribution statistics (skewness/kurtosis) from
# exact DECIMAL(38,0) power sums — int64 overflows at the 3rd/4th
# moment (cents³ ~ 1e18 per row), so the accumulators take the
# wide-decimal route the group-checksum query established. The
# closed forms then evaluate in double from identical exact inputs;
# Spark's skewness/kurtosis builtins are cross-checked in pytest.
# ---------------------------------------------------------------------------


@_q(
    "value_distribution_moments",
    """
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DECIMAL(38,0))) AS s1,
               SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS DECIMAL(38,0))) AS s2,
               SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS DECIMAL(38,0))
                   * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS DECIMAL(38,0))) AS s3
        FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS INTEGER) AS n_events,
           CAST(s1 AS VARCHAR) AS s1_exact,
           CAST(s2 AS VARCHAR) AS s2_exact,
           CAST(s3 AS VARCHAR) AS s3_exact,
           ROUND(
               (CAST(s3 AS DOUBLE) / n
                - 3.0 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s2 AS DOUBLE) / n)
                + 2.0 * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n))
               / POW(CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n)
                           * (CAST(s1 AS DOUBLE) / n), 1.5),
               6) AS skewness
    FROM m
    """,
)
def value_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness per event type from three exact decimal
    power sums in ONE partial/final scan. The exact sums are emitted
    as strings (DECIMAL(38) → VARCHAR is portable; double formatting
    is not — the column-stats precedent) so the oracle checks the
    accumulators themselves, not just the rounded statistic."""
    ev = read_table(spark, sf_dir, "events")
    c = (
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    m = ev.select("event_type", c.alias("_c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_c").alias("s1"),
        F.sum(F.col("_c") * F.col("_c")).alias("s2"),
        F.sum(F.col("_c") * F.col("_c") * F.col("_c")).alias("s3"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / F.pow(
        m2 - m1 * m1, F.lit(1.5)
    )
    return m.select(
        "event_type",
        F.col("n").cast("int").alias("n_events"),
        F.col("s1").cast("string").alias("s1_exact"),
        F.col("s2").cast("string").alias("s2_exact"),
        F.col("s3").cast("string").alias("s3_exact"),
        F.round(skew, 6).alias("skewness"),
    )


# ---------------------------------------------------------------------------
# Multiset semantics: INTERSECT ALL / EXCEPT ALL (bag intersection
# and difference WITH multiplicity — each priority survives
# min(nA, nB) / nA−nB times), the set-operator surface the plain
# EXCEPT query (part_type_norm family) doesn't cover.
# ---------------------------------------------------------------------------


@_q(
    "order_priority_multiset_ops",
    """
    WITH a AS (SELECT o_orderpriority AS p FROM orders
               WHERE o_orderstatus = 'O'),
    b AS (SELECT o_orderpriority AS p FROM orders
          WHERE o_orderstatus = 'F'),
    i AS (SELECT 'intersect_all' AS op, p FROM
          (SELECT p FROM a INTERSECT ALL SELECT p FROM b)),
    e AS (SELECT 'except_all' AS op, p FROM
          (SELECT p FROM a EXCEPT ALL SELECT p FROM b))
    SELECT op, p AS priority, CAST(COUNT(*) AS INTEGER) AS n
    FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
    GROUP BY op, p
    """,
)
def order_priority_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection/difference of the open-vs-finished priority
    multisets. Spark plans intersectAll/exceptAll as a count-compare
    generate over one hash shuffle per side — multiplicity semantics
    without materializing row copies; the final histogram collapses
    to the 5-value domain."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    b = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    i = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    e = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    return (
        i.unionByName(e)
        .groupBy("op", "priority")
        .agg(F.count(F.lit(1)).cast("int").alias("n"))
    )


# ---------------------------------------------------------------------------
# Semi-structured key census: which JSON keys appear in the event
# props and how often — the schema-inference / drift-monitoring
# primitive over a free-form payload column (json_object_keys
# surface; the VARIANT query covers typed extraction).
# ---------------------------------------------------------------------------


@_q(
    "props_key_histogram",
    """
    SELECT k AS key,
           CAST(COUNT(*) AS INTEGER) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types,
           CAST(COUNT(DISTINCT json_extract_string(props, '$.' || k))
                AS INTEGER) AS n_distinct_values,
           MIN(TRY_CAST(json_extract_string(props, '$.' || k) AS BIGINT))
               AS min_int_value,
           MAX(TRY_CAST(json_extract_string(props, '$.' || k) AS BIGINT))
               AS max_int_value
    FROM (
        SELECT event_type, props, unnest(json_keys(props)) AS k
        FROM events WHERE props IS NOT NULL
    )
    GROUP BY k
    """,
)
def props_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key frequency AND value profile across the props payloads:
    json_object_keys → explode → one partial/final agg on the (small)
    key domain, now carrying distinct-value cardinality and the
    numeric min/max per key (this data has a single key 'k', so the
    1-row shape needs value-bearing columns to be a non-vacuous
    oracle — the r5 audit). At 100 TB this is the cheap first pass
    that decides which keys deserve VARIANT extraction or schema
    promotion."""
    ev = read_table(spark, sf_dir, "events")
    # get_json_object via expr: the Python wrapper insists on a
    # literal path; the SQL form evaluates a per-row path fine
    val = F.expr("get_json_object(props, concat('$.', key))")
    return (
        ev.where(F.col("props").isNotNull())
        .select(
            "event_type",
            "props",
            F.explode(F.json_object_keys("props")).alias("key"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.countDistinct("event_type").cast("int").alias("n_types"),
            F.countDistinct(val).cast("int").alias("n_distinct_values"),
            F.min(val.try_cast("bigint")).alias("min_int_value"),
            F.max(val.try_cast("bigint")).alias("max_int_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the second
# classic entity-resolution blocking scheme next to key blocking
# (customer_name_jw_pairs): order records by the match key, pair each
# with its w nearest neighbors in that order. The global order comes
# from the hierarchical prefix rank; the "±w neighbors" theta join
# decomposes into w equi-joins on shifted ranks.
# ---------------------------------------------------------------------------


@_q(
    "sorted_neighborhood_pairs",
    """
    WITH c AS (
        SELECT c_custkey, c_name,
               ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
           ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw_sim
    FROM c a JOIN c b ON b.rn - a.rn IN (1, 2)
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-2 sorted-neighborhood candidate pairs over the name
    order, scored with the Jaro-Winkler UDF. The rank is the
    hierarchical prefix row number (range shuffle, never one task);
    the neighbor join is two shuffle equi-joins on rn+1 / rn+2 —
    output is exactly 2n−3 pairs, the linear candidate budget that
    makes sorted-neighborhood the scale-friendly blocking scheme."""
    from ..operators.prefix import global_row_number

    jw = textfn.jaro_winkler_pandas_udf()
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    )
    ranked = global_row_number(
        cust.select("c_custkey", "c_name"),
        order_cols=("c_name", "c_custkey"),
        out_col="rn",
    )
    a = ranked.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("_na"),
        F.col("rn").alias("_ra"),
    )
    pairs = None
    for d in (1, 2):
        b = ranked.select(
            F.col("c_custkey").alias("key_b"),
            F.col("c_name").alias("_nb"),
            (F.col("rn") - d).alias("_ra"),
            F.lit(d).cast("int").alias("rank_gap"),
        )
        p = a.join(b, "_ra")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.select(
        "key_a",
        "key_b",
        "rank_gap",
        F.round(jw(F.col("_na"), F.col("_nb")), 6).alias("jw_sim"),
    )


# ---------------------------------------------------------------------------
# Binary (sign) quantization ANN: 64-dim vectors compress to two
# 32-bit sign codes; Hamming distance (bit_count of XOR) prefilters
# candidates 32× cheaper than float cosine, exact rerank recovers
# the true top-k — the modern memory-tight retrieval stack next to
# PQ/IVF (same two-stage shape, different code family).
# ---------------------------------------------------------------------------


@_q(
    "binary_hamming_knn",
    """
    WITH coded AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(0, 32),
                       i -> CASE WHEN embedding[i + 1] > 0
                                 THEN CAST(1 AS BIGINT) << i
                                 ELSE CAST(0 AS BIGINT) END)),
                   (a, b) -> a + b) AS lo,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(32, 64),
                       i -> CASE WHEN embedding[i + 1] > 0
                                 THEN CAST(1 AS BIGINT) << (i - 32)
                                 ELSE CAST(0 AS BIGINT) END)),
                   (a, b) -> a + b) AS hi
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, lo AS qlo, hi AS qhi
          FROM coded WHERE vec_id < 5),
    ham AS (
        SELECT q.query_id, c.vec_id,
               bit_count(xor(q.qlo, c.lo)) + bit_count(xor(q.qhi, c.hi))
                   AS hamming,
               list_cosine_similarity(q.qe, c.e) AS cos
        FROM q CROSS JOIN coded c
    ),
    cand AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY hamming, vec_id) AS hr
        FROM ham
    )
    SELECT query_id, vec_id, CAST(hamming AS INTEGER) AS hamming,
           ROUND(cos, 4) AS cosine_sim, CAST(rr AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rr
        FROM cand WHERE hr <= 50
    ) t
    WHERE rr <= 5
    """,
)
def binary_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-code Hamming prefilter (top-50) → exact cosine rerank
    (top-5). Codes are TWO int32-range words per vector, so the
    shifts never touch the sign bit on either engine; the XOR +
    bit_count candidate scan reads 8 bytes/vector instead of 256 —
    the production scan at billion scale stores ONLY codes and
    fetches raw vectors for the 50 survivors. Hamming ties at the
    candidate boundary break on vec_id, so the candidate set (and
    everything downstream) is deterministic cross-engine."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")

    def word(lo_bit: int) -> F.Column:
        # 2^(i−lo_bit) via pow: exact in double for exponents ≤ 31
        # (F.shiftleft takes only a literal shift amount)
        return F.aggregate(
            F.sequence(F.lit(lo_bit), F.lit(lo_bit + 31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(v, i + 1) > 0,
                F.pow(F.lit(2.0), (i - F.lit(lo_bit)).cast("double")).cast(
                    "long"
                ),
            ).otherwise(F.lit(0).cast("long")),
        )

    coded = emb.select(
        "vec_id",
        v.alias("e"),
        similarity.l2_norm(v).alias("_n"),
        word(0).alias("lo"),
        word(32).alias("hi"),
    )
    q = coded.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("_qe"),
        F.col("_n").alias("_qn"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    ham = coded.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
            + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
        ).alias("hamming"),
        (
            similarity.dot(F.col("_qe"), F.col("e"))
            / (F.col("_qn") * F.col("_n"))
        ).alias("_cos"),
    )
    wh = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    wc = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        ham.withColumn("hr", F.row_number().over(wh))
        .where(F.col("hr") <= 50)
        .withColumn("rnk", F.row_number().over(wc))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id",
            "vec_id",
            F.col("hamming").cast("int"),
            F.round("_cos", 4).alias("cosine_sim"),
            F.col("rnk").cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka two-stage retrieval (Kusupati et al. 2022): MRL-style
# embeddings rank usefully on a PREFIX of dimensions, so stage 1
# scores only the first 16 dims (4× less math and memory traffic),
# stage 2 reranks the survivors with the full 64 — the staged-
# retrieval pattern underlying every "fast filter, exact finish"
# vector stack.
# ---------------------------------------------------------------------------


@_q(
    "matryoshka_two_stage_knn",
    """
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               CAST(embedding[1:16] AS DOUBLE[]) AS p
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, p AS qp
          FROM base WHERE vec_id < 5),
    coarse AS (
        SELECT q.query_id, b.vec_id,
               list_cosine_similarity(q.qp, b.p) AS ccos,
               list_cosine_similarity(q.qe, b.e) AS fcos
        FROM q CROSS JOIN base b
    ),
    cand AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY ccos DESC, vec_id) AS cr
        FROM coarse
    )
    SELECT query_id, vec_id,
           ROUND(ccos, 4) AS coarse_sim,
           ROUND(fcos, 4) AS cosine_sim,
           CAST(rr AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY fcos DESC, vec_id) AS rr
        FROM cand WHERE cr <= 40
    ) t
    WHERE rr <= 5
    """,
)
def matryoshka_two_stage_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-16 coarse scoring → top-40 candidates → full-64 exact
    rerank → top-5. Both stages are the one broadcast-scored corpus
    scan shape; at scale stage 1 reads a 16-float column (or the
    prefix from the same column — column pruning does not help inside
    arrays, so production persists the prefix separately) and only
    the 40 survivors touch full vectors."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    base = emb.select(
        "vec_id",
        v.alias("e"),
        F.slice(v, 1, 16).alias("p"),
        similarity.l2_norm(v).alias("_ne"),
        similarity.l2_norm(F.slice(v, 1, 16)).alias("_np"),
    )
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("_qe"),
        F.col("p").alias("_qp"),
        F.col("_ne").alias("_qne"),
        F.col("_np").alias("_qnp"),
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            similarity.dot(F.col("_qp"), F.col("p"))
            / (F.col("_qnp") * F.col("_np"))
        ).alias("_ccos"),
        (
            similarity.dot(F.col("_qe"), F.col("e"))
            / (F.col("_qne") * F.col("_ne"))
        ).alias("_fcos"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("_ccos"), F.asc("vec_id")
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("_fcos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("cr", F.row_number().over(wc))
        .where(F.col("cr") <= 40)
        .withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id",
            "vec_id",
            F.round("_ccos", 4).alias("coarse_sim"),
            F.round("_fcos", 4).alias("cosine_sim"),
            F.col("rnk").cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
# fuse the BM25 lexical ranking (fixed query terms) with the vector
# ranking (query = embedding of vec 0) as Σ 1/(60+rank) over the
# union of both top-100 lists — the standard fusion behind every
# "hybrid search" stack. Ranks are exact integers, so the fused
# score is the same two-fraction sum on both engines.
# ---------------------------------------------------------------------------


@_q(
    "hybrid_search_rrf",
    rf"""
    WITH base AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> x <> '')) AS dl,
               {_BM25_TF_SQL}
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {_BM25_DF_SQL}
        FROM base
    ),
    lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (
                   ORDER BY {_BM25_SCORE_SQL} DESC, doc_id) AS r_lex
        FROM base, stats
        WHERE {_BM25_SCORE_SQL} > 0
        QUALIFY r_lex <= 100
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
           WHERE vec_id = 0),
    vec AS (
        SELECT e.vec_id AS doc_id, ROW_NUMBER() OVER (
                   ORDER BY list_cosine_similarity(qv.qe,
                       CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id)
                   AS r_vec
        FROM embeddings e CROSS JOIN qv
        JOIN base b ON b.doc_id = e.vec_id
        QUALIFY r_vec <= 100
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           CAST(l.r_lex AS INTEGER) AS r_lex,
           CAST(v.r_vec AS INTEGER) AS r_vec,
           ROUND(COALESCE(1.0 / (60 + l.r_lex), 0.0)
                 + COALESCE(1.0 / (60 + v.r_vec), 0.0), 6) AS rrf
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hybrid results: BM25 top-100 ∪ cosine top-100, fused
    by RRF (k=60). Each ranking is the established one-scan shape
    (stats/query rows broadcast); the fusion is a full-outer join of
    two ≤100-row lists — driver-trivial at any corpus size. The
    final LIMIT is TakeOrderedAndProject, not a global sort."""
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    toks = dedup.tokens("text")

    def tf_col(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_col(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def term_score(t: str):
        tf = F.col(f"tf_{t}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        return (
            idf
            * (tf * F.lit(2.2))
            / (
                tf
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
            )
        )

    score = term_score(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + term_score(t)
    wl = Window.orderBy(F.desc("_bm25"), F.asc("doc_id"))
    lex = (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("_bm25"))
        .where(F.col("_bm25") > 0)
        .withColumn("r_lex", F.row_number().over(wl))
        .where(F.col("r_lex") <= 100)
        .select("doc_id", "r_lex")
    )
    qv = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qe"),
        similarity.l2_norm(F.col("embedding")).alias("_qn"),
    )
    wv = Window.orderBy(F.desc("_cos"), F.asc("doc_id"))
    vec = (
        emb.join(base.select("doc_id"), emb["vec_id"] == base["doc_id"])
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            (
                similarity.dot(F.col("_qe"), F.col("embedding"))
                / (F.col("_qn") * similarity.l2_norm(F.col("embedding")))
            ).alias("_cos"),
        )
        .withColumn("r_vec", F.row_number().over(wv))
        .where(F.col("r_vec") <= 100)
        .select(F.col("doc_id").alias("v_doc_id"), "r_vec")
    )
    fused = lex.join(
        vec, lex["doc_id"] == vec["v_doc_id"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("v_doc_id")).alias("doc_id"),
        F.col("r_lex").cast("int").alias("r_lex"),
        F.col("r_vec").cast("int").alias("r_vec"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("r_vec")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)


# ---------------------------------------------------------------------------
# Chi-square contingency (event type × day-of-week): the
# independence test a product-analytics pipeline runs on categorical
# pairs. Observed counts are exact; expected counts and cell
# contributions are the same rational expressions of those integers
# on both engines.
# ---------------------------------------------------------------------------


@_q(
    "type_dow_chisquare",
    """
    WITH o AS (
        SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS obs
        FROM events GROUP BY event_type, dayofweek(ts)
    ),
    rt AS (SELECT event_type, SUM(obs) AS row_tot FROM o GROUP BY event_type),
    ct AS (SELECT dow, SUM(obs) AS col_tot FROM o GROUP BY dow),
    n AS (SELECT SUM(obs) AS total FROM o)
    SELECT o.event_type, CAST(o.dow AS INTEGER) AS dow,
           CAST(o.obs AS INTEGER) AS observed,
           ROUND(CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.total, 6)
               AS expected,
           ROUND(POW(o.obs - CAST(rt.row_tot AS DOUBLE) * ct.col_tot
                             / n.total, 2)
                 / (CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.total), 6)
               AS chi2_contrib
    FROM o
    JOIN rt USING (event_type)
    JOIN ct USING (dow)
    CROSS JOIN n
    """,
)
def type_dow_chisquare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square contributions over the 5×7 contingency
    table. One exact-count agg on the domain-sized key, marginals
    broadcast back, contributions are pure projections — the test
    statistic is the sum of 35 rows the reader (or a 1-row follow-up
    agg) takes. DuckDB dayofweek is 0-6 (Sun=0), Spark 1-7 (Sun=1):
    the Spark side subtracts 1."""
    ev = read_table(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    n = o.agg(F.sum("obs").alias("total"))
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("total")
    return (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dow").cast("int"),
            F.col("obs").cast("int").alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(
                F.pow(F.col("obs") - exp, F.lit(2.0)) / exp, 6
            ).alias("chi2_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# NULL-semantics battery: the aggregate/comparison NULL rules
# (COUNT(*) vs COUNT(col), DISTINCT with NULLs, null-safe equality,
# NULL-ignoring extrema, exact-decimal AVG over the non-null subset)
# asserted cross-engine on planted NULLs — the correctness surface
# every migration audit checks first.
# ---------------------------------------------------------------------------


@_q(
    "null_semantics_battery",
    """
    WITH b AS (
        SELECT event_type, user_id,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               END AS cents
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS INTEGER) AS n_rows,
           CAST(COUNT(cents) AS INTEGER) AS n_nonnull,
           CAST(count_if(cents IS NOT DISTINCT FROM NULL) AS INTEGER)
               AS n_nullsafe_eq_null,
           CAST(COUNT(DISTINCT cents) AS INTEGER) AS n_distinct_nonnull,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(SUM(cents) AS DOUBLE) / COUNT(cents) AS avg_nonnull
    FROM b GROUP BY event_type
    """,
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL rules on planted NULLs (every 'error' row): COUNT(col)
    skips them, COUNT(DISTINCT) ignores them, <=> NULL finds exactly
    them, MIN/MAX/AVG ignore them, and the error group's aggregate
    columns are themselves NULL. One partial/final agg; the
    null-safe predicate is eqNullSafe — the operator a naive `=`
    rewrite gets wrong three-valued-logically."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.when(
        F.col("event_type") != "error",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
    )
    b = ev.select("event_type", cents.alias("cents"))
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_rows"),
        F.count("cents").cast("int").alias("n_nonnull"),
        F.sum(
            F.col("cents").eqNullSafe(F.lit(None).cast("bigint")).cast("int")
        ).cast("int").alias("n_nullsafe_eq_null"),
        F.countDistinct("cents").cast("int").alias("n_distinct_nonnull"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        (F.sum("cents").cast("double") / F.count("cents")).alias(
            "avg_nonnull"
        ),
    )


# ---------------------------------------------------------------------------
# nDCG@10 of the cosine ranking against label relevance — the
# retrieval-evaluation metric next to AUC: does nearest-neighbor
# search surface same-label items early? rel(hit) = 1 iff the hit
# shares the query's label (self excluded); DCG folds rel/ln(1+r)
# in rank order (fixed ≤10 terms, deterministic order on both
# engines), IDCG is the closed form for n_rel relevant items.
# ---------------------------------------------------------------------------


@_q(
    "knn_ndcg_eval",
    """
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, q.qlabel, e.vec_id, e.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qe,
                       CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id
               ) AS r
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    top AS (SELECT * FROM scored WHERE r <= 10),
    agg AS (
        SELECT query_id,
               CAST(count_if(label = qlabel) AS BIGINT) AS n_rel,
               list(CASE WHEN label = qlabel
                         THEN 1.0 / ln(CAST(1 + r AS DOUBLE))
                         ELSE 0.0 END ORDER BY r) AS gains
        FROM top GROUP BY query_id
    )
    SELECT query_id,
           CAST(n_rel AS INTEGER) AS n_rel_at_10,
           ROUND(list_reduce(list_prepend(0.0, gains), (a, b) -> a + b),
                 6) AS dcg,
           ROUND(CASE WHEN n_rel = 0 THEN 0.0 ELSE
               list_reduce(list_prepend(0.0,
                   list_transform(range(1, CAST(n_rel AS INTEGER) + 1),
                       i -> 1.0 / ln(CAST(1 + i AS DOUBLE)))),
                   (a, b) -> a + b) END, 6) AS idcg
    FROM agg
    """,
)
def knn_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCG@10 and ideal DCG per query over label relevance. The
    ranking is the broadcast-scored corpus scan; the fold runs over
    exactly 10 terms in rank order on both engines (1/ln(1+r) gains
    — natural log keeps the term a single bit-stable call), so the
    sums agree to the rounding grid. n_rel makes the reader's
    nDCG = dcg/idcg well-defined."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("_qe"),
        similarity.l2_norm(F.col("embedding")).alias("_qn"),
    )
    scored = (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            similarity.l2_norm(F.col("embedding")).alias("_cn"),
        )
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            "vec_id",
            "label",
            (
                similarity.dot(F.col("_qe"), F.col("embedding"))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    top = scored.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 10)
    gain = F.when(
        F.col("label") == F.col("qlabel"),
        F.lit(1.0) / F.log((F.lit(1) + F.col("r")).cast("double")),
    ).otherwise(F.lit(0.0))
    agg = (
        top.select(
            "query_id",
            (F.col("label") == F.col("qlabel")).cast("long").alias("_rel"),
            F.struct(F.col("r"), gain.alias("g")).alias("_rg"),
        )
        .groupBy("query_id")
        .agg(
            F.sum("_rel").alias("n_rel"),
            F.array_sort(F.collect_list("_rg")).alias("_rgs"),
        )
    )
    dcg = F.aggregate(
        F.transform(F.col("_rgs"), lambda s: s["g"]),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    idcg = F.when(F.col("n_rel") == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.col("n_rel").cast("int")),
                lambda i: F.lit(1.0)
                / F.log((F.lit(1) + i).cast("double")),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    return agg.select(
        "query_id",
        F.col("n_rel").cast("int").alias("n_rel_at_10"),
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index (the industry drift metric next to the
# L1 histogram drift of value_drift_weekly): PSI = Σ (p−q)·ln(p/q)
# over fixed value bins, week 1 as reference. Counts are exact; the
# fold runs over the ≤12 bins in fixed bin order.
# ---------------------------------------------------------------------------


@_q(
    "value_psi_weekly",
    """
    WITH b AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               LEAST(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                          // 10000 AS BIGINT), 9) AS bin
        FROM events
    ),
    weeks AS (SELECT DISTINCT week FROM b),
    ref AS (SELECT MIN(week) AS ref_week FROM b),
    c AS (
        SELECT week, bin, COUNT(*) AS n FROM b GROUP BY week, bin
    ),
    t AS (SELECT week, SUM(n) AS tot FROM c GROUP BY week),
    -- densify: every (week, bin) cell with Laplace +1 smoothing so
    -- empty cells stay defined
    grid AS (
        SELECT w.week, g.bin,
               COALESCE(c.n, 0) + 1 AS n_s
        FROM weeks w
        CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
        LEFT JOIN c ON c.week = w.week AND c.bin = g.bin
    ),
    gt AS (SELECT week, SUM(n_s) AS tot_s FROM grid GROUP BY week),
    dist AS (
        SELECT g.week, g.bin,
               CAST(g.n_s AS DOUBLE) / gt.tot_s AS p
        FROM grid g JOIN gt ON gt.week = g.week
    ),
    terms AS (
        SELECT cur.week,
               list((cur.p - refd.p) * ln(cur.p / refd.p)
                    ORDER BY cur.bin) AS term_list
        FROM dist cur
        JOIN ref ON TRUE
        JOIN dist refd ON refd.week = ref.ref_week AND refd.bin = cur.bin
        WHERE cur.week <> ref.ref_week
        GROUP BY cur.week
    )
    SELECT week,
           ROUND(list_reduce(list_prepend(0.0, term_list), (a, b) -> a + b),
                 6) AS psi
    FROM terms
    """,
)
def value_psi_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly PSI of the value distribution vs the first week, over
    ten fixed $100 bins with Laplace smoothing (so empty cells never
    divide by zero and the metric stays defined at every SF). The
    per-week fold is ≤10 terms in fixed bin order; everything else
    is exact-count aggregation with the reference week broadcast.
    PSI > 0.2 is the standard retrain/alert threshold."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    b = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.least(F.floor(cents / 10000), F.lit(9)).cast("bigint").alias("bin"),
    )
    weeks = b.select("week").distinct()
    bins = spark.range(0, 10).select(F.col("id").cast("bigint").alias("bin"))
    c = b.groupBy("week", "bin").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        weeks.crossJoin(F.broadcast(bins))
        .join(c, ["week", "bin"], "left")
        .select(
            "week", "bin", (F.coalesce(F.col("n"), F.lit(0)) + 1).alias("n_s")
        )
    )
    gt = grid.groupBy("week").agg(F.sum("n_s").alias("tot_s"))
    dist = grid.join(F.broadcast(gt), "week").select(
        "week", "bin", (F.col("n_s").cast("double") / F.col("tot_s")).alias("p")
    )
    ref_week = b.agg(F.min("week").alias("ref_week"))
    refd = (
        dist.crossJoin(F.broadcast(ref_week))
        .where(F.col("week") == F.col("ref_week"))
        .select(F.col("bin"), F.col("p").alias("q"))
    )
    terms = (
        dist.crossJoin(F.broadcast(ref_week))
        .where(F.col("week") != F.col("ref_week"))
        .join(F.broadcast(refd), "bin")
        .select(
            "week",
            F.struct(
                "bin",
                ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
                    "t"
                ),
            ).alias("_bt"),
        )
        .groupBy("week")
        .agg(F.array_sort(F.collect_list("_bt")).alias("_bts"))
    )
    psi = F.aggregate(
        F.transform(F.col("_bts"), lambda s: s["t"]),
        F.lit(0.0),
        lambda a, b2: a + b2,
    )
    return terms.select("week", F.round(psi, 6).alias("psi"))


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout): arms by user-id
# parity, conversion = user made a purchase. The z statistic's
# closed form evaluates from four exact integers; the p-value stays
# with the reader (erf isn't cross-engine-stable) — the z value and
# the standard |z| > 1.96 verdict are.
# ---------------------------------------------------------------------------


@_q(
    "ab_test_ztest",
    """
    WITH a AS (
        SELECT CAST(event_id % 2 AS INTEGER) AS arm,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY arm
    ),
    wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN conv END) AS c1
        FROM a
    )
    SELECT CAST(n0 AS INTEGER) AS n_control,
           CAST(c0 AS INTEGER) AS conv_control,
           CAST(n1 AS INTEGER) AS n_treatment,
           CAST(c1 AS INTEGER) AS conv_treatment,
           ROUND((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z,
           ABS((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))) > 1.96 AS significant_95
    FROM wide
    """,
)
def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z over event-id parity arms, testing
    the error rate (a per-user conversion metric degenerates at the
    smallest SF: every user converts, the pooled variance hits 0).
    Arm totals are one partial/final agg, the statistic a projection
    of four exact integers — identical closed form both sides, and
    the significance verdict compares the same double. Nothing here
    scales with events beyond the one scan."""
    ev = read_table(spark, sf_dir, "events")
    a = ev.select(
        (F.col("event_id") % 2).cast("int").alias("arm"),
        (F.col("event_type") == "error").cast("long").alias("converted"),
    ).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.sqrt(
        pp * (F.lit(1) - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("int").alias("n_control"),
        F.col("c0").cast("int").alias("conv_control"),
        F.col("n1").cast("int").alias("n_treatment"),
        F.col("c1").cast("int").alias("conv_treatment"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# Constraint suite over ARRAY data: the declarative checks operator
# (checks.constraint_report) applied to the embeddings table —
# dimensionality, NaN/zero-vector screens, label domain — the QA
# gate an embedding pipeline runs before indexing. Demonstrates that
# rules are arbitrary boolean Columns (higher-order functions
# included), still one scan for N rules.
# ---------------------------------------------------------------------------


@_q(
    "embeddings_constraint_report",
    """
    WITH base AS (
        SELECT *,
               len(embedding) AS dim,
               len(list_filter(embedding, x -> isnan(x))) AS n_nan,
               len(list_filter(embedding, x -> x <> 0)) AS n_nonzero
        FROM embeddings
    ),
    b AS (
        SELECT COUNT(*) AS n_rows,
               count_if(NOT COALESCE(dim = 64, TRUE)) AS v_dim_64,
               count_if(NOT COALESCE(embedding IS NOT NULL, TRUE))
                   AS v_vector_present,
               count_if(NOT COALESCE(n_nan = 0, TRUE)) AS v_no_nans,
               count_if(NOT COALESCE(n_nonzero > 0, TRUE))
                   AS v_not_zero_vector,
               count_if(NOT COALESCE(label BETWEEN 0 AND 9, TRUE))
                   AS v_label_domain
        FROM base
    )
    SELECT "constraint", n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
        SELECT 'dim_64' AS "constraint", n_rows,
               v_dim_64 AS n_violations FROM b
        UNION ALL SELECT 'vector_present', n_rows, v_vector_present FROM b
        UNION ALL SELECT 'no_nans', n_rows, v_no_nans FROM b
        UNION ALL SELECT 'not_zero_vector', n_rows, v_not_zero_vector FROM b
        UNION ALL SELECT 'label_domain', n_rows, v_label_domain FROM b
    )
    """,
)
def embeddings_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five array-aware rules in ONE scan via checks.constraint_report
    — the rule set is a dict of boolean Columns, so higher-order
    array expressions (NaN screen, zero-vector screen) cost nothing
    extra; adding a rule adds an aggregate expression, never a
    pass."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    report = checks.constraint_report(
        emb,
        {
            "dim_64": F.size(v) == 64,
            "vector_present": v.isNotNull(),
            "no_nans": F.size(F.filter(v, lambda x: F.isnan(x))) == 0,
            "not_zero_vector": F.size(F.filter(v, lambda x: x != 0)) > 0,
            "label_domain": F.col("label").between(0, 9),
        },
    )
    return report


# ---------------------------------------------------------------------------
# Rank-trimmed mean: the robust location estimate between the plain
# mean (0% breakdown) and the median — drop the k lowest and k
# highest values per group by RANK (exact integers, deterministic
# ties) rather than by quantile (whose cut fraction would not be
# binary-exact), then take the exact decimal mean of the rest.
# ---------------------------------------------------------------------------


@_q(
    "trimmed_mean_value",
    """
    WITH r AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY CAST(CAST(value AS DECIMAL(18,2))
                                               * 100 AS BIGINT), event_id)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS INTEGER) AS n_kept,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS trimmed_mean_cents,
           MIN(cents) AS lo_kept,
           MAX(cents) AS hi_kept
    FROM r
    WHERE rn > 10 AND rn <= n - 10
    GROUP BY event_type
    """,
)
def trimmed_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean of each type's values with the 10 lowest and 10 highest
    dropped by deterministic rank (event_id tiebreak). One keyed
    window per type partition (groups partition the data — the
    per-entity contract), one exact-int agg; the mean is the same
    int/int double division both sides."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = (
        ev.select("event_type", "event_id", cents.alias("cents"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    return (
        r.where((F.col("rn") > 10) & (F.col("rn") <= F.col("n") - 10))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            (F.sum("cents").cast("double") / F.count(F.lit(1))).alias(
                "trimmed_mean_cents"
            ),
            F.min("cents").alias("lo_kept"),
            F.max("cents").alias("hi_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Benford's-law digit audit: the distribution of first significant
# digits of the value column vs log10(1+1/d) — the classic fraud /
# fabricated-data screen. Observed counts are exact; expected shares
# are the same ln-ratio expression on both engines.
# ---------------------------------------------------------------------------


@_q(
    "value_benford_audit",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                                  AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit
        FROM events
        WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit,
           CAST(c.n AS INTEGER) AS observed,
           CAST(c.n AS DOUBLE) / t.total AS observed_share,
           ROUND(ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS benford_share,
           ROUND(ABS(CAST(c.n AS DOUBLE) / t.total
                     - ln(1.0 + 1.0 / c.digit) / ln(10.0)), 6)
               AS abs_deviation
    FROM c CROSS JOIN t
    """,
)
def value_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit histogram vs Benford expectation. The digit is
    integer string surgery on exact cents (no float log for the
    OBSERVED side), counts partial-aggregate onto a 9-value domain,
    expectations are ln-ratio constants. One scan; the audit verdict
    is the reader's threshold on abs_deviation."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    d = ev.select(cents.alias("_c")).where(F.col("_c") > 0).select(
        F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias(
            "digit"
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(
        F.lit(10.0)
    )
    share = F.col("n").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("int").alias("observed"),
        share.alias("observed_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.abs(share - benford), 6).alias("abs_deviation"),
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (Sarwar et al. 2001) on top of
# the market-basket co-occurrence operator: cosine-normalize the
# co-occurrence counts into an item-item similarity and keep each
# item's top-3 neighbors — the "customers also bought" primitive.
# ---------------------------------------------------------------------------


@_q(
    "brand_item_item_cf",
    """
    WITH inc AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_n
        FROM inc a JOIN inc b ON a.b = b.b AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    ic AS (SELECT item, COUNT(*) AS n FROM inc GROUP BY item),
    sym AS (
        SELECT item_a AS item, item_b AS neighbor, pair_n FROM pairs
        UNION ALL
        SELECT item_b, item_a, pair_n FROM pairs
    ),
    scored AS (
        SELECT s.item, s.neighbor,
               ROUND(s.pair_n / (sqrt(CAST(ia.n AS DOUBLE))
                                 * sqrt(CAST(ib.n AS DOUBLE))), 6) AS sim
        FROM sym s
        JOIN ic ia ON ia.item = s.item
        JOIN ic ib ON ib.item = s.neighbor
    )
    SELECT item, neighbor, sim, CAST(rn AS INTEGER) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY item ORDER BY sim DESC, neighbor) AS rn
        FROM scored
    ) t
    WHERE rn <= 3
    """,
)
def brand_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine neighbors per brand from basket co-occurrence.
    Reuses relational.cooccurrence_pairs (one basket-keyed self-join),
    symmetrizes the pair list, normalizes by the exact incidence
    counts, and ranks within the 25-brand domain — everything after
    the pair join is domain-sized. sim rounds BEFORE the rank so the
    top-3 boundary compares identical doubles on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    inc = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    co = relational.cooccurrence_pairs(inc, basket_col="basket", item_col="item")
    sym = co.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "pair_baskets",
        F.col("baskets_a").alias("n_self"),
        F.col("baskets_b").alias("n_other"),
    ).unionByName(
        co.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "pair_baskets",
            F.col("baskets_b").alias("n_self"),
            F.col("baskets_a").alias("n_other"),
        )
    )
    sim = F.round(
        F.col("pair_baskets")
        / (
            F.sqrt(F.col("n_self").cast("double"))
            * F.sqrt(F.col("n_other").cast("double"))
        ),
        6,
    )
    w = Window.partitionBy("item").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        sym.withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("item", "neighbor", "sim", F.col("rnk").cast("int"))
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (product-limit) over
# signup → first-purchase durations with right-censoring at the
# corpus horizon — the time-to-event analysis marketing/retention
# teams run. The survival curve is a RUNNING PRODUCT, the
# multiplicative sibling of the EMA/CUSUM ordered folds: both
# engines fold the identical (1 − d/n) terms in day order, so the
# probabilities agree to the rounding grid.
# ---------------------------------------------------------------------------


@_q(
    "signup_purchase_km",
    """
    WITH s AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT s.user_id, MIN(e.ts) AS tp
        FROM s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase' AND e.ts >= s.t0
        GROUP BY s.user_id
    ),
    h AS (SELECT MAX(ts) AS horizon FROM events),
    dur AS (
        SELECT s.user_id,
               CASE WHEN p.tp IS NOT NULL
                    THEN date_diff('day', CAST(s.t0 AS DATE),
                                   CAST(p.tp AS DATE))
                    ELSE date_diff('day', CAST(s.t0 AS DATE),
                                   CAST(h.horizon AS DATE)) END AS d_days,
               p.tp IS NOT NULL AS observed
        FROM s LEFT JOIN p USING (user_id) CROSS JOIN h
    ),
    cnt AS (
        SELECT d_days, COUNT(*) AS n_all,
               count_if(observed) AS n_obs
        FROM dur GROUP BY d_days
    ),
    tot AS (SELECT SUM(n_all) AS n_total FROM cnt),
    risk AS (
        SELECT c.d_days, c.n_obs,
               t.n_total - COALESCE(SUM(c2.n_all), 0) AS n_risk
        FROM cnt c CROSS JOIN tot t
        LEFT JOIN cnt c2 ON c2.d_days < c.d_days
        GROUP BY c.d_days, c.n_obs, t.n_total
    ),
    ev AS (
        SELECT d_days, CAST(n_risk AS BIGINT) AS n_risk,
               CAST(n_obs AS BIGINT) AS d_events,
               1.0 - CAST(n_obs AS DOUBLE) / n_risk AS term
        FROM risk WHERE n_obs > 0
    ),
    curve AS (
        SELECT d_days, n_risk, d_events,
               list(term) OVER (ORDER BY d_days
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS terms
        FROM ev
    )
    SELECT CAST(d_days AS INTEGER) AS day,
           CAST(n_risk AS INTEGER) AS n_at_risk,
           CAST(d_events AS INTEGER) AS d_events,
           ROUND(list_reduce(terms, (a, b) -> a * b), 6) AS survival
    FROM curve
    """,
)
def signup_purchase_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM curve at day granularity: for each day with ≥1 observed
    conversion, the at-risk count, conversions, and the running
    product Π(1 − d/n). Durations and risk sets are exact-integer
    aggregations on the ≤O(days) domain; the product folds ≤#days
    terms in day order (the ema/list_reduce discipline, multiplied).
    The heavy lifting is two keyed aggs over events; everything
    after is domain-sized."""
    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    h = ev.agg(F.max("ts").alias("horizon"))
    dur = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(h))
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.col("tp").cast("date"), F.col("t0").cast("date")),
            )
            .otherwise(
                F.datediff(
                    F.col("horizon").cast("date"), F.col("t0").cast("date")
                )
            )
            .alias("d_days"),
            F.col("tp").isNotNull().alias("observed"),
        )
    )
    cnt = dur.groupBy("d_days").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.col("observed").cast("long")).alias("n_obs"),
    )
    tot = cnt.agg(F.sum("n_all").alias("n_total"))
    wcum = (
        Window.orderBy("d_days").rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("n_all").over(wcum), F.lit(0)),
        )
        .where(F.col("n_obs") > 0)
        .select(
            "d_days",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_obs").cast("long").alias("d_events"),
            (
                F.lit(1.0) - F.col("n_obs").cast("double") / F.col("n_risk")
            ).alias("term"),
        )
    )
    wprod = Window.orderBy("d_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = risk.withColumn("terms", F.collect_list("term").over(wprod))
    surv = F.aggregate(
        F.col("terms"), F.lit(1.0), lambda a, b: a * b
    )
    return curve.select(
        F.col("d_days").cast("int").alias("day"),
        F.col("n_risk").cast("int").alias("n_at_risk"),
        F.col("d_events").cast("int").alias("d_events"),
        F.round(surv, 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (first-touch / last-touch / touch counts):
# every purchase credits the click/view events of the same user in
# the preceding 24h. Counts only — the exact-integer core of every
# attribution model (linear/position credit is a projection over
# these counts the reader applies; float credit sums would need the
# ordered-fold discipline for no analytical gain).
# ---------------------------------------------------------------------------


@_q(
    "purchase_attribution_counts",
    """
    WITH purch AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT event_id AS t_id, user_id, ts AS t_ts, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ),
    cand AS (
        SELECT p.p_id, t.event_type, t.t_ts, t.t_id,
               lpad(CAST(epoch_us(t.t_ts) AS VARCHAR), 20, '0') || '-' ||
                   lpad(CAST(t.t_id AS VARCHAR), 12, '0') AS k
        FROM purch p JOIN touch t
          ON t.user_id = p.user_id
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL 24 HOURS
    ),
    per_p AS (
        SELECT p_id,
               COUNT(*) AS n_touches,
               arg_min(event_type, k) AS first_touch,
               arg_max(event_type, k) AS last_touch
        FROM cand GROUP BY p_id
    )
    SELECT 'click' AS channel,
           CAST(count_if(first_touch = 'click') AS INTEGER)
               AS first_touch_purchases,
           CAST(count_if(last_touch = 'click') AS INTEGER)
               AS last_touch_purchases,
           CAST((SELECT COUNT(*) FROM cand WHERE event_type = 'click')
                AS INTEGER) AS total_touches
    FROM per_p
    UNION ALL
    SELECT 'view',
           CAST(count_if(first_touch = 'view') AS INTEGER),
           CAST(count_if(last_touch = 'view') AS INTEGER),
           CAST((SELECT COUNT(*) FROM cand WHERE event_type = 'view')
                AS INTEGER)
    FROM per_p
    """,
)
def purchase_attribution_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch purchase counts and raw touch volume per
    channel. The candidate join shuffles on user_id with the 24h
    bound as a residual predicate (bounded per-user history — the
    interval-join contract); per-purchase argmin/argmax use the
    zero-padded composite key (the OHLC determinism trick); the
    channel rollup is domain-sized."""
    ev = read_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    k = F.concat(
        F.lpad(
            F.unix_micros(F.col("t_ts").cast("timestamp")).cast("string"),
            20,
            "0",
        ),
        F.lit("-"),
        F.lpad(F.col("t_id").cast("string"), 12, "0"),
    )
    cand = (
        purch.join(touch, "user_id")
        .where(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
        )
        .select("p_id", "event_type", k.alias("_k"))
    )
    per_p = cand.groupBy("p_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.min_by("event_type", "_k").alias("first_touch"),
        F.max_by("event_type", "_k").alias("last_touch"),
    )
    totals = cand.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total_touches")
    )
    out = None
    for ch in ("click", "view"):
        row = per_p.agg(
            F.lit(ch).alias("channel"),
            F.sum((F.col("first_touch") == ch).cast("int"))
            .cast("int")
            .alias("first_touch_purchases"),
            F.sum((F.col("last_touch") == ch).cast("int"))
            .cast("int")
            .alias("last_touch_purchases"),
        ).crossJoin(
            F.broadcast(
                totals.where(F.col("event_type") == ch).select(
                    F.col("total_touches").cast("int").alias("total_touches")
                )
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Calibration curve (reliability diagram) of the continuous quality
# score against the Gopher hard verdict: decile bins of the score,
# per-bin pass rate — the "is the score meaningful" check a curation
# pipeline runs before thresholding on it.
# ---------------------------------------------------------------------------


_QUALITY_SCORED_CTES = r"""
    t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w,
               text
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(w) AS n_words,
               len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                   AS n_alpha_words,
               len(array_to_string(w, '')) AS n_word_chars,
               CAST(list_contains(w, 'the') AS INTEGER)
                   + CAST(list_contains(w, 'a') AS INTEGER)
                   AS n_stop_distinct,
               length(regexp_replace(text, '\s+', '', 'g')) AS nonspace,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
               len(list_filter(w, x -> list_contains(
                   ['the','and','of','to','in','is','that','with'], x)))
                   AS stop_hits
        FROM t
    ),
    scored AS (
        SELECT doc_id,
               (n_words BETWEEN 30 AND 5000)
                   AND (n_word_chars / n_words BETWEEN 3.0 AND 5.0)
                   AND (n_alpha_words / CAST(n_words AS DOUBLE) >= 0.9)
                   AND (n_stop_distinct >= 2) AS gopher_pass,
               ROUND(LEAST(1.0,
                   0.4 * (CASE WHEN nonspace > 0
                               THEN alpha / CAST(nonspace AS DOUBLE)
                               ELSE 0.0 END)
                   + 0.4 * (CASE WHEN n_words >= 5 THEN 1.0
                                 ELSE n_words / 5.0 END)
                   + 0.2 * LEAST(1.0,
                       (CASE WHEN n_words > 0
                             THEN stop_hits / CAST(n_words AS DOUBLE)
                             ELSE 0.0 END) * 4)), 4) AS q
        FROM m WHERE n_words > 0
    )
"""


@_q(
    "quality_calibration_bins",
    f"""
    WITH {_QUALITY_SCORED_CTES}
    SELECT CAST(LEAST(CAST(floor(q * 10) AS BIGINT), 9) AS INTEGER) AS bin,
           CAST(COUNT(*) AS INTEGER) AS n_docs,
           CAST(count_if(gopher_pass) AS INTEGER) AS n_pass,
           CAST(count_if(gopher_pass) AS DOUBLE) / COUNT(*) AS pass_rate
    FROM scored GROUP BY bin
    """,
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: the composite quality score (the same
    expression tree as text.quality_score, rounded to its published
    4 decimals BEFORE binning so the bin edge compares identical
    doubles) against the Gopher hard verdict, per decile bin. One
    projection + one domain-sized agg."""
    docs = read_table(spark, sf_dir, "documents")
    w = dedup.tokens("text")
    n_words = F.size(w)
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    n_chars = F.length(F.array_join(w, ""))
    n_stop = F.array_contains(w, "the").cast("int") + F.array_contains(
        w, "a"
    ).cast("int")
    mean_len = n_chars / n_words
    alpha_frac = n_alpha / n_words.cast("double")
    gopher = (
        n_words.between(30, 5000)
        & mean_len.between(3.0, 5.0)
        & (alpha_frac >= 0.9)
        & (n_stop >= 2)
    )
    q = F.round(textfn.quality_score(F.col("text")), 4)
    scored = docs.where(n_words > 0).select(
        gopher.alias("gopher_pass"), q.alias("q")
    )
    b = F.least(F.floor(F.col("q") * 10).cast("bigint"), F.lit(9)).cast(
        "int"
    )
    return scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(F.col("gopher_pass").cast("int")).cast("int").alias("n_pass"),
        (
            F.sum(F.col("gopher_pass").cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# FUZZY benchmark decontamination: the MinHash/LSH complement of the
# exact n-gram `benchmark_contamination` — near-duplicates of
# benchmark documents (not just verbatim overlaps) flagged in the
# corpus via the persisted-index machinery, the way production
# pipelines decontaminate against eval suites (GPT-3 appendix C
# style). Bound-checked like incremental_near_dup: output is the
# TRUE cross-side Jaccard≥0.5 pairs, with an in-query assertion that
# the LSH path surfaced each as a candidate with a close estimate.
# ---------------------------------------------------------------------------


@_q(
    "fuzzy_decontamination",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(w[1:len(w) - 2],
                      (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2]))
                   AS shingle
        FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
        SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id,
               COUNT(*) AS inter
        FROM sh b JOIN sh c ON b.shingle = c.shingle
        WHERE b.doc_id % 31 = 0 AND c.doc_id % 31 <> 0
        GROUP BY 1, 2
    )
    SELECT bench_id, corpus_id,
           ROUND(inter / (sb.set_size + sc.set_size - inter), 4)
               AS jaccard,
           TRUE AS est_within
    FROM inter
    JOIN sizes sb ON inter.bench_id = sb.doc_id
    JOIN sizes sc ON inter.corpus_id = sc.doc_id
    WHERE inter / (sb.set_size + sc.set_size - inter) >= 0.5
    """,
)
def fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs near-duplicating a benchmark doc (3-gram Jaccard
    ≥ 0.5). The benchmark side (doc_id % 31 == 0) builds the LSH
    index ONCE; the corpus streams against it — only matched
    (band, bucket) rows join, corpus text is hashed but never
    self-joined. est_within asserts the candidate surfaced with
    |est − true| ≤ 0.2; a banding miss or estimator bias fails the
    driver hash."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    index = dedup.minhash_index(bench, "doc_id", "text")
    cand = dedup.minhash_pairs_against_index(
        corpus, index, "doc_id", "text", threshold=0.0
    ).select(
        F.col("doc_old").alias("bench_id"),
        F.col("doc_new").alias("corpus_id"),
        F.col("est_jaccard"),
    )
    # r6: cross-sides-only exact join (dedup.jaccard_pairs_cross) —
    # the old full-corpus jaccard_pairs scored every corpus×corpus
    # pair just to discard them; the decontamination shape only ever
    # needs bench×corpus candidates (Σ df_A·df_B, not Σ df²).
    true_pairs = dedup.jaccard_pairs_cross(
        bench, corpus, "doc_id", "text", n=3, threshold=0.5
    ).select(
        F.col("id_a").alias("bench_id"),
        F.col("id_b").alias("corpus_id"),
        "jaccard",
    )
    return (
        true_pairs.join(cand, ["bench_id", "corpus_id"], "left")
        .select(
            "bench_id",
            "corpus_id",
            F.col("jaccard"),
            (
                F.col("est_jaccard").isNotNull()
                & (F.abs(F.col("est_jaccard") - F.col("jaccard")) <= 0.2)
            ).alias("est_within"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the declared `lang` column vs the
# engine's marker-based heuristic (functions/text.lang_id) — the
# eval every classifier-replacing-metadata decision needs. Counts
# are exact; the heuristic is a deterministic projection, so the
# matrix is stable.
# ---------------------------------------------------------------------------


@_q(
    "lang_id_confusion",
    r"""
    WITH scored AS (
        SELECT lang AS declared,
               (WITH hits AS (
                    SELECT
                      len(regexp_extract_all(lower(text),
                          '\b(der|die|das|und|nicht|ist|ein|mit)\b')) AS de,
                      len(regexp_extract_all(lower(text),
                          '\b(the|and|of|to|in|is|that|with)\b')) AS en,
                      len(regexp_extract_all(lower(text),
                          '\b(el|la|los|que|es|una|con|para)\b')) AS es,
                      len(regexp_extract_all(lower(text),
                          '\b(le|la|les|et|est|une|que|dans)\b')) AS fr
                )
                SELECT CASE
                    WHEN fr > greatest(de, en, es, 0) THEN 'fr'
                    WHEN es > greatest(de, en, 0) THEN 'es'
                    WHEN en > greatest(de, 0) THEN 'en'
                    WHEN de > 0 THEN 'de'
                    ELSE 'unknown' END
                FROM hits) AS predicted
        FROM documents
    )
    SELECT declared, predicted, CAST(COUNT(*) AS INTEGER) AS n
    FROM scored GROUP BY declared, predicted
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language counts. The Spark side is the
    production lang_id() Column (alphabetical argmax with strict-
    greater wins — the oracle reproduces that exact tie rule as a
    reversed CASE cascade); one projection + one agg onto the ≤5×5
    domain."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("declared"),
            textfn.lang_id("text").alias("predicted"),
        )
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).cast("int").alias("n"))
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative value per signup cohort by weeks-
# since-signup — the lifetime-value readout on top of the retention
# matrix. Exact cents cumulated over the (cohort, age) DIMENSION.
# ---------------------------------------------------------------------------


@_q(
    "cohort_ltv_curve",
    """
    WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort,
               date_diff('week', f.cohort,
                         CAST(date_trunc('week', e.ts) AS DATE)) AS age_weeks,
               SUM(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events e JOIN first_seen f USING (user_id)
        GROUP BY 1, 2
    ),
    sizes AS (SELECT cohort, COUNT(*) AS cohort_users
              FROM first_seen GROUP BY cohort)
    SELECT r.cohort, CAST(r.age_weeks AS INTEGER) AS age_weeks,
           CAST(s.cohort_users AS INTEGER) AS cohort_users,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort
                                   ORDER BY r.age_weeks) AS BIGINT)
               AS cum_cents,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort
                                   ORDER BY r.age_weeks) AS DOUBLE)
               / s.cohort_users AS ltv_cents_per_user
    FROM rev r JOIN sizes s USING (cohort)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV per weekly signup cohort. The events scan
    aggregates to exact cents on the (cohort, age) dimension FIRST;
    the running sum then windows over a handful of rows per cohort —
    never raw events. Per-user LTV is one int/int division."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    rev = (
        ev.join(first_seen, "user_id")
        .select(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort"),
                )
                / 7
            )
            .cast("long")
            .alias("age_weeks"),
            cents.alias("_c"),
        )
        .groupBy("cohort", "age_weeks")
        .agg(F.sum("_c").alias("cents"))
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = Window.partitionBy("cohort").orderBy("age_weeks")
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("age_weeks").cast("int").alias("age_weeks"),
            F.col("cohort_users").cast("int").alias("cohort_users"),
            F.sum("cents").over(w).alias("cum_cents"),
            (
                F.sum("cents").over(w).cast("double")
                / F.col("cohort_users")
            ).alias("ltv_cents_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonally-adjusted anomalies: each day's total vs ITS OWN
# day-of-week baseline — the deseasonalized twin of the CUSUM/z
# monitors (a Monday spike is only a spike relative to Mondays).
# All exact-integer means; flag thresholds compare identical doubles.
# ---------------------------------------------------------------------------


@_q(
    "dow_adjusted_anomalies",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, dayofweek(ts) AS dow,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT dow,
               CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS dow_mean,
               COUNT(*) AS n_days
        FROM daily GROUP BY dow
    )
    SELECT d.day, CAST(d.dow AS INTEGER) AS dow, d.cents,
           ROUND(b.dow_mean, 6) AS dow_mean_cents,
           ROUND(CAST(d.cents AS DOUBLE) / b.dow_mean, 6) AS ratio,
           (CAST(d.cents AS DOUBLE) / b.dow_mean > 1.2
            OR CAST(d.cents AS DOUBLE) / b.dow_mean < 0.8) AS is_anomaly
    FROM daily d JOIN base b USING (dow)
    WHERE b.n_days >= 3
    """,
)
def dow_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each day's total vs its own day-of-week mean, with the ≥20%
    deviation verdict as an emitted boolean (filtering on it made
    the oracle match vacuously on calm data — 0 rows at sf0.01; the
    full series keeps the comparison discriminating while the flag
    still marks the anomalies). Daily rollup → 7-row baseline
    broadcast → projection; the DOW convention is aligned
    Spark→DuckDB by subtracting 1 (the chisquare precedent). The
    flag compares the same raw double ratio on both sides; emitted
    values round."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            cents.alias("_c"),
        )
        .groupBy("day", "dow")
        .agg(F.sum("_c").alias("cents"))
    )
    base = daily.groupBy("dow").agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("dow_mean"),
        F.count(F.lit(1)).alias("n_days"),
    )
    ratio = F.col("cents").cast("double") / F.col("dow_mean")
    return (
        daily.join(F.broadcast(base), "dow")
        .where(F.col("n_days") >= 3)
        .select(
            "day",
            F.col("dow").cast("int"),
            "cents",
            F.round("dow_mean", 6).alias("dow_mean_cents"),
            F.round(ratio, 6).alias("ratio"),
            ((ratio > 1.2) | (ratio < 0.8)).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): unlike the
# Misra–Gries summaries (whose estimates are partitioning-dependent
# and only bound-checkable), CMS cells are plain sums over
# deterministic md5 buckets — the sketch AND its estimates are
# exactly engine-reproducible, so this oracle checks the estimator
# itself: est = min over rows, est ≥ true, overestimate exactly
# equal on both engines.
# ---------------------------------------------------------------------------


@_q(
    "cms_user_counts",
    """
    WITH b AS (
        SELECT user_id, r.r AS r,
               CAST(('0x' || substring(md5(CAST(r.r AS VARCHAR) || '|' ||
                                           CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 256 AS bucket
        FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS r) r
    ),
    cms AS (
        SELECT r, bucket, COUNT(*) AS cnt FROM b GROUP BY r, bucket
    ),
    truth AS (
        SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id
    ),
    probes AS (
        SELECT t.user_id, t.true_n, pb.r,
               CAST(('0x' || substring(md5(CAST(pb.r AS VARCHAR) || '|' ||
                                           CAST(t.user_id AS VARCHAR)), 1,
                                       15)) AS BIGINT) % 256 AS bucket
        FROM truth t CROSS JOIN (SELECT unnest(range(0, 4)) AS r) pb
    )
    SELECT p.user_id, CAST(p.true_n AS INTEGER) AS true_n,
           CAST(MIN(COALESCE(c.cnt, 0)) AS INTEGER) AS cms_est,
           CAST(MIN(COALESCE(c.cnt, 0)) - p.true_n AS INTEGER)
               AS overestimate,
           MIN(COALESCE(c.cnt, 0)) >= p.true_n AS never_undercounts
    FROM probes p
    LEFT JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY p.user_id, p.true_n
    """,
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-count estimates from a 4×256 CMS vs the exact
    counts. Every column — including the estimate and its exact
    overestimate — hash-matches across engines because CMS cells are
    deterministic-bucket sums; never_undercounts is the CMS theorem
    as a checked boolean. Update/merge is one (depth×width)-key
    partial aggregate: the sketch the streaming side appends
    per-batch where exact per-key counts would be unbounded state."""
    from ..operators import sketch

    ev = read_table(spark, sf_dir, "events")
    table = sketch.cms_table(ev, "user_id", depth=4, width=256)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    est = sketch.cms_estimates(table, truth.select("user_id"), "user_id")
    return truth.join(est, "user_id").select(
        "user_id",
        F.col("true_n").cast("int").alias("true_n"),
        F.col("est").cast("int").alias("cms_est"),
        (F.col("est") - F.col("true_n")).cast("int").alias("overestimate"),
        (F.col("est") >= F.col("true_n")).alias("never_undercounts"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA (operators/pca.py): exact-int second moments in one
# mapInPandas pass, closed-form covariance, grid-rounded power
# iteration, and corpus projection. The whitening front half of
# SemDeDup/D4-style embedding curation, differential-tested end to
# end. (No reference-repo counterpart; SURVEY §2.12 extension.)
# ---------------------------------------------------------------------------

# Shared oracle prefix: exact-int Gram/first moments on the 1e-6
# quantization grid (mirrors pca.second_moments_quantized), then the
# one fixed covariance expression. `g` stays exact (HUGEINT in
# DuckDB, DECIMAL(38,0) in Spark); the double conversion happens in
# the same operation order on both engines.
_PCA_COV_CTES = """
    qx AS MATERIALIZED (
        SELECT vec_id,
               CAST(u.pos AS INTEGER) AS pos,
               CAST(FLOOR(CAST(u.x AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS x,
                             unnest(range(0, len(embedding))) AS pos) u
    ),
    m AS MATERIALIZED (
        SELECT a.pos AS i, b.pos AS j, COUNT(*) AS n,
               SUM(a.q) AS si, SUM(b.q) AS sj, SUM(a.q * b.q) AS g
        FROM qx a JOIN qx b
          ON a.vec_id = b.vec_id AND a.pos <= b.pos
        GROUP BY a.pos, b.pos
    ),
    cov AS MATERIALIZED (
        SELECT i, j, n, g,
               ROUND((CAST(g AS DOUBLE)
                      - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE) / 1000000000000.0, 12) AS c
        FROM m
    )
"""

# Power-iteration rounds over the covariance, every round quantity on
# the 1e-9 grid (see pca.top_component for why the grid makes the
# recurrence engine-identical).
_PCA_POWER_CTES = (
    _PCA_COV_CTES
    + """,
    sym AS MATERIALIZED (SELECT i, j, c FROM cov
            UNION ALL
            SELECT j AS i, i AS j, c FROM cov WHERE i < j),
    v0 AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS pos,
                  1.0 / SQRT(64.0) AS vv),
    w1 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM sym s JOIN v0 v ON v.pos = s.j GROUP BY s.i),
    n1 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM w1),
    v1 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM w1, n1),
    w2 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM sym s JOIN v1 v ON v.pos = s.j GROUP BY s.i),
    n2 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM w2),
    v2 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM w2, n2),
    w3 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM sym s JOIN v2 v ON v.pos = s.j GROUP BY s.i),
    n3 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM w3),
    v3 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM w3, n3)
"""
)


@_q(
    "embedding_covariance",
    f"""
    WITH {_PCA_COV_CTES}
    SELECT i, j, CAST(n AS BIGINT) AS n,
           CAST(g AS VARCHAR) AS gram, c AS cov
    FROM cov
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance of the 64-dim embedding corpus —
    `pca.covariance`: ONE mapInPandas pass emits per-batch exact-int
    partial Gram triangles (2 080 rows per batch, never N·dim), one
    2 080-key shuffle finishes the sums as DECIMAL(38,0), and the
    covariance doubles come from one fixed expression over those
    exact integers. `gram` is compared as the exact integer string —
    a quantization or partial-aggregation bug cannot hide behind
    float tolerance."""
    from ..operators import pca

    emb = read_table(spark, sf_dir, "embeddings")
    return pca.covariance(emb, dim=64)


@_q(
    "pca_power_component",
    f"""
    WITH {_PCA_POWER_CTES},
    ray AS (SELECT ROUND(SUM(s.c * a.vv * b.vv), 9) AS eigenvalue
            FROM sym s JOIN v3 a ON a.pos = s.i JOIN v3 b ON b.pos = s.j)
    SELECT v3.pos, v3.vv AS loading, ray.eigenvalue
    FROM v3, ray
    """,
)
def pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus —
    `pca.top_component`: three unrolled power-iteration rounds on the
    dim×dim covariance (kilobytes; every join broadcasts), each
    round's matvec/norm/vector ROUNDed to the shared 1e-9 grid so the
    recurrence is engine-identical, plus the Rayleigh-quotient
    eigenvalue. The corpus-sized work all happened in the covariance
    pass; this stage is O(dim²) regardless of N."""
    from ..operators import pca

    emb = read_table(spark, sf_dir, "embeddings")
    comp = pca.top_component(pca.covariance(emb, dim=64), dim=64)
    return comp.select("pos", "loading", "eigenvalue")


@_q(
    "pca_project_top1",
    f"""
    WITH {_PCA_POWER_CTES},
    vlist AS (SELECT list(vv ORDER BY pos) AS v FROM v3),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed
          FROM embeddings)
    SELECT vec_id,
           ROUND(list_reduce(
               list_transform(ed, (x, i) -> ROUND(x * v[i], 9)),
               (a, b) -> a + b), 9) AS pc1_score
    FROM e, vlist
    """,
)
def pca_project_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the data-derived top component —
    `pca.project`: the driver collects the 64 rounded loadings
    (kilobytes, the k-means-centroid discipline) and the projection
    itself is a zero-shuffle scan folding per-position products in
    array order, each product ROUNDed before the fold so DuckDB's
    list fusion cannot FMA-drift (see pca.py). This is the scalar
    the D4-style curation loop sorts/clusters on."""
    from ..operators import pca

    emb = read_table(spark, sf_dir, "embeddings")
    comp = pca.top_component(pca.covariance(emb, dim=64), dim=64)
    loadings = [
        r["loading"] for r in sorted(comp.collect(), key=lambda r: r["pos"])
    ]
    proj = pca.project(emb, loadings, out_col="pc1_score")
    return proj.select(
        "vec_id", F.round("pc1_score", 9).alias("pc1_score")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance (operators/ivm.py): maintain an
# aggregated JOIN view by the delta-join expansion instead of
# recomputing the base join. The oracle computes the view DIRECTLY —
# a hash match IS the IVM correctness theorem (any double-counted or
# dropped delta term breaks it).
# ---------------------------------------------------------------------------


@_q(
    "ivm_nation_revenue",
    """
    SELECT c_nationkey AS nation_key,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) FILTER (WHERE o_orderkey % 7 = 0 OR c_custkey % 9 = 0)
               AS n_from_delta
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def ivm_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-by-nation over orders⋈customer, maintained
    INCREMENTALLY: ~1/7 of orders and ~1/9 of customers are held out
    as insert deltas, the base view is materialized (localCheckpoint
    = the persisted-state boundary), and the refresh computes only
    γ(ΔO⋈C) ⊕ γ(O⋈ΔC) ⊕ γ(ΔO⋈ΔC) before one state merge. The
    oracle is the DIRECT join-aggregate over the full tables, so the
    hash compare proves maintained ≡ recomputed; `n_from_delta`
    (rows that arrived via any delta term) proves the delta path is
    non-vacuous. At scale each delta term is a small-side join the
    optimizer broadcasts from size estimates."""
    from ..operators import ivm

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o_delta = orders.where(F.col("o_orderkey") % 7 == 0)
    o_old = orders.where(F.col("o_orderkey") % 7 != 0)
    c_delta = cust.where(F.col("c_custkey") % 9 == 0)
    c_old = cust.where(F.col("c_custkey") % 9 != 0)
    on = F.col("o_custkey") == F.col("c_custkey")
    states = {
        "n_orders": F.lit(1),
        "revenue": F.col("o_totalprice").cast("decimal(18,2)"),
    }
    keys, names = ["c_nationkey"], list(states)
    base = ivm.join_agg_states(o_old, c_old, on, keys, states)
    base = base.localCheckpoint(eager=True)
    d = ivm.delta_states(
        o_old, o_delta, c_old, c_delta, on, keys, states
    ).localCheckpoint(eager=True)
    view = ivm.apply_delta(base, d, keys, names)
    dn = d.select("c_nationkey", F.col("n_orders").alias("n_from_delta"))
    return view.join(dn, "c_nationkey", "left").select(
        F.col("c_nationkey").alias("nation_key"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("revenue").cast("double").alias("revenue"),
        F.coalesce(F.col("n_from_delta"), F.lit(0))
        .cast("long")
        .alias("n_from_delta"),
    )


# ---------------------------------------------------------------------------
# Positional phrase search (operators/search.py): exact phrase
# occurrence counts from a positional inverted index — the retrieval
# primitive bag-of-words BM25 cannot express. Oracle = per-document
# token-list scan.
# ---------------------------------------------------------------------------


@_q(
    "phrase_search_positional",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    hits AS (
        SELECT 'batch batch' AS phrase, doc_id,
               len(list_filter(range(1, len(w)),
                   i -> w[i] = 'batch' AND w[i+1] = 'batch')) AS n_matches
        FROM toks
        UNION ALL
        SELECT 'hash join', doc_id,
               len(list_filter(range(1, len(w)),
                   i -> w[i] = 'hash' AND w[i+1] = 'join'))
        FROM toks
        UNION ALL
        SELECT 'merge slow join', doc_id,
               len(list_filter(range(1, len(w) - 1),
                   i -> w[i] = 'merge' AND w[i+1] = 'slow'
                        AND w[i+2] = 'join'))
        FROM toks
    )
    SELECT phrase, doc_id, n_matches FROM hits WHERE n_matches > 0
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch phrase search — `search.phrase_match_counts` over three
    phrases including a repeated-token phrase ("batch batch", the
    case that breaks naive position intersection) and a 3-gram. ONE
    broadcast join of vocabulary-filtered positional postings
    against the literal (phrase, offset, token) table, then the
    COUNT(offsets)=phrase_len check per candidate start. The oracle
    re-counts by scanning each document's token list — overlapping
    occurrences count on both sides."""
    from ..operators import search

    docs = read_table(spark, sf_dir, "documents")
    return search.phrase_match_counts(
        docs, ["batch batch", "hash join", "merge slow join"]
    )


# ---------------------------------------------------------------------------
# Perceptual image near-dup (functions/multimodal.average_hash): the
# visual-curation sibling of text MinHash — brightness-invariant
# aHash pairs over REAL BMP decode. The oracle states each hash in
# closed form from the synthesis parameters, so a decode, pooling,
# thresholding, or bit-packing bug changes emitted values.
# ---------------------------------------------------------------------------


@_q(
    "image_ahash_pairs",
    """
    WITH m AS (
        SELECT doc_id AS media_id, doc_id % 5 AS g
        FROM documents WHERE doc_id < 60
    ),
    h AS (
        SELECT media_id,
               (CAST(POW(2, 2 + g) AS BIGINT) - 1) * 72340172838076673
                   AS ahash
        FROM m
    )
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming,
           bit_count(xor(a.ahash, b.ahash)) = 0 AS same_pattern
    FROM h a JOIN h b ON a.media_id < b.media_id
    """,
)
def image_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over REAL image decode: each media
    row synthesizes a 16×16 grayscale vertical-stripe BMP whose
    stripe width is its pattern group (doc_id%5) and whose
    brightness is shifted by doc_id%7 — aHash is invariant to the
    shift (the threshold adapts), so within-group pairs land at
    hamming 0 and cross-group pairs at exactly 8·|Δgroup|. The hash
    runs the full real path (struct+numpy BMP decode → gray → area
    pool → adaptive threshold → bit pack in
    `multimodal.average_hash`); the oracle recomputes every 64-bit
    hash in CLOSED FORM from the synthesis parameters — decode or
    hash bugs shift emitted hammings. Payloads never shuffle; the
    pair join runs on 16-byte hash rows."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 5).cast("int").alias("g"),
        (F.col("doc_id") % 7).cast("int").alias("shift"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    int(m),
                    mm.synth_bmp_vstripes(
                        16, 16, (2 + int(g)) * 2, 40, 200, int(s)
                    ),
                )
                for m, g, s in zip(pdf["media_id"], pdf["g"], pdf["shift"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    bmp = base.mapInPandas(synth, "media_id long, payload binary")
    hashes = mm.average_hash(bmp)
    a = hashes.select(
        F.col("media_id").alias("media_a"), F.col("ahash").alias("ha")
    )
    b = hashes.select(
        F.col("media_id").alias("media_b"), F.col("ahash").alias("hb")
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, F.col("media_a") < F.col("media_b"))
        .select(
            "media_a",
            "media_b",
            ham.cast("int").alias("hamming"),
            (ham == 0).alias("same_pattern"),
        )
    )


# ---------------------------------------------------------------------------
# Holt double exponential smoothing
# (sequential.holt_winters_fixed_point_per_key): level+trend
# forecasting over daily exact-cent totals. The 2-state recurrence
# doesn't fit a scalar list_reduce, so the oracle is a RECURSIVE CTE —
# and after the r4 driver hash-fail the recurrence is EXACT integer
# fixed point (BIGINT state in 2^-20 cents, portable floor division),
# not a float chain betting on cross-engine FMA behavior. Emitted
# doubles are exact power-of-2 divisions of identical BIGINTs.
# ---------------------------------------------------------------------------


def _sql_floordiv(a: str, d: int) -> str:
    """Portable SQL floor division by positive ``d``: DuckDB's ``//``
    truncates toward zero and ``%`` is C-style, so shift the numerator
    onto an exact multiple first (then trunc == floor)."""
    return f"(({a}) - (((({a}) % {d}) + {d}) % {d})) // {d}"


_HW_SCALE = 1 << 20
_HW_LNEW = _sql_floordiv("n.xfp + 3 * (h.lfp + h.tfp)", 4)
_HW_TNEW = _sql_floordiv(f"(({_HW_LNEW}) - h.lfp) + 7 * h.tfp", 8)


@_q(
    "daily_value_holt_winters",
    f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, day, cents,
               cents * {_HW_SCALE} AS xfp,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS stp
        FROM daily
    ),
    hw AS (
        SELECT event_type, day, cents, xfp, stp,
               xfp AS lfp, CAST(0 AS BIGINT) AS tfp
        FROM seq WHERE stp = 1
        UNION ALL
        SELECT n.event_type, n.day, n.cents, n.xfp, n.stp,
               {_HW_LNEW} AS lfp,
               {_HW_TNEW} AS tfp
        FROM hw h JOIN seq n
          ON n.event_type = h.event_type AND n.stp = h.stp + 1
    )
    SELECT event_type, day, cents,
           CAST(lfp AS DOUBLE) / {_HW_SCALE}.0 AS level,
           CAST(tfp AS DOUBLE) / {_HW_SCALE}.0 AS trend,
           CAST(lfp + tfp AS DOUBLE) / {_HW_SCALE}.0 AS forecast_next
    FROM hw
    """,
)
def daily_value_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend smoothing of per-type daily value totals with
    the one-step-ahead forecast — the trend-aware upgrade of
    `user_value_ema` (`revenue_forecast` fits one global line; this
    tracks a drifting level per series). Daily totals are exact
    integer cents; the recurrence runs in EXACT int64 fixed point
    (state in 2^-20 cents, α=1/4, β=1/8 as rationals, floor division
    — the r4 float-chain version drew a driver hash-fail from
    engine-sensitive FMA/rounding). Emitted level/trend/forecast are
    single power-of-2 divisions of bit-identical BIGINTs, exact while
    |state| < 2^52. One shuffle to daily grain + one ordered fold per
    type."""
    from ..operators.sequential import holt_winters_fixed_point_per_key

    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").cast("bigint").alias("cents"))
    )
    out = holt_winters_fixed_point_per_key(
        daily, "event_type", ("day",), "cents", alpha=(1, 4), beta=(1, 8)
    )
    s = F.lit(float(_HW_SCALE))
    return out.select(
        "event_type",
        "day",
        "cents",
        (F.col("level_fp").cast("double") / s).alias("level"),
        (F.col("trend_fp").cast("double") / s).alias("trend"),
        (
            (F.col("level_fp") + F.col("trend_fp")).cast("double") / s
        ).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (operators/er.py): the
# decision layer over the engine's blocking + fuzzy scoring. Weights
# are Python-computed literals inlined into BOTH plans (CAST(x AS
# DOUBLE) in the oracle — a bare decimal literal would parse as
# DECIMAL and break bit-equality), so the score sum is bit-equal.
# ---------------------------------------------------------------------------

from ..operators.er import fs_weights as _fs_weights

_FS_PARAMS = [
    ("agree_name", 0.95, 0.01),
    ("agree_nation", 0.90, 0.04),
    ("agree_bal", 0.80, 0.02),
]
# String-quoted casts: DuckDB parses a bare 17-digit literal as
# DECIMAL and the decimal→double conversion double-rounds (measured:
# -2.2617630984737906 → -2.26176309847379); CAST('…' AS DOUBLE) goes
# through strtod and round-trips exactly.
_FS_CASES = " + ".join(
    f"CASE WHEN {col} THEN CAST('{_fs_weights(m, u)[0]!r}' AS DOUBLE) "
    f"ELSE CAST('{_fs_weights(m, u)[1]!r}' AS DOUBLE) END"
    for col, m, u in _FS_PARAMS
)


@_q(
    "customer_fellegi_sunter",
    f"""
    WITH c AS (
        SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM customer WHERE c_custkey % 10 = 0
    ),
    p AS (
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.95
                   AS agree_name,
               a.c_nationkey = b.c_nationkey AS agree_nation,
               ABS(a.cents - b.cents) <= 10000 AS agree_bal
        FROM c a JOIN c b
          ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
    ),
    s AS (SELECT *, {_FS_CASES} AS fs_score FROM p)
    SELECT key_a, key_b, agree_name, agree_nation, agree_bal, fs_score,
           CASE WHEN fs_score >= 5.0 THEN 'link'
                WHEN fs_score >= 0.0 THEN 'possible'
                ELSE 'non_link' END AS decision
    FROM s
    """,
)
def customer_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage over segment-blocked candidate pairs:
    three field comparisons (Jaro-Winkler name agreement on the
    ROUNDed score, nation equality, account balance within 100.00 on
    exact cents) fold into the log-likelihood-ratio score with
    literal m/u weights, then threshold into link / possible /
    non_link. The score is a fixed-order sum of identical double
    literals on both engines — bit-equal, no tolerance; threshold
    compares cannot flip. Pure projection over the blocked pairs:
    blocking bounds the cost, scoring adds zero shuffle."""
    from ..operators import er

    jw = textfn.jaro_winkler_pandas_udf()
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    )
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_na"),
        F.col("c_nationkey").alias("_ga"),
        cents.alias("_ca"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_nb"),
        F.col("c_nationkey").alias("_gb"),
        cents.alias("_cb"),
    )
    pairs = (
        a.join(b, "segment")
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            (F.round(jw(F.col("_na"), F.col("_nb")), 6) >= 0.95).alias(
                "agree_name"
            ),
            (F.col("_ga") == F.col("_gb")).alias("agree_nation"),
            (F.abs(F.col("_ca") - F.col("_cb")) <= 10000).alias("agree_bal"),
        )
    )
    scored = er.fellegi_sunter(
        pairs, _FS_PARAMS, link_threshold=5.0, possible_threshold=0.0
    )
    return scored.select(
        "key_a",
        "key_b",
        "agree_name",
        "agree_nation",
        "agree_bal",
        "fs_score",
        "decision",
    )


# ---------------------------------------------------------------------------
# Change-point detection (binary segmentation, one split): the
# offline complement of the sequential monitors (cusum/zscore) —
# find WHERE the level shifted, not just that it did. SSE from
# exact-integer prefix moments; the argmin compares bit-equal
# doubles with an explicit index tie-break.
# ---------------------------------------------------------------------------


@_q(
    "daily_value_changepoint",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, day, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS ps,
               SUM(CAST(cents * cents AS DECIMAL(38,0)))
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING) AS ps2,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(cents) OVER (PARTITION BY event_type) AS ts_all,
               SUM(CAST(cents * cents AS DECIMAL(38,0)))
                   OVER (PARTITION BY event_type) AS t2
        FROM daily
    ),
    scored AS (
        SELECT event_type, day, i, n,
               CAST(t2 AS DOUBLE)
                   - CAST(ts_all AS DOUBLE) * CAST(ts_all AS DOUBLE)
                     / CAST(n AS DOUBLE) AS sse_nosplit,
               (CAST(ps2 AS DOUBLE)
                    - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE)
                      / CAST(i AS DOUBLE))
               + (CAST(t2 - ps2 AS DOUBLE)
                    - CAST(ts_all - ps AS DOUBLE)
                      * CAST(ts_all - ps AS DOUBLE)
                      / CAST(n - i AS DOUBLE)) AS sse_split
        FROM seq WHERE i < n
    )
    SELECT event_type, day AS split_day, CAST(i AS BIGINT) AS split_i,
           CAST(n AS BIGINT) AS n_days, sse_nosplit, sse_split,
           sse_nosplit - sse_split AS sse_reduction
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY sse_split, i) = 1
    """,
)
def daily_value_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single change-point per event-type daily series (binary
    segmentation): SSE(left)+SSE(right) for every split from
    exact-integer prefix moments (cents as BIGINT, squared sums as
    DECIMAL(38,0) — cents³-class overflow is why), evaluated as one
    fixed double expression per side. Both engines compare
    bit-equal doubles, so the argmin (tie → earliest day) picks the
    same split. Windows partition by event_type — per-series days
    are calendar-bounded, so no SinglePartition risk; the heavy
    grain reduction (events → days) is one partial/final agg."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wa = Window.partitionBy("event_type")
    sq = (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
    seq = daily.select(
        "event_type",
        "day",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
        F.sum("cents").over(wo).alias("ps"),
        F.sum(sq).over(wo).alias("ps2"),
        F.count(F.lit(1)).over(wa).alias("n"),
        F.sum("cents").over(wa).alias("ts_all"),
        F.sum(sq).over(wa).alias("t2"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    sse_nosplit = d(F.col("t2")) - d(F.col("ts_all")) * d(
        F.col("ts_all")
    ) / d(F.col("n"))
    sse_split = (
        d(F.col("ps2")) - d(F.col("ps")) * d(F.col("ps")) / d(F.col("i"))
    ) + (
        d(F.col("t2") - F.col("ps2"))
        - d(F.col("ts_all") - F.col("ps"))
        * d(F.col("ts_all") - F.col("ps"))
        / d(F.col("n") - F.col("i"))
    )
    scored = seq.where(F.col("i") < F.col("n")).select(
        "event_type",
        F.col("day").alias("split_day"),
        F.col("i").cast("long").alias("split_i"),
        F.col("n").cast("long").alias("n_days"),
        sse_nosplit.alias("sse_nosplit"),
        sse_split.alias("sse_split"),
        (sse_nosplit - sse_split).alias("sse_reduction"),
    )
    pick = Window.partitionBy("event_type").orderBy("sse_split", "split_i")
    return (
        scored.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (Chamandy et al. 2012, the
# production way to bootstrap a dataset you cannot hold): per-row
# replicate weights ~ Poisson(1) from a CONTENT-HASH uniform, so the
# resample is reproducible across engines, runs, and partitionings —
# rand() is none of those. Replicate means are exact-int ratios; the
# cross-replicate variance lands on a rounding grid.
# ---------------------------------------------------------------------------

_POIS_C = [math.exp(-1.0), 2.0 * math.exp(-1.0), 2.5 * math.exp(-1.0)]


@_q(
    "event_value_bootstrap_se",
    f"""
    WITH e AS (
        SELECT event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    rep AS (
        SELECT event_type, b, cents,
               (CAST(('0x' || substring(
                        md5(CAST(event_id AS VARCHAR) || ':'
                            || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                   / 4294967296.0 AS u
        FROM e, (SELECT unnest(range(0, 32)) AS b)
    ),
    w AS (
        SELECT event_type, b, cents,
               CASE WHEN u <= CAST('{_POIS_C[0]!r}' AS DOUBLE) THEN 0
                    WHEN u <= CAST('{_POIS_C[1]!r}' AS DOUBLE) THEN 1
                    WHEN u <= CAST('{_POIS_C[2]!r}' AS DOUBLE) THEN 2
                    ELSE 3 END AS wt
        FROM rep
    ),
    m AS (
        SELECT event_type, b,
               CAST(SUM(wt * cents) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE)
                   AS m
        FROM w GROUP BY event_type, b
    ),
    s1 AS (SELECT event_type, ROUND(SUM(m) / 32.0, 6) AS boot_mean
           FROM m GROUP BY event_type),
    s2 AS (SELECT m.event_type,
                  ROUND(SUM((m.m - s1.boot_mean) * (m.m - s1.boot_mean))
                        / 31.0, 6) AS v
           FROM m JOIN s1 ON m.event_type = s1.event_type
           GROUP BY m.event_type),
    base AS (SELECT event_type, COUNT(*) AS n_events,
                    CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                        AS mean_cents
             FROM e GROUP BY event_type)
    SELECT base.event_type, n_events, mean_cents, s1.boot_mean,
           SQRT(s2.v) AS boot_se,
           s1.boot_mean - 2.0 * SQRT(s2.v) AS ci_lo,
           s1.boot_mean + 2.0 * SQRT(s2.v) AS ci_hi
    FROM base
    JOIN s1 ON base.event_type = s1.event_type
    JOIN s2 ON base.event_type = s2.event_type
    """,
)
def event_value_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error of the per-type mean value over 32
    deterministic Poisson(1) resamples: the replicate weight is an
    inverse-CDF lookup on an md5-derived uniform (exact power-of-two
    division; threshold literals string-cast on the oracle side so
    they round-trip), replicate means are exact-int ratios, and the
    cross-replicate moments ROUND at 1e-6 — far above plain-SUM
    association noise across 32 doubles. One fan-out×32 with
    map-side partial aggregation (tasks emit 32·types partials, the
    shuffle never sees the fan-out), then O(types·32) finishing
    work. rand() cannot do any of this reproducibly across retries
    or engines."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    base_rows = ev.select(
        "event_id", "event_type", cents.alias("cents")
    )
    rep = base_rows.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        F.col("event_id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    wt = (
        F.when(u <= _POIS_C[0], 0)
        .when(u <= _POIS_C[1], 1)
        .when(u <= _POIS_C[2], 2)
        .otherwise(3)
    )
    m = (
        rep.withColumn("wt", wt)
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum(F.col("wt") * F.col("cents")).cast("double")
                / F.sum("wt").cast("double")
            ).alias("m")
        )
    )
    s1 = m.groupBy("event_type").agg(
        F.round(F.sum("m") / 32.0, 6).alias("boot_mean")
    )
    s2 = (
        m.join(s1, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(
                    (F.col("m") - F.col("boot_mean"))
                    * (F.col("m") - F.col("boot_mean"))
                )
                / 31.0,
                6,
            ).alias("v")
        )
    )
    base = base_rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("mean_cents"),
    )
    se = F.sqrt(F.col("v"))
    return (
        base.join(s1, "event_type")
        .join(s2, "event_type")
        .select(
            "event_type",
            "n_events",
            "mean_cents",
            "boot_mean",
            se.alias("boot_se"),
            (F.col("boot_mean") - 2.0 * se).alias("ci_lo"),
            (F.col("boot_mean") + 2.0 * se).alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining (PMI) + mutual-information feature ranking: the
# info-theoretic pair for tokenizer/vocab curation and feature
# selection. Everything reduces to exact integer counts; ln of an
# exact-int ratio is bit-equal across engines (the
# doc_unigram_logprob precedent), so scores need no tolerance.
# ---------------------------------------------------------------------------


@_q(
    "bigram_pmi_collocations",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    uni AS (
        SELECT unnest(w) AS tok FROM toks
    ),
    uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
    nt AS (SELECT COUNT(*) AS n FROM uni),
    bi AS (
        SELECT unnest(list_transform(w[1:len(w) - 1],
                                     (x, i) -> x || ' ' || w[i + 1]))
                   AS bigram
        FROM toks
    ),
    bc AS (SELECT bigram, COUNT(*) AS cb FROM bi GROUP BY bigram),
    nb AS (SELECT COUNT(*) AS m FROM bi),
    scored AS (
        SELECT b.bigram, b.cb,
               ln((CAST(b.cb AS DOUBLE) / CAST(nb.m AS DOUBLE))
                  / ((CAST(u1.c AS DOUBLE) / CAST(nt.n AS DOUBLE))
                     * (CAST(u2.c AS DOUBLE) / CAST(nt.n AS DOUBLE))))
                   AS pmi_raw
        FROM bc b
        JOIN uc u1 ON u1.tok = string_split(b.bigram, ' ')[1]
        JOIN uc u2 ON u2.tok = string_split(b.bigram, ' ')[2]
        CROSS JOIN nt CROSS JOIN nb
        WHERE b.cb >= 5
    )
    SELECT bigram, cb AS pair_count, ROUND(pmi_raw, 12) AS pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(pmi_raw, 12) DESC, bigram)
                AS INTEGER) AS rnk
    FROM scored
    QUALIFY rnk <= 25
    """,
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigram collocations by pointwise mutual information —
    the phrase-mining step a tokenizer/vocab pipeline runs before
    merging multiword units. Unigram and bigram counts come from one
    tokenize each (exact ints); PMI = ln of an exact-int ratio
    expression, ROUNDed at 1e-12 on both engines BEFORE ranking
    (measured: this ln composition drifts 1 ulp cross-engine where
    the bare-ln folds of doc_unigram_logprob don't), so the rank
    tie-break compares identical doubles. Two partial/final
    count aggregates + a broadcast-joined scoring projection;
    top-25 via TakeOrderedAndProject, never a global sort."""
    docs = read_table(spark, sf_dir, "documents")
    toks = dedup.tokens("text")
    uni = docs.select(F.explode(toks).alias("tok"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    nt = uni.agg(F.count(F.lit(1)).alias("n"))
    bi_arr = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    bi = docs.select(F.explode(bi_arr).alias("bigram"))
    bc = (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cb"))
        .where(F.col("cb") >= 5)
    )
    nb = bi.agg(F.count(F.lit(1)).alias("m"))
    first = F.split(F.col("bigram"), " ").getItem(0)
    second = F.split(F.col("bigram"), " ").getItem(1)
    u1 = uc.select(F.col("tok").alias("_t1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("tok").alias("_t2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("cb").cast("double") / F.col("m").cast("double"))
        / (
            (F.col("c1").cast("double") / F.col("n").cast("double"))
            * (F.col("c2").cast("double") / F.col("n").cast("double"))
        )
    )
    scored = (
        bc.join(u1, first == F.col("_t1"))
        .join(u2, second == F.col("_t2"))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select(
            "bigram",
            F.col("cb").alias("pair_count"),
            F.round(pmi, 12).alias("pmi"),
        )
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("pmi"), F.col("bigram")))
            .cast("int"),
        )
        .where(F.col("rnk") <= 25)
    )


@_q(
    "type_value_mutual_info",
    """
    WITH base AS (
        SELECT event_type,
               CASE WHEN value < 25 THEN 0
                    WHEN value < 50 THEN 1
                    WHEN value < 100 THEN 2
                    ELSE 3 END AS vb
        FROM events
    ),
    joint AS (SELECT event_type, vb, COUNT(*) AS cxy
              FROM base GROUP BY event_type, vb),
    mx AS (SELECT event_type, COUNT(*) AS cx FROM base GROUP BY event_type),
    my AS (SELECT vb, COUNT(*) AS cy FROM base GROUP BY vb),
    nt AS (SELECT COUNT(*) AS n FROM base),
    terms AS (
        SELECT j.event_type, j.vb, j.cxy,
               (CAST(j.cxy AS DOUBLE) / CAST(nt.n AS DOUBLE))
               * ln((CAST(j.cxy AS DOUBLE) * CAST(nt.n AS DOUBLE))
                    / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
                   AS term
        FROM joint j
        JOIN mx ON mx.event_type = j.event_type
        JOIN my ON my.vb = j.vb
        CROSS JOIN nt
    )
    SELECT event_type, vb, cxy, ROUND(term, 12) AS mi_term
    FROM terms
    """,
)
def type_value_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell mutual-information terms between event type and a
    fixed value bucketing — the feature-selection complement of
    `type_dow_chisquare`. Each term is (p_xy)·ln(c_xy·N/(c_x·c_y))
    over exact integer counts; the composed product rounds at 1e-12
    (the source_diversity_entropy lesson: composed ln TERMS can
    differ by 1 ulp even when bare ln doesn't). Emitting per-cell
    terms rather than the summed MI keeps the check
    order-insensitive and strictly finer-grained."""
    ev = read_table(spark, sf_dir, "events")
    vb = (
        F.when(F.col("value") < 25, 0)
        .when(F.col("value") < 50, 1)
        .when(F.col("value") < 100, 2)
        .otherwise(3)
    )
    base = ev.select("event_type", vb.alias("vb"))
    joint = base.groupBy("event_type", "vb").agg(
        F.count(F.lit(1)).alias("cxy")
    )
    mx = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("cx"))
    my = base.groupBy("vb").agg(F.count(F.lit(1)).alias("cy"))
    nt = base.agg(F.count(F.lit(1)).alias("n"))
    term = (F.col("cxy").cast("double") / F.col("n").cast("double")) * F.log(
        (F.col("cxy").cast("double") * F.col("n").cast("double"))
        / (F.col("cx").cast("double") * F.col("cy").cast("double"))
    )
    return (
        joint.join(mx, "event_type")
        .join(F.broadcast(my), "vb")
        .crossJoin(F.broadcast(nt))
        .select(
            "event_type",
            "vb",
            "cxy",
            F.round(term, 12).alias("mi_term"),
        )
    )


@_q(
    "pca_second_component",
    f"""
    WITH {_PCA_POWER_CTES},
    ray AS MATERIALIZED (SELECT ROUND(SUM(s.c * a.vv * b.vv), 9) AS lam
            FROM sym s JOIN v3 a ON a.pos = s.i JOIN v3 b ON b.pos = s.j),
    c2 AS MATERIALIZED (SELECT s.i, s.j,
                  ROUND(s.c - ray.lam * a.vv * b.vv, 12) AS c
           FROM sym s
           JOIN v3 a ON a.pos = s.i
           JOIN v3 b ON b.pos = s.j
           CROSS JOIN ray),
    u0 AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS pos,
                  1.0 / SQRT(64.0) AS vv),
    x1 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM c2 s JOIN u0 v ON v.pos = s.j GROUP BY s.i),
    m1 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM x1),
    u1 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM x1, m1),
    x2 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM c2 s JOIN u1 v ON v.pos = s.j GROUP BY s.i),
    m2 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM x2),
    u2 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM x2, m2),
    x3 AS MATERIALIZED (SELECT s.i AS pos, ROUND(SUM(s.c * v.vv), 9) AS w
           FROM c2 s JOIN u2 v ON v.pos = s.j GROUP BY s.i),
    m3 AS (SELECT ROUND(SQRT(SUM(w * w)), 9) AS nm FROM x3),
    u3 AS MATERIALIZED (SELECT pos, ROUND(w / nm, 9) AS vv FROM x3, m3),
    ray2 AS (SELECT ROUND(SUM(s.c * a.vv * b.vv), 9) AS eigenvalue2
             FROM c2 s JOIN u3 a ON a.pos = s.i JOIN u3 b ON b.pos = s.j),
    dt AS (SELECT ROUND(SUM(u3.vv * v3.vv), 9) AS v1_dot
           FROM u3 JOIN v3 ON u3.pos = v3.pos)
    SELECT u3.pos, u3.vv AS loading2, ray2.eigenvalue2, dt.v1_dot
    FROM u3, ray2, dt
    """,
)
def pca_second_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second principal component by Hotelling deflation
    (`pca.deflated_component`): C₂ = C − λ₁v₁v₁ᵀ with every deflated
    entry on the 1e-12 grid (the a·b−c shape may FMA-contract), then
    the same grid-rounded power recurrence. `v1_dot` emits the
    v₁·v₂ residual so the oracle checks near-orthogonality as a
    VALUE, not an assumption. All post-covariance work remains
    O(dim²) rows."""
    from ..operators import pca

    emb = read_table(spark, sf_dir, "embeddings")
    return pca.deflated_component(pca.covariance(emb, dim=64), dim=64)


# ---------------------------------------------------------------------------
# Neyman-optimal stratified allocation: the survey-methodology step a
# stratified eval/labeling budget should use instead of proportional
# allocation (variance-weighted: n_h ∝ N_h·S_h minimizes the
# estimator variance at fixed total n). Exact-int stratum moments,
# largest-remainder integerization — allocations sum EXACTLY to the
# budget.
# ---------------------------------------------------------------------------


@_q(
    "neyman_allocation",
    """
    WITH e AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    s AS (
        SELECT event_type, COUNT(*) AS n, SUM(cents) AS sx,
               SUM(CAST(cents * cents AS DECIMAL(38,0))) AS sx2
        FROM e GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n,
               SQRT((CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)) AS sd
        FROM s
    ),
    wgt AS (SELECT event_type, n, sd, CAST(n AS DOUBLE) * sd AS w FROM d),
    tot AS (SELECT SUM(w) AS tw FROM wgt),
    fr AS (SELECT event_type, n, sd, ROUND(w / tw, 9) AS frac
           FROM wgt, tot),
    fl AS (SELECT event_type, n, sd, frac,
                  CAST(FLOOR(200.0 * frac) AS BIGINT) AS base,
                  200.0 * frac - FLOOR(200.0 * frac) AS rem
           FROM fr),
    rk AS (SELECT *,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, event_type) AS r,
                  (SELECT 200 - SUM(base) FROM fl) AS short
           FROM fl)
    SELECT event_type, n AS n_rows, ROUND(sd, 9) AS sd,
           frac AS alloc_frac,
           CAST(base + CASE WHEN r <= short THEN 1 ELSE 0 END AS INTEGER)
               AS n_alloc
    FROM rk
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a 200-row eval budget across event-type
    strata: population SD per stratum from exact-int moments (one
    fixed double expression — bit-equal), weights N_h·S_h, fractions
    ROUNDed at 1e-9 BEFORE integerization so FLOOR can never
    straddle an ulp, then largest-remainder apportionment
    (deterministic tie → type name) so Σn_h = 200 exactly. One
    corpus-sized aggregate; everything after runs on O(strata)
    rows."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    e = ev.select("event_type", cents.alias("cents"))
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .alias("sx2"),
    )
    n_d = F.col("n").cast("double")
    sd = F.sqrt(
        (
            F.col("sx2").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double") / n_d
        )
        / n_d
    )
    d = s.select("event_type", "n", sd.alias("sd"))
    wgt = d.withColumn("w", F.col("n").cast("double") * F.col("sd"))
    tot = wgt.agg(F.sum("w").alias("tw"))
    fr = wgt.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "sd",
        F.round(F.col("w") / F.col("tw"), 9).alias("frac"),
    )
    fl = fr.select(
        "event_type",
        "n",
        "sd",
        "frac",
        F.floor(200.0 * F.col("frac")).cast("bigint").alias("base"),
        (200.0 * F.col("frac") - F.floor(200.0 * F.col("frac"))).alias(
            "rem"
        ),
    )
    short = fl.agg((200 - F.sum("base")).alias("short"))
    rk = fl.crossJoin(F.broadcast(short)).withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.col("event_type"))
        ),
    )
    return rk.select(
        "event_type",
        F.col("n").alias("n_rows"),
        F.round("sd", 9).alias("sd"),
        F.col("frac").alias("alloc_frac"),
        (
            F.col("base")
            + F.when(F.col("r") <= F.col("short"), 1).otherwise(0)
        )
        .cast("int")
        .alias("n_alloc"),
    )


# ---------------------------------------------------------------------------
# Fractional multi-touch attribution (linear + U-shaped): the credit
# models `purchase_attribution_counts` deliberately left as counts.
# Per-purchase credits are exact small-int divisions (identical
# doubles on both engines); only the corpus-wide channel SUM needs
# the 1e-9 grid.
# ---------------------------------------------------------------------------


@_q(
    "attribution_credit_models",
    """
    WITH purch AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT event_id AS t_id, user_id, ts AS t_ts, event_type
        FROM events WHERE event_type IN ('click', 'view')
    ),
    cand AS (
        SELECT p.p_id, t.event_type,
               lpad(CAST(epoch_us(t.t_ts) AS VARCHAR), 20, '0') || '-' ||
                   lpad(CAST(t.t_id AS VARCHAR), 12, '0') AS k
        FROM purch p JOIN touch t
          ON t.user_id = p.user_id
         AND t.t_ts < p.p_ts
         AND t.t_ts >= p.p_ts - INTERVAL 24 HOURS
    ),
    ranked AS (
        SELECT p_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY k) AS rnk,
               COUNT(*) OVER (PARTITION BY p_id) AS n
        FROM cand
    ),
    credit AS (
        SELECT event_type AS channel,
               1.0 / CAST(n AS DOUBLE) AS lin,
               CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN rnk = 1 OR rnk = n THEN 0.4
                    ELSE 0.2 / CAST(n - 2 AS DOUBLE) END AS u,
               CASE WHEN rnk = 1 THEN 1 ELSE 0 END AS is_first,
               CASE WHEN rnk = n THEN 1 ELSE 0 END AS is_last
        FROM ranked
    )
    SELECT channel,
           ROUND(SUM(lin), 9) AS linear_credit,
           ROUND(SUM(u), 9) AS u_shaped_credit,
           CAST(SUM(is_first) AS INTEGER) AS first_touches,
           CAST(SUM(is_last) AS INTEGER) AS last_touches
    FROM credit GROUP BY channel
    """,
)
def attribution_credit_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear and U-shaped (40/20/40) attribution credit per channel
    over the same 24h candidate join as the counts query. Per-touch
    credit is an exact small-int division — identical doubles on
    both engines; the channel totals ROUND at 1e-9 (plain-SUM
    association noise over thousands of identical addends is
    ~1e-13). Credits conserve mass: Σ over a purchase's touches is
    exactly 1 per model, so channel totals sum to the attributed
    purchase count (asserted in tests). One user-keyed shuffle, one
    per-purchase window, one domain-sized rollup."""
    ev = read_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    k = F.concat(
        F.lpad(
            F.unix_micros(F.col("t_ts").cast("timestamp")).cast("string"),
            20,
            "0",
        ),
        F.lit("-"),
        F.lpad(F.col("t_id").cast("string"), 12, "0"),
    )
    cand = (
        purch.join(touch, "user_id")
        .where(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
        )
        .select("p_id", "event_type", k.alias("_k"))
    )
    wp = Window.partitionBy("p_id")
    ranked = cand.select(
        "p_id",
        "event_type",
        F.row_number().over(wp.orderBy("_k")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    n_d = F.col("n").cast("double")
    lin = F.lit(1.0) / n_d
    u = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rnk") == 1) | (F.col("rnk") == F.col("n")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2).cast("double"))
    )
    credit = ranked.select(
        F.col("event_type").alias("channel"),
        lin.alias("lin"),
        u.alias("u"),
        F.when(F.col("rnk") == 1, 1).otherwise(0).alias("is_first"),
        F.when(F.col("rnk") == F.col("n"), 1).otherwise(0).alias("is_last"),
    )
    return credit.groupBy("channel").agg(
        F.round(F.sum("lin"), 9).alias("linear_credit"),
        F.round(F.sum("u"), 9).alias("u_shaped_credit"),
        F.sum("is_first").cast("int").alias("first_touches"),
        F.sum("is_last").cast("int").alias("last_touches"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (the multilingual-LM sampling rule
# — upweight small sources by p^τ, τ=1/2 here so the scaling is a
# bit-equal SQRT) + image near-dup CLUSTERS (the aHash pair graph
# closed under connected components — multimodal dedup end-to-end).
# ---------------------------------------------------------------------------


@_q(
    "source_temperature_mix",
    """
    WITH s AS (SELECT source, COUNT(*) AS n FROM documents
               GROUP BY source),
    nt AS (SELECT SUM(n) AS total FROM s),
    w AS (SELECT source, n,
                 SQRT(CAST(n AS DOUBLE) / CAST(nt.total AS DOUBLE)) AS wr,
                 CAST(n AS DOUBLE) / CAST(nt.total AS DOUBLE) AS nat
          FROM s, nt),
    tw AS (SELECT SUM(wr) AS sw FROM w)
    SELECT source, n AS n_docs,
           ROUND(nat, 9) AS natural_weight,
           ROUND(wr / tw.sw, 9) AS temp_weight,
           ROUND(wr / tw.sw, 9) > ROUND(nat, 9) AS upweighted
    FROM w, tw
    """,
)
def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source (τ=1/2 — the
    multilingual-LM rule that keeps small sources from vanishing):
    w_s ∝ (n_s/N)^τ, renormalized. SQRT of an exact-int ratio is
    bit-equal; only the O(sources) normalizing sum needs the 1e-9
    grid. `upweighted` pins the rule's point: below-average sources
    gain, dominant ones shed. One corpus aggregate; the rest is
    source-cardinality work."""
    docs = read_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    nt = s.agg(F.sum("n").alias("total"))
    nat = F.col("n").cast("double") / F.col("total").cast("double")
    w = s.crossJoin(F.broadcast(nt)).select(
        "source", "n", F.sqrt(nat).alias("wr"), nat.alias("nat")
    )
    tw = w.agg(F.sum("wr").alias("sw"))
    temp = F.round(F.col("wr") / F.col("sw"), 9)
    return w.crossJoin(F.broadcast(tw)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.round("nat", 9).alias("natural_weight"),
        temp.alias("temp_weight"),
        (temp > F.round(F.col("nat"), 9)).alias("upweighted"),
    )


@_q(
    "image_ahash_clusters",
    """
    SELECT doc_id AS media_id,
           doc_id % 5 AS component,
           doc_id < 5 AS is_rep
    FROM documents WHERE doc_id < 60
    """,
)
def image_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup CLUSTERS through the full real path: synthesize
    → decode → aHash (`multimodal.average_hash`) → hamming-0 pair
    edges → `graph.connected_components` → min-id representative.
    The oracle states the answer in closed form from the synthesis
    parameters (pattern group = doc_id%5; brightness shifts hash to
    identical codes), so any break in decode, hashing, pairing, or
    the CC iteration moves real emitted values. The multimodal twin
    of `near_dup_clusters`."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 5).cast("int").alias("g"),
        (F.col("doc_id") % 7).cast("int").alias("shift"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    int(m),
                    mm.synth_bmp_vstripes(
                        16, 16, (2 + int(g)) * 2, 40, 200, int(s)
                    ),
                )
                for m, g, s in zip(pdf["media_id"], pdf["g"], pdf["shift"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    bmp = base.mapInPandas(synth, "media_id long, payload binary")
    hashes = mm.average_hash(bmp).localCheckpoint(eager=True)
    a = hashes.select(
        F.col("media_id").alias("src"), F.col("ahash").alias("ha")
    )
    b = hashes.select(
        F.col("media_id").alias("dst"), F.col("ahash").alias("hb")
    )
    edges = (
        a.join(b, F.col("src") < F.col("dst"))
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) == 0
        )
        .select("src", "dst")
    )
    comp = graph.connected_components(edges, src="src", dst="dst")
    allv = hashes.select(F.col("media_id").alias("vertex"))
    full = allv.join(comp, "vertex", "left").select(
        "vertex",
        # a hash with no partner is its own singleton cluster
        F.coalesce("component", F.col("vertex")).alias("component"),
    )
    return full.select(
        F.col("vertex").alias("media_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("vertex") == F.col("component")).alias("is_rep"),
    )


# ---------------------------------------------------------------------------
# Markov absorption: P(purchase within k steps | current state) by
# unrolled first-step analysis over the user-event transition chain —
# the predictive extension of `event_transition_matrix` (which stops
# at one-step probabilities). Same grid discipline as PageRank: each
# round's values ROUND at 1e-12, so the recurrence is
# engine-identical.
# ---------------------------------------------------------------------------


@_q(
    "purchase_absorption_3step",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    t AS (SELECT from_type, SUM(n) AS row_total FROM c GROUP BY from_type),
    p AS (SELECT from_type, to_type,
                 CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS pr
          FROM c JOIN t USING (from_type)),
    q1 AS (SELECT from_type AS s,
                  ROUND(COALESCE(SUM(CASE WHEN to_type = 'purchase'
                                          THEN pr END), 0.0), 12) AS q
           FROM p GROUP BY from_type),
    q2 AS (SELECT p.from_type AS s,
                  ROUND(a.q + COALESCE(SUM(p.pr * b.q), 0.0), 12) AS q
           FROM p
           JOIN q1 a ON a.s = p.from_type
           LEFT JOIN q1 b ON b.s = p.to_type AND p.to_type <> 'purchase'
           GROUP BY p.from_type, a.q),
    q3 AS (SELECT p.from_type AS s,
                  ROUND(a.q + COALESCE(SUM(p.pr * b.q), 0.0), 12) AS q
           FROM p
           JOIN q1 a ON a.s = p.from_type
           LEFT JOIN q2 b ON b.s = p.to_type AND p.to_type <> 'purchase'
           GROUP BY p.from_type, a.q)
    SELECT q1.s AS state, q1.q AS p_1step, q2.q AS p_2step,
           q3.q AS p_3step
    FROM q1 JOIN q2 ON q2.s = q1.s JOIN q3 ON q3.s = q1.s
    """,
)
def purchase_absorption_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(reach 'purchase' within 1/2/3 transitions | current event
    type), by first-step analysis unrolled three rounds:
    q_{k+1}(s) = q₁(s) + Σ_{t≠purchase} P(s,t)·q_k(t). Transition
    probabilities are exact-int ratios; every round ROUNDs at 1e-12
    so both engines iterate identical doubles (the PageRank grid).
    All post-count work runs on the ≤25-cell transition matrix. The
    monotonicity q₁ ≤ q₂ ≤ q₃ is asserted in tests — absorption
    probabilities only grow with horizon."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    p = c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        (F.col("n").cast("double") / F.col("row_total").cast("double"))
        .alias("pr"),
    ).localCheckpoint(eager=True)

    q1 = p.groupBy(F.col("from_type").alias("s")).agg(
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("to_type") == "purchase", F.col("pr"))),
                F.lit(0.0),
            ),
            12,
        ).alias("q")
    ).localCheckpoint(eager=True)

    def step(prev):
        a = q1.select(F.col("s").alias("_sa"), F.col("q").alias("_qa"))
        b = prev.select(F.col("s").alias("_sb"), F.col("q").alias("_qb"))
        return (
            p.join(a, F.col("from_type") == F.col("_sa"))
            .join(
                b,
                (F.col("to_type") == F.col("_sb"))
                & (F.col("to_type") != "purchase"),
                "left",
            )
            .groupBy(F.col("from_type").alias("s"), F.col("_qa"))
            .agg(
                F.round(
                    F.col("_qa")
                    + F.coalesce(
                        F.sum(F.col("pr") * F.col("_qb")), F.lit(0.0)
                    ),
                    12,
                ).alias("q")
            )
            .select("s", "q")
            .localCheckpoint(eager=True)
        )

    q2 = step(q1)
    q3 = step(q2)
    return (
        q1.select(F.col("s").alias("state"), F.col("q").alias("p_1step"))
        .join(
            q2.select(F.col("s").alias("state"), F.col("q").alias("p_2step")),
            "state",
        )
        .join(
            q3.select(F.col("s").alias("state"), F.col("q").alias("p_3step")),
            "state",
        )
    )


# ---------------------------------------------------------------------------
# Weighted PageRank over the brand co-purchase graph: edge weights =
# co-basket counts (exact ints), contributions rank·w/strength. The
# importance ranking a merchandising/recsys surface wants from the
# co-occurrence graph `brand_copurchase_lift` builds.
# ---------------------------------------------------------------------------


@_q(
    "brand_copurchase_pagerank",
    """
    WITH inc AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
        SELECT a.item AS s, b.item AS t, COUNT(*) AS w
        FROM inc a JOIN inc b ON a.b = b.b AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    e0 AS (SELECT s, t, w FROM pairs
           UNION ALL SELECT t AS s, s AS t, w FROM pairs),
    e AS (SELECT s, t, SUM(w) AS w FROM e0 GROUP BY s, t),
    deg AS (SELECT s AS v, SUM(w) AS d FROM e GROUP BY s),
    nt AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT v, 1.0 / nt.n AS r FROM deg, nt),
    i1 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r0 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r1 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i1.sc, 0.0) AS r
           FROM deg LEFT JOIN i1 ON deg.v = i1.v, nt),
    i2 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r1 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r2 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i2.sc, 0.0) AS r
           FROM deg LEFT JOIN i2 ON deg.v = i2.v, nt),
    i3 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r2 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r3 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i3.sc, 0.0) AS r
           FROM deg LEFT JOIN i3 ON deg.v = i3.v, nt)
    SELECT v AS brand, ROUND(r, 12) AS pagerank FROM r3
    """,
)
def brand_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 rounds, damping 7/8) over brand
    co-purchase edges weighted by co-basket counts —
    `graph.pagerank(weight_col=...)`: per-round contribution is
    rank·w/out-strength with exact-integer weights/strengths, so the
    per-edge double matches cross-engine and the final ROUND(,12)
    absorbs plain-SUM noise exactly as in the unweighted query. The
    corpus-sized work is the co-occurrence pipeline; the iteration
    runs on the brand-cardinality graph."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    inc = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    pairs = relational.cooccurrence_pairs(
        inc, basket_col="basket", item_col="item"
    ).select("item_a", "item_b", "pair_baskets")
    pr = graph.pagerank(
        pairs,
        src="item_a",
        dst="item_b",
        weight_col="pair_baskets",
        n_iter=3,
        damping=0.875,
    )
    return pr.select(
        F.col("vertex").alias("brand"),
        F.round("pagerank", 12).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# Cluster labeling by c-TF-IDF (BERTopic's representation step): the
# top distinctive tokens of each embedding cluster — what makes a
# k-means cell INTERPRETABLE. Embeddings pair with documents by id;
# cluster assignment is the literal-centroid kmeans.assign.
# ---------------------------------------------------------------------------


@_q(
    "cluster_top_terms",
    rf"""
    WITH {_KMEANS_DIST_CTES},
    toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)),
                                                     '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    ),
    j AS (SELECT b.cluster_id, t.tok
          FROM toks t JOIN best b ON b.vec_id = t.doc_id),
    tf AS (SELECT cluster_id, tok, COUNT(*) AS tf
           FROM j GROUP BY cluster_id, tok),
    dfc AS (SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok),
    sc AS (SELECT tf.cluster_id, tf.tok, tf.tf, dfc.dfc,
                  ROUND(CAST(tf.tf AS DOUBLE)
                        * ln(9.0 / CAST(1 + dfc.dfc AS DOUBLE)), 12)
                      AS score
           FROM tf JOIN dfc USING (tok))
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id, tok AS token,
           tf, CAST(dfc AS INTEGER) AS df_clusters, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY score DESC, tok) AS INTEGER)
               AS rnk
    FROM sc QUALIFY rnk <= 5
    """,
)
def cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 c-TF-IDF tokens per embedding cluster: assignment via
    the literal k=8 centroids (`kmeans.assign`), token counts per
    cluster, cross-cluster df, score = tf·ln((k+1)/(1+df)) ROUNDed
    at 1e-12 BEFORE ranking (the PMI lesson — composed ln terms
    drift 1 ulp cross-engine). One tokenize + two count aggregates;
    the rank window partitions by cluster over vocabulary-bounded
    rows."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = kmeans.assign(emb, _KMEANS_CENTROIDS).select(
        F.col("vec_id"), F.col("cluster_id")
    )
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(dedup.tokens("text")).alias("tok")
    )
    j = toks.join(
        assigned, toks["doc_id"] == assigned["vec_id"]
    ).select("cluster_id", "tok")
    tf = j.groupBy("cluster_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.lit(9.0) / (F.lit(1) + F.col("dfc")).cast("double")),
        12,
    )
    sc = tf.join(F.broadcast(dfc), "tok").select(
        "cluster_id", "tok", "tf", "dfc", score.alias("score")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.col("tok")
    )
    return (
        sc.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 5)
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.col("tok").alias("token"),
            "tf",
            F.col("dfc").cast("int").alias("df_clusters"),
            "score",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score over the quality-score
# reliability bins: reliability (miscalibration) and resolution
# (discrimination) per bin plus the base-rate uncertainty — the
# numbers a calibration DIAGRAM summarizes, as one query. Builds on
# the same scored CTE as quality_calibration_bins.
# ---------------------------------------------------------------------------


@_q(
    "quality_brier_decomposition",
    """
    WITH {_Q},
    b AS (
        SELECT LEAST(CAST(floor(q * 10) AS BIGINT), 9) AS bin,
               COUNT(*) AS n,
               count_if(gopher_pass) AS pos,
               ROUND(SUM(q) / COUNT(*), 9) AS mean_pred
        FROM scored GROUP BY bin
    ),
    tot AS (SELECT SUM(n) AS nn, SUM(pos) AS pp FROM b),
    base AS (SELECT CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE) AS obar,
                    nn FROM tot)
    SELECT CAST(b.bin AS INTEGER) AS bin,
           CAST(b.n AS INTEGER) AS n_docs,
           CAST(b.pos AS INTEGER) AS n_pass,
           b.mean_pred,
           CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS obs_rate,
           ROUND(CAST(b.n AS DOUBLE)
                 * (b.mean_pred - CAST(b.pos AS DOUBLE)
                                  / CAST(b.n AS DOUBLE))
                 * (b.mean_pred - CAST(b.pos AS DOUBLE)
                                  / CAST(b.n AS DOUBLE))
                 / CAST(base.nn AS DOUBLE), 12) AS rel_term,
           ROUND(CAST(b.n AS DOUBLE)
                 * (CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE)
                    - base.obar)
                 * (CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE)
                    - base.obar)
                 / CAST(base.nn AS DOUBLE), 12) AS res_term,
           ROUND(base.obar * (1.0 - base.obar), 12) AS uncertainty
    FROM b CROSS JOIN base
    """.format(_Q=_QUALITY_SCORED_CTES),
)
def quality_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin Murphy decomposition terms of the quality-score vs
    Gopher-verdict Brier score: reliability n_b(p̄_b−o_b)²/N and
    resolution n_b(o_b−ō)²/N, with p̄_b the within-bin mean of the
    4-decimal scores (summed doubles → ROUND 1e-9; every other
    operand is an exact-int ratio, so the squared terms are built
    from identical doubles and the 1e-12 grid is belt-and-braces).
    Σrel − Σres + uncertainty reconstructs the binned Brier score —
    asserted in tests. Same single corpus scan as the calibration
    diagram; everything after runs on 10 bin rows."""
    docs = read_table(spark, sf_dir, "documents")
    w = dedup.tokens("text")
    n_words = F.size(w)
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    n_chars = F.length(F.array_join(w, ""))
    n_stop = F.array_contains(w, "the").cast("int") + F.array_contains(
        w, "a"
    ).cast("int")
    gopher = (
        n_words.between(30, 5000)
        & (n_chars / n_words).between(3.0, 5.0)
        & ((n_alpha / n_words.cast("double")) >= 0.9)
        & (n_stop >= 2)
    )
    q = F.round(textfn.quality_score(F.col("text")), 4)
    scored = docs.where(n_words > 0).select(
        gopher.alias("gopher_pass"), q.alias("q")
    )
    bcol = F.least(F.floor(F.col("q") * 10).cast("bigint"), F.lit(9))
    b = scored.groupBy(bcol.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gopher_pass").cast("int")).alias("pos"),
        F.round(F.sum("q") / F.count(F.lit(1)), 9).alias("mean_pred"),
    )
    tot = b.agg(F.sum("n").alias("nn"), F.sum("pos").alias("pp"))
    base = tot.select(
        (F.col("pp").cast("double") / F.col("nn").cast("double")).alias(
            "obar"
        ),
        "nn",
    )
    j = b.crossJoin(F.broadcast(base))
    n_d = F.col("n").cast("double")
    nn_d = F.col("nn").cast("double")
    obs = F.col("pos").cast("double") / n_d
    rel = F.round(
        n_d
        * (F.col("mean_pred") - obs)
        * (F.col("mean_pred") - obs)
        / nn_d,
        12,
    )
    res = F.round(
        n_d * (obs - F.col("obar")) * (obs - F.col("obar")) / nn_d, 12
    )
    return j.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("int").alias("n_docs"),
        F.col("pos").cast("int").alias("n_pass"),
        "mean_pred",
        obs.alias("obs_rate"),
        rel.alias("rel_term"),
        res.alias("res_term"),
        F.round(F.col("obar") * (F.lit(1.0) - F.col("obar")), 12).alias(
            "uncertainty"
        ),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend per daily series: the median of pairwise
# slopes — a 29% breakdown point where OLS (brand_price_regression's
# machinery) breaks at one outlier. Slopes are exact-int ratios
# (identical doubles), the median is an order statistic (even-count
# midpoint is ONE addition + halving — exact), so only the intercept
# residuals need a grid.
# ---------------------------------------------------------------------------


@_q(
    "daily_trend_theil_sen",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
        FROM daily
    ),
    slopes AS (
        SELECT a.event_type,
               (CAST(b.cents AS DOUBLE) - CAST(a.cents AS DOUBLE))
                   / CAST(b.i - a.i AS DOUBLE) AS m
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND a.i < b.i
    ),
    med AS (
        SELECT event_type, COUNT(*) AS n_pairs,
               median(m) AS slope
        FROM slopes GROUP BY event_type
    ),
    resid AS (
        SELECT s.event_type,
               ROUND(CAST(s.cents AS DOUBLE)
                     - med.slope * CAST(s.i AS DOUBLE), 9) AS r0
        FROM seq s JOIN med ON med.event_type = s.event_type
    )
    SELECT r.event_type, med.n_pairs, med.slope,
           median(r.r0) AS intercept
    FROM resid r JOIN med ON med.event_type = r.event_type
    GROUP BY r.event_type, med.n_pairs, med.slope
    """,
)
def daily_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of each event type's daily-total trend:
    slope = median over all C(n,2) pairwise slopes (exact-int
    ratios — identical doubles, and the even-count median midpoint
    is one addition + a power-of-two division, still exact);
    intercept = median residual with the y−m·x base ROUNDed at 1e-9
    (the subtract-of-product is the FMA-contractible shape). The
    pair join is per-series O(days²) — calendar-bounded, the
    documented sample-based switch applies beyond ~10⁴ points per
    series. One corpus-sized grain reduction; everything after is
    days²-per-series work."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    seq = daily.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    ).localCheckpoint(eager=True)
    a = seq.select(
        F.col("event_type"), F.col("cents").alias("ca"), F.col("i").alias("ia")
    )
    b = seq.select(
        F.col("event_type").alias("et2"),
        F.col("cents").alias("cb"),
        F.col("i").alias("ib"),
    )
    slopes = (
        a.join(b, (F.col("event_type") == F.col("et2")) & (F.col("ia") < F.col("ib")))
        .select(
            "event_type",
            (
                (F.col("cb").cast("double") - F.col("ca").cast("double"))
                / (F.col("ib") - F.col("ia")).cast("double")
            ).alias("m"),
        )
    )
    med = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("median(m)").alias("slope"),
    )
    resid = seq.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.round(
            F.col("cents").cast("double")
            - F.col("slope") * F.col("i").cast("double"),
            9,
        ).alias("r0"),
    )
    return (
        resid.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "n_pairs", "slope")
        .agg(F.expr("median(r0)").alias("intercept"))
        .select("event_type", "n_pairs", "slope", "intercept")
    )


# ---------------------------------------------------------------------------
# STL-lite decomposition: trend = centered 7-day moving average
# (complete windows only), seasonal = day-of-week mean of the
# detrended series, residual = remainder. The classical additive
# decomposition behind every seasonal-anomaly monitor
# (dow_adjusted_anomalies adjusts; this EXPLAINS the adjustment).
# ---------------------------------------------------------------------------


@_q(
    "daily_value_stl_lite",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tr AS (
        SELECT event_type, day, cents,
               CAST(SUM(cents) OVER w AS DOUBLE) / 7.0 AS trend,
               COUNT(*) OVER w AS wn,
               dayofweek(day) AS dow
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT event_type, day, cents, trend, dow,
               CAST(cents AS DOUBLE) - trend AS d
        FROM tr WHERE wn = 7
    ),
    seas AS (
        SELECT event_type, dow, ROUND(SUM(d) / COUNT(*), 9) AS seasonal
        FROM det GROUP BY event_type, dow
    )
    SELECT det.event_type, det.day, det.cents, det.trend,
           seas.seasonal,
           ROUND(det.d - seas.seasonal, 9) AS residual
    FROM det JOIN seas
      ON seas.event_type = det.event_type AND seas.dow = det.dow
    """,
)
def daily_value_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of per-type
    daily totals: the trend is an exact-int 7-day centered sum
    divided once (bit-equal; incomplete edge windows dropped via the
    window count), the day-of-week seasonal means ROUND at 1e-9
    (plain-SUM association over ~weeks of identical doubles), and
    the residual is one subtraction of identical values. Windows
    partition per series (calendar-bounded); the DOW means are a
    35-key aggregate."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cents",
        (F.sum("cents").over(w).cast("double") / 7.0).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
        F.dayofweek("day").alias("dow"),
    )
    det = tr.where(F.col("wn") == 7).select(
        "event_type",
        "day",
        "cents",
        "trend",
        "dow",
        (F.col("cents").cast("double") - F.col("trend")).alias("d"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.round(F.sum("d") / F.count(F.lit(1)), 9).alias("seasonal")
    )
    return det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "cents",
        "trend",
        "seasonal",
        F.round(F.col("d") - F.col("seasonal"), 9).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Video shot-boundary detection: per-frame perceptual hashes, cuts
# where consecutive frames' hamming jumps. Frames are synthesized
# BMPs whose stripe pattern SHIFTS at planted cut indices (and whose
# brightness drifts every frame — aHash must see through that), so
# the oracle knows every cut in closed form while the engine runs
# the real decode→hash→lag pipeline.
# ---------------------------------------------------------------------------


@_q(
    "video_scene_cuts",
    """
    WITH m AS (
        SELECT doc_id AS media_id, doc_id % 3 AS period
        FROM documents WHERE doc_id < 30
    ),
    f AS (
        SELECT media_id, period, unnest(range(0, 12)) AS frame_no
        FROM m
    )
    SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
           frame_no > 0
           AND (frame_no % (period + 3)) = 0 AS is_cut
    FROM f
    """,
)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot boundaries in 12-frame synthetic clips: frame pattern
    (stripe width) advances every ``period+3`` frames while
    brightness drifts EVERY frame (frame_no % 5) — a naive
    pixel-diff detector would fire on every frame; aHash's adaptive
    threshold ignores the drift, so hamming(prev, cur) > 0 exactly
    at pattern changes. Real path: per-frame BMP synth + decode +
    `multimodal.average_hash`, then one LAG window per clip. Frames
    never shuffle (hashing happens in the synth stage's mapInPandas);
    the cut test runs on 16-byte hash rows."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 3).cast("int").alias("period"),
    )
    frames = base.select(
        "media_id",
        "period",
        F.explode(F.sequence(F.lit(0), F.lit(11))).alias("frame_no"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, per, fno in zip(
                pdf["media_id"], pdf["period"], pdf["frame_no"]
            ):
                scene = int(fno) // (int(per) + 3)
                bright_cols = (2 + (scene % 5)) * 2
                shift = int(fno) % 5  # per-frame brightness drift
                rows.append(
                    (
                        int(mid),
                        int(fno),
                        mm.synth_bmp_vstripes(
                            16, 16, bright_cols, 40, 200, shift
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "payload"]
            )

    bmp = frames.mapInPandas(
        synth, "media_id long, frame_no int, payload binary"
    )
    # hash each frame; carry frame_no through by hashing on a
    # composite id then splitting it back out
    keyed = bmp.select(
        (F.col("media_id") * 100 + F.col("frame_no")).alias("media_id"),
        "payload",
    )
    hashes = mm.average_hash(keyed).select(
        (F.col("media_id") / 100).cast("long").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_no"),
        "ahash",
    )
    w = Window.partitionBy("media_id").orderBy("frame_no")
    prev = F.lag("ahash").over(w)
    return hashes.select(
        "media_id",
        "frame_no",
        F.coalesce(
            F.bit_count(F.col("ahash").bitwiseXOR(prev)) > 0, F.lit(False)
        ).alias("is_cut"),
    )


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest: every day's Holt one-step-ahead
# prediction scored against the NEXT observation, vs the naive
# persistence baseline — the skill score that decides whether a
# forecaster earns its complexity. Composes the oracle-checked Holt
# recurrence with a lag window; no refitting (the fold IS the
# rolling origin).
# ---------------------------------------------------------------------------


@_q(
    "holt_backtest_skill",
    f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, day, cents,
               cents * {_HW_SCALE} AS xfp,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY day) AS stp
        FROM daily
    ),
    hw AS (
        SELECT event_type, day, cents, xfp, stp,
               xfp AS lfp, CAST(0 AS BIGINT) AS tfp
        FROM seq WHERE stp = 1
        UNION ALL
        SELECT n.event_type, n.day, n.cents, n.xfp, n.stp,
               {_HW_LNEW} AS lfp,
               {_HW_TNEW} AS tfp
        FROM hw h JOIN seq n
          ON n.event_type = h.event_type AND n.stp = h.stp + 1
    ),
    lagged AS (
        SELECT event_type, stp, xfp,
               LAG(lfp + tfp) OVER w AS ffp_prev,
               LAG(xfp) OVER w AS xfp_prev
        FROM hw
        WINDOW w AS (PARTITION BY event_type ORDER BY stp)
    ),
    err AS (
        SELECT event_type,
               COUNT(*) AS n_evals,
               CAST(SUM(ABS(xfp - ffp_prev)) AS BIGINT) AS se_holt,
               CAST(SUM(ABS(xfp - xfp_prev)) AS BIGINT) AS se_naive
        FROM lagged WHERE ffp_prev IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, CAST(n_evals AS INTEGER) AS n_evals,
           ROUND(CAST(se_holt AS DOUBLE)
                 / CAST(n_evals * {_HW_SCALE} AS DOUBLE), 9) AS mae_holt,
           ROUND(CAST(se_naive AS DOUBLE)
                 / CAST(n_evals * {_HW_SCALE} AS DOUBLE), 9) AS mae_naive,
           CASE WHEN se_naive > 0
                THEN ROUND(1.0 - CAST(se_holt AS DOUBLE)
                                 / CAST(se_naive AS DOUBLE), 12)
                ELSE CAST(0.0 AS DOUBLE) END AS skill
    FROM err
    """,
)
def holt_backtest_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series backtest of the Holt forecaster: MAE of the
    one-step-ahead prediction (previous row's level+trend) and of
    naive persistence, plus the skill score 1 − MAE_holt/MAE_naive.
    The fold IS the rolling origin — each prediction uses only the
    prefix, no refit loop. Runs on the exact fixed-point recurrence
    (see daily_value_holt_winters): absolute errors are BIGINT
    subtractions, their sums are exact, the MAEs are single divides
    of identical integers on the 1e-9 grid, and the skill is
    1 − se_holt/se_naive (the n·S denominators cancel EXACTLY in the
    integer domain) on the 1e-12 grid. One grain reduction + one fold
    + one lag window per series."""
    from ..operators.sequential import holt_winters_fixed_point_per_key

    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").cast("bigint").alias("cents"))
    )
    hw = holt_winters_fixed_point_per_key(
        daily, "event_type", ("day",), "cents", alpha=(1, 4), beta=(1, 8)
    )
    xfp = F.col("cents") * F.lit(_HW_SCALE)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = hw.select(
        "event_type",
        xfp.alias("xfp"),
        F.lag(F.col("level_fp") + F.col("trend_fp")).over(w).alias("ffp_prev"),
        F.lag(xfp).over(w).alias("xfp_prev"),
    ).where(F.col("ffp_prev").isNotNull())
    err = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_evals"),
        F.sum(F.abs(F.col("xfp") - F.col("ffp_prev")))
        .cast("bigint")
        .alias("se_holt"),
        F.sum(F.abs(F.col("xfp") - F.col("xfp_prev")))
        .cast("bigint")
        .alias("se_naive"),
    )
    den = (F.col("n_evals") * F.lit(_HW_SCALE)).cast("double")
    skill = F.when(
        F.col("se_naive") > 0,
        F.round(
            F.lit(1.0)
            - F.col("se_holt").cast("double")
            / F.col("se_naive").cast("double"),
            12,
        ),
    ).otherwise(F.lit(0.0))
    return err.select(
        "event_type",
        F.col("n_evals").cast("int").alias("n_evals"),
        F.round(F.col("se_holt").cast("double") / den, 9).alias("mae_holt"),
        F.round(F.col("se_naive").cast("double") / den, 9).alias("mae_naive"),
        skill.alias("skill"),
    )


# ---------------------------------------------------------------------------
# Audio activity segmentation (VAD-style): per-frame RMS gate over
# REAL WAV decode, then native gaps-and-islands stitching. Clips are
# synthesized tone/silence/tone with frame-aligned boundaries, so the
# oracle states every segment in closed form.
# ---------------------------------------------------------------------------


@_q(
    "audio_activity_segments",
    """
    WITH m AS (
        SELECT doc_id AS media_id,
               3 + doc_id % 3 AS a, 2 + doc_id % 2 AS b
        FROM documents WHERE doc_id < 40
    )
    SELECT media_id, CAST(0 AS INTEGER) AS seg_start,
           CAST(a - 1 AS INTEGER) AS seg_end,
           CAST(a AS INTEGER) AS n_frames
    FROM m
    UNION ALL
    SELECT media_id, CAST(a + b AS INTEGER),
           CAST(a + b + 3 AS INTEGER), CAST(4 AS INTEGER)
    FROM m
    """,
)
def audio_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-audio segments per clip: tone(3..5 frames) → silence
    (2..3) → tone(4), synthesized with frame-aligned boundaries,
    pushed through the REAL decode + per-frame RMS gate
    (`multimodal.wav_frame_activity`) and stitched by the classic
    gaps-and-islands window (frame_no − row_number over active
    frames). The oracle knows both segments of every clip in closed
    form — a decode, framing, thresholding, or stitching bug moves
    emitted boundaries. Payloads stay inside one mapInPandas; the
    island window partitions per clip."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("media_id"),
        (3 + F.col("doc_id") % 3).cast("int").alias("a"),
        (2 + F.col("doc_id") % 2).cast("int").alias("b"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    int(mid),
                    mm.synth_wav_segments(
                        [
                            (500 + (int(mid) % 5) * 100, int(a)),
                            (None, int(b)),
                            (600, 4),
                        ]
                    ),
                )
                for mid, a, b in zip(pdf["media_id"], pdf["a"], pdf["b"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    wav = base.mapInPandas(synth, "media_id long, payload binary")
    act = mm.wav_frame_activity(wav).where(F.col("active"))
    w = Window.partitionBy("media_id").orderBy("frame_no")
    islands = act.select(
        "media_id",
        "frame_no",
        (F.col("frame_no") - F.row_number().over(w)).alias("island"),
    )
    return islands.groupBy("media_id", "island").agg(
        F.min("frame_no").cast("int").alias("seg_start"),
        F.max("frame_no").cast("int").alias("seg_end"),
        F.count(F.lit(1)).cast("int").alias("n_frames"),
    ).drop("island")


# ---------------------------------------------------------------------------
# Mann-Kendall trend test per daily series: the nonparametric
# significance companion to `daily_trend_theil_sen` (same pair join,
# same grain). S is an exact integer (sum of pairwise signs), the
# tie-corrected variance is an exact integer ratio (numerator < 2^53
# for calendar-bounded series), and z composes identical doubles —
# ROUND(,12) as belt against future FMA contraction.
# ---------------------------------------------------------------------------


@_q(
    "daily_mann_kendall",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
        FROM daily
    ),
    s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat,
               COUNT(*) AS n_pairs
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND a.i < b.i
        GROUP BY a.event_type
    ),
    nd AS (
        SELECT event_type, COUNT(*) AS n_days FROM seq GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
        FROM (
            SELECT event_type, COUNT(*) AS t
            FROM seq GROUP BY event_type, cents
        ) GROUP BY event_type
    ),
    stat AS (
        SELECT s.event_type, nd.n_days, s.s_stat,
               (CAST(nd.n_days AS DOUBLE) * (nd.n_days - 1)
                * (2 * nd.n_days + 5)
                - CAST(ties.tie_term AS DOUBLE)) / 18.0 AS var_s
        FROM s
        JOIN nd ON nd.event_type = s.event_type
        JOIN ties ON ties.event_type = s.event_type
    )
    SELECT event_type, n_days, s_stat, var_s,
           ROUND(CASE WHEN s_stat > 0
                      THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_s)
                      WHEN s_stat < 0
                      THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_s)
                      ELSE 0.0 END, 12) AS z_stat
    FROM stat
    """,
)
def daily_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on each event type's daily
    totals: S = Σ_{i<j} sign(c_j − c_i) (exact integer), variance
    with the standard tie correction (exact integers through the
    closed form; /18.0 on identical numerators is bit-identical),
    continuity-corrected z. Pair join is per-series O(days²) —
    calendar-bounded like Theil-Sen; at 100 TB the grain reduction
    to (event_type, day) happens first, so the quadratic stage sees
    thousands of rows, not billions."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    seq = daily.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    ).localCheckpoint(eager=True)
    b = seq.select(
        F.col("event_type").alias("et2"),
        F.col("cents").alias("cb"),
        F.col("i").alias("ib"),
    )
    s = (
        seq.join(b, (F.col("event_type") == F.col("et2")) & (F.col("i") < F.col("ib")))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum((F.col("cb") - F.col("cents")).cast("double")).cast("bigint"))
            .alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .drop("n_pairs")
    )
    nd = seq.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        seq.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n_d = F.col("n_days").cast("double")
    var_s = (
        n_d * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    s_d = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (s_d - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s_stat") < 0, (s_d + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(nd, "event_type")
        .join(ties, "event_type")
        .withColumn("var_s", var_s)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var_s",
            F.round(z, 12).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between two daily measures. Average ranks
# are kept EXACT by doubling (2·avgrank = 2·RANK + ties − 1, always
# an integer); all five moments are then exact int64 sums and the
# closed form composes identical doubles (ROUND 12 vs FMA).
# ---------------------------------------------------------------------------


@_q(
    "daily_spearman_corr",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    ranked AS (
        SELECT event_type,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY cents)
                 + COUNT(*) OVER (PARTITION BY event_type, cents) - 1
                   AS rx,
               2 * RANK() OVER (PARTITION BY event_type ORDER BY n_events)
                 + COUNT(*) OVER (PARTITION BY event_type, n_events) - 1
                   AS ry
        FROM daily
    ),
    mom AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * ry) AS sxy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 12) AS rho
    FROM mom
    """,
)
def daily_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between each event type's daily total value and its
    daily event count. Tie handling uses exact average ranks via the
    doubled-rank trick (2·avgrank = 2·RANK() + tie_count − 1 — an
    integer, so Σr, Σr², Σrxry are exact int64 sums and both engines
    build the SAME rationals); ρ is then the Pearson closed form on
    identical doubles, ROUNDed at 1e-12 before emit. Window is
    per-event_type (bounded partitions); the moments agg is one
    map-side-combinable pass."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"), F.count(F.lit(1)).alias("n_events"))
    )

    def _r2(col: str):
        wr = Window.partitionBy("event_type").orderBy(col)
        wt = Window.partitionBy("event_type", col)
        return 2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1

    ranked = daily.select(
        "event_type", _r2("cents").alias("rx"), _r2("n_events").alias("ry")
    )
    mom = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    rho = (n_d * F.col("sxy") - sx_d * F.col("sy")) / (
        F.sqrt(n_d * F.col("sxx") - sx_d * F.col("sx"))
        * F.sqrt(n_d * F.col("syy") - sy_d * F.col("sy"))
    )
    return mom.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(rho, 12).alias("rho"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals: the distribution-free
# uncertainty wrapper every model-quality monitor wants. Calibration
# is a content-hash split (never random()); the quantile is a RANKED
# order statistic (ceil((n+1)(1−α)) — no interpolation, so the
# selected score is one identical double), and coverage compares
# identical doubles on the held-out half.
# ---------------------------------------------------------------------------


@_q(
    "value_conformal_intervals",
    """
    WITH scored AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'calib' ELSE 'test' END AS half
        FROM events
    ),
    model AS (
        SELECT event_type,
               CAST(SUM(cents) AS BIGINT) AS s_cents,
               COUNT(*) AS n_calib
        FROM scored WHERE half = 'calib' GROUP BY event_type
    ),
    resid AS (
        SELECT s.event_type, m.n_calib,
               abs(s.cents * m.n_calib - m.s_cents) AS r_int,
               ROW_NUMBER() OVER (
                   PARTITION BY s.event_type
                   ORDER BY abs(s.cents * m.n_calib - m.s_cents), s.cents
               ) AS rk
        FROM scored s JOIN model m ON m.event_type = s.event_type
        WHERE s.half = 'calib'
    ),
    qhat AS (
        SELECT event_type, n_calib, r_int AS q_int
        FROM resid
        WHERE rk = (9 * (n_calib + 1) + 9) // 10
    ),
    cover AS (
        SELECT s.event_type,
               COUNT(*) AS n_test,
               CAST(SUM(CASE WHEN abs(s.cents * m.n_calib - m.s_cents)
                                  <= q.q_int
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM scored s
        JOIN model m ON m.event_type = s.event_type
        JOIN qhat q ON q.event_type = s.event_type
        WHERE s.half = 'test'
        GROUP BY s.event_type
    )
    SELECT c.event_type, q.n_calib, c.n_test,
           ROUND(CAST(q.q_int AS DOUBLE) / CAST(q.n_calib AS DOUBLE), 6)
               AS qhat,
           c.covered,
           ROUND(CAST(c.covered AS DOUBLE) / CAST(c.n_test AS DOUBLE), 12)
               AS coverage
    FROM cover c JOIN qhat q ON q.event_type = c.event_type
    """,
)
def value_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% intervals around a per-type mean model:
    md5(event_id) splits 8/16 calib, 8/16 test (deterministic,
    machine-independent); q̂ = the ⌈0.9(n+1)⌉-th smallest absolute
    calibration residual. The r4 hash-fail taught the lesson: the
    WHOLE decision path is now exact integers — residuals are scaled
    by n_calib (|cents·n − Σcents| ≡ n·|cents − mean|, same order,
    same coverage verdicts, zero floats), the rank is the integer
    ceil ⌈9(n+1)/10⌉ = (9(n+1)+9) DIV 10 (a double 0.9·(n+1) parses
    as DECIMAL in DuckDB but DOUBLE in Spark — a latent tie-break
    hazard), and the only doubles are two terminal single divides of
    bit-identical BIGINTs, ROUNDed onto 1e-6/1e-12 grids. Scale
    shape: one scan to split+score, per-type broadcast of the
    1-row-per-type model and q̂ — no data-sized shuffle beyond the
    calib rank (bounded per-type partitions; at 100 TB the rank
    would switch to the hierarchical-prefix order statistic like
    order_value_percentiles)."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    nib = F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 1)
    scored = ev.select(
        "event_type",
        cents.alias("cents"),
        F.when(nib.isin(*"01234567"), F.lit("calib"))
        .otherwise(F.lit("test"))
        .alias("half"),
    ).localCheckpoint(eager=True)
    calib = scored.where(F.col("half") == "calib")
    model = calib.groupBy("event_type").agg(
        F.sum("cents").cast("bigint").alias("s_cents"),
        F.count(F.lit(1)).alias("n_calib"),
    )
    r_int = F.abs(F.col("cents") * F.col("n_calib") - F.col("s_cents"))
    resid = calib.join(F.broadcast(model), "event_type").select(
        "event_type",
        "n_calib",
        r_int.alias("r_int"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(r_int, "cents"))
        .alias("rk"),
    )
    qhat = resid.where(
        F.col("rk") == F.expr("(9 * (n_calib + 1) + 9) DIV 10")
    ).select("event_type", "n_calib", F.col("r_int").alias("q_int"))
    test = scored.where(F.col("half") == "test")
    cover = (
        test.join(F.broadcast(model), "event_type")
        .join(F.broadcast(qhat.select("event_type", "q_int")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") * F.col("n_calib") - F.col("s_cents"))
                    <= F.col("q_int"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return cover.join(F.broadcast(qhat), "event_type").select(
        "event_type",
        "n_calib",
        "n_test",
        F.round(
            F.col("q_int").cast("double") / F.col("n_calib").cast("double"), 6
        ).alias("qhat"),
        "covered",
        F.round(
            F.col("covered").cast("double") / F.col("n_test").cast("double"),
            12,
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Portable Bloom-filter membership screen (operators/sketch.py):
# deterministic md5 bit positions make the filter — and every
# membership verdict — engine-reproducible, so the oracle checks the
# zero-false-negative theorem AND the exact packed-bit population,
# not just bounds. The set-bits count pins the 32-bit word packing:
# any packing bug changes n_set_bits or flips a verdict.
# ---------------------------------------------------------------------------


@_q(
    "bloom_customer_screen",
    """
    WITH members AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0
    ),
    hashes AS (SELECT unnest([0, 1]) AS i),
    mpos AS (
        SELECT DISTINCT
               CAST(('0x' || substring(md5(CAST(m.c_custkey AS VARCHAR)
                                           || '#' || CAST(h.i AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 4096 AS pos
        FROM members m CROSS JOIN hashes h
    ),
    ppos AS (
        SELECT c.c_custkey, (c.c_custkey % 7 = 0) AS is_member,
               CAST(('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)
                                           || '#' || CAST(h.i AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 4096 AS pos
        FROM customer c CROSS JOIN hashes h
    ),
    verdict AS (
        SELECT p.c_custkey, p.is_member,
               COUNT(DISTINCT p.pos) AS npos,
               COUNT(DISTINCT CASE WHEN m.pos IS NOT NULL
                                   THEN p.pos END) AS nhit
        FROM ppos p LEFT JOIN mpos m ON m.pos = p.pos
        GROUP BY p.c_custkey, p.is_member
    ),
    summary AS (
        SELECT COUNT(*) AS n_probes,
               CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_members,
               CAST(SUM(CASE WHEN is_member AND nhit = npos
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_member_pass,
               CAST(SUM(CASE WHEN NOT is_member AND nhit = npos
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonmember_pass
        FROM verdict
    )
    SELECT n_members, n_probes, n_member_pass,
           n_member_pass = n_members AS all_members_pass,
           n_nonmember_pass,
           (SELECT COUNT(*) FROM mpos) AS n_set_bits,
           CAST(n_nonmember_pass AS DOUBLE) / (n_probes - n_members)
               AS fpr_measured
    FROM summary
    """,
)
def bloom_customer_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter (m=4096 bits, k=2) over a deterministic
    member subset (c_custkey % 7 = 0), probed with every customer
    key. Emits the zero-false-negative theorem (all members pass),
    the EXACT false-positive count (deterministic because the bit
    positions are md5-derived — engine-independent), the packed-word
    population count (F.bit_count over the 32-bit words == the
    oracle's distinct-position count), and the measured FPR. Build is
    one mergeable bit_or aggregate (≤128 word rows); probing is a
    broadcast of the word map + a zero-shuffle scan — at 100 TB the
    filter rides the closure to every executor like a semi-join
    Bloom, with no JVM-private bit layout (sketch.py provenance:
    reference has no sketch surface; cites Bloom 1970 semantics)."""
    from ..operators import sketch

    m_bits, k = 4096, 2
    cust = read_table(spark, sf_dir, "customer")
    members = cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey")
    words = sketch.bloom_words(members, "c_custkey", m_bits, k)
    wm = sketch.bloom_words_map(words)
    set_bits = words.agg(
        F.sum(F.bit_count("word")).alias("n_set_bits")
    )
    probed = (
        cust.select(
            "c_custkey", (F.col("c_custkey") % 7 == 0).alias("is_member")
        )
        .crossJoin(F.broadcast(wm))
        .select(
            "is_member",
            sketch.bloom_contains(
                F.col("c_custkey"), m_bits, k, F.col("m")
            ).alias("hit"),
        )
    )
    summary = probed.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(
            F.when(F.col("is_member") & F.col("hit"), 1).otherwise(0)
        ).alias("n_member_pass"),
        F.sum(
            F.when(~F.col("is_member") & F.col("hit"), 1).otherwise(0)
        ).alias("n_nonmember_pass"),
    )
    return summary.crossJoin(F.broadcast(set_bits)).select(
        "n_members",
        "n_probes",
        "n_member_pass",
        (F.col("n_member_pass") == F.col("n_members")).alias(
            "all_members_pass"
        ),
        "n_nonmember_pass",
        "n_set_bits",
        (
            F.col("n_nonmember_pass").cast("double")
            / (F.col("n_probes") - F.col("n_members"))
        ).alias("fpr_measured"),
    )


# ---------------------------------------------------------------------------
# Bigram LM scoring with add-1 smoothing — the conditional-probability
# step up from doc_unigram_logprob (same ordered-fold discipline:
# every ln argument is an exact integer ratio, the per-doc sum folds
# the doc's own bigram sequence in order on BOTH engines).
# ---------------------------------------------------------------------------


def bigram_lm_logprob_plan(
    docs: DataFrame, mode: str = "join"
) -> DataFrame:
    """Corpus-trained add-1-smoothed bigram LM, scored per doc:
    mean ln p(w_i | w_{i-1}), p = (c(a,b)+1)/(c₁(a)+V).

    Two physical strategies over the same logical result:

    * ``mode="join"`` (DEFAULT, the 100 TB path): bigrams keep their
      in-doc position through a posexplode, the (bigram → count) and
      (history → count) tables attach by JOIN (size-driven — AQE
      broadcasts them while they fit, shuffles when the vocabulary
      is open), and the per-doc ordered sum is rebuilt with a
      position-sorted collect_list fold (per-doc bounded state).
      Nothing corpus-vocabulary-sized ever passes through a single
      partition or the driver.
    * ``mode="broadcast"``: the r4 shape — both count tables fold
      into ONE map row (Exchange SinglePartition) and broadcast; the
      per-doc score is a map-lookup array fold with zero joins.
      Cheapest when the vocabulary is known-small (closed tag sets);
      a scale-killer on open text (VERDICT r4 #2) — never the
      default.

    Both modes produce bit-identical doubles: every ln argument is
    an exact integer ratio and the per-doc sum folds the doc's own
    bigrams in position order."""
    t_all = docs.select("doc_id", dedup.tokens("text").alias("w"))
    t = t_all.where(F.size("w") > 1)
    # zip_with over two shifted slices, NOT transform((x, i) -> ...
    # w[i+1]): a lambda that captures the outer array forces explode
    # off the codegen path (measured 6x slower at sf0.1).
    bigrams = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    tb = t.select("doc_id", bigrams.alias("bgs"))
    big = tb.select(
        "doc_id", F.posexplode("bgs").alias("pos", "bg")
    )
    bc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    hc = (
        big.select(F.substring_index("bg", " ", 1).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("hcnt"))
    )
    # Vocabulary over ALL docs (including single-token docs that
    # yield no bigram) — the add-1 denominator must agree with the
    # oracle's vocab CTE, which counts distinct terms over the
    # unfiltered corpus (ADVICE r5: the old post-filter vocab
    # diverged on corpora with a term unique to a 1-token doc).
    vocab = t_all.select(F.explode("w").alias("term")).agg(
        F.countDistinct("term").alias("v")
    )
    if mode == "join":
        lp_rows = (
            big.join(bc, "bg")
            .join(hc, F.substring_index(F.col("bg"), " ", 1) == F.col("h"))
            .crossJoin(F.broadcast(vocab))
            .select(
                "doc_id",
                "pos",
                F.log(
                    (F.col("cnt") + 1) / (F.col("hcnt") + F.col("v"))
                ).alias("lnp"),
            )
        )
        per_doc = lp_rows.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("_n"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                    lambda s: s["lnp"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("_ll"),
        )
        return per_doc.select(
            "doc_id",
            F.col("_n").cast("int").alias("n_bigrams"),
            F.round(F.col("_ll") / F.col("_n"), 4).alias("ll_per_bigram"),
        )
    if mode != "broadcast":
        raise ValueError(f"unknown bigram LM mode: {mode!r}")
    stats = (
        bc.agg(
            F.map_from_entries(
                F.collect_list(F.struct("bg", "cnt"))
            ).alias("bm")
        )
        .crossJoin(
            hc.agg(
                F.map_from_entries(
                    F.collect_list(F.struct("h", "hcnt"))
                ).alias("hm")
            )
        )
        .crossJoin(vocab)
    )
    lp = F.aggregate(
        F.col("bgs"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.log(
            (F.element_at(F.col("bm"), x) + 1)
            / (
                F.element_at(F.col("hm"), F.substring_index(x, " ", 1))
                + F.col("v")
            )
        ),
    )
    return tb.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.size("bgs").cast("int").alias("n_bigrams"),
        F.round(lp / F.size("bgs"), 4).alias("ll_per_bigram"),
    )


@_q(
    "doc_bigram_lm_logprob",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(w[1:len(w) - 1],
                      (x, i) -> x || ' ' || w[i + 1])) AS bg,
               unnest(range(1, len(w))) AS pos
        FROM t WHERE len(w) > 1
    ),
    bc AS (SELECT bg, COUNT(*) AS cnt FROM big GROUP BY bg),
    hc AS (
        SELECT split_part(bg, ' ', 1) AS h, COUNT(*) AS cnt
        FROM big GROUP BY split_part(bg, ' ', 1)
    ),
    vocab AS (
        SELECT COUNT(DISTINCT term) AS v
        FROM (SELECT unnest(w) AS term FROM t)
    ),
    lp AS (
        SELECT big.doc_id, big.pos,
               ln((bc.cnt + 1) / (hc.cnt + vocab.v)) AS lnp
        FROM big
        JOIN bc ON bc.bg = big.bg
        JOIN hc ON hc.h = split_part(big.bg, ' ', 1), vocab
    )
    SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
           ROUND(list_reduce(list(lnp ORDER BY pos), (a, b) -> a + b)
                 / COUNT(*), 4) AS ll_per_bigram
    FROM lp GROUP BY doc_id
    """,
)
def doc_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM per-doc scoring on the JOIN (open-vocabulary) path —
    see :func:`bigram_lm_logprob_plan`. The r4 broadcast-map shape
    (unbounded collect_list → SinglePartition map → broadcast; the
    round's one flagged scale-killer) survives only as the opt-in
    ``mode="broadcast"`` for closed vocabularies, differentially
    tested against this default."""
    docs = read_table(spark, sf_dir, "documents")
    return bigram_lm_logprob_plan(docs, mode="join")


# ---------------------------------------------------------------------------
# Mutual-kNN graph: the symmetric-neighbor filter curation pipelines
# put in front of graph clustering (a near-dup edge both endpoints
# agree on is far more precise than a one-directional hit). Ranking
# follows the knn_cosine discipline exactly — raw fold-ordered
# cosine, vec_id tie-break — so top-k membership is engine-identical.
# ---------------------------------------------------------------------------


@_q(
    "mutual_knn_pairs",
    """
    WITH sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % 4 = 0
    ),
    scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               list_cosine_similarity(a.e, b.e) AS cos
        FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    topk AS (
        SELECT qid, nid, cos
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY cos DESC, nid) AS rn
            FROM scored
        ) WHERE rn <= 5
    )
    SELECT t1.qid AS lo_id, t1.nid AS hi_id,
           ROUND(t1.cos, 4) AS cosine_sim
    FROM topk t1 JOIN topk t2
      ON t1.qid = t2.nid AND t1.nid = t2.qid
    WHERE t1.qid < t1.nid
    """,
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN pairs (k=5) over a deterministic quarter of the
    embedding table: an edge survives only if each endpoint ranks
    the other in its own top-5 by exact cosine. The per-side top-k
    reuses knn_cosine_bruteforce (queries broadcast, one corpus
    scan, windowed rank per query); mutuality is one self-join on
    the reversed pair. At 100 TB the all-pairs scoring stage swaps
    for cosine_pairs_grid (block GEMM) or the IVF path with the
    same downstream rank+join — the mutual filter itself is
    partitioning-independent."""
    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 4 == 0
    )
    topk = similarity.knn_cosine_bruteforce(
        emb,
        emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        exclude_self=True,
    )
    t1 = topk.select(
        F.col("query_id").alias("qid"),
        F.col("vec_id").alias("nid"),
        "cosine_sim",
    )
    t2 = t1.select(
        F.col("qid").alias("r_nid"), F.col("nid").alias("r_qid")
    )
    return (
        t1.join(
            t2,
            (F.col("qid") == F.col("r_qid")) & (F.col("nid") == F.col("r_nid")),
        )
        .where(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("lo_id"),
            F.col("nid").alias("hi_id"),
            "cosine_sim",
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition (graph.kcore): iterative degree peel to a
# fixpoint. Spark peels with a driver-side convergence probe; the
# oracle unrolls 6 peel rounds (≥ the measured 4-round worst case at
# any tested SF, and post-fixpoint rounds are no-ops, so unroll ≥
# actual ⇒ identical). Every CTE is MATERIALIZED — DuckDB inlines
# CTEs and this chain references each round twice (the PCA lesson:
# un-materialized it re-expands the co-purchase self-join 2^6×).
# ---------------------------------------------------------------------------

_KCORE_K = 65
_KCORE_ORACLE_ROUNDS = 6


def _kcore_oracle() -> str:
    parts = [
        """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
    ),
    e_0 AS MATERIALIZED (
        SELECT s, d FROM e0 UNION SELECT d, s FROM e0
    )"""
    ]
    for r in range(1, _KCORE_ORACLE_ROUNDS + 1):
        parts.append(
            f""",
    k_{r} AS MATERIALIZED (
        SELECT s FROM e_{r - 1} GROUP BY s HAVING COUNT(*) >= {_KCORE_K}
    ),
    e_{r} AS MATERIALIZED (
        SELECT e.s, e.d FROM e_{r - 1} e
        JOIN k_{r} a ON a.s = e.s
        JOIN k_{r} b ON b.s = e.d
    )"""
        )
    parts.append(
        f"""
    SELECT s AS vertex, COUNT(*) AS core_degree
    FROM e_{_KCORE_ORACLE_ROUNDS} GROUP BY s
    """
    )
    return "".join(parts)


@_q("copurchase_kcore", _kcore_oracle())
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """65-core of the part co-purchase graph (parts adjacent when
    they share an order): repeatedly delete parts with fewer than 65
    surviving co-purchase partners. The dense-region extractor
    recommender/curation pipelines run before community detection —
    the core keeps only parts whose neighborhoods survive mutually.
    Spark side peels to a TRUE fixpoint (graph.kcore, one degree agg
    + two semi-joins per round, localCheckpoint-ed, 1-count driver
    probe — the connected_components round budget; raises rather
    than return a partial peel); k=65 sits just below this graph's
    sharp core-collapse threshold so the result is non-vacuous at
    every SF (188/200, 1992/2000, 19845/20000 vertices). Edge build
    is one orderkey-keyed self-join — partial-aggregatable and
    shuffle-bounded by order width, not corpus size."""
    li = read_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_partkey").alias("s"))
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("d")
    )
    edges = (
        a.join(b, (F.col("l_orderkey") == F.col("ok2")) & (F.col("s") < F.col("d")))
        .select("s", "d")
        .distinct()
    )
    # canonical=True: edges are distinct with s < d, so kcore skips
    # its re-dedup of the symmetrized set — that distinct() was the
    # single most expensive exchange in the whole query (r6).
    return graph.kcore(edges, k=_KCORE_K, src="s", dst="d", canonical=True)


# ---------------------------------------------------------------------------
# UCB1 arm ranking: the deterministic exploration-bonus score over
# observed counts (Auer et al. 2002) — what a bandit-driven data-
# mixing loop computes each round. Every input to the score is an
# exact integer, so mean + sqrt(2 ln N / n) composes identical
# doubles; ROUND(,12) before ranking per the PMI lesson.
# ---------------------------------------------------------------------------


@_q(
    "ucb1_brand_ranking",
    """
    WITH arms AS (
        SELECT p.p_brand AS brand,
               COUNT(*) AS n_pulls,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rewards
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    tot AS (SELECT SUM(n_pulls) AS big_n FROM arms),
    scored AS (
        SELECT brand, n_pulls, n_rewards,
               CAST(n_rewards AS DOUBLE) / n_pulls AS mean_reward,
               ROUND(CAST(n_rewards AS DOUBLE) / n_pulls
                     + sqrt(2 * ln(CAST(big_n AS DOUBLE)) / n_pulls),
                     12) AS ucb_score
        FROM arms, tot
    )
    SELECT brand, n_pulls, n_rewards, mean_reward, ucb_score,
           CAST(ROW_NUMBER() OVER (ORDER BY ucb_score DESC, brand)
                AS INTEGER) AS rnk
    FROM scored
    """,
)
def ucb1_brand_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 scores treating each part brand as a bandit arm (pull =
    lineitem, reward = returned line): mean reward (exact integer
    ratio) + the sqrt(2 ln N / n) exploration bonus. ln/sqrt on
    identical doubles are bit-equal; the one risky step — ADDING the
    two terms — gets the 1e-12 grid before the rank so a boundary
    ulp can't flip an ordering. One fact-dim broadcast join + one
    partial-aggregatable groupBy + a 25-row window: nothing here
    scales with more than the brand count."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    arms = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_pulls"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_rewards"),
        )
    )
    tot = arms.agg(F.sum("n_pulls").alias("big_n"))
    mean = F.col("n_rewards").cast("double") / F.col("n_pulls")
    ucb = F.round(
        mean
        + F.sqrt(
            F.lit(2.0)
            * F.log(F.col("big_n").cast("double"))
            / F.col("n_pulls")
        ),
        12,
    )
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "brand",
        "n_pulls",
        "n_rewards",
        mean.alias("mean_reward"),
        ucb.alias("ucb_score"),
    )
    return scored.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("ucb_score"), F.asc("brand")))
        .cast("int")
        .alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Deterministic token dropout — the data-augmentation twin of the
# sampling family: every keep/drop decision is an md5 of
# (doc_id, position), so the augmented corpus is reproducible across
# machines, retries, AND partitionings (never rand()). Positions are
# pinned 1-based on both engines (Spark's two-arg lambda index is
# 0-based, DuckDB's is 1-based — the off-by-one is handled HERE, not
# downstream).
# ---------------------------------------------------------------------------


@_q(
    "doc_token_dropout",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    kept AS (
        SELECT doc_id, len(w) AS n_tokens,
               list_filter(w, (x, i) ->
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                               || '#' || CAST(i AS VARCHAR)),
                                           1, 2)) AS BIGINT) >= 64) AS k
        FROM t
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(len(k) AS INTEGER) AS n_kept,
           array_to_string(k[1:8], ' ') AS kept_preview
    FROM kept
    """,
)
def doc_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token dropout at nominal rate 64/256 = 25%: token at 1-based
    position p survives iff the first md5 byte of "doc_id#p" is
    ≥ 64. Content- and position-keyed, so the same doc always drops
    the same tokens — reproducible augmentation with zero
    coordination, and a pure projection (no shuffle at any scale).
    Emits per-doc kept counts and an 8-token preview (string-exact
    across engines)."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", dedup.tokens("text").alias("w"))
    kept = F.expr(
        "filter(w, (x, i) -> conv(substring(md5(concat("
        "cast(doc_id as string), '#', cast(i + 1 as string))), 1, 2),"
        " 16, 10) >= 64)"
    )
    k = t.select("doc_id", F.size("w").alias("n_tokens"), kept.alias("k"))
    return k.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.size("k").cast("int").alias("n_kept"),
        F.array_join(F.slice("k", 1, 8), " ").alias("kept_preview"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss distance preservation under a deterministic
# Rademacher (±1) projection 64 → 16. The planes are driver-computed
# md5 signs inlined as INTEGER literals in both engines (no float
# parse trap at all); every fold walks arrays in order; the final
# ratio gets ROUND(,6) — the kmeans lesson, DuckDB FMA-contracts
# (a−b)·(a−b) inside list lambdas so squared terms are never
# bit-trusted.
# ---------------------------------------------------------------------------

_JL_DIM, _JL_OUT = 64, 16


def _jl_planes() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl{j}#{d}".encode()).hexdigest()[0], 16) < 8
            else -1
            for d in range(_JL_DIM)
        ]
        for j in range(_JL_OUT)
    ]


def _jl_oracle() -> str:
    planes = _jl_planes()
    proj_cols = ",\n               ".join(
        "list_reduce(list_transform(range(1, %d), i -> e[i] * (%s)[i]),"
        " (a, b) -> a + b) AS y%d"
        % (_JL_DIM + 1, str(pl), j)
        for j, pl in enumerate(planes)
    )
    dy = " + ".join(
        f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(_JL_OUT)
    )
    return f"""
    WITH sub AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % 10 < 2
    ),
    proj AS MATERIALIZED (
        SELECT vec_id, e,
               {proj_cols}
        FROM sub
    )
    SELECT a.vec_id AS lo_id, b.vec_id AS hi_id,
           ROUND(({dy})
                 / ({_JL_OUT} * list_reduce(
                        list_transform(range(1, {_JL_DIM + 1}),
                                       i -> (a.e[i] - b.e[i])
                                            * (a.e[i] - b.e[i])),
                        (x, y) -> x + y)), 6) AS dist_ratio
    FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 10
    """


@_q("embedding_jl_distortion", _jl_oracle())
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL lemma, measured: squared pair distances after a ±1
    Rademacher projection to 16 dims, relative to m·(original
    squared distance) — concentrated around 1.0. Planes are md5-sign
    literals shared by both engines; each projection coordinate is
    one ordered fold over the row's own array (zero shuffle — the
    projection is a map), and pairing joins vec_id → vec_id+10 over
    a deterministic 20% subset. The measured-ratio column is the
    curation signal (how far can we compress before ANN recall
    degrades); ROUND(,6) kills the FMA-contraction ulp in the
    squared-difference folds."""
    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 10 < 2
    )
    planes = _jl_planes()
    lits = [
        F.lit([float(v) for v in pl]).alias(f"_p{j}")
        for j, pl in enumerate(planes)
    ]
    base = emb.select(
        "vec_id", F.col("embedding").alias("e"), *lits
    )
    proj = base.select(
        "vec_id",
        "e",
        *[
            F.aggregate(
                F.zip_with(
                    F.col("e"),
                    F.col(f"_p{j}"),
                    lambda x, s: x.cast("double") * s.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias(f"y{j}")
            for j in range(_JL_OUT)
        ],
    )
    a = proj.select(
        F.col("vec_id").alias("lo_id"),
        F.col("e").alias("ea"),
        *[F.col(f"y{j}").alias(f"a{j}") for j in range(_JL_OUT)],
    )
    b = proj.select(
        F.col("vec_id").alias("hi_id"),
        F.col("e").alias("eb"),
        *[F.col(f"y{j}").alias(f"b{j}") for j in range(_JL_OUT)],
    )
    dy = None
    for j in range(_JL_OUT):
        term = (F.col(f"a{j}") - F.col(f"b{j}")) * (
            F.col(f"a{j}") - F.col(f"b{j}")
        )
        dy = term if dy is None else dy + term
    dx = F.aggregate(
        F.zip_with(
            F.col("ea"),
            F.col("eb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, F.col("hi_id") == F.col("lo_id") + 10)
        .select(
            "lo_id",
            "hi_id",
            F.round(dy / (F.lit(_JL_OUT) * dx), 6).alias("dist_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# CMS self-join-size estimation (AMS inner product over CMS cells):
# the query optimizer's cardinality-estimation primitive, exactly
# reproducible because the cells are deterministic md5 buckets.
# ---------------------------------------------------------------------------


@_q(
    "cms_selfjoin_size_estimate",
    """
    WITH rows AS (SELECT unnest(range(0, 4)) AS r),
    cells AS (
        SELECT r.r,
               CAST(('0x' || substring(md5(CAST(r.r AS VARCHAR) || '|'
                                           || CAST(l.l_suppkey AS VARCHAR)),
                                       1, 15)) AS BIGINT) % 256 AS bucket,
               COUNT(*) AS cnt
        FROM lineitem l CROSS JOIN rows r
        GROUP BY 1, 2
    ),
    est AS (
        SELECT CAST(MIN(est_r) AS BIGINT) AS est
        FROM (SELECT r, CAST(SUM(cnt * cnt) AS BIGINT) AS est_r
              FROM cells GROUP BY r)
    ),
    tru AS (
        SELECT CAST(SUM(f * f) AS BIGINT) AS true_size
        FROM (SELECT COUNT(*) AS f FROM lineitem GROUP BY l_suppkey)
    )
    SELECT t.true_size, e.est,
           e.est >= t.true_size AS never_undercounts,
           ROUND(CAST(e.est AS DOUBLE) / CAST(t.true_size AS DOUBLE), 9)
               AS overestimate_ratio
    FROM tru t, est e
    """,
)
def cms_selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join size of lineitem on l_suppkey (Σ f(s)² — the AMS
    F₂-style statistic behind join cardinality estimation), estimated
    from the Count-Min sketch via the inner-product estimator
    (sketch.cms_join_size) and compared with the exact answer. Both
    numbers are exact integers: the sketch cells are deterministic
    md5 buckets (engine-reproducible — the cms_user_counts policy),
    so the ESTIMATE itself is oracle material, plus the
    never-undercounts theorem as a boolean. Terminal columns are
    explicitly BIGINT (DuckDB SUM yields HUGEINT otherwise — the
    r4 hash-fail class) and the ratio sits on the 1e-9 ROUND grid
    rather than betting on raw-double bit equality. Sketch build is one
    (4×256)-key partial agg; the estimate joins two 1 KB tables —
    constant cost at any input scale."""
    from ..operators import sketch

    li = read_table(spark, sf_dir, "lineitem")
    # ONE corpus aggregation feeds both the sketch and its exact twin
    # (r8): per-key frequencies first, then the weighted cms_table
    # pays 4 md5 per DISTINCT suppkey instead of per lineitem row
    # (~60x fewer hashes at sf0.1), and true_size reuses the same
    # frame. localCheckpoint because three branches hang off it
    # (sketch ×2 via the self-join + the exact sum).
    freq = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint()
    )
    cms = sketch.cms_table(
        freq, "l_suppkey", depth=4, width=256, weight_col="f"
    ).localCheckpoint()
    est = sketch.cms_join_size(cms, cms, depth=4)
    true_size = freq.agg(F.sum(F.col("f") * F.col("f")).alias("true_size"))
    return true_size.crossJoin(F.broadcast(est)).select(
        F.col("true_size").cast("long").alias("true_size"),
        F.col("est").cast("long").alias("est"),
        (F.col("est") >= F.col("true_size")).alias("never_undercounts"),
        F.round(
            F.col("est").cast("double") / F.col("true_size").cast("double"),
            9,
        ).alias("overestimate_ratio"),
    )


# ---------------------------------------------------------------------------
# AR(1) fit by Yule-Walker (lag-1 autocorrelation) per daily series —
# the simplest member of the forecasting family (Holt, STL, Theil-Sen
# already covered): five exact-int lag-pair moments, closed form on
# the 1e-12 grid, one-step-ahead forecast from identical doubles.
# ---------------------------------------------------------------------------


@_q(
    "daily_value_ar1",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type, a.cents AS x, b.cents AS y
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND b.i = a.i + 1
    ),
    mom AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pairs GROUP BY event_type
    ),
    last_v AS (
        SELECT s.event_type, s.cents AS x_last
        FROM seq s
        JOIN (SELECT event_type, MAX(i) AS mi FROM seq GROUP BY event_type) m
          ON m.event_type = s.event_type AND m.mi = s.i
    ),
    fit AS (
        SELECT m.event_type, m.n,
               ROUND((CAST(m.n AS DOUBLE) * m.sxy
                      - CAST(m.sx AS DOUBLE) * m.sy)
                     / (sqrt(CAST(m.n AS DOUBLE) * m.sxx
                             - CAST(m.sx AS DOUBLE) * m.sx)
                        * sqrt(CAST(m.n AS DOUBLE) * m.syy
                               - CAST(m.sy AS DOUBLE) * m.sy)), 12)
                   AS phi,
               CAST(m.sy AS DOUBLE) / m.n AS mu,
               l.x_last
        FROM mom m JOIN last_v l ON l.event_type = m.event_type
    )
    SELECT event_type, n AS n_pairs, phi,
           ROUND(mu + phi * (CAST(x_last AS DOUBLE) - mu), 6)
               AS forecast_cents
    FROM fit
    """,
)
def daily_value_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) coefficient per event type from the Yule-Walker moment
    equations on (x_t, x_{t+1}) lag pairs: φ = lag-1 Pearson from
    five exact-int64 moments (closed form, 1e-12 grid), one-step
    forecast μ + φ(x_n − μ) on identical doubles (1e-6 grid — the
    subtract-multiply-add is the FMA-contractible shape). Lag pairs
    come from the same per-series row-number self-join every series
    query uses; all downstream work is per-type scalars."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("cents"))
    )
    seq = daily.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    ).localCheckpoint(eager=True)
    b = seq.select(
        F.col("event_type").alias("et2"),
        F.col("cents").alias("y"),
        F.col("i").alias("ib"),
    )
    pairs = seq.join(
        b,
        (F.col("event_type") == F.col("et2"))
        & (F.col("ib") == F.col("i") + 1),
    ).select("event_type", F.col("cents").alias("x"), "y")
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    last_v = (
        seq.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.desc("i"))
            ),
        )
        .where(F.col("_rn") == 1)
        .select("event_type", F.col("cents").alias("x_last"))
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    phi = F.round(
        (n_d * F.col("sxy") - sx_d * F.col("sy"))
        / (
            F.sqrt(n_d * F.col("sxx") - sx_d * F.col("sx"))
            * F.sqrt(n_d * F.col("syy") - sy_d * F.col("sy"))
        ),
        12,
    )
    mu = sy_d / F.col("n")
    fit = mom.join(last_v, "event_type").select(
        "event_type",
        F.col("n").alias("n_pairs"),
        phi.alias("phi"),
        mu.alias("mu"),
        "x_last",
    )
    return fit.select(
        "event_type",
        "n_pairs",
        "phi",
        F.round(
            F.col("mu")
            + F.col("phi") * (F.col("x_last").cast("double") - F.col("mu")),
            6,
        ).alias("forecast_cents"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b: the third rank-correlation surface (Spearman and
# Pearson-on-moments exist) — concordant/discordant pair counts are
# exact integers, the tie-corrected denominator is a sqrt of exact
# integer products, grid-rounded before emit.
# ---------------------------------------------------------------------------


@_q(
    "daily_kendall_tau",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
        SELECT event_type, cents AS x, n_events AS y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
        FROM daily
    ),
    pairc AS (
        SELECT a.event_type,
               SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                        THEN 1 ELSE 0 END) AS c,
               SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                        THEN 1 ELSE 0 END) AS d,
               COUNT(*) AS n0
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND a.i < b.i
        GROUP BY a.event_type
    ),
    tx AS (
        SELECT event_type, SUM(t * (t - 1) / 2) AS n1
        FROM (SELECT event_type, COUNT(*) AS t FROM seq
              GROUP BY event_type, x)
        GROUP BY event_type
    ),
    ty AS (
        SELECT event_type, SUM(t * (t - 1) / 2) AS n2
        FROM (SELECT event_type, COUNT(*) AS t FROM seq
              GROUP BY event_type, y)
        GROUP BY event_type
    )
    SELECT p.event_type,
           CAST(p.c AS BIGINT) AS concordant,
           CAST(p.d AS BIGINT) AS discordant,
           ROUND((CAST(p.c AS DOUBLE) - p.d)
                 / sqrt(CAST((p.n0 - tx.n1) AS DOUBLE)
                        * (p.n0 - ty.n2)), 12) AS tau_b
    FROM pairc p
    JOIN tx ON tx.event_type = p.event_type
    JOIN ty ON ty.event_type = p.event_type
    """,
)
def daily_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between daily total value and daily event count:
    concordant/discordant counts over the calendar-bounded pair join
    (exact integers), tie corrections n1/n2 as exact integer sums,
    τ-b = (C−D)/√((n0−n1)(n0−n2)) composed from identical doubles on
    the 1e-12 grid. Complements daily_spearman_corr: τ is the
    robust, interpretable cousin (probability of agreement minus
    disagreement)."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("x"), F.count(F.lit(1)).alias("y"))
    )
    seq = daily.select(
        "event_type",
        "x",
        "y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("i"),
    ).localCheckpoint(eager=True)
    b = seq.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("i").alias("ib"),
    )
    prod = (F.col("xb") - F.col("x")) * (F.col("yb") - F.col("y"))
    pairc = (
        seq.join(
            b,
            (F.col("event_type") == F.col("et2")) & (F.col("i") < F.col("ib")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
            F.count(F.lit(1)).alias("n0"),
        )
    )

    def _ties(col: str, out: str):
        return (
            seq.groupBy("event_type", col)
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(
                F.sum((F.col("t") * (F.col("t") - 1) / 2).cast("bigint")).alias(
                    out
                )
            )
        )

    tx, ty = _ties("x", "n1"), _ties("y", "n2")
    tau = F.round(
        (F.col("c").cast("double") - F.col("d"))
        / F.sqrt(
            (F.col("n0") - F.col("n1")).cast("double")
            * (F.col("n0") - F.col("n2"))
        ),
        12,
    )
    return (
        pairc.join(tx, "event_type")
        .join(ty, "event_type")
        .select(
            "event_type",
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            tau.alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# ER survivorship: FS link pairs → transitive clusters → ONE golden
# record per cluster with deterministic field election (the master-
# data-management step after linkage). Every election key is exact
# (padded integer-string argmax — the OHLC discipline), so the
# golden rows are hash-exact.
# ---------------------------------------------------------------------------


@_q(
    "customer_golden_records",
    f"""
    WITH RECURSIVE c AS MATERIALIZED (
        SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM customer WHERE c_custkey % 10 = 0
    ),
    p AS (
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.95
                   AS agree_name,
               a.c_nationkey = b.c_nationkey AS agree_nation,
               ABS(a.cents - b.cents) <= 10000 AS agree_bal
        FROM c a JOIN c b
          ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
    ),
    s AS (SELECT key_a, key_b, {_FS_CASES} AS fs_score FROM p),
    pairs AS MATERIALIZED (
        SELECT key_a AS doc_a, key_b AS doc_b FROM s WHERE fs_score >= 5.0
    ),
    {_CC_BY_RECURSIVE_CTE},
    rec AS (
        SELECT cc.component, c.*,
               lpad(CAST(c.cents AS VARCHAR), 14, '0') || '-' ||
                   lpad(CAST(c.c_custkey AS VARCHAR), 12, '0') AS kk
        FROM c JOIN cc ON cc.vertex = c.c_custkey
    )
    SELECT component AS cluster_id,
           CAST(COUNT(*) AS INTEGER) AS n_members,
           MIN(c_custkey) AS rep_key,
           arg_max(c_name, kk) AS canonical_name,
           arg_max(c_mktsegment, kk) AS canonical_segment,
           MAX(cents) AS best_balance_cents,
           MIN(c_nationkey) AS min_nationkey
    FROM rec GROUP BY component
    """,
)
def customer_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record construction over Fellegi-Sunter linkage: link
    pairs (fs_score ≥ 5, the customer_fellegi_sunter scoring reused
    verbatim) feed graph.connected_components; each cluster elects
    one survivor per field — name/segment from the member with the
    lexicographically-max (padded cents, custkey) key (max_by on a
    total order — deterministic), balance = MAX, representative key
    = MIN. The classic MDM survivorship shapes (most-complete /
    most-recent) reduce to exactly this argmax-over-total-order
    pattern. Blocked pairs bound the quadratic stage; CC is
    O(diameter) rounds; election is one partial-aggregatable
    groupBy."""
    from ..operators import er

    jw = textfn.jaro_winkler_pandas_udf()
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    )
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_name",
        "c_nationkey",
        cents.alias("cents"),
    ).localCheckpoint(eager=True)
    a = base.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_na"),
        F.col("c_nationkey").alias("_ga"),
        F.col("cents").alias("_ca"),
    )
    b = base.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_nb"),
        F.col("c_nationkey").alias("_gb"),
        F.col("cents").alias("_cb"),
    )
    pairs = (
        a.join(b, "segment")
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            (F.round(jw(F.col("_na"), F.col("_nb")), 6) >= 0.95).alias(
                "agree_name"
            ),
            (F.col("_ga") == F.col("_gb")).alias("agree_nation"),
            (F.abs(F.col("_ca") - F.col("_cb")) <= 10000).alias("agree_bal"),
        )
    )
    links = (
        er.fellegi_sunter(
            pairs, _FS_PARAMS, link_threshold=5.0, possible_threshold=0.0
        )
        .where(F.col("decision") == "link")
        .select(
            F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b")
        )
    )
    cc = graph.connected_components(links)
    kk = F.concat(
        F.lpad(F.col("cents").cast("string"), 14, "0"),
        F.lit("-"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
    )
    rec = base.join(
        cc, base.c_custkey == cc.vertex
    ).select("component", "c_custkey", "c_name", "c_mktsegment",
             "c_nationkey", "cents", kk.alias("kk"))
    return rec.groupBy("component").agg(
        F.count(F.lit(1)).cast("int").alias("n_members"),
        F.min("c_custkey").alias("rep_key"),
        F.max_by("c_name", "kk").alias("canonical_name"),
        F.max_by("c_mktsegment", "kk").alias("canonical_segment"),
        F.max("cents").alias("best_balance_cents"),
        F.min("c_nationkey").alias("min_nationkey"),
    ).withColumnRenamed("component", "cluster_id")


# ---------------------------------------------------------------------------
# CDC log apply: materialize the current state from an ordered
# insert/update/delete change log — the lakehouse ingestion shape
# MERGE handles incrementally, expressed as one windowed last-writer
# pass (delete wins only if it is the LAST op). Ordering key is
# exact integer microseconds + event_id: both engines truncate the
# nano timestamps identically, so the "last" op can never diverge.
# ---------------------------------------------------------------------------


@_q(
    "cdc_user_state_apply",
    """
    WITH log AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS us,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D'
                               ELSE 'U' END AS op,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    ordered AS (
        SELECT user_id, op, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY us DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_ops
        FROM log
    )
    SELECT user_id, CAST(n_ops AS INTEGER) AS n_ops,
           op AS last_op, cents AS last_cents
    FROM ordered WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_user_state_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change log to materialize current per-user state:
    event_type maps to I/U/D ops, ops apply in (microsecond,
    event_id) order, and a user exists in the final state iff their
    LAST op is not a delete — the Debezium-snapshot semantics the
    incremental path implements via operators/merge.py. One windowed
    pass on bounded per-user partitions; at scale this runs per
    partition-pruned key range, and the last-writer row carries
    everything downstream."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    log = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        cents.alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    ordered = log.select(
        "user_id",
        "op",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_ops"),
    )
    return ordered.where((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("n_ops").cast("int").alias("n_ops"),
        F.col("op").alias("last_op"),
        F.col("cents").alias("last_cents"),
    )


# ---------------------------------------------------------------------------
# Weighted SSSP (Bellman-Ford): graph.bellman_ford relaxes to a
# driver-probed fixpoint; the oracle unrolls 16 relaxation rounds
# (≥ the ≤14-hop tree depth at any tested SF; post-fixpoint rounds
# are no-ops). Integer weights keep every distance exact.
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 16


def _sssp_oracle() -> str:
    parts = [
        """
    WITH e0 AS MATERIALIZED (
        SELECT c_custkey AS s, CAST(c_custkey // 2 AS BIGINT) AS d,
               c_custkey % 10 + 1 AS w
        FROM customer WHERE c_custkey > 1
    ),
    e AS MATERIALIZED (
        SELECT s, d, w FROM e0 UNION ALL SELECT d, s, w FROM e0
    ),
    d_0 AS (SELECT CAST(1 AS BIGINT) AS vertex, CAST(0 AS BIGINT) AS dist)"""
    ]
    for r in range(1, _SSSP_ROUNDS + 1):
        parts.append(
            f""",
    d_{r} AS MATERIALIZED (
        SELECT vertex, MIN(dist) AS dist FROM (
            SELECT vertex, dist FROM d_{r - 1}
            UNION ALL
            SELECT e.d AS vertex, p.dist + e.w AS dist
            FROM e JOIN d_{r - 1} p ON p.vertex = e.s
        ) GROUP BY vertex
    )"""
        )
    parts.append(f"""
    SELECT vertex, dist FROM d_{_SSSP_ROUNDS}
    """)
    return "".join(parts)


@_q("referral_weighted_sssp", _sssp_oracle())
def referral_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest weighted distance from the referral root (customer 1
    — every custkey halves down to 1, so the whole tree is reachable;
    the r4 version rooted at the ISOLATED vertex 0 and emitted one
    vacuous row, caught by the r5 0/1-row oracle audit) to every
    customer over the undirected referral tree with integer edge
    weights (c_custkey % 10 + 1): graph.bellman_ford — per round one
    dist⋈edges relaxation + min aggregate, checkpointed, stopping
    when the driver probe counts zero changed vertices (raises
    rather than emit a partial relaxation). Distances are exact
    integer sums. At 100 TB the dist table is vertex-sized and
    partitions with the edges on vertex id — the Pregel shape."""
    cust = read_table(spark, sf_dir, "customer")
    e0 = cust.where(F.col("c_custkey") > 1).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 2).cast("long").alias("dst"),
        (F.col("c_custkey") % 10 + 1).alias("w"),
    )
    edges = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    return graph.bellman_ford(edges, sources=[1])


# ---------------------------------------------------------------------------
# HLL set-operation estimation: intersection size by inclusion-
# exclusion over mergeable sketches — the portable claim is the
# bound boolean (sketch bytes never cross engines), the
# hll_sketch_weekly_users policy extended to set algebra.
# ---------------------------------------------------------------------------


@_q(
    "hll_user_overlap_estimate",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM a) AS exact_click_users,
           (SELECT COUNT(*) FROM b) AS exact_purchase_users,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_both,
           TRUE AS union_within_5pct,
           TRUE AS intersection_within_15pct
    """,
)
def hll_user_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from HLL sketches alone: |A∩B| ≈
    est(A) + est(B) − est(A∪B) by inclusion-exclusion, where the
    union estimate comes from MERGING the two sketches (never
    re-reading raw events — the mergeability story). Exact counts
    ride along; the oracle asserts the union estimate within 5% and
    the (error-compounding) intersection estimate within 15%. At
    100 TB each per-set sketch is one partial-aggregatable pass and
    the set algebra is O(sketch bytes)."""
    ev = read_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "purchase")
    sk = (
        a.agg(F.hll_sketch_agg("user_id").alias("sa"))
        .crossJoin(b.agg(F.hll_sketch_agg("user_id").alias("sb")))
        .select(
            F.hll_sketch_estimate("sa").alias("ea"),
            F.hll_sketch_estimate("sb").alias("eb"),
            F.hll_sketch_estimate(
                F.hll_union("sa", "sb")
            ).alias("eu"),
        )
    )
    exact = (
        a.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_click_users"))
        .crossJoin(
            b.select("user_id")
            .distinct()
            .agg(F.count(F.lit(1)).alias("exact_purchase_users"))
        )
        .crossJoin(
            a.select("user_id")
            .distinct()
            .join(b.select("user_id").distinct(), "user_id")
            .agg(F.count(F.lit(1)).alias("exact_both"))
        )
    )
    est_both = F.col("ea") + F.col("eb") - F.col("eu")
    exact_union = (
        F.col("exact_click_users")
        + F.col("exact_purchase_users")
        - F.col("exact_both")
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_click_users",
        "exact_purchase_users",
        "exact_both",
        (
            F.abs(F.col("eu") - exact_union) <= 0.05 * exact_union
        ).alias("union_within_5pct"),
        (
            F.abs(est_both - F.col("exact_both"))
            <= 0.15 * F.col("exact_both")
        ).alias("intersection_within_15pct"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary (sketch.quantile_summary): the quantile
# member of the sketch pantheon. Raw estimates are partitioning-
# dependent (never oracle material — the Misra–Gries policy); the
# oracle checks the rank-error THEOREM as booleans, with the exact
# rank-based quantiles riding along through the hierarchical prefix
# rank (never a data-sized SinglePartition window).
# ---------------------------------------------------------------------------


@_q(
    "quantile_sketch_order_values",
    """
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey
        FROM orders
    ),
    n AS (SELECT COUNT(*) AS n_rows FROM o),
    r AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn
        FROM o
    )
    SELECT CAST(p.p_target AS DOUBLE) AS p_target, n.n_rows,
           r.cents AS exact_q_cents,
           TRUE AS within_rank_bound
    FROM (VALUES (0.25), (0.5), (0.75)) p(p_target)
    CROSS JOIN n
    JOIN r ON r.rn = CAST(ceil(p.p_target * n.n_rows) AS BIGINT)
    """,
)
def quantile_sketch_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles from the mergeable per-partition summary
    (k=64 segments/partition): the sketch estimate for each target
    rank must sit within the Σ_p ⌈n_p/k⌉ ≤ N/k + P rank-error bound
    of its target — the theorem holds under ANY partitioning, which
    is what makes it oracle-safe while the estimates themselves are
    not. Exact rank-based quantiles (value at rank ⌈p·N⌉) ride along
    via the hierarchical prefix rank. At 100 TB only the ≤ k·P-row
    summary ever moves; the exact branch exists for the in-query
    check (a production rollup persists per-shard summaries and
    merges by concatenation)."""
    from ..operators import prefix, sketch

    k = 64
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "o_orderkey",
    ).localCheckpoint(eager=True)
    n_parts = o.rdd.getNumPartitions()  # known post-checkpoint, no job
    summary = sketch.quantile_summary(o, "cents", k=k)
    est = sketch.quantile_estimates(summary, [0.25, 0.5, 0.75])
    nrow = o.agg(F.count(F.lit(1)).alias("n_rows"))
    # exact ranks around each estimate: one conditional-agg pass over
    # the checkpointed base keyed by target (the r4 version burned 4
    # driver collects reaching the same verdicts — VERDICT r4 #6;
    # everything below is one lazy plan until the sink action).
    counts = (
        o.crossJoin(F.broadcast(est))
        .groupBy("p_target", "target_rank")
        .agg(
            F.sum(
                F.when(F.col("cents") < F.col("est_value"), 1).otherwise(0)
            ).alias("lt"),
            F.sum(
                F.when(F.col("cents") <= F.col("est_value"), 1).otherwise(0)
            ).alias("le"),
        )
    )
    bound = F.col("n_rows") / k + F.lit(n_parts)
    verd = counts.crossJoin(F.broadcast(nrow)).select(
        "p_target",
        (
            ((F.col("lt") + 1) <= (F.col("target_rank") + bound))
            & (F.col("le") >= (F.col("target_rank") - bound))
        ).alias("within_rank_bound"),
    )
    rn = prefix.global_row_number(
        o, ["cents", "o_orderkey"], out_col="rn", carry_cols=("cents",)
    )
    targets = spark.createDataFrame(
        [(0.25,), (0.5,), (0.75,)], "p_target double"
    ).crossJoin(F.broadcast(nrow))
    exact = targets.join(
        rn,
        F.col("rn")
        == F.ceil(F.col("p_target") * F.col("n_rows")).cast("bigint"),
    ).select("p_target", "n_rows", F.col("cents").alias("exact_q_cents"))
    return exact.join(verd, "p_target").select(
        "p_target", "n_rows", "exact_q_cents", "within_rank_bound"
    )


# ---------------------------------------------------------------------------
# Zipf fit of the corpus frequency spectrum — the corpus-health
# diagnostic every LM data report carries: OLS slope of ln(freq) on
# ln(rank) over exact term counts and deterministic ranks.
# ---------------------------------------------------------------------------


@_q(
    "corpus_zipf_fit",
    r"""
    WITH t AS (
        SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    counts AS (
        SELECT term, COUNT(*) AS freq
        FROM (SELECT unnest(w) AS term FROM t) GROUP BY term
    ),
    ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk
        FROM counts
    ),
    pts AS (
        SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        FROM ranked
    ),
    mom AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM pts
    )
    SELECT n AS n_terms,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 9) AS zipf_slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / n, 9) AS intercept
    FROM mom
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: slope of
    ln(freq) ~ ln(rank) (healthy natural-language corpora sit near
    −1; synthetic/degenerate vocabularies flatten). Ranks are
    deterministic (freq DESC, term tiebreak); ln of exact integers
    is bit-equal; the OLS moments are sums of identical doubles in
    engine-dependent ORDER — so the closed form gets the 1e-9 grid
    rather than bit-trust (unlike the int-moment regressions, these
    moments are float sums; the slope is stable far beyond 1e-9).
    One count agg + a hierarchical global rank (operators/prefix.py
    — r6: the old vocabulary-sized SinglePartition row_number was the
    one data-scaled funnel the registry-wide plan walker found; at
    open-vocabulary scale the vocab IS data-sized, so it gets the
    same prefix-sum treatment as customer ranks) — corpus text is
    read once."""
    from ..operators import prefix

    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(dedup.tokens("text").alias("w"))
    counts = (
        t.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = prefix.global_row_number(
        counts,
        ["freq", "term"],
        out_col="rnk",
        descending=[True, False],
        carry_cols=("freq",),
    ).select("freq", "rnk")
    pts = ranked.select(
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    slope = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 9).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness per user: coefficient of variation of the
# exact-integer microsecond gaps, and the Goh–Barabási burstiness
# parameter B = (σ−μ)/(σ+μ) — exact-int moments, 1e-9 grid.
# ---------------------------------------------------------------------------


@_q(
    "user_interarrival_burstiness",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    gaps AS (
        SELECT user_id,
               us - lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS g
        FROM e
    ),
    mom AS (
        SELECT user_id, COUNT(*) AS n, SUM(g) AS s,
               SUM(CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0))) AS s2
        FROM gaps WHERE g IS NOT NULL GROUP BY user_id
        HAVING COUNT(*) >= 10
    )
    SELECT user_id, n AS n_gaps,
           ROUND(sqrt((CAST(s2 AS DOUBLE) * n - CAST(s AS DOUBLE) * s))
                 / CAST(s AS DOUBLE), 9) AS cv,
           ROUND((sqrt((CAST(s2 AS DOUBLE) * n - CAST(s AS DOUBLE) * s)) / n
                  - CAST(s AS DOUBLE) / n)
                 / (sqrt((CAST(s2 AS DOUBLE) * n - CAST(s AS DOUBLE) * s)) / n
                    + CAST(s AS DOUBLE) / n), 9) AS burstiness
    FROM mom
    """,
)
def user_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness per user over inter-event gaps:
    B = (σ−μ)/(σ+μ) (−1 regular, 0 Poisson, →1 bursty) and the CV.
    Gaps are exact integer microseconds (both engines truncate nanos
    identically); Σg fits int64, Σg² goes through DECIMAL(38,0)
    (micros² overflows int64 — the value_distribution_moments
    lesson); σ and the ratios compose identical doubles on the 1e-9
    grid. One keyed window + one partial-aggregatable groupBy."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = e.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("g")
    ).where(F.col("g").isNotNull())
    mom = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("s"),
            F.sum(
                F.col("g").cast("decimal(38,0)")
                * F.col("g").cast("decimal(38,0)")
            ).alias("s2"),
        )
        .where(F.col("n") >= 10)
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    sig_n = F.sqrt(F.col("s2").cast("double") * F.col("n") - s_d * s_d)
    sigma = sig_n / F.col("n")
    mu = s_d / F.col("n")
    return mom.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.round(sig_n / s_d, 9).alias("cv"),
        F.round((sigma - mu) / (sigma + mu), 9).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics: the pre-flight report a 100 TB join
# plan needs (pick salting / AQE skew thresholds from DATA, not
# folklore). All exact integers; the per-key agg is the only
# data-sized stage.
# ---------------------------------------------------------------------------


@_q(
    "join_key_skew_report",
    """
    WITH ks AS (
        SELECT 'lineitem.l_suppkey' AS key_name, l_suppkey AS k
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
        UNION ALL
        SELECT 'orders.o_custkey', o_custkey FROM orders
        UNION ALL
        SELECT 'events.user_id', user_id FROM events
    ),
    per_key AS (
        SELECT key_name, k, COUNT(*) AS f FROM ks GROUP BY key_name, k
    ),
    stats AS (
        SELECT key_name,
               COUNT(*) AS n_distinct,
               CAST(SUM(f) AS BIGINT) AS n_rows,
               MAX(f) AS max_freq,
               SUM(CAST(f AS DECIMAL(38,0)) * CAST(f AS DECIMAL(38,0)))
                   AS sum_f2
        FROM per_key GROUP BY key_name
    )
    SELECT key_name, n_distinct, n_rows, max_freq,
           ROUND(CAST(max_freq AS DOUBLE) * n_distinct / n_rows, 9)
               AS max_over_mean,
           ROUND(CAST(sum_f2 AS DOUBLE) * n_distinct
                 / (CAST(n_rows AS DOUBLE) * n_rows), 9)
               AS skew_factor
    FROM stats
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report across the engine's join keys:
    max/mean frequency ratio and the normalized second moment
    n·Σf²/N² (= 1 for uniform keys; the expected per-task blowup of
    a hash join on that key). This is the number that decides
    between plain hash join, AQE skew split, and the manual salting
    fallback (salted_event_enrichment) BEFORE the job runs. One
    union scan + per-key partial agg; Σf² through DECIMAL(38,0)."""
    tables = [
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("events.user_id", "events", "user_id"),
    ]
    ks = None
    for key_name, tbl, col in tables:
        part = read_table(spark, sf_dir, tbl).select(
            F.lit(key_name).alias("key_name"), F.col(col).alias("k")
        )
        ks = part if ks is None else ks.unionByName(part)
    per_key = ks.groupBy("key_name", "k").agg(F.count(F.lit(1)).alias("f"))
    f38 = F.col("f").cast("decimal(38,0)")
    stats = per_key.groupBy("key_name").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("f").alias("n_rows"),
        F.max("f").alias("max_freq"),
        F.sum(f38 * f38).alias("sum_f2"),
    )
    return stats.select(
        "key_name",
        "n_distinct",
        "n_rows",
        "max_freq",
        F.round(
            F.col("max_freq").cast("double")
            * F.col("n_distinct")
            / F.col("n_rows"),
            9,
        ).alias("max_over_mean"),
        F.round(
            F.col("sum_f2").cast("double")
            * F.col("n_distinct")
            / (F.col("n_rows").cast("double") * F.col("n_rows")),
            9,
        ).alias("skew_factor"),
    )


# ---------------------------------------------------------------------------
# Rolling correlation between two daily measures over a bounded
# 14-day frame: every frame moment is an exact int64 window sum, so
# the per-day correlation composes identical doubles (1e-12 grid) —
# the windowed member of the exact-moment correlation family.
# ---------------------------------------------------------------------------


@_q(
    "rolling_corr_value_count",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS x,
               COUNT(*) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    fr AS (
        SELECT event_type, day,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * y) OVER w AS sxy,
               SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, CAST(n AS INTEGER) AS n_days,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 12) AS rolling_corr
    FROM fr WHERE n = 14
    """,
)
def rolling_corr_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily value totals
    and daily event counts per type (complete frames only): all six
    frame moments are exact int64 sums sharing ONE frame sort, the
    closed form composes identical doubles on the 1e-12 grid. The
    window partitions per type over calendar-bounded series — never
    data-sized."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("_c").alias("x"), F.count(F.lit(1)).alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    fr = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    ).where(F.col("n") == 14)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    corr = (n_d * F.col("sxy") - sx_d * F.col("sy")) / (
        F.sqrt(n_d * F.col("sxx") - sx_d * F.col("sx"))
        * F.sqrt(n_d * F.col("syy") - sy_d * F.col("sy"))
    )
    return fr.select(
        "event_type",
        "day",
        F.col("n").cast("int").alias("n_days"),
        F.round(corr, 12).alias("rolling_corr"),
    )


# ---------------------------------------------------------------------------
# Effective sample size of the DSIR importance weights — the
# diagnostic that decides whether importance RESAMPLING is usable at
# all (ESS/n → 0 means the weights are too peaked and the resampled
# set collapses onto a few documents). Max-stabilized exp + sorted
# ordered folds keep every float bit-equal; ROUND(,6) as belt.
# ---------------------------------------------------------------------------

@_q("dsir_ess_report")  # oracle assigned below (embeds the DSIR CTE)
def dsir_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ESS = (Σw)²/Σw² over the raw (non-target) pool's importance
    weights w = exp(log_weight − max): the Kong effective-sample-
    size diagnostic for DSIR resampling. The max-shift is an exact
    MAX of identical doubles; exp is bit-equal; both Σ folds walk
    the doc_id-sorted list on both engines (the diversity-entropy
    discipline — engine-order float sums are never trusted). One
    1-row collapse over doc-count-sized weights; at 100 TB the fold
    switches to the hierarchical prefix sum with the same
    stabilization."""
    docs = read_table(spark, sf_dir, "documents")
    w = textfn.dsir_log_weights(
        docs, F.col("lang") == "en", id_col="doc_id", text_col="text",
        n_buckets=256,
    )
    raw = w.where(~F.col("is_target")).select("doc_id", "log_weight")
    mx = raw.agg(F.max("log_weight").alias("m"))
    ex = raw.crossJoin(F.broadcast(mx)).select(
        "doc_id", F.exp(F.col("log_weight") - F.col("m")).alias("wt")
    )
    arr = F.sort_array(F.collect_list(F.struct("doc_id", "wt")))
    s = ex.agg(
        F.count(F.lit(1)).alias("n_raw"), arr.alias("_arr")
    ).select(
        "n_raw",
        F.aggregate(
            F.transform(F.col("_arr"), lambda x: x["wt"]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("s1"),
        F.aggregate(
            F.transform(F.col("_arr"), lambda x: x["wt"] * x["wt"]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("s2"),
    )
    return s.select(
        "n_raw",
        F.round(F.col("s1") * F.col("s1") / F.col("s2"), 6).alias("ess"),
        F.round(
            F.col("s1") * F.col("s1") / F.col("s2") / F.col("n_raw"), 6
        ).alias("ess_fraction"),
    )


ORACLES["dsir_ess_report"] = f"""
    WITH w AS ({ORACLES["doc_dsir_weights"]}),
    raw AS (SELECT doc_id, log_weight FROM w WHERE NOT is_target),
    mx AS (SELECT MAX(log_weight) AS m FROM raw),
    ex AS (SELECT doc_id, exp(log_weight - mx.m) AS wt FROM raw, mx),
    s AS (
        SELECT COUNT(*) AS n_raw,
               list_reduce(list(wt ORDER BY doc_id), (a, b) -> a + b)
                   AS s1,
               list_reduce(list(wt * wt ORDER BY doc_id), (a, b) -> a + b)
                   AS s2
        FROM ex
    )
    SELECT n_raw, ROUND(s1 * s1 / s2, 6) AS ess,
           ROUND(s1 * s1 / s2 / n_raw, 6) AS ess_fraction
    FROM s
"""


# ---------------------------------------------------------------------------
# RM3-style pseudo-relevance feedback: BM25 pass 1 → top-10 feedback
# docs → top-5 expansion terms by exact feedback-tf mass → BM25 pass
# 2 over the expanded query. Long-format (doc, term, tf) BM25, so the
# expanded term set can stay data-dependent; per-doc scores fold the
# term-sorted contribution list (never an engine-order float SUM) and
# ROUND(,4) before every rank.
# ---------------------------------------------------------------------------

_RM3_Q0 = ("dup", "spark", "vector")


def _rm3_contrib_sql(qcte: str) -> str:
    return f"""
        SELECT tf.doc_id, tf.term,
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS c
        FROM tf
        JOIN {qcte} USING (term)
        JOIN df USING (term)
        JOIN dl USING (doc_id), stats
    """


@_q(
    "rm3_feedback_search",
    rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, len(w) AS dl FROM t),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(w) AS term FROM t)
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT (SELECT COUNT(*) FROM dl) AS n_docs,
               (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl
    ),
    q0 AS (SELECT unnest({list(_RM3_Q0)!r}) AS term),
    c0 AS ({_rm3_contrib_sql('q0')}),
    s1 AS (
        SELECT doc_id,
               ROUND(list_reduce(list(c ORDER BY term), (a, b) -> a + b), 4)
                   AS s
        FROM c0 GROUP BY doc_id
    ),
    top10 AS (SELECT doc_id FROM s1 ORDER BY s DESC, doc_id LIMIT 10),
    expterms AS (
        SELECT tf.term, SUM(tf.tf) AS cnt
        FROM tf JOIN top10 USING (doc_id)
        WHERE tf.term NOT IN (SELECT term FROM q0)
        GROUP BY tf.term ORDER BY cnt DESC, term LIMIT 5
    ),
    q1 AS (SELECT term FROM q0 UNION ALL SELECT term FROM expterms),
    c1 AS ({_rm3_contrib_sql('q1')}),
    s2 AS (
        SELECT doc_id,
               ROUND(list_reduce(list(c ORDER BY term), (a, b) -> a + b), 4)
                   AS rm3_score
        FROM c1 GROUP BY doc_id
    )
    SELECT doc_id, rm3_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rm3_score DESC, doc_id)
                AS INTEGER) AS rnk
    FROM s2 ORDER BY rm3_score DESC, doc_id LIMIT 20
    """,
)
def rm3_feedback_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (RM3 shape): score the corpus with
    BM25 for {dup, spark, vector}, take the top-10 as feedback,
    expand the query with the 5 highest-mass feedback terms (exact
    integer tf sums — no float weighting needed for the selection),
    rescore with the expanded query, emit the top-20. BM25 here is
    LONG-format — (doc, term, tf) rows joined against a term-set
    relation — because the expansion terms are data-dependent and
    cannot be inlined as columns; per-doc totals fold the
    term-sorted contributions so both engines add identical doubles
    in identical order. Plan: the postings/tf/df tables build in one
    shuffle each and are REUSED by both passes; the query relations
    are ≤8 rows, always broadcast."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", dedup.tokens("text").alias("w"))
    dl = t.select("doc_id", F.size("w").alias("dl")).localCheckpoint(
        eager=True
    )
    tf = (
        t.select("doc_id", F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    def score(terms_df):
        c = (
            tf.join(F.broadcast(terms_df), "term")
            .join(F.broadcast(df_t), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                "term",
                (
                    F.log(
                        1
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )
                    * (F.col("tf") * 2.2)
                    / (
                        F.col("tf")
                        + 1.2
                        * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("c"),
            )
        )
        arr = F.array_sort(F.collect_list(F.struct("term", "c")))
        return c.groupBy("doc_id").agg(
            F.round(
                F.aggregate(
                    F.transform(arr, lambda x: x["c"]),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            ).alias("s")
        )

    q0 = spark.createDataFrame([(x,) for x in _RM3_Q0], "term string")
    s1 = score(q0)
    top10 = s1.orderBy(F.desc("s"), F.asc("doc_id")).limit(10).select("doc_id")
    expterms = (
        tf.join(F.broadcast(top10), "doc_id")
        .join(F.broadcast(q0), "term", "left_anti")
        .groupBy("term")
        .agg(F.sum("tf").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(5)
        .select("term")
    )
    q1 = q0.unionByName(expterms)
    s2 = score(q1).withColumnRenamed("s", "rm3_score")
    return (
        s2.orderBy(F.desc("rm3_score"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            "rm3_score",
            F.row_number()
            .over(Window.orderBy(F.desc("rm3_score"), F.asc("doc_id")))
            .cast("int")
            .alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency: the classic interval-overlap maximum
# (room scheduling / concurrent-sessions / capacity planning) as
# +1/-1 boundary events and a running sum — never an interval
# self-join. All integers end to end.
# ---------------------------------------------------------------------------


@_q(
    "peak_concurrent_sessions",
    """
    WITH s AS (
        SELECT event_type,
               epoch_us(ts) AS start_us,
               epoch_us(ts)
               + (60 + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       % 1800) * 1000000 AS end_us
        FROM events
    ),
    b AS (
        SELECT event_type, start_us AS t, CAST(1 AS BIGINT) AS delta FROM s
        UNION ALL
        SELECT event_type, end_us, CAST(-1 AS BIGINT) FROM s
    ),
    c AS (
        SELECT event_type, t, delta,
               CAST(SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS conc
        FROM b
    ),
    m AS (
        SELECT event_type, t, conc,
               MAX(conc) OVER (PARTITION BY event_type) AS mx
        FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_sessions,
           CAST(MAX(mx) AS BIGINT) AS peak_concurrency,
           CAST(MIN(CASE WHEN conc = mx THEN t END) AS BIGINT)
               AS peak_at_us
    FROM m
    GROUP BY event_type
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum simultaneous sessions per event type by sweep line:
    each event opens a session of deterministic length (60 +
    cents % 1800 seconds), every boundary becomes a +1/-1 delta row,
    and the concurrency curve is a running sum ordered by
    (t, delta) — ends sort before starts at the same instant
    (half-open intervals), so a back-to-back handoff never counts as
    overlap. `peak_at_us` is the earliest instant achieving the
    peak. The interval SELF-JOIN this replaces is quadratic in
    overlap depth; the sweep is one per-type ordered pass — bounded
    per-type partitions here, range-partitioned time + the
    hierarchical prefix operator at 100 TB (same state split as
    prefix.prefix_sum). Everything is exact integers."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    dur_us = (F.lit(60) + cents % 1800) * F.lit(1000000)
    s = ev.select(
        "event_type",
        start.alias("start_us"),
        (start + dur_us).alias("end_us"),
    )
    b = s.select(
        "event_type",
        F.col("start_us").alias("t"),
        F.lit(1).cast("bigint").alias("delta"),
    ).unionByName(
        s.select(
            "event_type",
            F.col("end_us").alias("t"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = b.select(
        "event_type", "t", F.sum("delta").over(w).cast("bigint").alias("conc")
    )
    m = c.select(
        "event_type",
        "t",
        "conc",
        F.max("conc").over(Window.partitionBy("event_type")).alias("mx"),
    )
    return m.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
        F.max("mx").cast("bigint").alias("peak_concurrency"),
        F.min(F.when(F.col("conc") == F.col("mx"), F.col("t")))
        .cast("bigint")
        .alias("peak_at_us"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP): the irregular-sampling mean every
# metering/pricing pipeline needs — each observation weighted by how
# long it was current. Exact integer numerator/denominator; the
# denominator is bounded by the day length at ANY data scale.
# ---------------------------------------------------------------------------


@_q(
    "type_daily_twap",
    """
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS t_us,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               event_id
        FROM events
    ),
    g AS (
        SELECT event_type, day, cents,
               LEAD(t_us) OVER (
                   PARTITION BY event_type, day ORDER BY t_us, event_id
               ) - t_us AS gap_us
        FROM e
    ),
    a AS (
        SELECT event_type, day,
               COUNT(*) AS n_gaps,
               CAST(SUM(cents * gap_us) AS BIGINT) AS num,
               CAST(SUM(gap_us) AS BIGINT) AS den
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY event_type, day
    )
    SELECT event_type, day, n_gaps, den AS observed_us,
           ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 / CAST(100 AS DOUBLE), 6) AS twap_value
    FROM a WHERE den > 0
    """,
)
def type_daily_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (type, day): each event's
    value holds until the next event of that type that day; the last
    observation of the day carries no weight (no lookahead into the
    next day). TWAP = Σ cents·gap / Σ gap — both exact int64 (the
    denominator is ≤ 86 400e6 µs per day REGARDLESS of data scale,
    and the numerator ≤ max_cents·day — scale-invariant overflow
    headroom), one terminal divide chain on the 1e-6 grid. One
    per-(type, day) LEAD window — calendar-bounded partitions — and
    one partial-aggregatable groupBy."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    e = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        cents.alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    g = e.select(
        "event_type",
        "day",
        "cents",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    a = g.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("cents") * F.col("gap_us")).cast("bigint").alias("num"),
        F.sum("gap_us").cast("bigint").alias("den"),
    )
    return a.where(F.col("den") > 0).select(
        "event_type",
        "day",
        "n_gaps",
        F.col("den").alias("observed_us"),
        F.round(
            F.col("num").cast("double")
            / F.col("den").cast("double")
            / F.lit(100).cast("double"),
            6,
        ).alias("twap_value"),
    )


# ---------------------------------------------------------------------------
# Spatial nearest-neighbor via grid bucketing: the geo twin of the
# LSH band join — candidates come from the 3x3 neighbor cells of a
# lat/lon grid, never an all-pairs cross join. Coordinates are
# deterministic md5-derived integers (engine-reproducible, the
# cms_user_counts policy); only the haversine itself touches libm,
# absorbed by the ROUND grid.
# ---------------------------------------------------------------------------


@_q(
    "customer_nearest_supplier_geo",
    """
    WITH sup AS (
        SELECT s_suppkey,
               CAST(('0x' || substring(md5('lat|' || CAST(s_suppkey AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 1000000 AS hlat,
               CAST(('0x' || substring(md5('lon|' || CAST(s_suppkey AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 1000000 AS hlon
        FROM supplier
    ),
    cust AS (
        SELECT c_custkey,
               CAST(('0x' || substring(md5('lat|c' || CAST(c_custkey AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 1000000 AS hlat,
               CAST(('0x' || substring(md5('lon|c' || CAST(c_custkey AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 1000000 AS hlon
        FROM customer
    ),
    supc AS (
        SELECT *,
               hlat // 100000 AS cell_lat, hlon // 100000 AS cell_lon,
               CAST(hlat * 120 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                   - CAST(60 AS DOUBLE) AS lat,
               CAST(hlon * 360 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                   - CAST(180 AS DOUBLE) AS lon
        FROM sup
    ),
    custc AS (
        SELECT *,
               hlat // 100000 AS cell_lat, hlon // 100000 AS cell_lon,
               CAST(hlat * 120 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                   - CAST(60 AS DOUBLE) AS lat,
               CAST(hlon * 360 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                   - CAST(180 AS DOUBLE) AS lon
        FROM cust
    ),
    probe AS (
        SELECT c.*, c.cell_lat + dy.d AS ncell_lat, c.cell_lon + dx.d AS ncell_lon
        FROM custc c
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        WHERE c.cell_lat + dy.d BETWEEN 0 AND 9
          AND c.cell_lon + dx.d BETWEEN 0 AND 9
    ),
    cand AS (
        SELECT p.c_custkey, s.s_suppkey,
               ROUND(2.0 * CAST(6371 AS DOUBLE) * asin(sqrt(
                   sin(radians(s.lat - p.lat) / 2) ^ 2
                   + cos(radians(p.lat)) * cos(radians(s.lat))
                     * sin(radians(s.lon - p.lon) / 2) ^ 2)), 6) AS d_km
        FROM probe p
        JOIN supc s ON s.cell_lat = p.ncell_lat AND s.cell_lon = p.ncell_lon
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey, d_km,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY d_km, s_suppkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY c_custkey) AS n_candidates
        FROM cand
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, d_km AS distance_km,
           CAST(n_candidates AS INTEGER) AS n_candidates
    FROM ranked WHERE rn = 1
    """,
)
def customer_nearest_supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer on a deterministic synthetic
    globe: md5-derived integer coordinates map every key to a
    (lat, lon) in [-60,60)x[-180,180), a 10x10 grid cell comes from
    PURE integer division of the raw hash (no float in the bucketing
    path), and each customer probes only its 3x3 neighbor cells —
    the spatial twin of the LSH band join, replacing the
    customers x suppliers cross join with a cell-equality join.
    Haversine is the one libm surface (sin/cos/asin may differ by an
    ulp across engines) so distances ROUND to the 1e-6 km grid
    before the argmin; ties break on supplier key. Semantics note
    (mirrored exactly in the oracle): no longitude wraparound — the
    grid clamps at the +-180 seam, candidates are ONLY the 3x3
    neighborhood, and customers with an empty neighborhood emit no
    row. At scale both sides partition by cell; hot cells shrink by
    refining the grid (cells are prefixes, like LSH bands)."""
    sup = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")

    def h(tag: str, col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(tag), col.cast("string")).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )

    def coords(df, key, tag_suffix):
        key_col = F.col(key)
        return df.select(
            key,
            h("lat|" + tag_suffix, key_col).alias("hlat"),
            h("lon|" + tag_suffix, key_col).alias("hlon"),
        ).select(
            key,
            F.expr("hlat DIV 100000").alias("cell_lat"),
            F.expr("hlon DIV 100000").alias("cell_lon"),
            (
                (F.col("hlat") * 120).cast("double")
                / F.lit(1000000).cast("double")
                - F.lit(60).cast("double")
            ).alias("lat"),
            (
                (F.col("hlon") * 360).cast("double")
                / F.lit(1000000).cast("double")
                - F.lit(180).cast("double")
            ).alias("lon"),
        )

    supc = coords(sup, "s_suppkey", "")
    custc = coords(cust, "c_custkey", "c")
    offsets = spark.createDataFrame(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], "dy int, dx int"
    )
    probe = (
        custc.crossJoin(F.broadcast(offsets))
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.col("cell_lat") + F.col("dy")).alias("ncell_lat"),
            (F.col("cell_lon") + F.col("dx")).alias("ncell_lon"),
        )
        .where(
            F.col("ncell_lat").between(0, 9) & F.col("ncell_lon").between(0, 9)
        )
    )
    s = supc.select(
        "s_suppkey",
        F.col("cell_lat").alias("ncell_lat"),
        F.col("cell_lon").alias("ncell_lon"),
        F.col("lat").alias("slat"),
        F.col("lon").alias("slon"),
    )
    hav = (
        F.pow(F.sin(F.radians(F.col("slat") - F.col("lat")) / 2), 2)
        + F.cos(F.radians("lat"))
        * F.cos(F.radians("slat"))
        * F.pow(F.sin(F.radians(F.col("slon") - F.col("lon")) / 2), 2)
    )
    d_km = F.round(
        F.lit(2.0) * F.lit(6371).cast("double") * F.asin(F.sqrt(hav)), 6
    )
    cand = probe.join(F.broadcast(s), ["ncell_lat", "ncell_lon"]).select(
        "c_custkey", "s_suppkey", d_km.alias("d_km")
    )
    wv = Window.partitionBy("c_custkey")
    ranked = cand.select(
        "c_custkey",
        "s_suppkey",
        "d_km",
        F.row_number()
        .over(wv.orderBy("d_km", "s_suppkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wv).alias("n_candidates"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "c_custkey",
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.col("d_km").alias("distance_km"),
        F.col("n_candidates").cast("int").alias("n_candidates"),
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users via HLL sketch algebra: the rolling
# DAU/WAU board metric. Exact sliding distinct decomposes as a
# bounded 7x day-replication (each (day, user) pair serves the 7
# windows that contain it); the sketch path merges the SAME persisted
# daily sketches over a 7-row frame — no re-read of raw events, the
# rollup-table pattern that survives 100 TB.
# ---------------------------------------------------------------------------


@_q(
    "sliding_distinct_users_hll",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    win AS (
        SELECT d.day AS win_end, du.user_id, du.day AS src_day
        FROM days d
        JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    )
    SELECT win_end,
           CAST(COUNT(DISTINCT src_day) AS INTEGER) AS n_days_in_window,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_7d,
           TRUE AS merged_within_5pct
    FROM win
    GROUP BY win_end
    """,
)
def sliding_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day, twice: EXACTLY (each
    distinct (day, user) pair replicated to the <=7 windows that
    contain it — a bounded fan-out + one distinct agg, the
    scale-safe decomposition of sliding COUNT DISTINCT) and
    approximately by merging per-day DataSketches HLL sketches over
    a 7-row window frame (`hll_union_agg` OVER) — zero re-reads of
    raw events, the persisted-rollup pattern. Sketch bytes are
    engine-specific (the hll_sketch_weekly_users policy), so the
    portable claim is the 5% bound boolean the oracle asserts TRUE;
    the exact side hash-matches outright."""
    ev = read_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    win = days.select(F.col("day").alias("win_end")).join(
        du,
        (F.col("day") >= F.date_sub(F.col("win_end"), 6))
        & (F.col("day") <= F.col("win_end")),
    )
    exact = win.groupBy("win_end").agg(
        F.countDistinct("day").cast("int").alias("n_days_in_window"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users_7d"),
    )
    daily_sk = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("_sketch")
    )
    wf = Window.orderBy("day").rowsBetween(-6, 0)
    est = daily_sk.select(
        F.col("day").alias("win_end"),
        F.hll_sketch_estimate(F.hll_union_agg("_sketch").over(wf)).alias(
            "_est"
        ),
    )
    return exact.join(est, "win_end").select(
        "win_end",
        "n_days_in_window",
        "exact_users_7d",
        (
            F.abs(F.col("_est") - F.col("exact_users_7d"))
            <= 0.05 * F.col("exact_users_7d")
        ).alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Top journey trigrams: the 3-step upgrade of the Markov transition
# matrix — which exact event-type PATHS dominate user behavior. The
# per-user ordered collect is the bounded-entity-history contract;
# the trigram expansion reuses ngram_array (codegen-safe zip_with).
# ---------------------------------------------------------------------------


@_q(
    "top_event_trigram_paths",
    """
    WITH seqs AS (
        SELECT user_id,
               list(event_type ORDER BY epoch_us(ts), event_id) AS types
        FROM events GROUP BY user_id
    ),
    tri AS (
        SELECT unnest(list_transform(
                   range(1, len(types) - 1),
                   i -> types[i] || ' ' || types[i + 1] || ' '
                        || types[i + 2])) AS path
        FROM seqs WHERE len(types) >= 3
    ),
    c AS (SELECT path, COUNT(*) AS n_occurrences FROM tri GROUP BY path)
    SELECT path, n_occurrences,
           CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path)
                AS INTEGER) AS rnk
    FROM c
    ORDER BY n_occurrences DESC, path
    LIMIT 20
    """,
)
def top_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event-type journeys across all users:
    per-user type sequences (one shuffle on user_id, history bounded
    per entity), trigram expansion via the zip_with ngram builder,
    one partial-aggregatable count on the <= |types|^3 = 125 path
    domain, and a TakeOrdered top-k. Exact integers; ties break on
    the path string so the rank is total."""
    from ..operators.dedup import ngram_array

    ev = read_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                F.col("event_id").alias("e"),
                F.col("event_type").alias("y"),
            ).alias("_s"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("_s")).alias("_arr"))
        .select(
            F.transform(F.col("_arr"), lambda s: s["y"]).alias("types")
        )
        .where(F.size("types") >= 3)
    )
    tri = seqs.select(
        F.explode(ngram_array(F.col("types"), 3)).alias("path")
    )
    c = tri.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return (
        c.orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(20)
        .select(
            "path",
            "n_occurrences",
            F.row_number()
            .over(Window.orderBy(F.desc("n_occurrences"), F.asc("path")))
            .cast("int")
            .alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Sequential probability ratio test (Wald 1945): the ALWAYS-VALID
# monitoring twin of the fixed-horizon ab_test_ztest — peek at the
# cumulative log-likelihood ratio every day and stop the moment a
# boundary is crossed, with error rates guaranteed by construction.
# Counts are exact ints; the LLR composes two Python-computed literal
# doubles (the fs_weights literal discipline) on the 1e-9 grid.
# ---------------------------------------------------------------------------

import math as _math

_SPRT_P0, _SPRT_P1 = 0.25, 0.20
_SPRT_LW = _math.log(_SPRT_P1 / _SPRT_P0)          # per-conversion term
_SPRT_LL = _math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))  # per-miss term
_SPRT_LNA = _math.log(19.0)    # (1-beta)/alpha at alpha=beta=0.05
_SPRT_LNB = -_math.log(19.0)   # beta/(1-alpha)


@_q(
    "ab_test_sprt",
    f"""
    WITH b AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events
        WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
              NOT IN ('0','1','2','3','4','5','6','7')
        GROUP BY 1
    ),
    c AS (
        SELECT day,
               CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
               CAST(SUM(k) OVER w AS BIGINT) AS k_cum
        FROM b
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, n_cum, k_cum,
           ROUND(k_cum * CAST({_SPRT_LW!r} AS DOUBLE)
                 + (n_cum - k_cum) * CAST({_SPRT_LL!r} AS DOUBLE), 9)
               AS llr,
           CASE WHEN k_cum * CAST({_SPRT_LW!r} AS DOUBLE)
                     + (n_cum - k_cum) * CAST({_SPRT_LL!r} AS DOUBLE)
                     >= CAST({_SPRT_LNA!r} AS DOUBLE) THEN 'accept_h1'
                WHEN k_cum * CAST({_SPRT_LW!r} AS DOUBLE)
                     + (n_cum - k_cum) * CAST({_SPRT_LL!r} AS DOUBLE)
                     <= CAST({_SPRT_LNB!r} AS DOUBLE) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c
    """,
)
def ab_test_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over the B-variant's daily conversion stream
    (deterministic md5 user split, conversion = purchase): cumulative
    LLR_t = K·ln(p1/p0) + (N−K)·ln((1−p1)/(1−p0)) against H0 p=0.25
    vs H1 p=0.20, boundaries ±ln 19 (α=β=0.05) — hypotheses chosen so
    the ~0.20 conversion stream actually CROSSES a boundary at every
    tested SF (a permanently 'continue' decision column would be a
    vacuous oracle). Unlike the z-test,
    the decision column is VALID at every row — this is the query a
    live experiment dashboard polls daily. Cumulative counts ride a
    calendar-bounded window (≤ days rows); the two ln constants are
    Python-computed literals inlined into BOTH plans (a bare decimal
    literal would parse as DECIMAL in DuckDB — the fs_weights
    discipline), so the LLR is a deterministic mul/add chain on the
    1e-9 grid."""
    ev = read_table(spark, sf_dir, "events")
    nib = F.substring(
        F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
    )
    b = (
        ev.where(~nib.isin(*"01234567"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = b.select(
        "day",
        F.sum("n").over(w).cast("bigint").alias("n_cum"),
        F.sum("k").over(w).cast("bigint").alias("k_cum"),
    )
    llr_raw = F.col("k_cum") * F.lit(_SPRT_LW) + (
        F.col("n_cum") - F.col("k_cum")
    ) * F.lit(_SPRT_LL)
    decision = (
        F.when(llr_raw >= F.lit(_SPRT_LNA), F.lit("accept_h1"))
        .when(llr_raw <= F.lit(_SPRT_LNB), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return c.select(
        "day",
        "n_cum",
        "k_cum",
        F.round(llr_raw, 9).alias("llr"),
        decision.alias("decision"),
    )


# ---------------------------------------------------------------------------
# Sequence-packing efficiency report: the number a pretraining
# exporter actually optimizes — what fraction of every context
# window is padding under each packing policy. Pure integer
# arithmetic over the same BPE-ish token counts as pack_token_budget;
# the doc-boundary policy reuses the hierarchical prefix sum.
# ---------------------------------------------------------------------------


@_q(
    "padding_waste_report",
    r"""
    WITH toks AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                   AS n_tok
        FROM documents
    ),
    tot AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total
        FROM toks
    ),
    cum AS (
        SELECT doc_id, n_tok,
               CAST(SUM(n_tok) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS running
        FROM toks
    ),
    shards AS (
        SELECT (running - 1) // 512 AS shard_id,
               CAST(SUM(n_tok) AS BIGINT) AS st
        FROM cum GROUP BY 1
    ),
    p1 AS (
        SELECT 'one_doc_per_seq' AS policy,
               CAST(t.n_docs AS BIGINT) AS n_sequences,
               CAST(SUM(512 - LEAST(x.n_tok, 512)) AS BIGINT)
                   AS padding_tokens,
               CAST(SUM(GREATEST(x.n_tok - 512, 0)) AS BIGINT)
                   AS overflow_tokens
        FROM toks x CROSS JOIN tot t
        GROUP BY t.n_docs
    ),
    p2 AS (
        SELECT 'concat_stream' AS policy,
               (total + 511) // 512 AS n_sequences,
               ((total + 511) // 512) * 512 - total AS padding_tokens,
               CAST(0 AS BIGINT) AS overflow_tokens
        FROM tot
    ),
    p3 AS (
        SELECT 'doc_boundary_shards' AS policy,
               CAST(COUNT(*) AS BIGINT) AS n_sequences,
               CAST(SUM(GREATEST(512 - st, 0)) AS BIGINT) AS padding_tokens,
               CAST(SUM(GREATEST(st - 512, 0)) AS BIGINT) AS overflow_tokens
        FROM shards
    ),
    u AS (
        SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL
        SELECT * FROM p3
    )
    SELECT u.policy, u.n_sequences, t.total AS total_tokens,
           u.padding_tokens, u.overflow_tokens,
           ROUND(CAST(u.padding_tokens AS DOUBLE)
                 / CAST(u.n_sequences * 512 AS DOUBLE), 9)
               AS padding_fraction
    FROM u CROSS JOIN tot t
    """,
)
def padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding/overflow audit of three context-window (L=512) packing
    policies over the same BPE-ish token counts: one-doc-per-sequence
    (truncate long docs, pad the rest), concat-stream (split at every
    L tokens — only the final window pads), and doc-boundary shards
    (the pack_token_budget running-sum policy — docs never split, so
    a shard can pad OR overflow). Every count is an exact integer;
    padding_fraction is one divide of exact ints on the 1e-9 grid.
    The doc-boundary branch rides the hierarchical prefix sum; the
    others are single partial-aggregatable passes."""
    from ..operators.prefix import prefix_sum

    L = 512
    docs = read_table(spark, sf_dir, "documents")
    n_tok = textfn.token_count_bpe_ish("text")
    toks = docs.select("doc_id", n_tok.alias("n_tok"))
    tot = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total"),
    )
    p1 = toks.crossJoin(F.broadcast(tot)).groupBy("n_docs").agg(
        F.sum(F.lit(L) - F.least(F.col("n_tok"), F.lit(L)))
        .cast("bigint")
        .alias("padding_tokens"),
        F.sum(F.greatest(F.col("n_tok") - L, F.lit(0)))
        .cast("bigint")
        .alias("overflow_tokens"),
    ).select(
        F.lit("one_doc_per_seq").alias("policy"),
        F.col("n_docs").cast("bigint").alias("n_sequences"),
        "padding_tokens",
        "overflow_tokens",
    )
    p2 = tot.select(
        F.lit("concat_stream").alias("policy"),
        F.expr(f"(total + {L - 1}) DIV {L}").alias("n_sequences"),
        (
            F.expr(f"(total + {L - 1}) DIV {L}") * L - F.col("total")
        ).alias("padding_tokens"),
        F.lit(0).cast("bigint").alias("overflow_tokens"),
    )
    cum = prefix_sum(
        toks, order_col="doc_id", value_col="n_tok", out_col="running"
    )
    shards = cum.groupBy(
        F.expr(f"(running - 1) DIV {L}").alias("shard_id")
    ).agg(F.sum("n_tok").cast("bigint").alias("st"))
    p3 = shards.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sequences"),
        F.sum(F.greatest(F.lit(L) - F.col("st"), F.lit(0)))
        .cast("bigint")
        .alias("padding_tokens"),
        F.sum(F.greatest(F.col("st") - L, F.lit(0)))
        .cast("bigint")
        .alias("overflow_tokens"),
    ).select(
        F.lit("doc_boundary_shards").alias("policy"),
        "n_sequences",
        "padding_tokens",
        "overflow_tokens",
    )
    u = p1.unionByName(p2).unionByName(p3)
    return u.crossJoin(F.broadcast(tot.select("total"))).select(
        "policy",
        "n_sequences",
        F.col("total").alias("total_tokens"),
        "padding_tokens",
        "overflow_tokens",
        F.round(
            F.col("padding_tokens").cast("double")
            / (F.col("n_sequences") * L).cast("double"),
            9,
        ).alias("padding_fraction"),
    )


# ---------------------------------------------------------------------------
# Differentially-private release (Dwork et al. 2006): the per-slice
# count histogram a pipeline publishes about a private corpus, with
# Laplace(1/ε) noise per cell. Event-level DP (sensitivity 1: adding
# or removing one event changes one cell by 1). Exact counts are the
# usual partial/final hash agg; the noise is a per-group scalar from
# the deterministic md5 uniform (functions/privacy.py) so both
# engines draw the SAME noise — production swaps in a crypto RNG.
# ---------------------------------------------------------------------------


@_q(
    "dp_noisy_type_daily",
    f"""
    WITH g AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS true_n
        FROM events GROUP BY 1, 2
    ),
    n AS (
        SELECT day, event_type, true_n,
               {privacy.DETERMINISTIC_UNIFORM_SQL.format(
                   key="CAST(day AS VARCHAR) || '|' || event_type"
               )} AS u
        FROM g
    )
    SELECT day, event_type, CAST(true_n AS INTEGER) AS true_n,
           ROUND({privacy.laplace_noise_sql("u", 1.0)}, 6) AS laplace_noise,
           ROUND(true_n + ({privacy.laplace_noise_sql("u", 1.0)}), 6)
               AS noisy_n,
           abs(ROUND({privacy.laplace_noise_sql("u", 1.0)}, 6)) <= 37.5
               AS noise_bounded
    FROM n
    """,
)
def dp_noisy_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 DP daily event-type histogram. One shuffle (the count);
    the Laplace draw is a scalar expression per output cell, so the
    DP release adds zero distributed cost at any scale. The
    `noise_bounded` column checks the |noise| ≤ scale·ln 2^54 bound
    as an in-query assertion."""
    from ..functions import privacy as priv

    ev = read_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("true_n"))
    u = priv.deterministic_uniform(
        F.concat(
            F.col("day").cast("string"), F.lit("|"), F.col("event_type")
        )
    )
    noise = priv.laplace_noise(u, 1.0)
    n = g.select("day", "event_type", "true_n", noise.alias("_noise"))
    return n.select(
        "day",
        "event_type",
        F.col("true_n").cast("int").alias("true_n"),
        F.round(F.col("_noise"), 6).alias("laplace_noise"),
        F.round(F.col("true_n") + F.col("_noise"), 6).alias("noisy_n"),
        (F.abs(F.round(F.col("_noise"), 6)) <= 37.5).alias("noise_bounded"),
    )


# ---------------------------------------------------------------------------
# Multi-feature ridge regression via distributed normal equations:
# (XᵀX + λI)β = Xᵀy solved in closed form (Cramer) from one pass of
# EXACT integer moment sums — the standard single-shuffle distributed
# linear regression (the 2-feature generalization of
# brand_price_regression's 1-feature OLS). Moments are exact int64
# (all < 2^53 at sf0.1, so the HUGEINT/DECIMAL intermediates convert
# to bit-identical doubles); the Cramer expressions are ONE shared
# SQL fragment evaluated by both engines in the same operation order.
# ---------------------------------------------------------------------------

# Shared closed-form fragments over moment columns n,s1,s2,s11,s12,
# s22,sy,s1y,s2y (λ ridge on the two slope diagonals, intercept
# unpenalized). Built once; used verbatim in the oracle SQL and via
# F.expr on the Spark side so FMA/ordering is identical.
_RIDGE_LAMBDA = 100.0


def _ridge_fragments(lam: float) -> dict[str, str]:
    d = {
        k: f"CAST({k} AS DOUBLE)"
        for k in ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
    }
    a11 = f"({d['s11']} + {lam!r})"
    a22 = f"({d['s22']} + {lam!r})"
    n, s1, s2, s12 = d["n"], d["s1"], d["s2"], d["s12"]
    sy, s1y, s2y = d["sy"], d["s1y"], d["s2y"]
    det = (
        f"({n} * ({a11} * {a22} - {s12} * {s12})"
        f" - {s1} * ({s1} * {a22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s12} - {a11} * {s2}))"
    )
    det0 = (
        f"({sy} * ({a11} * {a22} - {s12} * {s12})"
        f" - {s1} * ({s1y} * {a22} - {s12} * {s2y})"
        f" + {s2} * ({s1y} * {s12} - {a11} * {s2y}))"
    )
    det1 = (
        f"({n} * ({s1y} * {a22} - {s12} * {s2y})"
        f" - {sy} * ({s1} * {a22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
    )
    det2 = (
        f"({n} * ({a11} * {s2y} - {s1y} * {s12})"
        f" - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
        f" + {sy} * ({s1} * {s12} - {a11} * {s2}))"
    )
    return {
        "b0": f"ROUND({det0} / {det}, 6)",
        "b1": f"ROUND({det1} / {det}, 6)",
        "b2": f"ROUND({det2} / {det}, 6)",
    }


_RIDGE_F = _ridge_fragments(_RIDGE_LAMBDA)


@_q(
    "lineitem_ridge_regression",
    f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS s2,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s11,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS s12,
               SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS s22,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS sy,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS s1y,
               SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS s2y
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS INTEGER) AS n_rows,
           {_RIDGE_F['b0']} AS beta0_cents,
           {_RIDGE_F['b1']} AS beta1_cents_per_qty,
           {_RIDGE_F['b2']} AS beta2_cents_per_disc_cent
    FROM m
    """,
)
def lineitem_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-cents ~ quantity + discount-cents ridge (λ=100) per
    return flag. One partial/final integer aggregation per group —
    the 9 moments are the ONLY state that moves, so the plan is the
    same at 100 TB (sums would move to DECIMAL(38,0) above ~2^53
    rows·maxterm; asserted in docs). The 3×3 solve is a scalar
    expression per group, shared textually with the oracle."""
    li = read_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("bigint")
    x2 = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    m = (
        li.select(
            "l_returnflag", x1.alias("_x1"), x2.alias("_x2"), y.alias("_y")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_x1").alias("s1"),
            F.sum("_x2").alias("s2"),
            F.sum(F.col("_x1") * F.col("_x1")).alias("s11"),
            F.sum(F.col("_x1") * F.col("_x2")).alias("s12"),
            F.sum(F.col("_x2") * F.col("_x2")).alias("s22"),
            F.sum("_y").alias("sy"),
            F.sum(F.col("_x1") * F.col("_y")).alias("s1y"),
            F.sum(F.col("_x2") * F.col("_y")).alias("s2y"),
        )
    )
    return m.select(
        "l_returnflag",
        F.col("n").cast("int").alias("n_rows"),
        F.expr(_RIDGE_F["b0"]).alias("beta0_cents"),
        F.expr(_RIDGE_F["b1"]).alias("beta1_cents_per_qty"),
        F.expr(_RIDGE_F["b2"]).alias("beta2_cents_per_disc_cent"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (pool-adjacent-violators, Ayer et al. 1955)
# of the quality-score reliability diagram: the monotone-regression
# fit iso_k = max_{i≤k} min_{j≥k} pooled-rate(i..j) computed by the
# minimax identity over bin prefix sums — O(B³) on the B≈10 BINS,
# i.e. driver-free and constant-cost no matter the corpus size. The
# distributed part is exactly quality_calibration_bins' one agg; the
# PAV solve runs on the domain-sized bins frame. Block rates are
# ratios of identical exact ints, and min/max select from identical
# double sets, so the fit is engine-reproducible; ROUND(,9) guards
# the terminal.
# ---------------------------------------------------------------------------


@_q(
    "quality_isotonic_calibration",
    f"""
    WITH {_QUALITY_SCORED_CTES},
    bins AS (
        SELECT CAST(LEAST(CAST(floor(q * 50) AS BIGINT), 49) AS INTEGER)
                   AS bin,
               COUNT(*) AS nb, count_if(gopher_pass) AS pb
        FROM scored GROUP BY bin
    ),
    pref AS (
        SELECT bin, nb, pb,
               SUM(nb) OVER (ORDER BY bin) AS cn,
               SUM(pb) OVER (ORDER BY bin) AS cp
        FROM bins
    ),
    pairs AS (
        SELECT i.bin AS i, j.bin AS j,
               CAST(j.cp - (i.cp - i.pb) AS DOUBLE)
                   / CAST(j.cn - (i.cn - i.nb) AS DOUBLE) AS block_avg
        FROM pref i JOIN pref j ON i.bin <= j.bin
    ),
    minj AS (
        SELECT p.i, k.bin AS k, MIN(p.block_avg) AS lo
        FROM pairs p JOIN pref k ON p.j >= k.bin AND p.i <= k.bin
        GROUP BY p.i, k.bin
    ),
    iso AS (SELECT k, MAX(lo) AS iso_rate FROM minj GROUP BY k)
    SELECT b.bin, CAST(b.nb AS INTEGER) AS n_docs,
           CAST(b.pb AS INTEGER) AS n_pass,
           CAST(b.pb AS DOUBLE) / b.nb AS raw_rate,
           ROUND(i.iso_rate, 9) AS iso_rate,
           COALESCE(ROUND(i.iso_rate, 9) >=
                    LAG(ROUND(i.iso_rate, 9)) OVER (ORDER BY b.bin),
                    TRUE) AS monotone_ok
    FROM bins b JOIN iso i ON b.bin = i.k
    """,
)
def quality_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAV-calibrated pass rate per quality 1/50-bin (finer than the
    calibration-bins deciles so adjacent-violator pooling genuinely
    fires). One corpus scan + one domain-sized agg; the minimax
    solve joins the ≤50-row bins frame against itself — broadcast,
    constant work at any SF. The `monotone_ok` column asserts the
    PAV invariant in-query."""
    docs = read_table(spark, sf_dir, "documents")
    w_ = dedup.tokens("text")
    n_words = F.size(w_)
    n_alpha = F.size(F.filter(w_, lambda x: x.rlike("[a-z]")))
    n_chars = F.length(F.array_join(w_, ""))
    n_stop = F.array_contains(w_, "the").cast("int") + F.array_contains(
        w_, "a"
    ).cast("int")
    gopher = (
        n_words.between(30, 5000)
        & (n_chars / n_words).between(3.0, 5.0)
        & (n_alpha / n_words.cast("double") >= 0.9)
        & (n_stop >= 2)
    )
    q = F.round(textfn.quality_score(F.col("text")), 4)
    scored = docs.where(n_words > 0).select(
        gopher.alias("gopher_pass"), q.alias("q")
    )
    b = F.least(F.floor(F.col("q") * 50).cast("bigint"), F.lit(49)).cast(
        "int"
    )
    bins = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.col("gopher_pass").cast("int")).cast("bigint").alias("pb"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin",
        "nb",
        "pb",
        F.sum("nb").over(w).alias("cn"),
        F.sum("pb").over(w).alias("cp"),
    ).localCheckpoint()
    i_, j_, k_ = pref.alias("i"), pref.alias("j"), pref.alias("k")
    pairs = i_.join(
        F.broadcast(j_), F.col("i.bin") <= F.col("j.bin")
    ).select(
        F.col("i.bin").alias("i"),
        F.col("j.bin").alias("j"),
        (
            (F.col("j.cp") - (F.col("i.cp") - F.col("i.pb"))).cast("double")
            / (F.col("j.cn") - (F.col("i.cn") - F.col("i.nb"))).cast(
                "double"
            )
        ).alias("block_avg"),
    )
    minj = (
        pairs.join(
            F.broadcast(k_),
            (F.col("j") >= F.col("k.bin")) & (F.col("i") <= F.col("k.bin")),
        )
        .groupBy(F.col("i"), F.col("k.bin").alias("k"))
        .agg(F.min("block_avg").alias("lo"))
    )
    iso = minj.groupBy("k").agg(F.max("lo").alias("iso_rate"))
    out = bins.join(iso, bins["bin"] == iso["k"]).select(
        "bin",
        F.col("nb").cast("int").alias("n_docs"),
        F.col("pb").cast("int").alias("n_pass"),
        (F.col("pb").cast("double") / F.col("nb")).alias("raw_rate"),
        F.round(F.col("iso_rate"), 9).alias("iso_rate"),
    )
    wlag = Window.orderBy("bin")
    return out.select(
        "bin",
        "n_docs",
        "n_pass",
        "raw_rate",
        "iso_rate",
        F.coalesce(
            F.col("iso_rate") >= F.lag("iso_rate").over(wlag), F.lit(True)
        ).alias("monotone_ok"),
    )


# ---------------------------------------------------------------------------
# EM estimation of the Fellegi-Sunter m/u parameters (Winkler 1988,
# the Splink/dedupe.io training step). operators/er.py's docstring
# said EM's float fixpoint was "not differential-testable" — this
# query retires that caveat. The trick: the sufficient statistics
# are just the 8 agreement-PATTERN counts (exact ints, one
# distributed agg over the blocked pairs); EM then runs as a fixed
# number of UNROLLED scalar iterations over ONE pivoted row, with
# every expression generated once in Python and evaluated verbatim
# by both engines — fixed operation order, no aggregation over
# floats, bit-identical trajectory. Distributed cost: exactly one
# pattern-count aggregation; the solve is O(8·iters) scalar work.
# ---------------------------------------------------------------------------

_EM_CLAMP_LO = "CAST(0.000001 AS DOUBLE)"
_EM_CLAMP_HI = "CAST(0.999999 AS DOUBLE)"


def _fs_em_w_exprs() -> list[str]:
    """w_g = p·P(γ_g|M) / (p·P(γ_g|M) + (1−p)·P(γ_g|U)) for the 8
    patterns, as SQL text over columns p, m1..m3, u1..u3. Pattern
    index g: bit2=name, bit1=nation, bit0=bal."""
    out = []
    for g in range(8):
        bits = ((g >> 2) & 1, (g >> 1) & 1, g & 1)
        pm = " * ".join(
            f"m{i + 1}" if b else f"(1.0 - m{i + 1})"
            for i, b in enumerate(bits)
        )
        pu = " * ".join(
            f"u{i + 1}" if b else f"(1.0 - u{i + 1})"
            for i, b in enumerate(bits)
        )
        out.append(
            f"(p * ({pm})) / (p * ({pm}) + (1.0 - p) * ({pu})) AS w{g}"
        )
    return out


def _fs_em_update_exprs() -> list[str]:
    """One EM M-step over the w0..w7 / c0..c7 columns: p, m_i, u_i
    updates as fixed-order sums, clamped into (0, 1)."""
    tw = " + ".join(f"c{g} * w{g}" for g in range(8))
    n = " + ".join(f"c{g}" for g in range(8))
    upd = [f"LEAST(GREATEST(({tw}) / ({n}), {_EM_CLAMP_LO}), {_EM_CLAMP_HI}) AS p"]
    for i in range(3):
        bit = 2 - i  # field i+1 agrees when pattern bit (2-i) is set
        on = [g for g in range(8) if (g >> bit) & 1]
        num_m = " + ".join(f"c{g} * w{g}" for g in on)
        num_u = " + ".join(f"c{g} * (1.0 - w{g})" for g in on)
        upd.append(
            f"LEAST(GREATEST(({num_m}) / ({tw}), {_EM_CLAMP_LO}), "
            f"{_EM_CLAMP_HI}) AS m{i + 1}"
        )
        upd.append(
            f"LEAST(GREATEST(({num_u}) / (({n}) - ({tw})), {_EM_CLAMP_LO}), "
            f"{_EM_CLAMP_HI}) AS u{i + 1}"
        )
    return upd


_FS_EM_ITERS = 8
_FS_EM_INIT = (
    "CAST(0.1 AS DOUBLE) AS p, "
    "CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2, "
    "CAST(0.9 AS DOUBLE) AS m3, "
    "CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2, "
    "CAST(0.1 AS DOUBLE) AS u3"
)
_FS_EM_COUNT_EXPRS = [
    "CAST(count_if("
    + " AND ".join(
        c if b else f"NOT {c}"
        for c, b in zip(
            ["agree_name", "agree_nation", "agree_bal"],
            [(g >> 2) & 1, (g >> 1) & 1, g & 1],
        )
    )
    + f") AS DOUBLE) AS c{g}"
    for g in range(8)
]


def _fs_em_oracle() -> str:
    cs = ", ".join(f"c{g}" for g in range(8))
    chain = [f"e0 AS (SELECT {cs}, {_FS_EM_INIT} FROM counts)"]
    for k in range(_FS_EM_ITERS):
        chain.append(
            f"e{k}w AS (SELECT *, {', '.join(_fs_em_w_exprs())} FROM e{k})"
        )
        chain.append(
            f"e{k + 1} AS (SELECT {cs}, "
            f"{', '.join(_fs_em_update_exprs())} FROM e{k}w)"
        )
    n = " + ".join(f"c{g}" for g in range(8))
    return f"""
    WITH c AS (
        SELECT c_custkey, c_mktsegment, c_name, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM customer WHERE c_custkey % 10 = 0
    ),
    pr AS (
        SELECT ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.95
                   AS agree_name,
               a.c_nationkey = b.c_nationkey AS agree_nation,
               ABS(a.cents - b.cents) <= 10000 AS agree_bal
        FROM c a JOIN c b
          ON a.c_mktsegment = b.c_mktsegment AND a.c_custkey < b.c_custkey
    ),
    counts AS (SELECT {', '.join(_FS_EM_COUNT_EXPRS)} FROM pr),
    {', '.join(chain)},
    fin AS (SELECT *, CAST(({n}) AS BIGINT) AS n_pairs
            FROM e{_FS_EM_ITERS})
    SELECT 'name' AS field, ROUND(m1, 9) AS m_est, ROUND(u1, 9) AS u_est,
           ROUND(p, 9) AS lambda_est, CAST(n_pairs AS INTEGER) AS n_pairs
    FROM fin
    UNION ALL
    SELECT 'nation', ROUND(m2, 9), ROUND(u2, 9), ROUND(p, 9),
           CAST(n_pairs AS INTEGER) FROM fin
    UNION ALL
    SELECT 'bal', ROUND(m3, 9), ROUND(u3, 9), ROUND(p, 9),
           CAST(n_pairs AS INTEGER) FROM fin
    """


@_q("fs_em_weights", _fs_em_oracle())
def fs_em_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM-trained Fellegi-Sunter parameters over the same blocked
    customer pairs as customer_fellegi_sunter. One distributed agg
    (the 8 pattern counts); {iters} unrolled EM iterations as scalar
    selectExpr passes over the pivoted 1-row frame — the generated
    expression text is shared verbatim with the oracle, so the float
    trajectory is fixed-order-identical on both engines. At 100 TB
    only the pattern-count agg scales; the solve is constant."""
    jw = textfn.jaro_winkler_pandas_udf()
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 10 == 0
    )
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_na"),
        F.col("c_nationkey").alias("_ga"),
        cents.alias("_ca"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_name").alias("_nb"),
        F.col("c_nationkey").alias("_gb"),
        cents.alias("_cb"),
    )
    pairs = (
        a.join(b, "segment")
        .where(F.col("key_a") < F.col("key_b"))
        .select(
            (F.round(jw(F.col("_na"), F.col("_nb")), 6) >= 0.95).alias(
                "agree_name"
            ),
            (F.col("_ga") == F.col("_gb")).alias("agree_nation"),
            (F.abs(F.col("_ca") - F.col("_cb")) <= 10000).alias("agree_bal"),
        )
    )
    state = pairs.selectExpr(*_FS_EM_COUNT_EXPRS).selectExpr(
        "*", *_FS_EM_INIT.split(", ")
    )
    for _ in range(_FS_EM_ITERS):
        state = state.selectExpr("*", *_fs_em_w_exprs())
        state = state.selectExpr(
            *[f"c{g}" for g in range(8)], *_fs_em_update_exprs()
        )
    n = " + ".join(f"c{g}" for g in range(8))
    fin = state.selectExpr("*", f"CAST(({n}) AS BIGINT) AS n_pairs")
    return fin.selectExpr(
        "stack(3, 'name', ROUND(m1, 9), ROUND(u1, 9), "
        "'nation', ROUND(m2, 9), ROUND(u2, 9), "
        "'bal', ROUND(m3, 9), ROUND(u3, 9)) AS (field, m_est, u_est)",
        "ROUND(p, 9) AS lambda_est",
        "CAST(n_pairs AS INTEGER) AS n_pairs",
    )


fs_em_weights.__doc__ = fs_em_weights.__doc__.format(iters=_FS_EM_ITERS)


# ---------------------------------------------------------------------------
# DP median via the exponential mechanism (McSherry & Talwar 2007)
# in its report-noisy-max form: score every candidate bucket by
# ε·u/(2Δu) with the median utility u(b) = −|2·cum(b) − n| (exact
# even ints, Δu = 2), add deterministic Gumbel noise, take the
# argmax. The second DP primitive next to the Laplace release —
# selection queries (median, mode, best split) can't be answered by
# adding noise to the output value; the exponential mechanism is the
# standard tool. Distributed cost: one bucket aggregation; the
# scoring/argmax runs on the domain-sized bucket frame.
# ---------------------------------------------------------------------------


@_q(
    "dp_median_exponential",
    f"""
    WITH b AS (
        SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 10000)
                    AS BIGINT) AS bucket,
               COUNT(*) AS nb
        FROM orders GROUP BY bucket
    ),
    c AS (
        SELECT bucket, nb,
               SUM(nb) OVER (ORDER BY bucket) AS cum,
               SUM(nb) OVER () AS n
        FROM b
    ),
    s AS (
        SELECT bucket, nb, cum, n,
               -abs(2 * cum - n) AS util,
               {privacy.DETERMINISTIC_UNIFORM_SQL.format(
                   key="'dpmed|' || CAST(bucket AS VARCHAR)"
               )} AS u
        FROM c
    ),
    g AS (
        SELECT bucket, nb, util, n,
               ROUND(CAST(util AS DOUBLE) / 4.0
                     + ({privacy.gumbel_noise_sql('u')}), 6) AS noisy_score
        FROM s
    ),
    r AS (
        SELECT bucket, CAST(nb AS INTEGER) AS n_orders,
               CAST(util AS BIGINT) AS utility,
               noisy_score,
               RANK() OVER (ORDER BY noisy_score DESC, bucket) AS rk
        FROM g
    )
    SELECT bucket, n_orders, utility, noisy_score,
           CAST(rk AS INTEGER) AS noisy_rank,
           rk = 1 AS is_dp_choice
    FROM r WHERE rk <= 10
    """,
)
def dp_median_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 DP median bucket of order totalprice ($100 buckets): top
    10 candidates by Gumbel-noised utility, the argmax being the DP
    release. One shuffle (bucket counts); every window runs over the
    price-domain-sized bucket frame (~tens of rows at any SF). Ranks
    compare ROUND(,6)-gridded scores with a bucket tie-break, so the
    ordering is engine-stable."""
    from ..functions import privacy as priv

    orders = read_table(spark, sf_dir, "orders")
    b = orders.groupBy(
        F.floor(F.col("o_totalprice").cast("decimal(18,2)") / 10000)
        .cast("bigint")
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("nb"))
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        "bucket",
        "nb",
        F.sum("nb").over(wcum).alias("cum"),
        F.sum("nb").over(wall).alias("n"),
    )
    u = priv.deterministic_uniform(
        F.concat(F.lit("dpmed|"), F.col("bucket").cast("string"))
    )
    s = c.select(
        "bucket",
        "nb",
        (-F.abs(2 * F.col("cum") - F.col("n"))).alias("util"),
        u.alias("u"),
    )
    g = s.select(
        "bucket",
        "nb",
        "util",
        F.round(
            F.col("util").cast("double") / 4.0 + priv.gumbel_noise(F.col("u")),
            6,
        ).alias("noisy_score"),
    )
    wrk = Window.orderBy(F.desc("noisy_score"), F.asc("bucket"))
    r = g.select(
        "bucket",
        F.col("nb").cast("int").alias("n_orders"),
        F.col("util").cast("bigint").alias("utility"),
        "noisy_score",
        F.rank().over(wrk).alias("rk"),
    )
    return r.where(F.col("rk") <= 10).select(
        "bucket",
        "n_orders",
        "utility",
        "noisy_score",
        F.col("rk").cast("int").alias("noisy_rank"),
        (F.col("rk") == 1).alias("is_dp_choice"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences (the workhorse quasi-experimental
# estimator): outcome = event value cents, treatment = even user_id
# (synthetic exposure cohort), post = second half of the month. The
# DiD estimate per event type is (ΔT) − (ΔC) of group means — four
# exact integer (sum, count) pairs per type, one partial/final agg,
# closed form on the 5-row result. Group means are double divisions
# of identical exact ints; the estimate is a fixed-order expression;
# ROUND(,6) guards the terminal.
# ---------------------------------------------------------------------------


@_q(
    "purchase_diff_in_diff",
    """
    WITH e AS (
        SELECT event_type,
               user_id % 2 = 0 AS treated,
               CAST(ts AS DATE) >= DATE '2024-01-16' AS post,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT event_type,
               SUM(cents) FILTER (WHERE treated AND post) AS s_tp,
               COUNT(*) FILTER (WHERE treated AND post) AS n_tp,
               SUM(cents) FILTER (WHERE treated AND NOT post) AS s_ta,
               COUNT(*) FILTER (WHERE treated AND NOT post) AS n_ta,
               SUM(cents) FILTER (WHERE NOT treated AND post) AS s_cp,
               COUNT(*) FILTER (WHERE NOT treated AND post) AS n_cp,
               SUM(cents) FILTER (WHERE NOT treated AND NOT post) AS s_ca,
               COUNT(*) FILTER (WHERE NOT treated AND NOT post) AS n_ca
        FROM e GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_tp + n_ta AS INTEGER) AS n_treated,
           CAST(n_cp + n_ca AS INTEGER) AS n_control,
           ROUND(CAST(s_tp AS DOUBLE) / n_tp
                 - CAST(s_ta AS DOUBLE) / n_ta, 6) AS delta_treated_cents,
           ROUND(CAST(s_cp AS DOUBLE) / n_cp
                 - CAST(s_ca AS DOUBLE) / n_ca, 6) AS delta_control_cents,
           ROUND((CAST(s_tp AS DOUBLE) / n_tp
                  - CAST(s_ta AS DOUBLE) / n_ta)
                 - (CAST(s_cp AS DOUBLE) / n_cp
                    - CAST(s_ca AS DOUBLE) / n_ca), 6) AS did_cents
    FROM m
    """,
)
def purchase_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD estimate of the post-period value shift per event type.
    One aggregation computes all eight (sum, count) cells via
    conditional aggregates — no per-cell scans, no joins; the
    estimator is scalar arithmetic on the types-sized result."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    e = ev.select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date")).alias(
            "post"
        ),
        cents.alias("cents"),
    )
    m = e.groupBy("event_type").agg(
        F.sum(F.when((F.col("treated")) & (F.col("post")), F.col("cents"))).alias("s_tp"),
        F.count(F.when((F.col("treated")) & (F.col("post")), F.lit(1))).alias("n_tp"),
        F.sum(F.when((F.col("treated")) & (~F.col("post")), F.col("cents"))).alias("s_ta"),
        F.count(F.when((F.col("treated")) & (~F.col("post")), F.lit(1))).alias("n_ta"),
        F.sum(F.when((~F.col("treated")) & (F.col("post")), F.col("cents"))).alias("s_cp"),
        F.count(F.when((~F.col("treated")) & (F.col("post")), F.lit(1))).alias("n_cp"),
        F.sum(F.when((~F.col("treated")) & (~F.col("post")), F.col("cents"))).alias("s_ca"),
        F.count(F.when((~F.col("treated")) & (~F.col("post")), F.lit(1))).alias("n_ca"),
    )
    dt = F.col("s_tp").cast("double") / F.col("n_tp") - F.col("s_ta").cast(
        "double"
    ) / F.col("n_ta")
    dc = F.col("s_cp").cast("double") / F.col("n_cp") - F.col("s_ca").cast(
        "double"
    ) / F.col("n_ca")
    return m.select(
        "event_type",
        (F.col("n_tp") + F.col("n_ta")).cast("int").alias("n_treated"),
        (F.col("n_cp") + F.col("n_ca")).cast("int").alias("n_control"),
        F.round(dt, 6).alias("delta_treated_cents"),
        F.round(dc, 6).alias("delta_control_cents"),
        F.round(dt - dc, 6).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility per language — the budgeting statistic a
# multilingual training pipeline tracks (how many subword tokens a
# word costs per language decides corpus mixing and cost forecasts).
# Fertility = Σ bpe-ish tokens / Σ whitespace words per language
# (ratio of exact corpus sums, not mean of per-doc ratios). Single
# scan + one language-domain-sized agg.
# ---------------------------------------------------------------------------


@_q(
    "lang_token_fertility",
    r"""
    WITH t AS (
        SELECT lang,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x <> '')) AS n_ws,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
               length(text) AS n_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS INTEGER) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS total_words,
           CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
           CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe) AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def lang_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword fertility and bytes-ish density per language over the
    ground-truth lang column. One projection (three counts per doc,
    all native regex/size expressions) + one 5-key agg — the
    canonical single-pass corpus statistic."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        textfn.token_count_ws("text").cast("bigint").alias("n_ws"),
        textfn.token_count_bpe_ish("text").cast("bigint").alias("n_bpe"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("total_words"),
        F.sum("n_bpe").cast("bigint").alias("total_tokens"),
        (F.sum("n_bpe").cast("double") / F.sum("n_ws")).alias("fertility"),
        (F.sum("n_chars").cast("double") / F.sum("n_bpe")).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# kNN-Shapley data valuation (Jia et al., PVLDB 2019): the exact
# Shapley value of every training point for an unweighted K-NN
# classifier has a closed form — a per-test-point suffix sum over
# distance ranks — so a quantity that naively costs 2^N coalition
# evaluations becomes one ranking window + one running sum. THE
# data-curation primitive: points with negative value are mislabeled
# or harmful; points with high value anchor their class. Terms are
# snapped to a 2^-40 fixed-point grid so every cross-engine sum is
# an exact integer sum (see operators/similarity.py:knn_shapley).
# ---------------------------------------------------------------------------


@_q(
    "knn_shapley_data_value",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
               label AS qlabel
        FROM embeddings WHERE vec_id < 8
    ),
    s AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(q.qe,
                   CAST(e.embedding AS DOUBLE[])) AS cos,
               CAST(e.label = q.qlabel AS INTEGER) AS m
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id >= 8
    ),
    r AS (
        SELECT query_id, vec_id, m,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id) AS i,
               COUNT(*) OVER (PARTITION BY query_id) AS n,
               LEAD(m) OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS mn
        FROM s
    ),
    t AS (
        SELECT query_id, vec_id, i,
               CAST(FLOOR((CASE WHEN i = n THEN CAST(m AS DOUBLE) / n
                                ELSE (m - mn) / 5 * least(5, i) / i END)
                          * 1099511627776.0 + 0.5) AS BIGINT) AS term_fp
        FROM r
    ),
    v AS (
        SELECT query_id, vec_id,
               SUM(term_fp) OVER (PARTITION BY query_id
                                  ORDER BY i DESC) AS s_fp
        FROM t
    )
    SELECT v.vec_id, e.label,
           CAST(SUM(v.s_fp) AS BIGINT) AS shapley_fp,
           CAST(SUM(v.s_fp) AS DOUBLE) / 8796093022208.0 AS shapley,
           SUM(v.s_fp) > 0 AS helpful
    FROM v JOIN embeddings e ON e.vec_id = v.vec_id
    GROUP BY v.vec_id, e.label
    """,
)
def knn_shapley_data_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-point value for the K=5-NN classifier over the 8
    held-out test embeddings: summed fixed-point Shapley + the
    double view + a `helpful` sign flag. The cross-test sum is an
    integer sum (order-free); `shapley` is one exact division.
    Plan: bounded test side broadcast, one corpus scan, per-query
    ranking/suffix windows, then a vec_id-keyed agg + label join."""
    emb = read_table(spark, sf_dir, "embeddings")
    tests = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("label").alias("qlabel"),
    )
    train = emb.where(F.col("vec_id") >= 8)
    vals = similarity.knn_shapley(
        train, tests, query_label_col="qlabel", k=5
    )
    agg = vals.groupBy("vec_id").agg(
        F.sum("s_fp").cast("bigint").alias("shapley_fp")
    )
    return agg.join(
        emb.select("vec_id", "label"), "vec_id"
    ).select(
        "vec_id",
        "label",
        "shapley_fp",
        (F.col("shapley_fp").cast("double") / F.lit(8796093022208.0)).alias(
            "shapley"
        ),
        (F.col("shapley_fp") > 0).alias("helpful"),
    )


# ---------------------------------------------------------------------------
# MMR diversified reranking (Carbonell & Goldstein, SIGIR 1998):
# greedy argmax of λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) over a
# bounded ANN candidate pool. The greedy loop is inherently
# sequential in k but each step is pure relational algebra on the
# pool-sized frame, so the k=10 steps unroll into 10 join+window
# stages (the same unrolled-iteration oracle discipline as
# fs_em_weights) — every step runs for ALL queries at once.
# ---------------------------------------------------------------------------

_MMR_K = 10
_MMR_POOL = 30


def _mmr_oracle() -> str:
    head = """
    WITH q AS MATERIALIZED (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 4
    ),
    scored AS MATERIALIZED (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(q.qe,
                   CAST(e.embedding AS DOUBLE[])) AS rel
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
    ),
    cand AS MATERIALIZED (
        SELECT query_id, vec_id, rel, rn AS rel_rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rel DESC, vec_id) AS rn
            FROM scored) t
        WHERE rn <= 30
    ),
    pairs AS MATERIALIZED (
        SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
               list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                   CAST(eb.embedding AS DOUBLE[])) AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    s1 AS MATERIALIZED (
        SELECT query_id, vec_id, rel, rel_rank, 1 AS step FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rel DESC, vec_id) AS rn
            FROM cand) t WHERE rn = 1
    )"""
    steps = []
    for i in range(2, _MMR_K + 1):
        prev = f"s{i - 1}"
        steps.append(f""",
    p{i} AS MATERIALIZED (
        SELECT query_id, vec_id, rel, rel_rank FROM (
            SELECT c.query_id, c.vec_id, c.rel, c.rel_rank,
                   ROW_NUMBER() OVER (PARTITION BY c.query_id
                       ORDER BY CAST(0.7 AS DOUBLE) * c.rel
                              - CAST(0.3 AS DOUBLE) * c.msim DESC,
                              c.vec_id) AS rn
            FROM (
                SELECT c.query_id, c.vec_id, c.rel, c.rel_rank,
                       MAX(p.sim) AS msim
                FROM cand c
                JOIN {prev} s ON s.query_id = c.query_id
                JOIN pairs p ON p.query_id = c.query_id
                            AND p.a = c.vec_id AND p.b = s.vec_id
                WHERE NOT EXISTS (
                    SELECT 1 FROM {prev} x
                    WHERE x.query_id = c.query_id
                      AND x.vec_id = c.vec_id)
                GROUP BY c.query_id, c.vec_id, c.rel, c.rel_rank
            ) c
        ) t WHERE rn = 1
    ),
    s{i} AS MATERIALIZED (
        SELECT * FROM {prev}
        UNION ALL
        SELECT query_id, vec_id, rel, rel_rank, {i} AS step FROM p{i}
    )""")
    tail = f"""
    SELECT query_id, CAST(step AS INTEGER) AS mmr_rank, vec_id,
           CAST(rel_rank AS INTEGER) AS rel_rank,
           ROUND(rel, 4) AS relevance
    FROM s{_MMR_K}
    """
    return head + "".join(steps) + tail


@_q("mmr_diverse_rerank", _mmr_oracle())
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (λ=0.7) rerank of the top-{pool} cosine candidates down to
    k={k} for 4 query vectors. `rel_rank` is the pure-relevance rank
    of each pick — values > {k} prove the diversity term pulls deep
    pool items forward (checked non-vacuous at every SF). Pool and
    pair frames are localCheckpointed once (pool-sized, 4×{pool}
    rows) so the 10 unrolled steps never re-touch the corpus; each
    step is a join + per-query window over the pool. At 100 TB the
    pool per query is still bounded (it comes from ANN search), so
    MMR's cost is independent of corpus size."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qvec"),
        similarity.l2_norm(F.col("embedding")).alias("_qn"),
    )
    c = dedup.fan_out_narrow_input(emb).select(
        "vec_id",
        "embedding",
        similarity.l2_norm(F.col("embedding")).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                similarity.dot(F.col("_qvec"), F.col("embedding"))
                / (F.col("_qn") * F.col("_cn"))
            ).alias("rel"),
        )
    )
    wrel = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("vec_id")
    )
    cand = (
        scored.withColumn("rel_rank", F.row_number().over(wrel))
        .where(F.col("rel_rank") <= _MMR_POOL)
        .localCheckpoint()
    )
    ea = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("_ea"),
        similarity.l2_norm(F.col("embedding")).alias("_na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("_eb"),
        similarity.l2_norm(F.col("embedding")).alias("_nb"),
    )
    ca = cand.select("query_id", F.col("vec_id").alias("a"))
    cb = cand.select("query_id", F.col("vec_id").alias("b"))
    pairs = (
        ca.join(cb, "query_id")
        .where(F.col("a") != F.col("b"))
        .join(F.broadcast(ea), "a")
        .join(F.broadcast(eb), "b")
        .select(
            "query_id",
            "a",
            "b",
            (
                similarity.dot(F.col("_ea"), F.col("_eb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    sel = (
        cand.where(F.col("rel_rank") == 1)
        .select("query_id", "vec_id", "rel", "rel_rank", F.lit(1).alias("step"))
        .localCheckpoint()
    )
    for i in range(2, _MMR_K + 1):
        remaining = cand.join(
            sel.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti"
        )
        msim = (
            remaining.join(
                sel.select("query_id", F.col("vec_id").alias("b")), "query_id"
            )
            .join(pairs.withColumnRenamed("a", "vec_id"), ["query_id", "vec_id", "b"])
            .groupBy("query_id", "vec_id", "rel", "rel_rank")
            .agg(F.max("sim").alias("msim"))
        )
        wpick = Window.partitionBy("query_id").orderBy(
            F.desc(
                F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("msim")
            ),
            F.asc("vec_id"),
        )
        pick = (
            msim.withColumn("rn", F.row_number().over(wpick))
            .where(F.col("rn") == 1)
            .select(
                "query_id", "vec_id", "rel", "rel_rank",
                F.lit(i).alias("step"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select(
        "query_id",
        F.col("step").cast("int").alias("mmr_rank"),
        "vec_id",
        F.col("rel_rank").cast("int").alias("rel_rank"),
        F.round("rel", 4).alias("relevance"),
    )


mmr_diverse_rerank.__doc__ = mmr_diverse_rerank.__doc__.format(
    pool=_MMR_POOL, k=_MMR_K
)


# ---------------------------------------------------------------------------
# kNN label diagnostics (confident-learning / cleanlab style): for
# every labeled point, the label votes of its K=10 nearest neighbors
# give (a) a consensus label, (b) an agreement count, (c) a
# plurality margin — flagging suspected mislabels (neighborhood
# plurality of >=4 disagrees with the point's own label) and
# boundary points (margin <= 1). Every emitted quantity is an exact
# integer or boolean — zero float surface. Ranking follows the
# knn_cosine discipline (raw fold-ordered cosine, nid tie-break).
# ---------------------------------------------------------------------------


@_q(
    "knn_label_diagnostics",
    """
    WITH sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
        FROM embeddings WHERE vec_id % 2 = 0
    ),
    scored AS (
        SELECT a.vec_id AS qid, a.label AS qlabel,
               b.vec_id AS nid, b.label AS nlabel,
               list_cosine_similarity(a.e, b.e) AS cos
        FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
    ),
    topk AS (
        SELECT qid, qlabel, nlabel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                          ORDER BY cos DESC, nid) AS rn
            FROM scored) t WHERE rn <= 10
    ),
    votes AS (
        SELECT qid, qlabel, nlabel, COUNT(*) AS v
        FROM topk GROUP BY qid, qlabel, nlabel
    ),
    rk AS (
        SELECT qid, qlabel, nlabel, v,
               ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY v DESC, nlabel) AS rv
        FROM votes
    ),
    diag AS (
        SELECT qid, qlabel,
               MAX(CASE WHEN rv = 1 THEN nlabel END) AS consensus_label,
               MAX(CASE WHEN rv = 1 THEN v END) AS v1,
               COALESCE(MAX(CASE WHEN rv = 2 THEN v END), 0) AS v2,
               COALESCE(MAX(CASE WHEN nlabel = qlabel THEN v END), 0)
                   AS n_agree
        FROM rk GROUP BY qid, qlabel
    )
    SELECT qid AS vec_id, qlabel AS label,
           CAST(consensus_label AS INTEGER) AS consensus_label,
           CAST(n_agree AS INTEGER) AS n_agree,
           CAST(v1 - v2 AS INTEGER) AS vote_margin,
           consensus_label <> qlabel AND v1 >= 4 AS suspect_mislabel,
           v1 - v2 <= 1 AS boundary_point
    FROM diag
    """,
)
def knn_label_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood label-consensus diagnostics over the even-id half
    of the embeddings table (the mutual_knn_pairs subsetting
    discipline): suspected mislabels + boundary points from K=10
    neighbor votes. The exact self-join is the oracle-checkable
    core; at 100 TB the neighbor lists come from the IVF/LSH index
    (operators/similarity.py) and the vote algebra is unchanged.
    Flags checked non-vacuous (both values present) at every SF."""
    emb = read_table(spark, sf_dir, "embeddings")
    sub = emb.where(F.col("vec_id") % 2 == 0).select(
        "vec_id",
        "embedding",
        "label",
        similarity.l2_norm(F.col("embedding")).alias("_n"),
    )
    # the pair scoring is CPU-bound at the INPUT partitioning (a
    # single parquet file enters as 1 partition and serializes 1M
    # 128-dim dot products onto one core — measured 7s → ~1.5s)
    a = dedup.fan_out_narrow_input(sub).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("_ea"),
        F.col("label").alias("qlabel"),
        F.col("_n").alias("_na"),
    )
    b = sub.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("_eb"),
        F.col("label").alias("nlabel"),
        F.col("_n").alias("_nb"),
    )
    scored = (
        a.join(F.broadcast(b), F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "qlabel",
            "nid",
            "nlabel",
            (
                similarity.dot(F.col("_ea"), F.col("_eb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cos"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    topk = (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= 10)
        .select("qid", "qlabel", "nlabel")
    )
    votes = topk.groupBy("qid", "qlabel", "nlabel").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("v"), F.asc("nlabel"))
    rk = votes.withColumn("rv", F.row_number().over(wv))
    diag = rk.groupBy("qid", "qlabel").agg(
        F.max(F.when(F.col("rv") == 1, F.col("nlabel"))).alias(
            "consensus_label"
        ),
        F.max(F.when(F.col("rv") == 1, F.col("v"))).alias("v1"),
        F.coalesce(
            F.max(F.when(F.col("rv") == 2, F.col("v"))), F.lit(0)
        ).alias("v2"),
        F.coalesce(
            F.max(F.when(F.col("nlabel") == F.col("qlabel"), F.col("v"))),
            F.lit(0),
        ).alias("n_agree"),
    )
    return diag.select(
        F.col("qid").alias("vec_id"),
        F.col("qlabel").alias("label"),
        F.col("consensus_label").cast("int").alias("consensus_label"),
        F.col("n_agree").cast("int").alias("n_agree"),
        (F.col("v1") - F.col("v2")).cast("int").alias("vote_margin"),
        (
            (F.col("consensus_label") != F.col("qlabel"))
            & (F.col("v1") >= 4)
        ).alias("suspect_mislabel"),
        (F.col("v1") - F.col("v2") <= 1).alias("boundary_point"),
    )


def drift_value_counts(ev: DataFrame) -> DataFrame:
    """Shared state of the two-sample drift tests: per (event_type,
    value) A/B counts (A = first month half; B = second half with the
    +15 purchase canary shift). Counts are ADDITIVE — count tables
    over disjoint row sets merge by summing — which the streaming
    twin (streaming/ingest.drift_counts_stream) exploits: each
    micro-batch appends its own count table and the merged state is
    row-identical to this batch state over the same rows."""
    e0 = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        (F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")).alias(
            "in_a"
        ),
    )
    shift = F.when(
        (F.col("event_type") == "purchase") & (~F.col("in_a")), F.lit(15.0)
    ).otherwise(F.lit(0.0))
    e = e0.select(
        "event_type", (F.col("value") + shift).alias("value"), "in_a"
    )
    return e.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("in_a"), F.lit(1))).alias("ca"),
        F.count(F.when(~F.col("in_a"), F.lit(1))).alias("cb"),
    )


def ks_from_counts(g: DataFrame) -> DataFrame:
    """KS statistic/decision from a (event_type, value, ca, cb) count
    table — `value_ks_test` past its first aggregation, shared
    verbatim with the streaming path."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    d = c.groupBy("event_type", "n_a", "n_b").agg(
        F.max(
            F.abs(
                F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
            )
        ).alias("d_scaled")
    )
    k = d.select(
        "event_type",
        "n_a",
        "n_b",
        "d_scaled",
        (F.col("d_scaled").cast("double") / (F.col("n_a") * F.col("n_b"))).alias(
            "ks_d"
        ),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    return k.select(
        "event_type",
        "n_a",
        "n_b",
        "d_scaled",
        "ks_d",
        (
            F.lit(-2.0) * F.col("ks_d") * F.col("ks_d")
            * (nad * nbd / (nad + nbd))
        ).alias("ks_exponent"),
        (
            F.col("ks_d")
            > F.lit(1.358) * F.sqrt((nad + nbd) / (nad * nbd))
        ).alias("drifted"),
    )


def mw_from_counts(g: DataFrame) -> DataFrame:
    """Mann-Whitney z/decision from the same count table —
    `value_mannwhitney_test` past its first aggregation, shared
    verbatim with the streaming path."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cnt = F.col("ca") + F.col("cb")
    c = g.select(
        "event_type",
        "ca",
        "cb",
        cnt.alias("cnt"),
        F.sum(cnt).over(wcum).alias("cum"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    m = c.groupBy("event_type", "n_a", "n_b").agg(
        F.sum(
            F.col("ca")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("bigint")
        .alias("r2_a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("tie_cubes"),
    )
    u = m.select(
        "event_type",
        "n_a",
        "n_b",
        "tie_cubes",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("bigint")
        .alias("u2_a"),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    zc = (
        F.col("u2_a").cast("double") / F.lit(2.0)
        - nad * nbd / F.lit(2.0)
    ) / F.sqrt(
        nad * nbd / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("tie_cubes").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    z = u.select(
        "event_type", "n_a", "n_b", "u2_a", "tie_cubes", zc.alias("z")
    )
    return z.select(
        "event_type",
        "n_a",
        "n_b",
        "u2_a",
        "tie_cubes",
        "z",
        (F.abs(F.col("z")) > F.lit(1.96)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test, exact-integer form: with
# cumA/cumB the per-distinct-value cumulative counts, the KS
# statistic is max|cumA·nB − cumB·nA| / (nA·nB) — the numerator is a
# pure BIGINT max (no float CDFs), the division is one exact IEEE
# op, and the decision threshold c(α)·sqrt((nA+nB)/(nA·nB)) uses
# only exactly-rounded ops (sqrt is IEEE-exact; no libm
# transcendental in any emitted column — the exponent of the
# asymptotic p-value is emitted instead of exp(·) of it).
# ---------------------------------------------------------------------------


@_q(
    "value_ks_test",
    """
    WITH e0 AS (
        SELECT event_type, value,
               CAST(ts AS DATE) < DATE '2024-01-16' AS in_a
        FROM events WHERE value IS NOT NULL
    ),
    e AS (
        SELECT event_type,
               value + (CASE WHEN event_type = 'purchase' AND NOT in_a
                             THEN 15.0 ELSE 0.0 END) AS value,
               in_a
        FROM e0
    ),
    g AS (
        SELECT event_type, value,
               COUNT(*) FILTER (WHERE in_a) AS ca,
               COUNT(*) FILTER (WHERE NOT in_a) AS cb
        FROM e GROUP BY event_type, value
    ),
    c AS (
        SELECT event_type,
               SUM(ca) OVER (PARTITION BY event_type
                             ORDER BY value) AS cum_a,
               SUM(cb) OVER (PARTITION BY event_type
                             ORDER BY value) AS cum_b,
               SUM(ca) OVER (PARTITION BY event_type) AS n_a,
               SUM(cb) OVER (PARTITION BY event_type) AS n_b
        FROM g
    ),
    d AS (
        SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT)
                   AS d_scaled
        FROM c GROUP BY event_type, n_a, n_b
    ),
    k AS (
        SELECT event_type, n_a, n_b, d_scaled,
               CAST(d_scaled AS DOUBLE) / (n_a * n_b) AS ks_d
        FROM d
    )
    SELECT event_type, n_a, n_b, d_scaled, ks_d,
           -2.0 * ks_d * ks_d
               * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
               AS ks_exponent,
           ks_d > CAST(1.358 AS DOUBLE)
                  * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
               AS drifted
    FROM k
    """,
)
def value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KS drift test between the first and second half
    of the month. One (type, value) agg, two integer cum windows per
    type, then scalar arithmetic on the 5-row frame; emits the exact
    integer statistic, its double view, the asymptotic-p exponent
    (-2·D²·nA·nB/(nA+nB)) and the α=0.05 decision. The generator is
    drift-free, so a +15 location shift is injected into second-half
    purchase values as a detector canary — the decision column must
    fire for exactly that type at every SF (power checked: the shift
    clears the α=0.05 critical D even at the sf0.001 sample sizes).
    At extreme per-group cardinalities the BIGINT cross-products
    need a binned CDF (equi-depth histogram) — the statistic's form
    is unchanged."""
    ev = read_table(spark, sf_dir, "events")
    return ks_from_counts(drift_value_counts(ev))


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test, exact-midrank form: the nonparametric
# sibling of the KS drift test (same A/B split, same purchase canary
# shift). Doubled midranks are exact integers — for a tie group of
# size t starting after cum-before rows, 2·midrank = 2·cum_before +
# t + 1 — so the rank sum, 2U, and the tie-correction term Σ(t³−t)
# are all BIGINT; the normal z uses only IEEE-exact ops (sqrt, no
# libm transcendentals).
# ---------------------------------------------------------------------------


@_q(
    "value_mannwhitney_test",
    """
    WITH e0 AS (
        SELECT event_type, value,
               CAST(ts AS DATE) < DATE '2024-01-16' AS in_a
        FROM events WHERE value IS NOT NULL
    ),
    e AS (
        SELECT event_type,
               value + (CASE WHEN event_type = 'purchase' AND NOT in_a
                             THEN 15.0 ELSE 0.0 END) AS value,
               in_a
        FROM e0
    ),
    g AS (
        SELECT event_type, value,
               COUNT(*) FILTER (WHERE in_a) AS ca,
               COUNT(*) FILTER (WHERE NOT in_a) AS cb
        FROM e GROUP BY event_type, value
    ),
    c AS (
        SELECT event_type, ca, cb, ca + cb AS cnt,
               SUM(ca + cb) OVER (PARTITION BY event_type
                                  ORDER BY value) AS cum,
               SUM(ca) OVER (PARTITION BY event_type) AS n_a,
               SUM(cb) OVER (PARTITION BY event_type) AS n_b
        FROM g
    ),
    m AS (
        SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(SUM(ca * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
                   AS r2_a,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubes
        FROM c GROUP BY event_type, n_a, n_b
    ),
    u AS (
        SELECT event_type, n_a, n_b, tie_cubes,
               CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a
        FROM m
    ),
    z AS (
        SELECT event_type, n_a, n_b, u2_a, tie_cubes,
               (CAST(u2_a AS DOUBLE) / 2.0
                - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
               / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                      * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                         - CAST(tie_cubes AS DOUBLE)
                           / (CAST(n_a + n_b AS DOUBLE)
                              * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
                   AS z
        FROM u
    )
    SELECT event_type, n_a, n_b, u2_a, tie_cubes, z,
           abs(z) > CAST(1.96 AS DOUBLE) AS significant
    FROM z
    """,
)
def value_mannwhitney_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Mann-Whitney U between the month halves (same
    +15 purchase canary as value_ks_test — the decision must fire
    for exactly that type). Midranks never materialize as floats:
    the doubled rank sum r2_a and 2·U are exact BIGINTs from the
    per-distinct-value cumulative window; the tie-corrected z is one
    chain of exactly-rounded IEEE ops. Same scan/agg shape as the
    KS test — the two share everything up to the per-type frame."""
    ev = read_table(spark, sf_dir, "events")
    return mw_from_counts(drift_value_counts(ev))


# ---------------------------------------------------------------------------
# Coarsened exact matching (Iacus, King & Porro 2012): the
# observational-causal sibling of the DiD estimator. Units match
# exactly on COARSENED covariates (event_type × day-of-week strata);
# strata missing either arm drop; ATT reweights per-stratum treated/
# control mean differences by the treated share. Per-stratum
# contributions snap to a 2^-20 fixed-point grid so the cross-strata
# sum is an exact integer sum (strata counts are data-dependent — a
# fixed-order pivot like DiD's 2×2 doesn't apply).
# ---------------------------------------------------------------------------


@_q(
    "purchase_cem_att",
    """
    WITH e AS (
        SELECT event_type, dayofweek(ts) AS dow,
               user_id % 2 = 0 AS treated,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT event_type, dow,
               SUM(cents) FILTER (WHERE treated) AS st,
               COUNT(*) FILTER (WHERE treated) AS nt,
               SUM(cents) FILTER (WHERE NOT treated) AS sc,
               COUNT(*) FILTER (WHERE NOT treated) AS nc
        FROM e GROUP BY event_type, dow
    ),
    k AS (
        SELECT * FROM s WHERE nt > 0 AND nc > 0
    ),
    d AS (
        SELECT event_type, dow, nt, nc,
               CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc
                   AS diff_cents,
               CAST(FLOOR((CAST(st AS DOUBLE)
                           - CAST(nt AS DOUBLE) * sc / nc)
                          * 1048576.0 + 0.5) AS BIGINT) AS contrib_fp,
               SUM(nt) OVER () AS n_treated_total
        FROM k
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow,
           CAST(nt AS INTEGER) AS n_treated,
           CAST(nc AS INTEGER) AS n_control,
           diff_cents,
           CAST(SUM(contrib_fp) OVER () AS DOUBLE) / 1048576.0
               / CAST(n_treated_total AS DOUBLE) AS att_cents
    FROM d
    """,
)
def purchase_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEM ATT of the user-parity 'treatment' on event value: strata
    are (event_type, dow) — 35 cells, all doubly-populated here (the
    nt>0 AND nc>0 pruning is live logic for sparser covariates).
    One conditional aggregation per stratum; per-stratum mean diffs
    are exact IEEE chains; the treated-weighted ATT sums 2^-20
    fixed-point contributions (integer window sum, order-free). The
    scalar OVER () windows run on the strata frame (35 rows), never
    the corpus. DuckDB dayofweek ≡ Spark dayofweek − 1."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    s = e.groupBy("event_type", "dow").agg(
        F.sum(F.when(F.col("treated"), F.col("cents"))).alias("st"),
        F.count(F.when(F.col("treated"), F.lit(1))).alias("nt"),
        F.sum(F.when(~F.col("treated"), F.col("cents"))).alias("sc"),
        F.count(F.when(~F.col("treated"), F.lit(1))).alias("nc"),
    )
    k = s.where((F.col("nt") > 0) & (F.col("nc") > 0))
    contrib = (
        F.col("st").cast("double")
        - F.col("nt").cast("double") * F.col("sc") / F.col("nc")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = k.select(
        "event_type",
        "dow",
        "nt",
        "nc",
        (
            F.col("st").cast("double") / F.col("nt")
            - F.col("sc").cast("double") / F.col("nc")
        ).alias("diff_cents"),
        F.floor(contrib * F.lit(1048576.0) + F.lit(0.5))
        .cast("bigint")
        .alias("contrib_fp"),
        F.sum("nt").over(wall).alias("n_treated_total"),
    )
    return d.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("nt").cast("int").alias("n_treated"),
        F.col("nc").cast("int").alias("n_control"),
        "diff_cents",
        (
            F.sum("contrib_fp").over(wall).cast("double")
            / F.lit(1048576.0)
            / F.col("n_treated_total").cast("double")
        ).alias("att_cents"),
    )


# ---------------------------------------------------------------------------
# Clustering evaluation: per-cluster majority-label purity over the
# k=8 literal-centroid Voronoi assignment — the standard external
# quality metric a curation pipeline reports next to the clustering
# it ships (semantic_dedup_kmeans / cluster_balanced_sample). All
# counts integer; both purities are single exact divisions; the
# overall aggregate is an order-free integer window sum.
# ---------------------------------------------------------------------------


@_q(
    "cluster_label_purity",
    f"""
    WITH {_KMEANS_DIST_CTES},
    a AS (
        SELECT b.vec_id, b.cluster_id, e.label
        FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
    ),
    cl AS (
        SELECT cluster_id, label, COUNT(*) AS c
        FROM a GROUP BY cluster_id, label
    ),
    r AS (
        SELECT cluster_id, label, c,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY c DESC, label) AS rn,
               SUM(c) OVER (PARTITION BY cluster_id) AS n
        FROM cl
    ),
    m AS (
        SELECT cluster_id, CAST(n AS BIGINT) AS n,
               label AS majority_label, CAST(c AS BIGINT) AS n_majority
        FROM r WHERE rn = 1
    )
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
           CAST(n AS INTEGER) AS n_points,
           CAST(majority_label AS INTEGER) AS majority_label,
           CAST(n_majority AS INTEGER) AS n_majority,
           CAST(n_majority AS DOUBLE) / n AS purity,
           CAST(SUM(n_majority) OVER () AS DOUBLE)
               / CAST(SUM(n) OVER () AS BIGINT) AS overall_purity
    FROM m
    """,
)
def cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-label purity per k-means cell + the corpus-wide
    purity. One shuffle-free assignment scan, one (cluster, label)
    agg (≤ 80 cells), then windows over the cell frame. The scalar
    OVER () runs on ≤ 8 rows."""
    emb = read_table(spark, sf_dir, "embeddings")
    a = kmeans.assign(emb, _KMEANS_CENTROIDS).select(
        "vec_id", "cluster_id"
    ).join(emb.select("vec_id", "label"), "vec_id")
    cl = a.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = Window.partitionBy("cluster_id").orderBy(
        F.desc("c"), F.asc("label")
    )
    wn = Window.partitionBy("cluster_id")
    r = cl.select(
        "cluster_id",
        "label",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.sum("c").over(wn).alias("n"),
    )
    m = r.where(F.col("rn") == 1).select(
        "cluster_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("label").alias("majority_label"),
        F.col("c").cast("bigint").alias("n_majority"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return m.select(
        F.col("cluster_id").cast("int").alias("cluster_id"),
        F.col("n").cast("int").alias("n_points"),
        F.col("majority_label").cast("int").alias("majority_label"),
        F.col("n_majority").cast("int").alias("n_majority"),
        (F.col("n_majority").cast("double") / F.col("n")).alias("purity"),
        (
            F.sum("n_majority").over(wall).cast("double")
            / F.sum("n").over(wall)
        ).alias("overall_purity"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix: which SOURCES copy each other —
# the data-governance rollup of the exact near-dup pair surface
# (de-prioritize or re-license a source whose docs are mirrored
# elsewhere). Reuses the proven exact 3-gram-Jaccard pair fragment;
# the matrix is a (source, source) count aggregation over pairs.
# ---------------------------------------------------------------------------


@_q(
    "source_overlap_matrix",
    f"""
    WITH pairs AS MATERIALIZED ({_TRUE_PAIRS_3G_05}),
    lab AS (
        SELECT da.source AS sa, db.source AS sb
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    ),
    m AS (
        SELECT least(sa, sb) AS source_lo, greatest(sa, sb) AS source_hi,
               COUNT(*) AS n_pairs
        FROM lab GROUP BY least(sa, sb), greatest(sa, sb)
    )
    SELECT source_lo, source_hi, CAST(n_pairs AS BIGINT) AS n_pairs,
           source_lo = source_hi AS within_source,
           CAST(n_pairs AS DOUBLE) / CAST(SUM(n_pairs) OVER () AS BIGINT)
               AS pair_share
    FROM m
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts rolled up to unordered (source, source)
    cells. The pair surface is the exact-Jaccard join (the LSH band
    join is the 100 TB mode — identical downstream algebra); the
    rollup adds two id-keyed dim joins and a source-domain-sized
    agg. pair_share is one exact division over the order-free
    integer total."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    lab = pairs.join(da, "doc_a").join(db, "doc_b")
    m = lab.groupBy(
        F.least("sa", "sb").alias("source_lo"),
        F.greatest("sa", "sb").alias("source_hi"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return m.select(
        "source_lo",
        "source_hi",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        (F.col("source_lo") == F.col("source_hi")).alias("within_source"),
        (
            F.col("n_pairs").cast("double")
            / F.sum("n_pairs").over(wall)
        ).alias("pair_share"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β from the per-doc
# cumulative (tokens, new-types) curve — Zipf's companion statistic
# (a collapsing β flags a corpus whose vocabulary has saturated:
# heavy duplication or template text). Unlike corpus_zipf_fit, the
# OLS moments here are EXACT: the ln() points (bit-equal on exact
# integer inputs) snap to a 2^-18 fixed-point grid, so every moment
# is an integer sum (order-free in both engines) and the closed-form
# slope is a short chain of exactly-rounded double ops.
# ---------------------------------------------------------------------------


@_q(
    "corpus_heaps_fit",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, len(w) AS n_tok FROM toks
    ),
    firsts AS (
        SELECT term, MIN(doc_id) AS doc_id FROM (
            SELECT DISTINCT doc_id, unnest(w) AS term FROM toks
        ) GROUP BY term
    ),
    news AS (
        SELECT doc_id, COUNT(*) AS n_new FROM firsts GROUP BY doc_id
    ),
    cum AS (
        SELECT p.doc_id,
               SUM(p.n_tok) OVER (ORDER BY p.doc_id) AS cum_tok,
               SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY p.doc_id)
                   AS cum_vocab
        FROM per_doc p LEFT JOIN news nw ON nw.doc_id = p.doc_id
    ),
    pts AS (
        SELECT CAST(FLOOR(ln(CAST(cum_tok AS DOUBLE)) * 262144.0 + 0.5)
                    AS BIGINT) AS xf,
               CAST(FLOOR(ln(CAST(cum_vocab AS DOUBLE)) * 262144.0 + 0.5)
                    AS BIGINT) AS yf
        FROM cum WHERE cum_tok >= 1 AND cum_vocab >= 1
    ),
    mom AS (
        SELECT COUNT(*) AS n, CAST(SUM(xf) AS BIGINT) AS sx,
               CAST(SUM(yf) AS BIGINT) AS sy,
               CAST(SUM(xf * yf) AS BIGINT) AS sxy,
               CAST(SUM(xf * xf) AS BIGINT) AS sxx
        FROM pts
    ),
    fit AS (
        SELECT n, sx, sy,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
        FROM mom
    ),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tokens
            FROM per_doc),
    voc AS (SELECT COUNT(*) AS vocab_size FROM firsts)
    SELECT CAST(fit.n AS INTEGER) AS n_points,
           tot.total_tokens,
           CAST(voc.vocab_size AS BIGINT) AS vocab_size,
           ROUND(fit.beta, 9) AS heaps_beta,
           ROUND((CAST(fit.sy AS DOUBLE) - fit.beta
                  * CAST(fit.sx AS DOUBLE))
                 / CAST(fit.n AS DOUBLE) / 262144.0, 9) AS heaps_log_k
    FROM fit, tot, voc
    """,
)
def corpus_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law (vocab-growth) OLS over the doc_id-ordered corpus.
    The cumulative curves use the hierarchical prefix operator
    (operators/prefix.py) — NO data-sized SinglePartition window;
    first occurrences are one (term → min doc) agg. The 2^-18 grid
    keeps every OLS moment an exact int64 (headroom to ~5e4 docs ×
    (20·2^18)² products; past that, raise the grid or bucket docs).
    One text scan, two slim range shuffles, constant-size tail."""
    from ..operators.prefix import prefix_sum

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", dedup.tokens("text").alias("w"))
    per_doc = toks.select(
        "doc_id", F.size("w").cast("bigint").alias("n_tok")
    )
    # per-doc array_distinct BEFORE the explode: (doc_id, term) pairs
    # are already distinct, so the corpus-wide distinct() exchange
    # (a full token-stream shuffle at 100 TB) disappears — identical
    # values, one less shuffle (r8)
    firsts = (
        toks.select("doc_id", F.explode(F.array_distinct("w")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    news = firsts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    joined = per_doc.join(news, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new"),
    )
    c1 = prefix_sum(
        joined, "doc_id", "n_tok", out_col="cum_tok", carry_cols=["n_new"]
    )
    cum = prefix_sum(
        c1, "doc_id", "n_new", out_col="cum_vocab", carry_cols=["cum_tok"]
    )
    pts = cum.where(
        (F.col("cum_tok") >= 1) & (F.col("cum_vocab") >= 1)
    ).select(
        F.floor(
            F.log(F.col("cum_tok").cast("double")) * F.lit(262144.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("xf"),
        F.floor(
            F.log(F.col("cum_vocab").cast("double")) * F.lit(262144.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("yf"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xf").cast("bigint").alias("sx"),
        F.sum("yf").cast("bigint").alias("sy"),
        F.sum(F.col("xf") * F.col("yf")).cast("bigint").alias("sxy"),
        F.sum(F.col("xf") * F.col("xf")).cast("bigint").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    beta = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    fit = mom.select("n", "sx", "sy", beta.alias("beta"))
    tot = per_doc.agg(F.sum("n_tok").cast("bigint").alias("total_tokens"))
    voc = firsts.agg(F.count(F.lit(1)).alias("vocab_size"))
    return (
        fit.crossJoin(tot)
        .crossJoin(voc)
        .select(
            F.col("n").cast("int").alias("n_points"),
            "total_tokens",
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            F.round("beta", 9).alias("heaps_beta"),
            F.round(
                (
                    F.col("sy").cast("double")
                    - F.col("beta") * F.col("sx").cast("double")
                )
                / F.col("n").cast("double")
                / F.lit(262144.0),
                9,
            ).alias("heaps_log_k"),
        )
    )


# ---------------------------------------------------------------------------
# Uplift evaluation (Qini curve by score decile): the standard audit
# of a targeting model — rank units by score, then per cumulative
# decile compare treated vs control conversions. Deciles come from
# the hierarchical global_ntile (operators/prefix.py) — identical
# remainder distribution to ANSI NTILE, no SinglePartition funnel.
# All counts exact ints; rates and the Qini coefficient are short
# IEEE-exact chains.
# ---------------------------------------------------------------------------


@_q(
    "uplift_qini_deciles",
    """
    WITH pu AS (
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'view') AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 200
                        THEN 1 ELSE 0 END) AS converted,
               user_id % 2 = 0 AS treated
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT treated, converted,
               NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM pu
    ),
    a AS (
        SELECT decile,
               COUNT(*) FILTER (WHERE treated) AS nt,
               COUNT(*) FILTER (WHERE NOT treated) AS nc,
               SUM(CASE WHEN treated THEN converted ELSE 0 END) AS convt,
               SUM(CASE WHEN NOT treated THEN converted ELSE 0 END)
                   AS convc
        FROM d GROUP BY decile
    ),
    c AS (
        SELECT decile, nt, nc, convt, convc,
               SUM(nt) OVER (ORDER BY decile) AS cnt_t,
               SUM(nc) OVER (ORDER BY decile) AS cnt_c,
               SUM(convt) OVER (ORDER BY decile) AS cconv_t,
               SUM(convc) OVER (ORDER BY decile) AS cconv_c
        FROM a
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(nt AS INTEGER) AS n_treated,
           CAST(nc AS INTEGER) AS n_control,
           CAST(convt AS INTEGER) AS conv_treated,
           CAST(convc AS INTEGER) AS conv_control,
           CASE WHEN nt > 0 AND nc > 0
                THEN CAST(convt AS DOUBLE) / nt
                     - CAST(convc AS DOUBLE) / nc END AS uplift_rate,
           CASE WHEN cnt_c > 0
                THEN CAST(cconv_t AS DOUBLE)
                     - CAST(cconv_c AS DOUBLE)
                       * (CAST(cnt_t AS DOUBLE) / CAST(cnt_c AS DOUBLE))
                END AS qini
    FROM c
    """,
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini audit of an engagement-score targeting policy (score =
    view count per user; treatment = the user-parity assignment the
    causal family uses; conversion = any purchase of value ≥ 200 —
    ~20% of users, so both arms vary). One per-user agg, the
    hierarchical ntile, a 10-row decile agg, cumulative windows on
    10 rows. The treatment is random by construction, so the Qini
    curve hovers near 0 — the audit's null reading, exactly what a
    correct evaluator should report here. Empty-arm deciles (the
    15-user sf0.001 corner) emit NULL rates, ANSI-safe on both
    engines."""
    from ..operators.prefix import global_ntile

    ev = read_table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", F.lit(1))).alias(
            "score"
        ),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 200),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("converted"),
    ).withColumn("treated", F.col("user_id") % 2 == 0)
    d = global_ntile(
        pu,
        10,
        order_cols=["score", "user_id"],
        descending=[True, False],
        out_col="decile",
        carry_cols=["treated", "converted"],
    )
    a = d.groupBy("decile").agg(
        F.count(F.when(F.col("treated"), F.lit(1))).alias("nt"),
        F.count(F.when(~F.col("treated"), F.lit(1))).alias("nc"),
        F.sum(
            F.when(F.col("treated"), F.col("converted")).otherwise(F.lit(0))
        ).alias("convt"),
        F.sum(
            F.when(~F.col("treated"), F.col("converted")).otherwise(
                F.lit(0)
            )
        ).alias("convc"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = a.select(
        "decile",
        "nt",
        "nc",
        "convt",
        "convc",
        F.sum("nt").over(wcum).alias("cnt_t"),
        F.sum("nc").over(wcum).alias("cnt_c"),
        F.sum("convt").over(wcum).alias("cconv_t"),
        F.sum("convc").over(wcum).alias("cconv_c"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("nt").cast("int").alias("n_treated"),
        F.col("nc").cast("int").alias("n_control"),
        F.col("convt").cast("int").alias("conv_treated"),
        F.col("convc").cast("int").alias("conv_control"),
        F.when(
            (F.col("nt") > 0) & (F.col("nc") > 0),
            F.col("convt").cast("double") / F.col("nt")
            - F.col("convc").cast("double") / F.col("nc"),
        ).alias("uplift_rate"),
        F.when(
            F.col("cnt_c") > 0,
            F.col("cconv_t").cast("double")
            - F.col("cconv_c").cast("double")
            * (F.col("cnt_t").cast("double") / F.col("cnt_c").cast("double")),
        ).alias("qini"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa for the language-ID classifier: chance-corrected
# agreement between lang_pred and the ground-truth lang column.
# Entirely exact integers — agreement count, the expected-agreement
# numerator Σ rowtot·coltot — down to two terminal single divisions
# (accuracy, kappa = (agree·N − pe_num)/(N² − pe_num)).
# ---------------------------------------------------------------------------


@_q(
    "lang_id_kappa",
    f"""
    WITH l AS ({ORACLES["doc_lang_id"]}),
    j AS (
        SELECT d.lang AS truth, l.lang_pred AS pred
        FROM documents d JOIN l ON l.doc_id = d.doc_id
    ),
    conf AS (
        SELECT truth, pred, COUNT(*) AS c FROM j GROUP BY truth, pred
    ),
    rows_t AS (SELECT truth AS lab, SUM(c) AS rowtot FROM conf
               GROUP BY truth),
    cols_t AS (SELECT pred AS lab, SUM(c) AS coltot FROM conf
               GROUP BY pred),
    stats AS (
        SELECT (SELECT SUM(c) FROM conf) AS n,
               (SELECT COALESCE(SUM(c), 0) FROM conf
                WHERE truth = pred) AS agree,
               (SELECT COALESCE(SUM(r.rowtot * c.coltot), 0)
                FROM rows_t r JOIN cols_t c ON r.lab = c.lab) AS pe_num
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS agree,
           CAST(pe_num AS BIGINT) AS pe_num,
           CAST(agree AS DOUBLE) / n AS accuracy,
           CAST(agree * n - pe_num AS DOUBLE)
               / CAST(n * n - pe_num AS BIGINT) AS kappa
    FROM stats
    """,
)
def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement of the marker-based lang-ID against
    ground truth. Confusion counts are one (truth, pred) agg; row and
    column totals are label-domain-sized; kappa's numerator and
    denominator are exact BIGINTs, divided once. Low kappa here is
    the honest reading: the heuristic covers 4 of 5 true languages
    (zh has no markers) and abstains as 'unknown'."""
    docs = read_table(spark, sf_dir, "documents")
    j = docs.select(
        F.col("lang").alias("truth"),
        textfn.lang_id("text").alias("pred"),
    )
    conf = j.groupBy("truth", "pred").agg(F.count(F.lit(1)).alias("c"))
    rows_t = conf.groupBy(F.col("truth").alias("lab")).agg(
        F.sum("c").alias("rowtot")
    )
    cols_t = conf.groupBy(F.col("pred").alias("lab")).agg(
        F.sum("c").alias("coltot")
    )
    n_df = conf.agg(F.sum("c").alias("n"))
    agree_df = conf.where(F.col("truth") == F.col("pred")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("agree")
    )
    pe_df = rows_t.join(cols_t, "lab").agg(
        F.coalesce(
            F.sum(F.col("rowtot") * F.col("coltot")), F.lit(0)
        ).alias("pe_num")
    )
    stats = n_df.crossJoin(agree_df).crossJoin(pe_df)
    return stats.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("agree").cast("bigint").alias("agree"),
        F.col("pe_num").cast("bigint").alias("pe_num"),
        (F.col("agree").cast("double") / F.col("n")).alias("accuracy"),
        (
            (F.col("agree") * F.col("n") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("bigint")
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Embedding isotropy audit: the mean pairwise dot product over ALL
# N² vector pairs collapses to one vector sum via the identity
# Σ_{a≠b} <e_a, e_b> = ||Σ_n e_n||² − Σ_n ||e_n||² — the canonical
# example of replacing a quadratic pair join with a linear
# aggregation. Components quantize to the covariance pass's 1e-6
# grid (plans/queries._PCA_COV_CTES discipline), so both Gram
# quantities are EXACT integers (emitted as digit strings — a
# quantization or overflow bug cannot hide behind float tolerance);
# an anisotropic (mean-shifted) embedding space shows as
# isotropy_ratio >> 0.
# ---------------------------------------------------------------------------


@_q(
    "embedding_isotropy_audit",
    """
    WITH qx AS (
        SELECT vec_id, CAST(u.pos AS INTEGER) AS pos,
               CAST(FLOOR(CAST(u.x AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS x,
                             unnest(range(0, len(embedding))) AS pos) u
    ),
    s AS (SELECT pos, SUM(q) AS sd FROM qx GROUP BY pos),
    a1 AS (SELECT SUM(sd * sd) AS ss FROM s),
    a2 AS (SELECT SUM(q * q) AS t FROM qx),
    nn AS (SELECT COUNT(*) AS n FROM embeddings)
    SELECT CAST(nn.n AS INTEGER) AS n_vectors,
           CAST(64 AS INTEGER) AS dim,
           CAST(a1.ss AS VARCHAR) AS ss_exact,
           CAST(a2.t AS VARCHAR) AS self_dot_exact,
           CAST(a2.t AS DOUBLE) / nn.n / 1000000000000.0
               AS mean_sq_norm,
           (CAST(a1.ss AS DOUBLE) - CAST(a2.t AS DOUBLE))
               / nn.n / (nn.n - 1) / 1000000000000.0
               AS mean_offdiag_dot,
           ((CAST(a1.ss AS DOUBLE) - CAST(a2.t AS DOUBLE))
                / nn.n / (nn.n - 1))
               / (CAST(a2.t AS DOUBLE) / nn.n) AS isotropy_ratio
    FROM a1, a2, nn
    """,
)
def embedding_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean squared norm, mean off-diagonal dot and their ratio for
    the embedding corpus — N² pair semantics at one-scan cost (the
    per-dimension sum vector is the whole state; 64 rows). BIGINT
    holds Σq to ~1e9 vectors at this grid; the squared terms run in
    DECIMAL(38,0)/HUGEINT. Near-zero ratio = isotropic; a common
    mean direction inflates it toward 1."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(1000000.0))
        .cast("bigint")
        .alias("q"),
    )
    s = q.groupBy("pos").agg(F.sum("q").alias("sd"))
    a1 = s.agg(
        F.sum(
            F.col("sd").cast("decimal(19,0)") * F.col("sd").cast("decimal(19,0)")
        ).alias("ss")
    )
    a2 = q.agg(
        F.sum(
            F.col("q").cast("decimal(19,0)") * F.col("q").cast("decimal(19,0)")
        ).alias("t")
    )
    nn = emb.agg(F.count(F.lit(1)).alias("n"))
    j = a1.crossJoin(a2).crossJoin(nn)
    ssd = F.col("ss").cast("double")
    td = F.col("t").cast("double")
    nd = F.col("n")
    return j.select(
        F.col("n").cast("int").alias("n_vectors"),
        F.lit(64).cast("int").alias("dim"),
        F.col("ss").cast("string").alias("ss_exact"),
        F.col("t").cast("string").alias("self_dot_exact"),
        (td / nd / F.lit(1000000000000.0)).alias("mean_sq_norm"),
        ((ssd - td) / nd / (nd - 1) / F.lit(1000000000000.0)).alias(
            "mean_offdiag_dot"
        ),
        (((ssd - td) / nd / (nd - 1)) / (td / nd)).alias(
            "isotropy_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Inverse-propensity-weighted ATE (Hájek/stabilized form) with the
# propensity estimated per stratum — the third leg of the causal
# trio (DiD: parallel trends; CEM: exact matching; IPW: reweighting)
# over the SAME treatment/outcome, so the three estimates are
# directly comparable. With stratum-constant e(s) = nt/n the Hájek
# weights telescope: μt = Σ_s st_s·n_s/nt_s / N — a per-stratum IEEE
# chain snapped to the 2^-20 grid, summed as exact integers.
# ---------------------------------------------------------------------------


@_q(
    "purchase_ipw_ate",
    """
    WITH e AS (
        SELECT event_type, dayofweek(ts) AS dow,
               user_id % 2 = 0 AS treated,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT event_type, dow,
               SUM(cents) FILTER (WHERE treated) AS st,
               COUNT(*) FILTER (WHERE treated) AS nt,
               SUM(cents) FILTER (WHERE NOT treated) AS sc,
               COUNT(*) FILTER (WHERE NOT treated) AS nc,
               COUNT(*) AS n
        FROM e GROUP BY event_type, dow
    ),
    k AS (
        SELECT * FROM s WHERE nt > 0 AND nc > 0
    ),
    d AS (
        SELECT event_type, dow, n, nt,
               CAST(nt AS DOUBLE) / n AS propensity,
               CAST(FLOOR(CAST(st AS DOUBLE) * n / nt
                          * 1048576.0 + 0.5) AS BIGINT) AS wt_fp,
               CAST(FLOOR(CAST(sc AS DOUBLE) * n / nc
                          * 1048576.0 + 0.5) AS BIGINT) AS wc_fp,
               SUM(n) OVER () AS n_total
        FROM k
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow,
           CAST(n AS INTEGER) AS n,
           CAST(nt AS INTEGER) AS n_treated,
           propensity,
           CAST(SUM(wt_fp) OVER () AS DOUBLE) / 1048576.0
               / CAST(n_total AS DOUBLE) AS mu_treated_cents,
           CAST(SUM(wc_fp) OVER () AS DOUBLE) / 1048576.0
               / CAST(n_total AS DOUBLE) AS mu_control_cents,
           CAST(SUM(wt_fp) OVER () - SUM(wc_fp) OVER () AS DOUBLE)
               / 1048576.0 / CAST(n_total AS DOUBLE) AS ipw_ate_cents
    FROM d
    """,
)
def purchase_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratum-propensity IPW over the causal family's shared design
    ((event_type, dow) strata, parity treatment, cents outcome).
    One conditional aggregation; weighted sums snap to the 2^-20
    grid so the cross-strata reductions are order-free integer
    window sums on the 35-row strata frame. The ATE difference is
    taken on the EXACT integers before the terminal divisions."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    s = e.groupBy("event_type", "dow").agg(
        F.sum(F.when(F.col("treated"), F.col("cents"))).alias("st"),
        F.count(F.when(F.col("treated"), F.lit(1))).alias("nt"),
        F.sum(F.when(~F.col("treated"), F.col("cents"))).alias("sc"),
        F.count(F.when(~F.col("treated"), F.lit(1))).alias("nc"),
        F.count(F.lit(1)).alias("n"),
    )
    k = s.where((F.col("nt") > 0) & (F.col("nc") > 0))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = k.select(
        "event_type",
        "dow",
        "n",
        "nt",
        (F.col("nt").cast("double") / F.col("n")).alias("propensity"),
        F.floor(
            F.col("st").cast("double") * F.col("n") / F.col("nt")
            * F.lit(1048576.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("wt_fp"),
        F.floor(
            F.col("sc").cast("double") * F.col("n") / F.col("nc")
            * F.lit(1048576.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("wc_fp"),
        F.sum("n").over(wall).alias("n_total"),
    )
    return d.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("n").cast("int").alias("n"),
        F.col("nt").cast("int").alias("n_treated"),
        "propensity",
        (
            F.sum("wt_fp").over(wall).cast("double")
            / F.lit(1048576.0)
            / F.col("n_total").cast("double")
        ).alias("mu_treated_cents"),
        (
            F.sum("wc_fp").over(wall).cast("double")
            / F.lit(1048576.0)
            / F.col("n_total").cast("double")
        ).alias("mu_control_cents"),
        (
            (F.sum("wt_fp").over(wall) - F.sum("wc_fp").over(wall)).cast(
                "double"
            )
            / F.lit(1048576.0)
            / F.col("n_total").cast("double")
        ).alias("ipw_ate_cents"),
    )


# ---------------------------------------------------------------------------
# Held-out OOV rate against a train-split n-gram vocabulary: the
# generalization statistic a pipeline tracks when it builds a
# tokenizer or dedups against a reference corpus — how much of the
# held-out split is UNSEEN (word trigrams, the repo's shingle unit:
# the unigram vocab here is degenerate at 31 types, trigram types
# run ~16k at sf0.01). All counts exact ints; rates are single
# divisions.
# ---------------------------------------------------------------------------


@_q(
    "heldout_oov_rate",
    r"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    tr AS (
        SELECT DISTINCT unnest(list_transform(w[1:len(w) - 2],
               (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
        FROM t WHERE doc_id % 5 <> 0
    ),
    ho AS (
        SELECT lang, unnest(list_transform(w[1:len(w) - 2],
               (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
        FROM t WHERE doc_id % 5 = 0
    ),
    hg AS (SELECT lang, g, COUNT(*) AS c FROM ho GROUP BY lang, g),
    j AS (
        SELECT hg.lang, hg.c, tr.g IS NOT NULL AS known
        FROM hg LEFT JOIN tr ON tr.g = hg.g
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN NOT known THEN c ELSE 0 END) AS BIGINT)
               AS n_oov_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN NOT known THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov_types,
           CAST(SUM(CASE WHEN NOT known THEN c ELSE 0 END) AS DOUBLE)
               / SUM(c) AS oov_token_rate,
           CAST(SUM(CASE WHEN NOT known THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_type_rate
    FROM j GROUP BY lang
    """,
)
def heldout_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language unseen-trigram share of the 20% held-out split
    vs the 80% train vocabulary. One tokenization pass feeds both
    splits; the vocabulary membership check is a (gram)-keyed
    left join of the held-out gram counts against the distinct
    train grams — both sides partial-aggregated before the shuffle.
    At 100 TB the train vocab is the big side and the join stays a
    plain shuffle join on the gram key (or a bloom-filtered probe,
    operators/sketch.py, when the held-out side is tiny)."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", dedup.tokens("text").alias("w")
    )
    tri = dedup.ngram_array(F.col("w"), 3)
    tr = (
        t.where(F.col("doc_id") % 5 != 0)
        .select(F.explode(tri).alias("g"))
        .distinct()
    )
    ho = t.where(F.col("doc_id") % 5 == 0).select(
        "lang", F.explode(tri).alias("g")
    )
    hg = ho.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    j = hg.join(
        tr.withColumn("known", F.lit(True)), "g", "left"
    ).select("lang", "c", F.coalesce("known", F.lit(False)).alias("known"))
    return j.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(~F.col("known"), F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_oov_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(~F.col("known"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_oov_types"),
        (
            F.sum(
                F.when(~F.col("known"), F.col("c")).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("c")
        ).alias("oov_token_rate"),
        (
            F.sum(
                F.when(~F.col("known"), F.lit(1)).otherwise(F.lit(0))
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("oov_type_rate"),
    )


# ---------------------------------------------------------------------------
# Corpus datasheet: the one-page "datasheets for datasets" report a
# curation pipeline publishes with every corpus release — size,
# vocabulary, duplication (exact + near), quality, language mix —
# composed from the SAME building blocks the individual queries use
# (doc_quality CTE, the exact 3-gram pair fragment, the tokenizer),
# so the driver hash-checks the composition end to end. Tall
# (metric, value) layout; every value is an exact count or a short
# exact-IEEE chain (mean quality rides the 1e-4 grid the per-doc
# score is already published on).
# ---------------------------------------------------------------------------


@_q(
    "corpus_datasheet",
    rf"""
    WITH t AS (
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w,
               lang, text
        FROM documents
    ),
    base AS (
        SELECT COUNT(*) AS n_docs,
               SUM(len(w)) AS n_tokens,
               SUM(n_chars) AS n_chars,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
               COUNT(DISTINCT md5(text)) AS n_distinct_text
        FROM t
    ),
    tri AS (
        SELECT COUNT(DISTINCT g) AS vocab FROM (
            SELECT unnest(list_transform(w[1:len(w) - 2],
                   (x, i) -> x || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
            FROM t)
    ),
    q AS ({{doc_quality}}),
    qs AS (
        SELECT SUM(CAST(FLOOR(quality_score * 10000.0 + 0.5) AS BIGINT))
                   AS sq,
               SUM(CASE WHEN quality_score >= 0.82 THEN 1 ELSE 0 END)
                   AS npass
        FROM q
    ),
    pairs AS MATERIALIZED ({{true_pairs}}),
    np AS (SELECT COUNT(*) AS n_pairs FROM pairs)
    SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value
    FROM base
    UNION ALL
    SELECT 'total_ws_tokens', CAST(n_tokens AS DOUBLE) FROM base
    UNION ALL
    SELECT 'mean_tokens_per_doc',
           CAST(n_tokens AS DOUBLE) / n_docs FROM base
    UNION ALL
    SELECT 'mean_chars_per_token',
           CAST(n_chars AS DOUBLE) / n_tokens FROM base
    UNION ALL
    SELECT 'trigram_vocab', CAST(vocab AS DOUBLE) FROM tri
    UNION ALL
    SELECT 'exact_dup_rate',
           (CAST(n_docs AS DOUBLE) - CAST(n_distinct_text AS DOUBLE))
               / n_docs
    FROM base
    UNION ALL
    SELECT 'near_dup_pairs', CAST(n_pairs AS DOUBLE) FROM np
    UNION ALL
    SELECT 'quality_pass_rate',
           CAST(npass AS DOUBLE) / (SELECT n_docs FROM base) FROM qs
    UNION ALL
    SELECT 'mean_quality',
           CAST(sq AS DOUBLE) / (SELECT n_docs FROM base) / 10000.0
    FROM qs
    UNION ALL
    SELECT 'lang_en_share', CAST(n_en AS DOUBLE) / n_docs FROM base
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten-metric corpus release report. One tokenization scan feeds
    size/vocab/dup metrics; the quality CTE is the published per-doc
    score (its 1e-4 grid makes the mean an exact integer sum); the
    near-dup count rides the exact pair join (LSH bands at 100 TB,
    same downstream count). Everything reduces before it crosses a
    shuffle; the report itself is 10 rows."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        dedup.tokens("text").alias("w"),
        "lang",
        "text",
    )
    base = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("w").cast("bigint")).alias("n_tokens"),
        F.sum(F.col("n_chars").cast("bigint")).alias("n_chars"),
        F.sum(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
        ).alias("n_en"),
        F.countDistinct(F.md5("text")).alias("n_distinct_text"),
    ).localCheckpoint()
    tri = (
        t.select(F.explode(dedup.ngram_array(F.col("w"), 3)).alias("g"))
        .agg(F.countDistinct("g").alias("vocab"))
    )
    q = textfn.quality_features(docs, "doc_id", "text")
    qs = q.agg(
        F.sum(
            F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5))
            .cast("bigint")
        ).alias("sq"),
        F.sum(
            F.when(F.col("quality_score") >= 0.82, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("npass"),
    )
    np_ = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )

    def row(name: str, col) -> DataFrame:
        return F.lit(name).alias("metric"), col.alias("value")

    nd = F.col("n_docs").cast("double")
    parts = [
        base.select(*row("n_docs", nd)),
        base.select(*row("total_ws_tokens", F.col("n_tokens").cast("double"))),
        base.select(
            *row(
                "mean_tokens_per_doc",
                F.col("n_tokens").cast("double") / F.col("n_docs"),
            )
        ),
        base.select(
            *row(
                "mean_chars_per_token",
                F.col("n_chars").cast("double") / F.col("n_tokens"),
            )
        ),
        tri.select(*row("trigram_vocab", F.col("vocab").cast("double"))),
        base.select(
            *row(
                "exact_dup_rate",
                (nd - F.col("n_distinct_text").cast("double"))
                / F.col("n_docs"),
            )
        ),
        np_.select(*row("near_dup_pairs", F.col("n_pairs").cast("double"))),
        qs.crossJoin(base.select("n_docs")).select(
            *row(
                "quality_pass_rate",
                F.col("npass").cast("double") / F.col("n_docs"),
            )
        ),
        qs.crossJoin(base.select("n_docs")).select(
            *row(
                "mean_quality",
                F.col("sq").cast("double")
                / F.col("n_docs")
                / F.lit(10000.0),
            )
        ),
        base.select(
            *row(
                "lang_en_share",
                F.col("n_en").cast("double") / F.col("n_docs"),
            )
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# the datasheet oracle composes two published fragments
ORACLES["corpus_datasheet"] = ORACLES["corpus_datasheet"].format(
    doc_quality=ORACLES["doc_quality"], true_pairs=_TRUE_PAIRS_3G_05
)


# ---------------------------------------------------------------------------
# Interrupted time series (segmented regression): the fourth member
# of the causal family (DiD / CEM / IPW need a control group; ITS
# needs only the series and a known break). Independent pre/post OLS
# on (day index, daily cents): every moment is an exact BIGINT (day
# indexes and cents are integers), each slope is ONE division of
# exact integers, and the level/slope changes at the break are short
# exact-IEEE chains — no grid needed anywhere.
# ---------------------------------------------------------------------------


@_q(
    "daily_value_its",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS t,
               CAST(ts AS DATE) >= DATE '2024-01-16' AS post,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY CAST(ts AS DATE)
    ),
    mom AS (
        SELECT post, COUNT(*) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(t * t) AS BIGINT) AS stt,
               CAST(SUM(cents) AS BIGINT) AS sy,
               CAST(SUM(t * cents) AS BIGINT) AS sty
        FROM daily GROUP BY post
    ),
    fit AS (
        SELECT post, n,
               CAST(n * sty - st * sy AS DOUBLE)
                   / CAST(n * stt - st * st AS BIGINT) AS slope,
               st, sy
        FROM mom
    ),
    seg AS (
        SELECT post, n, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS icept
        FROM fit
    ),
    p AS (
        SELECT MAX(CASE WHEN NOT post THEN n END) AS n_pre,
               MAX(CASE WHEN post THEN n END) AS n_post,
               MAX(CASE WHEN NOT post THEN slope END) AS pre_slope,
               MAX(CASE WHEN post THEN slope END) AS post_slope,
               MAX(CASE WHEN NOT post THEN icept END) AS pre_icept,
               MAX(CASE WHEN post THEN icept END) AS post_icept
        FROM seg
    )
    SELECT CAST(n_pre AS INTEGER) AS n_pre,
           CAST(n_post AS INTEGER) AS n_post,
           pre_slope, post_slope,
           post_slope - pre_slope AS slope_change,
           (post_icept + post_slope * 15.0)
               - (pre_icept + pre_slope * 15.0) AS level_change_at_break
    FROM p
    """,
)
def daily_value_its(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented regression around the Jan-16 break on the daily
    cents series. One date-grain aggregation (the only corpus pass),
    2-row integer moments, closed-form slopes/intercepts, and a
    fixed-order 1-row pivot — the whole causal readout is constant
    work after the rollup. The series is generated break-free, so
    slope_change ≈ 0 is the correct null reading; the estimator's
    moments are exact so the oracle pins every bit."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("cents")
        )
        .select(
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("t"),
            (F.col("day") >= F.lit("2024-01-16").cast("date")).alias("post"),
            "cents",
        )
    )
    mom = daily.groupBy("post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("cents")).cast("bigint").alias("sty"),
    )
    fit = mom.select(
        "post",
        "n",
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
                "bigint"
            )
        ).alias("slope"),
        "st",
        "sy",
    )
    seg = fit.select(
        "post",
        "n",
        "slope",
        (
            (F.col("sy").cast("double") - F.col("slope") * F.col("st").cast("double"))
            / F.col("n").cast("double")
        ).alias("icept"),
    )
    p = seg.agg(
        F.max(F.when(~F.col("post"), F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("post"), F.col("n"))).alias("n_post"),
        F.max(F.when(~F.col("post"), F.col("slope"))).alias("pre_slope"),
        F.max(F.when(F.col("post"), F.col("slope"))).alias("post_slope"),
        F.max(F.when(~F.col("post"), F.col("icept"))).alias("pre_icept"),
        F.max(F.when(F.col("post"), F.col("icept"))).alias("post_icept"),
    )
    return p.select(
        F.col("n_pre").cast("int").alias("n_pre"),
        F.col("n_post").cast("int").alias("n_post"),
        "pre_slope",
        "post_slope",
        (F.col("post_slope") - F.col("pre_slope")).alias("slope_change"),
        (
            (F.col("post_icept") + F.col("post_slope") * F.lit(15.0))
            - (F.col("pre_icept") + F.col("pre_slope") * F.lit(15.0))
        ).alias("level_change_at_break"),
    )


# ---------------------------------------------------------------------------
# Audio fingerprint matching (Wang 2003, "Shazam"): spectral-peak
# landmark pairs hashed to (band₁, band₂, Δt) keys; a query snippet
# matches the reference whose key join produces the most consistent
# time OFFSET — the classic histogram-of-offsets vote, expressed
# relationally (hash equality join + groupBy + argmax window). The
# audio is REAL (stdlib WAV synth → the repo's STFT decode path);
# ground truth is planted: query q replays 4 of the 8 tone segments
# of reference (3q mod 20) starting at window 24, so the matcher's
# verdicts are closed-form oracle material — the
# audio_wav_metrics physics-verification discipline.
# ---------------------------------------------------------------------------


@_q(
    "audio_fingerprint_match",
    """
    SELECT CAST(100 + doc_id AS BIGINT) AS query_id,
           CAST((doc_id * 3) % 20 AS BIGINT) AS matched_ref,
           TRUE AS is_correct,
           TRUE AS offset_ok,
           TRUE AS vote_margin_ok
    FROM documents WHERE doc_id < 8
    """,
)
def audio_fingerprint_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 reference clips (8 deterministic tone segments each) + 8
    query snippets (segments 3-6 of their planted source). Peaks =
    per-window argmax STFT band (16 bands); landmarks = (b_t, b_t+d,
    d) for d ≤ 3; the match is the (query, ref, offset) vote argmax
    with ≥2× margin over the best wrong-reference vote. A broken
    hash, joint, or offset algebra flips a boolean and fails the
    driver compare. Scale shape: synth+decode collapse inside one
    mapInPandas (payloads never shuffle); landmarks are
    windows×3 rows per clip; the match is a key-equality join —
    catalog-sized, never all-pairs audio."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")

    def seg_freqs(i: int) -> list[float]:
        # band-centered tones (n_bands=32 -> 125 Hz bands): the peak
        # band is exactly the planted index; the per-clip sequence is
        # nonlinear in j so segment-transition pairs differ between
        # clips (a linear ramp gives every clip the same pair deltas)
        return [
            (2 + ((i * 37 + j * j * 11 + j * 5) % 23) + 0.5) * 125.0
            for j in range(8)
        ]

    base = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    qbase = docs.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 100).cast("long").alias("media_id"),
        ((F.col("doc_id") * 3) % 20).cast("long").alias("src"),
    )

    def synth_refs(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    int(m),
                    mm.synth_wav_segments(
                        [(f, 8) for f in seg_freqs(int(m))],
                        frame_samples=128,
                    ),
                )
                for m in pdf["media_id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    def synth_queries(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    int(m),
                    mm.synth_wav_segments(
                        [(f, 8) for f in seg_freqs(int(s))[3:7]],
                        frame_samples=128,
                    ),
                )
                for m, s in zip(pdf["media_id"], pdf["src"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    schema = "media_id long, payload binary"
    refs = base.mapInPandas(synth_refs, schema)
    qrys = qbase.select("media_id", "src").mapInPandas(
        synth_queries, schema
    )
    clips = refs.unionByName(qrys)
    spec = mm.extract_wav_spectrograms(
        clips, n_fft=256, hop=128, n_bands=32
    )
    pk = spec.select(
        "media_id", F.posexplode("spectrogram").alias("t", "bands")
    ).select(
        "media_id",
        "t",
        (F.array_position(F.col("bands"), F.array_max("bands")) - 1)
        .cast("int")
        .alias("b"),
    )
    a = pk.select("media_id", F.col("t").alias("t1"), F.col("b").alias("b1"))
    b = pk.select("media_id", F.col("t").alias("t2"), F.col("b").alias("b2"))
    marks = (
        a.join(b, "media_id")
        .where(
            (F.col("t2") > F.col("t1")) & (F.col("t2") <= F.col("t1") + 3)
        )
        .select(
            "media_id",
            "t1",
            (
                (F.col("b1") * 32 + F.col("b2")) * 4
                + (F.col("t2") - F.col("t1") - 1)
            ).alias("key"),
        )
        .localCheckpoint()
    )
    rh = marks.where(F.col("media_id") < 100).select(
        F.col("media_id").alias("ref_id"),
        F.col("t1").alias("tr"),
        "key",
    )
    qh = marks.where(F.col("media_id") >= 100).select(
        F.col("media_id").alias("query_id"),
        F.col("t1").alias("tq"),
        "key",
    )
    votes = (
        qh.join(rh, "key")
        .groupBy(
            "query_id", "ref_id", (F.col("tr") - F.col("tq")).alias("off")
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    wbest = Window.partitionBy("query_id").orderBy(
        F.desc("v"), F.asc("ref_id"), F.asc("off")
    )
    top = (
        votes.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select("query_id", "ref_id", "off", "v")
        .localCheckpoint()
    )
    wrong = (
        votes.join(
            top.select(
                "query_id", F.col("ref_id").alias("top_ref")
            ),
            "query_id",
        )
        .where(F.col("ref_id") != F.col("top_ref"))
        .groupBy("query_id")
        .agg(F.max("v").alias("best_wrong"))
    )
    best = top.join(wrong, "query_id", "left").withColumn(
        "best_wrong", F.coalesce("best_wrong", F.lit(0))
    )
    return best.select(
        "query_id",
        F.col("ref_id").alias("matched_ref"),
        (F.col("ref_id") == (F.col("query_id") - 100) * 3 % 20).alias(
            "is_correct"
        ),
        (F.abs(F.col("off") - 24) <= 1).alias("offset_ok"),
        (F.col("v") >= 2 * F.col("best_wrong")).alias("vote_margin_ok"),
    )


# ---------------------------------------------------------------------------
# Bradley-Terry preference-strength fitting (the reward-model
# estimator behind RLHF preference data): monthly brand-revenue
# duels give pairwise win counts; three unrolled MM iterations
# (Hunter 2004: s'_a = W_a / Σ_b n_ab/(s_a+s_b)) fit the strengths.
# Every per-brand denominator is a sum of 2^-30 fixed-point integer
# terms (cross-engine order-free — the FS-EM/PCA discipline for
# data-dependent sums); each strength re-snaps to the grid per
# round, so the recurrence is engine-identical without trusting any
# float accumulation order.
# ---------------------------------------------------------------------------


def _bt_iter_sql(prev: str, i: int) -> str:
    return f""",
    t{i} AS MATERIALIZED (
        SELECT o.a,
               SUM(CAST(FLOOR(CAST(o.n_ab AS DOUBLE)
                       / (CAST(sa.s_fp AS DOUBLE) / 1073741824.0
                          + CAST(sb.s_fp AS DOUBLE) / 1073741824.0)
                       * 1073741824.0 + 0.5) AS BIGINT)) AS den_fp
        FROM ordered o
        JOIN {prev} sa ON sa.brand = o.a
        JOIN {prev} sb ON sb.brand = o.b
        GROUP BY o.a
    ),
    s{i} AS MATERIALIZED (
        SELECT w.brand,
               CASE WHEN w.w = 0 OR t{i}.den_fp = 0 THEN 0
                    ELSE CAST(FLOOR(CAST(w.w AS DOUBLE)
                         / (CAST(t{i}.den_fp AS DOUBLE) / 1073741824.0)
                         * 1073741824.0 + 0.5) AS BIGINT) END AS s_fp
        FROM wins w JOIN t{i} ON t{i}.a = w.brand
    )"""


def _bt_oracle() -> str:
    head = """
    WITH rev AS (
        SELECT p.p_brand AS brand,
               year(l.l_shipdate) AS y, month(l.l_shipdate) AS mo,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, year(l.l_shipdate), month(l.l_shipdate)
    ),
    duel AS (
        SELECT a.brand AS wa, b.brand AS wb,
               SUM(CASE WHEN a.r > b.r THEN 1 ELSE 0 END) AS win_a,
               SUM(CASE WHEN b.r > a.r THEN 1 ELSE 0 END) AS win_b
        FROM rev a JOIN rev b
          ON a.y = b.y AND a.mo = b.mo AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    ),
    ordered AS MATERIALIZED (
        SELECT wa AS a, wb AS b, win_a + win_b AS n_ab FROM duel
        UNION ALL
        SELECT wb AS a, wa AS b, win_a + win_b AS n_ab FROM duel
    ),
    wins AS MATERIALIZED (
        SELECT a AS brand, CAST(SUM(w) AS BIGINT) AS w,
               CAST(SUM(n) AS BIGINT) AS n FROM (
            SELECT wa AS a, win_a AS w, win_a + win_b AS n FROM duel
            UNION ALL
            SELECT wb AS a, win_b AS w, win_a + win_b AS n FROM duel
        ) GROUP BY a
    ),
    s0 AS MATERIALIZED (
        SELECT brand, CAST(1073741824 AS BIGINT) AS s_fp FROM wins
    )"""
    steps = "".join(_bt_iter_sql(f"s{i - 1}", i) for i in range(1, 4))
    tail = """,
    tot AS (SELECT SUM(s_fp) AS tot_fp FROM s3)
    SELECT s3.brand,
           CAST(w.w AS INTEGER) AS n_wins,
           CAST(w.n AS INTEGER) AS n_comparisons,
           CAST(s3.s_fp AS DOUBLE) / CAST(tot.tot_fp AS BIGINT)
               AS strength,
           CAST(ROW_NUMBER() OVER (ORDER BY s3.s_fp DESC, s3.brand)
                AS INTEGER) AS rnk
    FROM s3 JOIN wins w ON w.brand = s3.brand, tot
    """
    return head + steps + tail


@_q("brand_bradley_terry", _bt_oracle())
def brand_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths of the 25 brands from monthly revenue
    duels. Corpus cost = ONE (brand, month) decimal aggregation; the
    duel matrix and all three MM rounds run on ≤ 25·24 rows with
    exact-integer denominators. Strengths emit normalized by the
    exact fixed-point total; ranks are deterministic on the grid."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == part.p_partkey,
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"))
    )
    a = rev.select(
        F.col("brand").alias("ba"), "y", "mo", F.col("r").alias("ra")
    )
    b = rev.select(
        F.col("brand").alias("bb"), "y", "mo", F.col("r").alias("rb")
    )
    duel = (
        a.join(b, ["y", "mo"])
        .where(F.col("ba") < F.col("bb"))
        .groupBy(F.col("ba").alias("wa"), F.col("bb").alias("wb"))
        .agg(
            F.sum(
                F.when(F.col("ra") > F.col("rb"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("win_a"),
            F.sum(
                F.when(F.col("rb") > F.col("ra"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("win_b"),
        )
        .localCheckpoint()
    )
    n_ab = (F.col("win_a") + F.col("win_b")).alias("n_ab")
    ordered = duel.select(
        F.col("wa").alias("a"), F.col("wb").alias("b"), n_ab
    ).unionByName(
        duel.select(F.col("wb").alias("a"), F.col("wa").alias("b"), n_ab)
    ).localCheckpoint()
    wins = (
        duel.select(
            F.col("wa").alias("a"),
            F.col("win_a").alias("w"),
            (F.col("win_a") + F.col("win_b")).alias("n"),
        )
        .unionByName(
            duel.select(
                F.col("wb").alias("a"),
                F.col("win_b").alias("w"),
                (F.col("win_a") + F.col("win_b")).alias("n"),
            )
        )
        .groupBy(F.col("a").alias("brand"))
        .agg(
            F.sum("w").cast("bigint").alias("w"),
            F.sum("n").cast("bigint").alias("n"),
        )
        .localCheckpoint()
    )
    s = wins.select("brand", F.lit(1073741824).cast("bigint").alias("s_fp"))
    for _ in range(3):
        sa = s.select(F.col("brand").alias("a"), F.col("s_fp").alias("sa_fp"))
        sb = s.select(F.col("brand").alias("b"), F.col("s_fp").alias("sb_fp"))
        term = F.floor(
            F.col("n_ab").cast("double")
            / (
                F.col("sa_fp").cast("double") / F.lit(1073741824.0)
                + F.col("sb_fp").cast("double") / F.lit(1073741824.0)
            )
            * F.lit(1073741824.0)
            + F.lit(0.5)
        ).cast("bigint")
        den = (
            ordered.join(sa, "a")
            .join(sb, "b")
            .groupBy("a")
            .agg(F.sum(term).alias("den_fp"))
        )
        s = (
            wins.join(den, wins.brand == den.a)
            .select(
                "brand",
                F.when(
                    (F.col("w") == 0) | (F.col("den_fp") == 0), F.lit(0)
                )
                .otherwise(
                    F.floor(
                        F.col("w").cast("double")
                        / (
                            F.col("den_fp").cast("double")
                            / F.lit(1073741824.0)
                        )
                        * F.lit(1073741824.0)
                        + F.lit(0.5)
                    )
                )
                .cast("bigint")
                .alias("s_fp"),
            )
            .localCheckpoint()
        )
    tot = s.agg(F.sum("s_fp").alias("tot_fp"))
    wrnk = Window.orderBy(F.desc("s_fp"), F.asc("brand"))
    return (
        s.join(wins, "brand")
        .crossJoin(tot)
        .select(
            "brand",
            F.col("w").cast("int").alias("n_wins"),
            F.col("n").cast("int").alias("n_comparisons"),
            (F.col("s_fp").cast("double") / F.col("tot_fp")).alias(
                "strength"
            ),
            F.row_number().over(wrnk).cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user Markov sequence surprisal: fit the corpus-wide first-order
# event-transition model (exact count ratios), then score every
# user's journey by its average negative log-likelihood — the
# standard anomalous-session detector (bots and broken clients walk
# improbable paths). ln() terms are bit-equal on identical exact
# ratios; each user's sum runs over 2^-30 fixed-point integers, so
# the per-user aggregation is order-free in both engines.
# ---------------------------------------------------------------------------


@_q(
    "user_markov_surprisal",
    """
    WITH seq AS (
        SELECT user_id, event_type AS a,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS b
        FROM events
    ),
    tr AS (SELECT user_id, a, b FROM seq WHERE b IS NOT NULL),
    cnt AS (
        SELECT a, b, COUNT(*) AS c_ab FROM tr GROUP BY a, b
    ),
    tot AS (SELECT a, SUM(c_ab) AS c_a FROM cnt GROUP BY a),
    model AS (
        SELECT cnt.a, cnt.b,
               CAST(FLOOR(ln(CAST(c_ab AS DOUBLE) / c_a)
                          * 1073741824.0 + 0.5) AS BIGINT) AS lp_fp
        FROM cnt JOIN tot ON tot.a = cnt.a
    ),
    scored AS (
        SELECT t.user_id, COUNT(*) AS n_trans,
               CAST(SUM(m.lp_fp) AS BIGINT) AS lp_sum
        FROM tr t JOIN model m ON m.a = t.a AND m.b = t.b
        GROUP BY t.user_id
    ),
    r AS (
        SELECT user_id, CAST(n_trans AS INTEGER) AS n_trans,
               -(CAST(lp_sum AS DOUBLE) / 1073741824.0) / n_trans
                   AS avg_surprisal,
               ROW_NUMBER() OVER (
                   ORDER BY -(CAST(lp_sum AS DOUBLE) / 1073741824.0)
                            / n_trans DESC, user_id) AS rn
        FROM scored WHERE n_trans >= 5
    )
    SELECT user_id, n_trans, avg_surprisal,
           CAST(rn AS INTEGER) AS anomaly_rank
    FROM r WHERE rn <= 20
    """,
)
def user_markov_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most improbable user journeys under the corpus
    transition model. One LEAD window per user (bounded history),
    one |types|²-key model agg broadcast back onto the transitions,
    per-user integer sums. Ranking compares fixed-point-derived
    doubles (two exact divisions) with a user tie-break."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    )
    tr = seq.where(F.col("b").isNotNull())
    cnt = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = cnt.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    model = cnt.join(tot, "a").select(
        "a",
        "b",
        F.floor(
            F.log(F.col("c_ab").cast("double") / F.col("c_a"))
            * F.lit(1073741824.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lp_fp"),
    )
    scored = (
        tr.join(F.broadcast(model), ["a", "b"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum("lp_fp").cast("bigint").alias("lp_sum"),
        )
    )
    surp = -(F.col("lp_sum").cast("double") / F.lit(1073741824.0)) / F.col(
        "n_trans"
    )
    r = (
        scored.where(F.col("n_trans") >= 5)
        .select(
            "user_id",
            F.col("n_trans").cast("int").alias("n_trans"),
            surp.alias("avg_surprisal"),
        )
        .withColumn(
            "anomaly_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("avg_surprisal"), F.asc("user_id")))
            .cast("int"),
        )
    )
    return r.where(F.col("anomaly_rank") <= 20)


# ---------------------------------------------------------------------------
# Covariate-balance diagnostics (standardized mean differences): the
# table every observational-causal analysis prints BEFORE trusting
# DiD/CEM/IPW — |SMD| ≤ 0.1 is the conventional balance bar. The
# assignment here is random by design, so a +5 confound is planted
# into one covariate as a detector canary (the KS-canary
# discipline): the flag must fire for exactly that row at every SF.
# All moments are exact integers; SMD is one IEEE chain.
# ---------------------------------------------------------------------------


@_q(
    "covariate_balance_smd",
    """
    WITH e AS (
        SELECT user_id % 2 = 0 AS treated,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CAST(dayofweek(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hr
        FROM events WHERE value IS NOT NULL
    ),
    x AS (
        SELECT treated, cents AS v, 'value_cents' AS covariate FROM e
        UNION ALL
        SELECT treated, dow, 'day_of_week' FROM e
        UNION ALL
        SELECT treated, hr, 'hour_of_day' FROM e
        UNION ALL
        SELECT treated,
               cents + (CASE WHEN treated THEN 2000 ELSE 0 END),
               'value_with_confound'
        FROM e
    ),
    m AS (
        SELECT covariate,
               COUNT(*) FILTER (WHERE treated) AS nt,
               SUM(v) FILTER (WHERE treated) AS st,
               SUM(v * v) FILTER (WHERE treated) AS qt,
               COUNT(*) FILTER (WHERE NOT treated) AS nc,
               SUM(v) FILTER (WHERE NOT treated) AS sc,
               SUM(v * v) FILTER (WHERE NOT treated) AS qc
        FROM x GROUP BY covariate
    ),
    d AS (
        SELECT covariate,
               CAST(st AS DOUBLE) / nt AS mean_t,
               CAST(sc AS DOUBLE) / nc AS mean_c,
               (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / nt) / nt
                   AS var_t,
               (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * sc / nc) / nc
                   AS var_c
        FROM m
    ),
    s AS (
        SELECT covariate, mean_t, mean_c,
               (mean_t - mean_c) / sqrt((var_t + var_c) / 2.0) AS smd
        FROM d
    )
    SELECT covariate, mean_t, mean_c, smd,
           abs(smd) <= CAST(0.1 AS DOUBLE) AS balanced
    FROM s
    """,
)
def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMD balance table for the causal family's parity assignment
    over three real covariates plus the planted-confound canary.
    One union-projection scan, one 4-key conditional aggregation,
    scalar IEEE math on 4 rows. The canary row must read
    balanced = false; the real rows must read true."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("value").isNotNull()).select(
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    )
    parts = [
        e.select("treated", F.col("cents").alias("v"),
                 F.lit("value_cents").alias("covariate")),
        e.select("treated", F.col("dow").alias("v"),
                 F.lit("day_of_week").alias("covariate")),
        e.select("treated", F.col("hr").alias("v"),
                 F.lit("hour_of_day").alias("covariate")),
        e.select(
            "treated",
            (
                F.col("cents")
                + F.when(F.col("treated"), F.lit(2000)).otherwise(F.lit(0))
            ).alias("v"),
            F.lit("value_with_confound").alias("covariate"),
        ),
    ]
    x = parts[0]
    for p in parts[1:]:
        x = x.unionByName(p)
    m = x.groupBy("covariate").agg(
        F.count(F.when(F.col("treated"), F.lit(1))).alias("nt"),
        F.sum(F.when(F.col("treated"), F.col("v"))).alias("st"),
        F.sum(F.when(F.col("treated"), F.col("v") * F.col("v"))).alias("qt"),
        F.count(F.when(~F.col("treated"), F.lit(1))).alias("nc"),
        F.sum(F.when(~F.col("treated"), F.col("v"))).alias("sc"),
        F.sum(F.when(~F.col("treated"), F.col("v") * F.col("v"))).alias(
            "qc"
        ),
    )
    d = m.select(
        "covariate",
        (F.col("st").cast("double") / F.col("nt")).alias("mean_t"),
        (F.col("sc").cast("double") / F.col("nc")).alias("mean_c"),
        (
            (
                F.col("qt").cast("double")
                - F.col("st").cast("double") * F.col("st") / F.col("nt")
            )
            / F.col("nt")
        ).alias("var_t"),
        (
            (
                F.col("qc").cast("double")
                - F.col("sc").cast("double") * F.col("sc") / F.col("nc")
            )
            / F.col("nc")
        ).alias("var_c"),
    )
    s = d.select(
        "covariate",
        "mean_t",
        "mean_c",
        (
            (F.col("mean_t") - F.col("mean_c"))
            / F.sqrt((F.col("var_t") + F.col("var_c")) / F.lit(2.0))
        ).alias("smd"),
    )
    return s.select(
        "covariate",
        "mean_t",
        "mean_c",
        "smd",
        (F.abs(F.col("smd")) <= F.lit(0.1)).alias("balanced"),
    )


# ---------------------------------------------------------------------------
# Term burstiness (Church & Gale): the variance-to-mean ratio of
# per-document term frequency separates content words (bursty —
# absent mostly, heavy where topical) from function words (Poisson-
# like). The dispersion index uses exact integer moments over ALL
# docs (including zero-tf ones — algebraically, via the corpus doc
# count, without materializing zeros).
# ---------------------------------------------------------------------------


@_q(
    "term_burstiness",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    nd AS (SELECT COUNT(*) AS n_docs FROM t),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS f FROM (
            SELECT doc_id, unnest(w) AS term FROM t) GROUP BY doc_id, term
    ),
    m AS (
        SELECT term, COUNT(*) AS df,
               CAST(SUM(f) AS BIGINT) AS sf,
               CAST(SUM(f * f) AS BIGINT) AS sff
        FROM tf GROUP BY term
    ),
    d AS (
        SELECT term, df, sf, sff, nd.n_docs,
               CAST(sf AS DOUBLE) / nd.n_docs AS mean_tf,
               (CAST(sff AS DOUBLE)
                - CAST(sf AS DOUBLE) * sf / nd.n_docs) / nd.n_docs
                   AS var_tf
        FROM m, nd
    )
    SELECT term, CAST(df AS INTEGER) AS doc_freq,
           CAST(sf AS BIGINT) AS total_tf,
           mean_tf,
           var_tf / mean_tf AS dispersion,
           var_tf / mean_tf > CAST(1.25 AS DOUBLE) AS bursty
    FROM d
    """,
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion index per vocabulary term. Zero-tf documents enter
    the moments through n_docs alone (Σf and Σf² are unchanged by
    zeros), so the stats are exact without a dense doc×term frame —
    the sparsity trick that keeps this one explode + one term-keyed
    agg at any corpus size. The 31-term shared vocabulary makes the
    whole report vocabulary-sized."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", dedup.tokens("text").alias("w"))
    nd = t.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        t.select("doc_id", F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    m = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("f").cast("bigint").alias("sf"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("sff"),
    )
    d = m.crossJoin(F.broadcast(nd)).select(
        "term",
        "df",
        "sf",
        (F.col("sf").cast("double") / F.col("n_docs")).alias("mean_tf"),
        (
            (
                F.col("sff").cast("double")
                - F.col("sf").cast("double") * F.col("sf") / F.col("n_docs")
            )
            / F.col("n_docs")
        ).alias("var_tf"),
    )
    return d.select(
        "term",
        F.col("df").cast("int").alias("doc_freq"),
        F.col("sf").alias("total_tf"),
        "mean_tf",
        (F.col("var_tf") / F.col("mean_tf")).alias("dispersion"),
        (F.col("var_tf") / F.col("mean_tf") > F.lit(1.25)).alias("bursty"),
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out impact: for each source, what happens to the
# corpus quality mean and the near-dup surface if that source is
# dropped — the curation decision table behind source re-weighting
# and de-licensing. Additive metrics make LOO pure algebra over
# per-source aggregates (no per-source recomputation passes): the
# quality delta comes from subtracting the source's fixed-point
# quality sum; the pair delta counts pairs TOUCHING the source.
# ---------------------------------------------------------------------------


@_q(
    "source_loo_impact",
    f"""
    WITH q AS ({{doc_quality}}),
    dq AS (
        SELECT d.source,
               CAST(FLOOR(q.quality_score * 10000.0 + 0.5) AS BIGINT)
                   AS q_fp
        FROM documents d JOIN q ON q.doc_id = d.doc_id
    ),
    per_src AS (
        SELECT source, COUNT(*) AS n, CAST(SUM(q_fp) AS BIGINT) AS sq
        FROM dq GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_all,
               CAST(SUM(sq) AS BIGINT) AS sq_all
        FROM per_src
    ),
    pairs AS MATERIALIZED ({{true_pairs}}),
    lab AS (
        SELECT da.source AS sa, db.source AS sb
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    ),
    touch AS (
        SELECT source, COUNT(*) AS p_touch FROM (
            SELECT sa AS source FROM lab
            UNION ALL
            SELECT sb FROM lab WHERE sb <> sa
        ) GROUP BY source
    )
    SELECT s.source,
           CAST(s.n AS INTEGER) AS n_docs,
           CAST(s.sq AS DOUBLE) / s.n / 10000.0 AS src_quality,
           CAST(t.sq_all - s.sq AS DOUBLE) / (t.n_all - s.n) / 10000.0
               - CAST(t.sq_all AS DOUBLE) / t.n_all / 10000.0
               AS loo_quality_delta,
           CAST(COALESCE(tc.p_touch, 0) AS BIGINT) AS near_dup_pairs_removed,
           CAST(t.sq_all - s.sq AS DOUBLE) / (t.n_all - s.n) / 10000.0
               > CAST(t.sq_all AS DOUBLE) / t.n_all / 10000.0
               AS drop_improves_quality
    FROM per_src s
    LEFT JOIN touch tc ON tc.source = s.source, tot t
    """,
)
def source_loo_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source leave-one-out table: source quality, the corpus
    quality delta if the source is dropped (exact fixed-point sums —
    no re-scan per source), near-dup pairs that would vanish, and
    the drop-improves flag. LOO over S sources costs ONE quality
    pass + ONE pair surface, not S of either."""
    docs = read_table(spark, sf_dir, "documents")
    q = textfn.quality_features(docs, "doc_id", "text").select(
        "doc_id",
        F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("q_fp"),
    )
    dq = docs.select("doc_id", "source").join(q, "doc_id")
    per_src = dq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q_fp").cast("bigint").alias("sq"),
    )
    tot = per_src.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("sq").cast("bigint").alias("sq_all"),
    )
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    lab = pairs.join(da, "doc_a").join(db, "doc_b").localCheckpoint()
    touch = (
        lab.select(F.col("sa").alias("source"))
        .unionByName(
            lab.where(F.col("sb") != F.col("sa")).select(
                F.col("sb").alias("source")
            )
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("p_touch"))
    )
    mean_all = (
        F.col("sq_all").cast("double") / F.col("n_all") / F.lit(10000.0)
    )
    mean_loo = (
        (F.col("sq_all") - F.col("sq")).cast("double")
        / (F.col("n_all") - F.col("n"))
        / F.lit(10000.0)
    )
    return (
        per_src.join(touch, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n").cast("int").alias("n_docs"),
            (
                F.col("sq").cast("double") / F.col("n") / F.lit(10000.0)
            ).alias("src_quality"),
            (mean_loo - mean_all).alias("loo_quality_delta"),
            F.coalesce(F.col("p_touch"), F.lit(0))
            .cast("bigint")
            .alias("near_dup_pairs_removed"),
            (mean_loo > mean_all).alias("drop_improves_quality"),
        )
    )


ORACLES["source_loo_impact"] = ORACLES["source_loo_impact"].format(
    doc_quality=ORACLES["doc_quality"], true_pairs=_TRUE_PAIRS_3G_05
)


# ---------------------------------------------------------------------------
# Log-rank test (Mantel-Cox): the standard two-arm survival
# comparison, completing the KM family — O−E and variance terms per
# event day from exact integer risk sets, each term snapped to the
# 2^-30 grid so the across-days sums are order-free integers. The
# generator has no arm effect, so a 5-day conversion delay is
# planted into the treated arm (the KS-canary discipline): the
# decision must fire at every SF (probed z: −4.0 / −10.6 / −30.6).
# ---------------------------------------------------------------------------


@_q(
    "signup_purchase_logrank",
    """
    WITH s AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT s.user_id, MIN(e.ts) AS tp
        FROM s JOIN events e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND e.ts >= s.t0 + (CASE WHEN s.user_id % 2 = 0
                                  THEN INTERVAL 5 DAY
                                  ELSE INTERVAL 0 DAY END)
        GROUP BY s.user_id
    ),
    h AS (SELECT MAX(ts) AS horizon FROM events),
    dur AS (
        SELECT s.user_id % 2 = 0 AS arm1,
               CASE WHEN p.tp IS NOT NULL
                    THEN date_diff('day', CAST(s.t0 AS DATE),
                                   CAST(p.tp AS DATE))
                    ELSE date_diff('day', CAST(s.t0 AS DATE),
                                   CAST(h.horizon AS DATE)) END AS d,
               p.tp IS NOT NULL AS obs
        FROM s LEFT JOIN p USING (user_id) CROSS JOIN h
    ),
    cnt AS (
        SELECT arm1, d, COUNT(*) AS n_all, count_if(obs) AS n_obs
        FROM dur GROUP BY arm1, d
    ),
    alldays AS (SELECT DISTINCT d FROM cnt),
    arms AS (SELECT DISTINCT arm1 FROM cnt),
    grid AS (
        SELECT a.d, b.arm1,
               COALESCE(c.n_all, 0) AS n_all,
               COALESCE(c.n_obs, 0) AS n_obs
        FROM alldays a CROSS JOIN arms b
        LEFT JOIN cnt c ON c.d = a.d AND c.arm1 = b.arm1
    ),
    risk AS (
        SELECT d, arm1, n_obs,
               SUM(n_all) OVER (PARTITION BY arm1)
               - (SUM(n_all) OVER (PARTITION BY arm1 ORDER BY d
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) - n_all)
                   AS n_risk
        FROM grid
    ),
    byday AS (
        SELECT d,
               CAST(MAX(CASE WHEN arm1 THEN n_risk END) AS BIGINT) AS n1,
               CAST(MAX(CASE WHEN arm1 THEN n_obs END) AS BIGINT) AS d1,
               CAST(SUM(n_risk) AS BIGINT) AS n,
               CAST(SUM(n_obs) AS BIGINT) AS dd
        FROM risk GROUP BY d
    ),
    terms AS (
        SELECT d1,
               CAST(FLOOR(CAST(dd AS DOUBLE) * n1 / n
                          * 1073741824.0 + 0.5) AS BIGINT) AS e_fp,
               CAST(FLOOR(CAST(dd AS DOUBLE) * n1 / n
                          * (1.0 - CAST(n1 AS DOUBLE) / n)
                          * (n - dd) / (n - 1)
                          * 1073741824.0 + 0.5) AS BIGINT) AS v_fp
        FROM byday WHERE dd > 0 AND n >= 2
    ),
    agg AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               CAST(SUM(e_fp) AS BIGINT) AS e1_fp,
               CAST(SUM(v_fp) AS BIGINT) AS v_fp
        FROM terms
    ),
    narm AS (
        SELECT count_if(arm1) AS n_treated,
               count_if(NOT arm1) AS n_control
        FROM dur
    )
    SELECT CAST(narm.n_treated AS INTEGER) AS n_treated,
           CAST(narm.n_control AS INTEGER) AS n_control,
           agg.o1 AS observed_treated,
           CAST(agg.e1_fp AS DOUBLE) / 1073741824.0 AS expected_treated,
           (CAST(agg.o1 AS DOUBLE)
            - CAST(agg.e1_fp AS DOUBLE) / 1073741824.0)
               / sqrt(CAST(agg.v_fp AS DOUBLE) / 1073741824.0) AS z,
           abs((CAST(agg.o1 AS DOUBLE)
                - CAST(agg.e1_fp AS DOUBLE) / 1073741824.0)
               / sqrt(CAST(agg.v_fp AS DOUBLE) / 1073741824.0))
               > CAST(1.96 AS DOUBLE) AS arms_differ
    FROM agg, narm
    """,
)
def signup_purchase_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank between the parity arms on signup→purchase
    time (treated conversions delayed 5 days as the planted effect).
    Corpus cost = the same duration construction as the KM curve;
    risk sets come from per-arm cumulative windows over day-grain
    counts; every cross-day reduction is an exact integer sum."""
    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    delay = F.when(
        F.col("user_id") % 2 == 0, F.expr("INTERVAL 5 DAYS")
    ).otherwise(F.expr("INTERVAL 0 DAYS"))
    p = (
        s.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .where(F.col("pts") >= F.col("t0") + delay)
        .groupBy("user_id")
        .agg(F.min("pts").alias("tp"))
    )
    h = ev.agg(F.max("ts").alias("horizon"))
    dur = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(h))
        .select(
            (F.col("user_id") % 2 == 0).alias("arm1"),
            F.when(
                F.col("tp").isNotNull(),
                F.datediff(F.col("tp").cast("date"), F.col("t0").cast("date")),
            )
            .otherwise(
                F.datediff(
                    F.col("horizon").cast("date"), F.col("t0").cast("date")
                )
            )
            .alias("d"),
            F.col("tp").isNotNull().alias("obs"),
        )
    )
    cnt = dur.groupBy("arm1", "d").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("obs"), F.lit(1))).alias("n_obs"),
    ).localCheckpoint()
    alldays = cnt.select("d").distinct()
    arms = cnt.select("arm1").distinct()
    grid = (
        alldays.crossJoin(arms)
        .join(cnt, ["d", "arm1"], "left")
        .select(
            "d",
            "arm1",
            F.coalesce("n_all", F.lit(0)).alias("n_all"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )
    warm = Window.partitionBy("arm1")
    wcum = (
        Window.partitionBy("arm1")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = grid.select(
        "d",
        "arm1",
        "n_obs",
        (
            F.sum("n_all").over(warm)
            - (F.sum("n_all").over(wcum) - F.col("n_all"))
        ).alias("n_risk"),
    )
    byday = risk.groupBy("d").agg(
        F.max(F.when(F.col("arm1"), F.col("n_risk")))
        .cast("bigint")
        .alias("n1"),
        F.max(F.when(F.col("arm1"), F.col("n_obs")))
        .cast("bigint")
        .alias("d1"),
        F.sum("n_risk").cast("bigint").alias("n"),
        F.sum("n_obs").cast("bigint").alias("dd"),
    )
    terms = byday.where((F.col("dd") > 0) & (F.col("n") >= 2)).select(
        "d1",
        F.floor(
            F.col("dd").cast("double") * F.col("n1") / F.col("n")
            * F.lit(1073741824.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("e_fp"),
        F.floor(
            F.col("dd").cast("double") * F.col("n1") / F.col("n")
            * (F.lit(1.0) - F.col("n1").cast("double") / F.col("n"))
            * (F.col("n") - F.col("dd"))
            / (F.col("n") - 1)
            * F.lit(1073741824.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("v_fp"),
    )
    agg = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e_fp").cast("bigint").alias("e1_fp"),
        F.sum("v_fp").cast("bigint").alias("v_fp"),
    )
    narm = dur.agg(
        F.count(F.when(F.col("arm1"), F.lit(1))).alias("n_treated"),
        F.count(F.when(~F.col("arm1"), F.lit(1))).alias("n_control"),
    )
    zc = (
        F.col("o1").cast("double")
        - F.col("e1_fp").cast("double") / F.lit(1073741824.0)
    ) / F.sqrt(F.col("v_fp").cast("double") / F.lit(1073741824.0))
    return agg.crossJoin(narm).select(
        F.col("n_treated").cast("int").alias("n_treated"),
        F.col("n_control").cast("int").alias("n_control"),
        F.col("o1").alias("observed_treated"),
        (F.col("e1_fp").cast("double") / F.lit(1073741824.0)).alias(
            "expected_treated"
        ),
        zc.alias("z"),
        (F.abs(zc) > F.lit(1.96)).alias("arms_differ"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects: the distributional complement of the
# causal family's mean estimators (an effect on the tail is
# invisible to an ATE). Per-arm exact interpolated quantiles of
# cents at p ∈ {.25, .5, .75}; QTE(p) = q_t(p) − q_c(p). A +$15
# shift is planted into the treated arm's purchase values (the
# family's standard canary) — the median-effect flag must fire for
# exactly that type at every SF.
# ---------------------------------------------------------------------------


@_q(
    "value_qte",
    """
    WITH e AS (
        SELECT event_type,
               user_id % 2 = 0 AS treated,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   + (CASE WHEN event_type = 'purchase'
                            AND user_id % 2 = 0
                           THEN 1500 ELSE 0 END) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    q AS (
        SELECT event_type,
               COUNT(*) FILTER (WHERE treated) AS n_t,
               COUNT(*) FILTER (WHERE NOT treated) AS n_c,
               quantile_cont(cents, 0.25) FILTER (WHERE treated) AS qt25,
               quantile_cont(cents, 0.50) FILTER (WHERE treated) AS qt50,
               quantile_cont(cents, 0.75) FILTER (WHERE treated) AS qt75,
               quantile_cont(cents, 0.25) FILTER (WHERE NOT treated)
                   AS qc25,
               quantile_cont(cents, 0.50) FILTER (WHERE NOT treated)
                   AS qc50,
               quantile_cont(cents, 0.75) FILTER (WHERE NOT treated)
                   AS qc75
        FROM e GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_t AS INTEGER) AS n_treated,
           CAST(n_c AS INTEGER) AS n_control,
           qt25 - qc25 AS qte_p25,
           qt50 - qc50 AS qte_p50,
           qt75 - qc75 AS qte_p75,
           abs(qt50 - qc50) > CAST(500.0 AS DOUBLE) AS median_effect
    FROM q
    """,
)
def value_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantile treatment effects on exact cents
    (interpolated order statistics — sort-within-group, the
    order_value_percentiles discipline). One aggregation computes
    all six per-arm quantiles; at 100 TB the per-group exact sort
    holds because groups partition the data (global QTE switches to
    the mergeable quantile summary)."""
    ev = read_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast(
        "bigint"
    ) + F.when(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0),
        F.lit(1500),
    ).otherwise(F.lit(0))
    e = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("treated"),
        cents.alias("cents"),
    )
    tcents = F.when(F.col("treated"), F.col("cents"))
    ccents = F.when(~F.col("treated"), F.col("cents"))
    q = e.groupBy("event_type").agg(
        F.count(tcents).alias("n_t"),
        F.count(ccents).alias("n_c"),
        F.percentile(tcents, F.lit(0.25)).alias("qt25"),
        F.percentile(tcents, F.lit(0.50)).alias("qt50"),
        F.percentile(tcents, F.lit(0.75)).alias("qt75"),
        F.percentile(ccents, F.lit(0.25)).alias("qc25"),
        F.percentile(ccents, F.lit(0.50)).alias("qc50"),
        F.percentile(ccents, F.lit(0.75)).alias("qc75"),
    )
    return q.select(
        "event_type",
        F.col("n_t").cast("int").alias("n_treated"),
        F.col("n_c").cast("int").alias("n_control"),
        (F.col("qt25") - F.col("qc25")).alias("qte_p25"),
        (F.col("qt50") - F.col("qc50")).alias("qte_p50"),
        (F.col("qt75") - F.col("qc75")).alias("qte_p75"),
        (F.abs(F.col("qt50") - F.col("qc50")) > F.lit(500.0)).alias(
            "median_effect"
        ),
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
# the word co-occurrence (adjacency) graph — the unsupervised
# keyword/keyphrase baseline. Reuses graph.pagerank verbatim on a
# vocabulary-sized graph; the corpus pass is one bigram explode.
# Same 3-round/damping-7/8 unrolled-oracle discipline as
# brand_copurchase_pagerank.
# ---------------------------------------------------------------------------


@_q(
    "corpus_textrank_keywords",
    r"""
    WITH t AS (
        SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(w[1:len(w) - 1],
               (x, i) -> x || ' ' || w[i + 1])) AS g
        FROM t
    ),
    p0 AS (
        SELECT string_split(g, ' ')[1] AS a,
               string_split(g, ' ')[2] AS b
        FROM bg
    ),
    pairs AS (
        SELECT least(a, b) AS s, greatest(a, b) AS t, COUNT(*) AS w
        FROM p0 WHERE a <> b GROUP BY least(a, b), greatest(a, b)
    ),
    e0 AS (SELECT s, t, w FROM pairs
           UNION ALL SELECT t AS s, s AS t, w FROM pairs),
    e AS (SELECT s, t, SUM(w) AS w FROM e0 GROUP BY s, t),
    deg AS (SELECT s AS v, SUM(w) AS d FROM e GROUP BY s),
    nt AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT v, 1.0 / nt.n AS r FROM deg, nt),
    i1 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r0 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r1 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i1.sc, 0.0) AS r
           FROM deg LEFT JOIN i1 ON deg.v = i1.v, nt),
    i2 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r1 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r2 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i2.sc, 0.0) AS r
           FROM deg LEFT JOIN i2 ON deg.v = i2.v, nt),
    i3 AS (SELECT e.t AS v, SUM(r.r * e.w / d.d) AS sc
           FROM e JOIN r2 r ON r.v = e.s JOIN deg d ON d.v = e.s
           GROUP BY e.t),
    r3 AS (SELECT deg.v, 0.125 / nt.n + 0.875 * COALESCE(i3.sc, 0.0) AS r
           FROM deg LEFT JOIN i3 ON deg.v = i3.v, nt)
    SELECT term, textrank, CAST(rn AS INTEGER) AS rnk FROM (
        SELECT v AS term, ROUND(r, 12) AS textrank,
               ROW_NUMBER() OVER (ORDER BY ROUND(r, 12) DESC, v) AS rn
        FROM r3) z
    WHERE rn <= 15
    """,
)
def corpus_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 TextRank keywords of the corpus. Adjacency edges from
    one zip_with bigram explode (codegen path), PageRank via
    graph.pagerank (per-round join+agg on the vocabulary-sized
    graph, exact-integer weights/strengths per contribution), ranks
    on the shared 1e-12 grid with a term tie-break."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(dedup.tokens("text").alias("w"))
    bg = toks.select(
        F.explode(dedup.ngram_array(F.col("w"), 2)).alias("g")
    ).select(
        F.split(F.col("g"), " ").getItem(0).alias("a"),
        F.split(F.col("g"), " ").getItem(1).alias("b"),
    )
    pairs = (
        bg.where(F.col("a") != F.col("b"))
        .groupBy(
            F.least("a", "b").alias("s"), F.greatest("a", "b").alias("t")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pr = graph.pagerank(
        pairs, src="s", dst="t", weight_col="w", n_iter=3, damping=0.875
    )
    ranked = pr.select(
        F.col("vertex").alias("term"),
        F.round("pagerank", 12).alias("textrank"),
    ).withColumn(
        "rnk",
        F.row_number()
        .over(Window.orderBy(F.desc("textrank"), F.asc("term")))
        .cast("int"),
    )
    return ranked.where(F.col("rnk") <= 15)


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (the FastCDC/LBFS family): cut each
# document where a rolling content hash passes a gate (md5 of the
# 8-gram ending at the position, mod 32), so chunk BOUNDARIES move
# with the content — an insertion near the start re-chunks only its
# neighborhood, and every downstream chunk still dedups (the
# property fixed-size blocks lack; pinned by a pytest). The corpus
# dedup report (shared chunks, chars saved) is the storage-layer
# complement of the document-level near-dup surface.
# ---------------------------------------------------------------------------


@_q(
    "cdc_chunk_dedup",
    """
    WITH g AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
               list_filter(range(8, CAST(length(text) AS BIGINT)),
                   i -> CAST(('0x' || substring(md5(
                            substr(text, CAST(i AS INTEGER) - 7, 8)),
                            1, 15)) AS BIGINT) % 32 = 31) AS cuts
        FROM documents
    ),
    b AS (
        SELECT doc_id, text,
               list_prepend(CAST(0 AS BIGINT),
                            list_append(cuts, n)) AS bs
        FROM g WHERE n > 0
    ),
    chunks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(bs)),
                   j -> substr(text, CAST(bs[j] + 1 AS INTEGER),
                               CAST(bs[j + 1] - bs[j] AS INTEGER))))
                   AS chunk
        FROM b
    ),
    pc AS (
        SELECT md5(chunk) AS cid,
               CAST(length(MIN(chunk)) AS BIGINT) AS clen,
               COUNT(*) AS cnt
        FROM chunks GROUP BY md5(chunk)
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS total_chunks,
           CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared_chunks,
           CAST(SUM(clen * cnt) AS BIGINT) AS total_chars,
           CAST(SUM(clen * (cnt - 1)) AS BIGINT) AS dedup_savings_chars,
           CAST(SUM(clen * (cnt - 1)) AS DOUBLE) / SUM(clen * cnt)
               AS savings_ratio,
           CAST(SUM(clen * cnt) AS DOUBLE) / SUM(cnt) AS mean_chunk_len
    FROM pc
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level CDC dedup report: gate = md5(8-gram) mod 32
    (expected chunk ~32 chars), chunks from boundary-array slicing —
    all native expressions inside one scan projection; the stats are
    one chunk-hash aggregation. At 100 TB the (chunk-hash → count)
    agg is the only shuffle and it moves hashes, not text."""
    docs = read_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        "text",
        F.expr(
            "CASE WHEN length(text) < 9 THEN array()"
            " ELSE filter(sequence(8L, cast(length(text) as bigint) - 1),"
            " i -> cast(conv(substring(md5("
            "substr(text, cast(i as int) - 7, 8)), 1, 15), 16, 10)"
            " as bigint) % 32 = 31) END"
        ).alias("cuts"),
    ).where(F.length("text") > 0)
    b = g.select(
        "doc_id",
        "text",
        F.expr(
            "concat(array(0L), cuts,"
            " array(cast(length(text) as bigint)))"
        ).alias("bs"),
    )
    chunks = b.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(bs) - 1),"
                " j -> substr(text,"
                " cast(element_at(bs, j) + 1 as int),"
                " cast(element_at(bs, j + 1) - element_at(bs, j) as int)))"
            )
        ).alias("chunk"),
    )
    pc = chunks.groupBy(F.md5("chunk").alias("cid")).agg(
        F.length(F.min("chunk")).cast("bigint").alias("clen"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return pc.agg(
        F.sum("cnt").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.sum(F.when(F.col("cnt") > 1, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("shared_chunks"),
        F.sum(F.col("clen") * F.col("cnt")).cast("bigint").alias(
            "total_chars"
        ),
        F.sum(F.col("clen") * (F.col("cnt") - 1))
        .cast("bigint")
        .alias("dedup_savings_chars"),
        (
            F.sum(F.col("clen") * (F.col("cnt") - 1)).cast("double")
            / F.sum(F.col("clen") * F.col("cnt"))
        ).alias("savings_ratio"),
        (
            F.sum(F.col("clen") * F.col("cnt")).cast("double")
            / F.sum("cnt")
        ).alias("mean_chunk_len"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between daily value totals and daily
# event counts — Kendall's companion (daily_kendall_tau), computed
# as Pearson over midranks. Doubled midranks are exact integers
# (the Mann-Whitney trick), so all five correlation moments are
# exact BIGINTs and ρ is one IEEE chain.
# ---------------------------------------------------------------------------


@_q(
    "daily_spearman_rho",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS cents,
               COUNT(*) AS n_events
        FROM events WHERE value IS NOT NULL
        GROUP BY CAST(ts AS DATE)
    ),
    g AS (
        SELECT d.day,
               (SELECT 2 * COUNT(*) FILTER (WHERE d2.cents < d.cents)
                       + COUNT(*) FILTER (WHERE d2.cents = d.cents) + 1
                FROM daily d2) AS rx2,
               (SELECT 2 * COUNT(*) FILTER (WHERE d2.n_events < d.n_events)
                       + COUNT(*) FILTER (WHERE d2.n_events = d.n_events)
                       + 1
                FROM daily d2) AS ry2
        FROM daily d
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(rx2) AS BIGINT) AS sx,
               CAST(SUM(ry2) AS BIGINT) AS sy,
               CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
               CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
               CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
        FROM g
    )
    SELECT CAST(n AS INTEGER) AS n_days,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS spearman_rho
    FROM mom
    """,
)
def daily_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ρ between daily revenue and daily volume on exact doubled
    midranks (2·midrank = 2·#{below} + #{ties} + 1 — computed here
    with rank windows, calendar-sized frame). Moments are exact
    BIGINTs; ρ is one exactly-rounded chain. The oracle states
    midranks as correlated-subquery counts — same integers."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # 2·midrank = 2·rank − 1 + (ties−1) = rank + max_rank_of_tie − 1;
    # via window counts: 2·#{<v} + #{=v} + 1
    wx_lt = Window.orderBy("cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    wy_lt = Window.orderBy("n_events").rangeBetween(
        Window.unboundedPreceding, -1
    )
    wx_eq = Window.partitionBy("cents")
    wy_eq = Window.partitionBy("n_events")
    g = daily.select(
        "day",
        (
            2 * F.coalesce(F.count(F.lit(1)).over(wx_lt), F.lit(0))
            + F.count(F.lit(1)).over(wx_eq)
            + 1
        )
        .cast("bigint")
        .alias("rx2"),
        (
            2 * F.coalesce(F.count(F.lit(1)).over(wy_lt), F.lit(0))
            + F.count(F.lit(1)).over(wy_eq)
            + 1
        )
        .cast("bigint")
        .alias("ry2"),
    )
    mom = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").cast("bigint").alias("sx"),
        F.sum("ry2").cast("bigint").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    rho = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / F.sqrt(
        (
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            nd * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return mom.select(
        F.col("n").cast("int").alias("n_days"),
        rho.alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Distribution-free median confidence interval from order statistics
# (the binomial/sign-test CI): the (l, u) ranks bracketing the
# median with ≥95% coverage need NO distributional assumption and NO
# bootstrap resampling — l = ⌊n/2 − 1.96·√n/2⌋, u = n + 1 − l
# (normal approximation to Binomial(n, ½)). Order-statistic
# selection on exact cents; at 100 TB the rank selection rides the
# same per-group sort the exact percentiles use.
# ---------------------------------------------------------------------------


@_q(
    "value_median_ci",
    """
    WITH e AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cents) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM e
    ),
    b AS (
        SELECT event_type, cents, rn, n,
               CAST(FLOOR(CAST(n AS DOUBLE) / 2.0
                          - 1.96 * sqrt(CAST(n AS DOUBLE)) / 2.0)
                    AS BIGINT) AS l
        FROM r
    )
    SELECT event_type,
           CAST(MAX(n) AS INTEGER) AS n,
           CAST(MAX(CASE WHEN rn = l THEN cents END) AS BIGINT)
               AS ci_lo_cents,
           quantile_cont(cents, 0.50) AS median_cents,
           CAST(MAX(CASE WHEN rn = n + 1 - l THEN cents END) AS BIGINT)
               AS ci_hi_cents
    FROM b GROUP BY event_type
    """,
)
def value_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% distribution-free median CI per event type on exact
    cents. One per-type rank window (the group sort the exact
    percentiles already pay), rank bounds from the binomial normal
    approximation (floor of an IEEE-exact chain — engine-identical),
    conditional-aggregate selection of the bracketing order
    statistics."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    l = F.floor(
        F.col("n").cast("double") / F.lit(2.0)
        - F.lit(1.96) * F.sqrt(F.col("n").cast("double")) / F.lit(2.0)
    ).cast("bigint")
    b = r.withColumn("l", l)
    return b.groupBy("event_type").agg(
        F.max("n").cast("int").alias("n"),
        F.max(F.when(F.col("rn") == F.col("l"), F.col("cents")))
        .cast("bigint")
        .alias("ci_lo_cents"),
        F.percentile("cents", F.lit(0.50)).alias("median_cents"),
        F.max(
            F.when(F.col("rn") == F.col("n") + 1 - F.col("l"), F.col("cents"))
        )
        .cast("bigint")
        .alias("ci_hi_cents"),
    )


# ---------------------------------------------------------------------------
# Mutual-information feature ranking: plug-in MI(X; Y) between each
# candidate feature and the high-value label — the
# information-gain screen a feature-selection pipeline runs before
# training. Every cell term (c/N)·ln(c·N/(c_x·c_y)) is ln of an
# exact integer ratio times an exact ratio, snapped to the 2^-40
# grid; the per-feature MI is an order-free integer sum over the
# feature's cells.
# ---------------------------------------------------------------------------


@_q(
    "feature_mi_ranking",
    """
    WITH e AS (
        SELECT event_type,
               CAST(dayofweek(ts) AS VARCHAR) AS dow,
               CAST(hour(ts) // 6 AS VARCHAR) AS hour_bucket,
               CAST(user_id % 2 AS VARCHAR) AS user_parity,
               CAST(value >= 200 AS INTEGER) AS y
        FROM events WHERE value IS NOT NULL
    ),
    x AS (
        SELECT 'event_type' AS feature, event_type AS x, y FROM e
        UNION ALL SELECT 'day_of_week', dow, y FROM e
        UNION ALL SELECT 'hour_bucket', hour_bucket, y FROM e
        UNION ALL SELECT 'user_parity', user_parity, y FROM e
    ),
    cells AS (
        SELECT feature, x, y, COUNT(*) AS c FROM x GROUP BY feature, x, y
    ),
    mx AS (SELECT feature, x, SUM(c) AS cx FROM cells
           GROUP BY feature, x),
    my AS (SELECT feature, y, SUM(c) AS cy FROM cells
           GROUP BY feature, y),
    nn AS (SELECT feature, SUM(c) AS n FROM cells GROUP BY feature),
    terms AS (
        SELECT c.feature,
               CAST(FLOOR(CAST(c.c AS DOUBLE) / nn.n
                          * ln(CAST(c.c AS DOUBLE) * nn.n
                               / (CAST(mx.cx AS DOUBLE) * my.cy))
                          * 1099511627776.0 + 0.5) AS BIGINT) AS t_fp
        FROM cells c
        JOIN mx ON mx.feature = c.feature AND mx.x = c.x
        JOIN my ON my.feature = c.feature AND my.y = c.y
        JOIN nn ON nn.feature = c.feature
    ),
    mi AS (
        SELECT feature, COUNT(*) AS n_cells,
               CAST(SUM(t_fp) AS BIGINT) AS mi_fp
        FROM terms GROUP BY feature
    )
    SELECT feature, CAST(n_cells AS INTEGER) AS n_cells,
           CAST(mi_fp AS DOUBLE) / 1099511627776.0 AS mi_nats,
           CAST(ROW_NUMBER() OVER (ORDER BY mi_fp DESC, feature)
                AS INTEGER) AS rnk
    FROM mi
    """,
)
def feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of four candidate features against the
    high-value label. One union projection + one (feature, x, y)
    agg; marginals and terms run on cell-count-sized frames; ranks
    compare exact fixed-point integers. MI near 0 everywhere is the
    correct reading for this generator (the label is independent of
    all four features) — the RANKING still discriminates and is
    grid-deterministic."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("string").alias("dow"),
        F.floor(F.hour("ts") / 6).cast("int").cast("string").alias(
            "hour_bucket"
        ),
        (F.col("user_id") % 2).cast("string").alias("user_parity"),
        (F.col("value") >= 200).cast("int").alias("y"),
    )
    parts = [
        e.select(F.lit("event_type").alias("feature"),
                 F.col("event_type").alias("x"), "y"),
        e.select(F.lit("day_of_week").alias("feature"),
                 F.col("dow").alias("x"), "y"),
        e.select(F.lit("hour_bucket").alias("feature"),
                 F.col("hour_bucket").alias("x"), "y"),
        e.select(F.lit("user_parity").alias("feature"),
                 F.col("user_parity").alias("x"), "y"),
    ]
    x = parts[0]
    for p in parts[1:]:
        x = x.unionByName(p)
    cells = x.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = cells.groupBy("feature", "x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("feature", "y").agg(F.sum("c").alias("cy"))
    nn = cells.groupBy("feature").agg(F.sum("c").alias("n"))
    terms = (
        cells.join(mx, ["feature", "x"])
        .join(my, ["feature", "y"])
        .join(nn, "feature")
        .select(
            "feature",
            F.floor(
                F.col("c").cast("double") / F.col("n")
                * F.log(
                    F.col("c").cast("double") * F.col("n")
                    / (F.col("cx").cast("double") * F.col("cy"))
                )
                * F.lit(1099511627776.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("t_fp"),
        )
    )
    mi = terms.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("t_fp").cast("bigint").alias("mi_fp"),
    )
    return mi.select(
        "feature",
        F.col("n_cells").cast("int").alias("n_cells"),
        (F.col("mi_fp").cast("double") / F.lit(1099511627776.0)).alias(
            "mi_nats"
        ),
        F.row_number()
        .over(Window.orderBy(F.desc("mi_fp"), F.asc("feature")))
        .cast("int")
        .alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Per-source quality thresholds: "keep the top 20%" means different
# absolute cutoffs per source — applying one GLOBAL cutoff instead
# skews the mix toward sources whose scorer runs hot. This report
# quantifies that: each source's own 80th-percentile cutoff (exact
# interpolated quantile on the published 1e-4 score grid) next to
# its pass count under the global cutoff. The standard argument for
# per-source (stratified) thresholding in curation pipelines.
# ---------------------------------------------------------------------------


@_q(
    "source_quality_thresholds",
    f"""
    WITH q AS ({{doc_quality}}),
    dq AS (
        SELECT d.source,
               CAST(FLOOR(q.quality_score * 10000.0 + 0.5) AS BIGINT)
                   AS q_fp
        FROM documents d JOIN q ON q.doc_id = d.doc_id
    ),
    gq AS (SELECT quantile_cont(q_fp, 0.80) AS g80 FROM dq),
    per_src AS (
        SELECT source, COUNT(*) AS n,
               quantile_cont(q_fp, 0.80) AS s80
        FROM dq GROUP BY source
    ),
    pass AS (
        SELECT dq.source,
               SUM(CASE WHEN CAST(dq.q_fp AS DOUBLE) >= gq.g80
                        THEN 1 ELSE 0 END) AS n_pass_global
        FROM dq, gq GROUP BY dq.source
    )
    SELECT p.source, CAST(p.n AS INTEGER) AS n_docs,
           p.s80 / 10000.0 AS source_q80,
           g.g80 / 10000.0 AS global_q80,
           CAST(ps.n_pass_global AS INTEGER) AS n_pass_global,
           CAST(ps.n_pass_global AS DOUBLE) / p.n AS global_pass_share,
           p.s80 > g.g80 AS runs_hot
    FROM per_src p JOIN pass ps ON ps.source = p.source, gq g
    """,
)
def source_quality_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20% cutoffs per source vs the global cutoff, with each
    source's pass share under the global rule (0.2 everywhere iff
    scorers are exchangeable across sources — deviations are the
    selection skew). One quality pass; per-source quantiles ride the
    group sort; the global quantile broadcasts back as one row."""
    docs = read_table(spark, sf_dir, "documents")
    q = textfn.quality_features(docs, "doc_id", "text").select(
        "doc_id",
        F.floor(F.col("quality_score") * F.lit(10000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("q_fp"),
    )
    dq = docs.select("doc_id", "source").join(q, "doc_id").localCheckpoint()
    glob = dq.agg(F.percentile("q_fp", F.lit(0.80)).alias("g80"))
    per_src = dq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("q_fp", F.lit(0.80)).alias("s80"),
    )
    pass_ = (
        dq.crossJoin(F.broadcast(glob))
        .groupBy("source")
        .agg(
            F.sum(
                F.when(
                    F.col("q_fp").cast("double") >= F.col("g80"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_pass_global")
        )
    )
    return (
        per_src.join(pass_, "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            F.col("n").cast("int").alias("n_docs"),
            (F.col("s80") / F.lit(10000.0)).alias("source_q80"),
            (F.col("g80") / F.lit(10000.0)).alias("global_q80"),
            F.col("n_pass_global").cast("int").alias("n_pass_global"),
            (F.col("n_pass_global").cast("double") / F.col("n")).alias(
                "global_pass_share"
            ),
            (F.col("s80") > F.col("g80")).alias("runs_hot"),
        )
    )


ORACLES["source_quality_thresholds"] = ORACLES[
    "source_quality_thresholds"
].format(doc_quality=ORACLES["doc_quality"])


# ---------------------------------------------------------------------------
# r9 registry-freeze lift: the ten codec/media/LRS queries prepared in
# plans/pending_queries.py across r6-r8 (VERDICT r8 #1 — the never-
# driver-checked backlog fell to 44 <= 50, the builder's own freeze
# threshold). Bodies are verbatim from the pending module, where each
# was differentially suite-tested against its oracle since it landed;
# promotion is a registration event, not a semantic change.
# ---------------------------------------------------------------------------

@_q(
    "image_png_metrics",
    """
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(120 AS INTEGER) AS mean_r,
           CAST(120 AS INTEGER) AS mean_g,
           CAST(doc_id AS INTEGER) AS mean_b
    FROM documents WHERE doc_id < 60
    """,
)
def image_png_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``image_bmp_metrics`` twin through the REAL PNG path
    (chunk walk + zlib inflate + scanline unfiltering): synthesize
    the same 16×16 gradient as a PNG per media row, decode it back
    through ``multimodal._decode_png``, and emit the RECOVERED
    dimensions and exact per-channel means. A filter-type bug
    (Sub/Up/Average/Paeth), a stride error, or a color-type mixup
    changes the means and fails the compare; matching
    ``image_bmp_metrics``'s oracle values IS the format-invariance
    statement.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_png(16, 16, int(b)))
                for m, b in zip(pdf["media_id"], pdf["blue"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    png = base.mapInPandas(synth, "media_id long, payload binary")
    feats = mm.extract_image_features(png)
    chan = lambda i: F.round(  # noqa: E731
        F.col("features")[i] * 255, 0
    ).cast("int")
    return feats.select(
        "media_id",
        "width",
        "height",
        chan(0).alias("mean_r"),
        chan(4).alias("mean_g"),
        chan(8).alias("mean_b"),
    )


@_q(
    "gif_lzw_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           TRUE AS pixels_match_bmp,
           CAST(120 AS INTEGER) AS mean_r,
           CAST(doc_id AS INTEGER) AS mean_b
    FROM documents WHERE doc_id < 60
    """,
)
def gif_lzw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF encode → LZW decode → pixel-exact comparison against the
    BMP twin of the same gradient, per media row: exercises the
    variable-width LZW codes, table growth, and palette indirection
    end-to-end inside the engine (the encoder and decoder are
    independent implementations, so agreement is a differential
    check, not a tautology). ``pixels_match_bmp`` is computed by
    decoding BOTH payloads in the UDF and comparing arrays — one
    wrong index anywhere flips it to false and fails the driver
    hash; the channel means re-state the closed form.

    Scale shape: both decodes happen in the one mapInPandas stage;
    only ~40-byte metric rows leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    out_schema = (
        "media_id long, width int, height int, "
        "pixels_match_bmp boolean, mean_r int, mean_b int"
    )

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for m, b in zip(pdf["media_id"], pdf["blue"]):
                gif = mm.synth_gif(16, 16, int(b))
                bmp = mm.synth_bmp(16, 16, int(b))
                gw, gh, gframes = mm._decode_gif(gif)
                _, _, bpx = mm._decode_bmp(bmp)
                gpx = gframes[0]
                rows.append(
                    (
                        int(m),
                        gw,
                        gh,
                        bool(np.array_equal(gpx, bpx)),
                        int(round(gpx[:, :, 0].mean())),
                        int(round(gpx[:, :, 2].mean())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "pixels_match_bmp",
                    "mean_r",
                    "mean_b",
                ],
            )

    return base.mapInPandas(roundtrip, out_schema)


@_q(
    "image_jpeg_metrics",
    """
    SELECT doc_id AS media_id, mode,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(60 + doc_id AS INTEGER) AS mean_gray,
           TRUE AS channels_equal
    FROM documents
    CROSS JOIN (
        SELECT unnest(['baseline8', 'progressive8', 'sof1_12bit',
                       'lossless8'])
            AS mode
    )
    WHERE doc_id < 60
    """,
)
def image_jpeg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec-metrics family member for REAL JPEG across all three
    DCT Huffman entropy layouts (r7 baseline + progressive, r8
    12-bit SOF1) plus the r8 PREDICTIVE lossless mode (SOF3,
    bit-exact by construction): a grayscale two-band image (left half 60, right half
    60+2·doc_id) goes through each full encode → Huffman/DCT decode
    pipeline; grayscale block-constant content round-trips EXACTLY
    (DC-only blocks, all-ones quant — the 12-bit row encodes the
    samples << 4 at level shift 2048 and must come back bit-equal
    after the >> 4 output contract), so the recovered mean is the
    closed-form integer 60+doc_id with NO tolerance per mode — a
    quantization, zigzag, IDCT, predictor, scan-script, or
    level-shift bug shifts one mode's rows and fails the hash.
    ``channels_equal`` pins the gray-replication contract.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
    )

    out_schema = (
        "media_id long, mode string, width int, height int, "
        "mean_gray int, channels_equal boolean"
    )

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                g = np.full((16, 16), 60, dtype=np.uint8)
                g[:, 8:] = 60 + 2 * int(m)
                payloads = {
                    "baseline8": mm._encode_jpeg(g),
                    "progressive8": mm._encode_jpeg_progressive(g),
                    "sof1_12bit": mm._encode_jpeg(
                        g.astype(np.int64) << 4, precision=12
                    ),
                    "lossless8": mm._encode_jpeg_lossless(
                        g.astype(np.int64), predictor=4
                    ),
                }
                for mode, payload in payloads.items():
                    w, h, px = mm._decode_jpeg(payload)
                    rows.append(
                        (
                            int(m),
                            mode,
                            w,
                            h,
                            int(round(px[:, :, 0].mean())),
                            bool(
                                np.array_equal(px[:, :, 0], px[:, :, 1])
                                and np.array_equal(px[:, :, 0], px[:, :, 2])
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "mode",
                    "width",
                    "height",
                    "mean_gray",
                    "channels_equal",
                ],
            )

    return base.mapInPandas(roundtrip, out_schema)


@_q(
    "audio_g711_adpcm_metrics",
    """
    SELECT doc_id AS media_id, codec,
           CAST(8000 AS INTEGER) AS sample_rate,
           TRUE AS rms_ok, TRUE AS zcr_ok, TRUE AS centroid_ok
    FROM documents
    CROSS JOIN (SELECT unnest(['ulaw', 'alaw', 'ima_adpcm']) AS codec)
    WHERE doc_id < 20
    """,
)
def audio_g711_adpcm_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``audio_wav_metrics`` family member for REAL compressed
    audio (r7): a per-row sine tone is compressed through each real
    codec (G.711 u-law / A-law, IMA ADPCM) and decoded back through
    the standard metrics path — zero-crossing rate and spectral
    centroid must recover the tone frequency and rms its amplitude
    within the codec's quantization bound, turning each flag false on
    any expansion-table, sign-convention, or nibble-order bug.

    Scale shape: synth + compress + decode share one mapInPandas
    stage; payloads never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("media_id"),
        (200 + (F.col("doc_id") % 10) * 100).cast("double").alias("freq"),
    )

    out_schema = (
        "media_id long, codec string, sample_rate int, "
        "rms_ok boolean, zcr_ok boolean, centroid_ok boolean"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        sr = 8000
        a_rms = 0.5 / 2**0.5
        for pdf in batches:
            rows = []
            for m, f in zip(pdf["media_id"], pdf["freq"]):
                t = np.arange(sr)  # 1 second
                pcm = (
                    0.5 * 32767 * np.sin(2 * np.pi * float(f) * t / sr)
                ).astype(np.int16)
                for codec in ("ulaw", "alaw", "ima_adpcm"):
                    met = mm._decode_wav(
                        mm._encode_wav_compressed(pcm, sr, codec)
                    )
                    # ADPCM granular noise chatters extra crossings
                    # near zero — wider (still discriminating) band
                    zcr_tol = (
                        max(16.0, float(f) * 0.08)
                        if codec == "ima_adpcm"
                        else max(5.0, float(f) * 0.05)
                    )
                    rows.append(
                        (
                            int(m),
                            codec,
                            met["sample_rate"],
                            bool(abs(met["rms"] - a_rms) <= 0.02),
                            bool(abs(met["zcr_hz"] - float(f)) <= zcr_tol),
                            bool(
                                abs(met["centroid_hz"] - float(f))
                                <= max(10.0, float(f) * 0.10)
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "codec",
                    "sample_rate",
                    "rms_ok",
                    "zcr_ok",
                    "centroid_ok",
                ],
            )

    return base.mapInPandas(run, out_schema)


@_q(
    "audio_flac_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(4000 AS BIGINT) AS n_frames,
           TRUE AS lossless, TRUE AS compressed
    FROM documents WHERE doc_id < 30
    """,
)
def audio_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC codec end-to-end (r7): a per-row tone+ramp signal is
    FLAC-encoded and decoded back inside the UDF; ``lossless``
    compares the decoded PCM to the source sample-exact (the codec's
    defining property — any Rice, predictor, CRC, or decorrelation
    bug flips it), ``compressed`` asserts the payload actually beat
    raw PCM size (a store-only fake would fail it).

    Scale shape: synth + encode + decode share one mapInPandas stage;
    payloads never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("media_id"),
        (200 + (F.col("doc_id") % 10) * 100).cast("double").alias("freq"),
    )

    out_schema = (
        "media_id long, sample_rate int, n_frames long, "
        "lossless boolean, compressed boolean"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        sr, n = 8000, 4000
        for pdf in batches:
            rows = []
            for m, f in zip(pdf["media_id"], pdf["freq"]):
                t = np.arange(n)
                pcm = (
                    10000 * np.sin(2 * np.pi * float(f) * t / sr)
                    + (t % 64) * 16
                ).astype(np.int16)
                payload = mm._flac_encode(pcm, sr)
                d = mm._decode_flac(payload)
                rows.append(
                    (
                        int(m),
                        d["sample_rate"],
                        int(d["n_frames"]),
                        bool(
                            np.array_equal(d["pcm"][0], pcm.astype(np.int64))
                        ),
                        bool(len(payload) < 2 * n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "lossless",
                    "compressed",
                ],
            )

    return base.mapInPandas(run, out_schema)


@_q(
    "doc_quality_logistic",
    """
    WITH feats AS (
        SELECT CAST(lang = 'en' AS DOUBLE) AS y,
               CAST(n_chars AS DOUBLE) / 4096.0 AS f1,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS DOUBLE) / 64.0 AS f2
        FROM documents
    ),
    -- iter 1: w = 0 => p = 0.5 exactly (libm-free first step)
    g1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(FLOOR((0.5 - y) * 1048576.0 + 0.5) AS BIGINT)) AS g0,
               SUM(CAST(FLOOR((0.5 - y) * f1 * 1048576.0 + 0.5) AS BIGINT)) AS ga,
               SUM(CAST(FLOOR((0.5 - y) * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gb
        FROM feats
    ),
    w1 AS (
        SELECT n,
               0.0 - 0.25 * ((g0 / 1048576.0) / n) AS w0,
               0.0 - 0.25 * ((ga / 1048576.0) / n) AS wa,
               0.0 - 0.25 * ((gb / 1048576.0) / n) AS wb
        FROM g1
    ),
    g2 AS (
        SELECT w1.n, w1.w0, w1.wa, w1.wb,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * 1048576.0 + 0.5) AS BIGINT)) AS g0n,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f1 * 1048576.0 + 0.5) AS BIGINT)) AS gan,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gbn
        FROM feats CROSS JOIN w1
        GROUP BY ALL
    ),
    w2 AS (
        SELECT n,
               w0 - 0.25 * ((g0n / 1048576.0) / n) AS w0,
               wa - 0.25 * ((gan / 1048576.0) / n) AS wa,
               wb - 0.25 * ((gbn / 1048576.0) / n) AS wb
        FROM g2
    ),
    g3 AS (
        SELECT w2.n, w2.w0, w2.wa, w2.wb,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * 1048576.0 + 0.5) AS BIGINT)) AS g0n,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f1 * 1048576.0 + 0.5) AS BIGINT)) AS gan,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gbn
        FROM feats CROSS JOIN w2
        GROUP BY ALL
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND(w0 - 0.25 * ((g0n / 1048576.0) / n), 9) AS w_bias,
           ROUND(wa - 0.25 * ((gan / 1048576.0) / n), 9) AS w_chars,
           ROUND(wb - 0.25 * ((gbn / 1048576.0) / n), 9) AS w_spaces
    FROM g3
    """,
)
def doc_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality-classifier training (r7): 3 full-batch
    gradient-descent steps of logistic regression predicting
    lang='en' from two grid-rational text features (chars/4096,
    spaces/64 — integer counts over powers of two stay exact in
    doubles). Each step is one map-side-combinable scalar aggregate
    with per-row contributions snapped to the 2^-20 fixed-point grid,
    so the WEIGHT TRAJECTORY is bit-reproducible across engines —
    the oracle unrolls the identical three steps in SQL (step 1 is
    exp-free since σ(0) = 0.5 exactly). Emits (n_docs, final weights
    on the 1e-9 grid); any gradient, update, or feature-engineering
    divergence shifts the weights and fails the hash.

    Scale: per step one scan + a 1-row reduce; weights re-enter as
    literals (whole-stage codegen, no UDF) — identical plan at
    100 TB."""
    from ..operators.regression import logistic_regression_gd

    docs = read_table(spark, sf_dir, "documents")
    feats = docs.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        (F.col("n_chars").cast("double") / 4096.0).alias("f1"),
        (
            (
                F.length("text") - F.length(F.translate("text", " ", ""))
            ).cast("double")
            / 64.0
        ).alias("f2"),
    )
    w, n = logistic_regression_gd(
        feats, ["f1", "f2"], "y", lr=0.25, iters=3
    )
    return spark.createDataFrame(
        [(n, round(w[0], 9), round(w[1], 9), round(w[2], 9))],
        "n_docs long, w_bias double, w_chars double, w_spaces double",
    )


@_q(
    "video_y4m_scene_cuts",
    """
    SELECT doc_id AS media_id, fno AS frame_no,
           (fno % ((doc_id % 3) + 3) = 0) AS is_cut
    FROM documents
    CROSS JOIN (SELECT unnest(generate_series(1, 11)) AS fno)
    WHERE doc_id < 30
    """,
)
def video_y4m_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``video_scene_cuts`` through the REAL Y4M container path:
    12-frame yuv4mpeg2 clips (luma stripes whose width advances every
    ``period+3`` frames while brightness drifts EVERY frame), decoded
    by ``multimodal.sample_video_frames`` (real header parse + planar
    read + BT.601), re-encoded to per-frame PNGs, hashed with the
    real aHash, and cut-tested with one LAG window per clip. The
    drift defeats a naive pixel-diff detector; aHash's adaptive
    threshold ignores it, so hamming(prev, cur) > 0 exactly at
    pattern changes — closed form the oracle states per (doc_id %
    3). Frames never shuffle; the window runs on 16-byte hash rows."""
    from ..functions import multimodal as mm
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 3).cast("int").alias("period"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, per in zip(pdf["media_id"], pdf["period"]):
                frames = []
                for fno in range(12):
                    scene = fno // (int(per) + 3)
                    bright_cols = (2 + (scene % 5)) * 2
                    shift = fno % 5  # per-frame brightness drift
                    luma = np.full((16, 16), 40 + shift, dtype=np.uint8)
                    luma[:, :bright_cols] = 200 + shift
                    frames.append(luma)
                rows.append((int(mid), mm.synth_y4m(16, 16, frames)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    clips = base.mapInPandas(synth, "media_id long, payload binary")
    # n_frames = clip length ⇒ the center-of-bucket rule selects every
    # frame; each comes back as a real PNG payload.
    frames = mm.sample_video_frames(clips, n_frames=12)
    hashes = mm.average_hash(
        frames.select(
            (F.col("media_id") * 100 + F.col("frame_no")).alias("media_id"),
            "payload",
        )
    ).select(
        (F.col("media_id") / 100).cast("long").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_no"),
        "ahash",
    )
    w = Window.partitionBy("media_id").orderBy("frame_no")
    return (
        hashes.withColumn("prev", F.lag("ahash").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "media_id",
            "frame_no",
            (F.col("ahash") != F.col("prev")).alias("is_cut"),
        )
    )


@_q(
    "image_phash_clusters",
    """
    SELECT doc_id AS media_id,
           doc_id % 5 AS component,
           doc_id < 5 AS is_rep
    FROM documents WHERE doc_id < 60
    """,
)
def image_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`image_ahash_clusters`'s DCT twin through the REAL pHash path
    (r8, `multimodal.perceptual_hash`): synthesize the five-pattern
    BMP family (`synth_bmp_phash_pattern` — half splits, stripes,
    quadrant) with a per-doc brightness shift, decode → grayscale →
    area-pool → orthonormal 2-D DCT-II → median-threshold the 63
    low-frequency AC coefficients → 63-bit hash; hamming-0 pair
    edges close under `graph.connected_components`. pHash drops DC,
    so every brightness shift of a group hashes IDENTICALLY (DCT
    linearity — exact) while the five groups' low-frequency sign
    structures differ: the oracle states the clusters in closed form
    from the synthesis parameters (component = doc_id % 5). Any bug
    in the DCT basis, the pooling, the median threshold, the bit
    packing, the hamming join, or the CC iteration moves emitted
    values. Scale shape: payloads die inside the hashing UDF; the
    pair join and CC run on 16-byte hash rows."""
    from ..functions import multimodal as mm
    from ..operators import graph

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 5).cast("int").alias("g"),
        (F.col("doc_id") % 7).cast("int").alias("shift"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_bmp_phash_pattern(int(g), int(s)))
                for m, g, s in zip(pdf["media_id"], pdf["g"], pdf["shift"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    bmp = base.mapInPandas(synth, "media_id long, payload binary")
    hashes = mm.perceptual_hash(bmp).localCheckpoint(eager=True)
    a = hashes.select(
        F.col("media_id").alias("src"), F.col("phash").alias("ha")
    )
    b = hashes.select(
        F.col("media_id").alias("dst"), F.col("phash").alias("hb")
    )
    edges = (
        a.join(b, F.col("src") < F.col("dst"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) == 0)
        .select("src", "dst")
    )
    comp = graph.connected_components(edges, src="src", dst="dst")
    allv = hashes.select(F.col("media_id").alias("vertex"))
    full = allv.join(comp, "vertex", "left").select(
        "vertex",
        F.coalesce("component", F.col("vertex")).alias("component"),
    )
    return full.select(
        F.col("vertex").alias("media_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("vertex") == F.col("component")).alias("is_rep"),
    )


@_q(
    "corpus_longest_repeated_span",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    ),
    ls AS (SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks)))
               AS L),
    grams AS (
      SELECT doc_id, L, array_to_string(list_slice(t, p, p + L - 1), ' ')
                 AS g
      FROM pos CROSS JOIN ls
      WHERE p + L - 1 <= len(t)
    ),
    rep AS (
      SELECT L, g FROM grams GROUP BY L, g
      HAVING count(DISTINCT doc_id) >= 2
    ),
    best AS (SELECT max(L) AS span_len FROM rep)
    SELECT CAST(b.span_len AS BIGINT) AS span_len,
           count(*) AS n_spans,
           min(r.g) AS lexmin_span
    FROM rep r, best b WHERE r.L = b.span_len GROUP BY b.span_len
    """,
)
def corpus_longest_repeated_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest token span shared by >= 2 distinct documents (r8,
    `dedup.longest_repeated_span_length`) — the corpus duplication
    diagnostic Lee et al. 2022 read off a suffix array, computed by
    BINARY SEARCH on span length: each probe is one positional-L-gram
    aggregation over 8-byte xxhash64 keys (shuffle cost independent
    of L), O(log max_len) probes total, and the answer re-verified
    with exact strings (`repeated_spans_at` — a 64-bit collision
    cannot silently inflate the result). The oracle brute-forces all
    (position, length) grams — O(T·L) rows, fine at oracle scale,
    exactly the asymmetry the binary search exists to avoid. Emits
    (span_len, n_spans, lexmin_span): length, number of distinct
    spans at that length, lexicographically smallest one."""
    from ..operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    n = dedup.longest_repeated_span_length(docs, "doc_id", "text")
    spans = dedup.repeated_spans_at(docs, "doc_id", "text", n)
    return spans.agg(
        F.count("*").alias("n_spans"),
        F.min("span").alias("lexmin_span"),
    ).select(
        F.lit(n).cast("long").alias("span_len"),
        "n_spans",
        "lexmin_span",
    )


@_q(
    "corpus_repeated_span_occurrences",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    ),
    ls AS (SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks)))
               AS L),
    grams AS (
      SELECT doc_id, L, array_to_string(list_slice(t, p, p + L - 1), ' ')
                 AS g
      FROM pos CROSS JOIN ls
      WHERE p + L - 1 <= len(t)
    ),
    rep AS (
      SELECT L, g,
             count(*) AS n_occ,
             count(DISTINCT doc_id) AS n_docs
      FROM grams GROUP BY L, g
      HAVING count(*) >= 3
    ),
    best AS (SELECT max(L) AS span_len FROM rep)
    SELECT CAST(b.span_len AS BIGINT) AS span_len,
           count(*) AS n_spans,
           CAST(max(r.n_occ) AS BIGINT) AS max_occurrences,
           CAST(min(r.n_docs) AS BIGINT) AS min_docs_touched,
           min(r.g) AS lexmin_span
    FROM rep r, best b WHERE r.L = b.span_len GROUP BY b.span_len
    """,
)
def corpus_repeated_span_occurrences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`corpus_longest_repeated_span`'s OCCURRENCE-mode twin (r9,
    `min_count`): longest token span occurring at >= 3 positions
    anywhere in the corpus — within-doc repeats count, which is the
    suffix-array diagnostic's native semantics (Lee et al. 2022 count
    repeated substrings of the CONCATENATED corpus; a template pasted
    repeatedly into one document is duplication the distinct-doc mode
    cannot see). Same binary search on a monotone predicate — every
    occurrence of an L-gram contains its (L-1)-prefix at the same
    position — with occurrence-counting probes and exact re-verify.
    Emits (span_len, n_spans, max_occurrences, min_docs_touched,
    lexmin_span); min_docs_touched < 3 would prove a within-doc
    repeat contributed (at sf0.01 the answer span occurs 3x across
    docs; the tests pin the pure within-doc case)."""
    from ..operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    n = dedup.longest_repeated_span_length(
        docs, "doc_id", "text", min_count=3
    )
    spans = dedup.repeated_spans_at(docs, "doc_id", "text", n, min_count=3)
    return spans.agg(
        F.count("*").alias("n_spans"),
        F.max("n_occurrences").alias("max_occurrences"),
        F.min("n_docs").alias("min_docs_touched"),
        F.min("span").alias("lexmin_span"),
    ).select(
        F.lit(n).cast("long").alias("span_len"),
        "n_spans",
        "max_occurrences",
        "min_docs_touched",
        "lexmin_span",
    )


@_q(
    "doc_exact_substring_trim",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    ),
    grams AS (
      SELECT doc_id, p, array_to_string(list_slice(t, p, p + 4), ' ') AS g
      FROM pos WHERE p + 4 <= len(t)
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) >= 2
    ),
    cov AS (
      SELECT DISTINCT grams.doc_id, grams.p + i.i AS cp
      FROM grams JOIN dup USING (g)
      CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) i
    ),
    kept AS (
      SELECT pos.doc_id, pos.p, pos.t[pos.p] AS tok
      FROM pos LEFT JOIN cov
        ON pos.doc_id = cov.doc_id AND pos.p = cov.cp
      WHERE cov.cp IS NULL
    ),
    reb AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY p) AS cleaned,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(len(toks.t) AS INTEGER) AS n_tokens,
           CAST(len(toks.t) - COALESCE(reb.n_kept, 0) AS INTEGER)
               AS n_tokens_removed,
           md5(COALESCE(reb.cleaned, '')) AS cleaned_md5
    FROM toks LEFT JOIN reb USING (doc_id)
    """,
)
def doc_exact_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (r9, `dedup.remove_duplicate_spans`) — the
    deletion step of Lee et al. 2022's span-level dedup that
    `duplicate_token_spans` only diagnoses: every token position
    covered by a 5-gram shared by >= 2 distinct docs is excised and
    the survivors reassembled in order. Emits per doc (n_tokens,
    n_tokens_removed, md5 of the cleaned text) — the md5 pins the
    EXACT surviving string, so an off-by-one in coverage expansion,
    ordering, or the empty-survivor contract fails the hash. The
    oracle recomputes the trim from positional grams in SQL.

    Scale shape: gram-frequency agg on 8-byte hashed keys, hit join,
    doc-bounded reassembly — see the operator docstring; nothing
    global, rows never dropped (docs trimmed to empty stay)."""
    from ..operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    out = dedup.remove_duplicate_spans(docs, "doc_id", "text", k=5)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_tokens_removed").cast("int").alias("n_tokens_removed"),
        F.md5(F.col("cleaned_text").cast("binary")).alias("cleaned_md5"),
    )


@_q(
    "incremental_span_trim",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    ),
    grams AS (
      SELECT doc_id, p, array_to_string(list_slice(t, p, p + 4), ' ') AS g
      FROM pos WHERE p + 4 <= len(t)
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) >= 2
    ),
    cov AS (
      SELECT DISTINCT grams.doc_id, grams.p + i.i AS cp
      FROM grams JOIN dup USING (g)
      CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) i
    ),
    kept AS (
      SELECT pos.doc_id, pos.p, pos.t[pos.p] AS tok
      FROM pos LEFT JOIN cov
        ON pos.doc_id = cov.doc_id AND pos.p = cov.cp
      WHERE cov.cp IS NULL
    ),
    reb AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY p) AS cleaned,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(len(toks.t) AS INTEGER) AS n_tokens,
           CAST(len(toks.t) - COALESCE(reb.n_kept, 0) AS INTEGER)
               AS n_tokens_removed,
           md5(COALESCE(reb.cleaned, '')) AS cleaned_md5
    FROM toks LEFT JOIN reb USING (doc_id)
    WHERE toks.doc_id % 2 = 1
    """,
)
def incremental_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growing-corpus ExactSubstr (r9, `dedup.gram_index` +
    `dedup.trim_batch_against_index`) — the operational shape for
    continuous ingestion, mirroring `incremental_near_dup`: even-id
    docs play the already-indexed corpus (only their 16-byte
    (gram-hash, n_docs) index rows participate — their text is never
    re-read), odd-id docs the incoming batch; a batch position trims
    when index count + batch count reaches 2, so batch-vs-corpus AND
    batch-internal duplication both excise. With disjoint ids this
    EQUALS the full-corpus trim restricted to the batch (the operator
    test pins it; the oracle exploits it — full-corpus positional-gram
    trim WHERE doc_id odd), so any drift between the incremental and
    batch paths fails the hash.

    Scale shape: batch-sized gram projection + one agg + one join
    against the persisted index (bucket it by h and only the batch
    shuffles), then the doc-bounded trim/reassembly."""
    from ..operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = dedup.gram_index(corpus, "doc_id", "text", k=5)
    out = dedup.trim_batch_against_index(
        batch, idx, "doc_id", "text", k=5
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_tokens_removed").cast("int").alias("n_tokens_removed"),
        F.md5(F.col("cleaned_text").cast("binary")).alias("cleaned_md5"),
    )


@_q(
    "media_catalog_report",
    """
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 60)
    SELECT CASE doc_id % 8
               WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
               WHEN 2 THEN 'image/jpeg' WHEN 3 THEN 'audio/wav'
               WHEN 4 THEN 'video/x-msvideo' WHEN 5 THEN 'image/tiff'
               WHEN 6 THEN 'image/x-icon' ELSE 'unknown' END AS mime,
           CASE doc_id % 8
               WHEN 0 THEN 'rgb' WHEN 1 THEN 'rgb'
               WHEN 2 THEN 'lossless' WHEN 3 THEN 'ulaw'
               WHEN 4 THEN 'rgb24' WHEN 5 THEN 'packbits'
               ELSE NULL END AS codec,
           count(*) AS n_objects,
           CASE WHEN doc_id % 8 IN (0, 1, 2, 4, 5, 6)
                THEN CAST(16 AS BIGINT) END AS max_width,
           CASE doc_id % 8 WHEN 3 THEN CAST(250 AS BIGINT)
                           WHEN 4 THEN CAST(120 AS BIGINT) END
               AS max_duration_ms
    FROM base
    GROUP BY doc_id % 8
    """,
)
def media_catalog_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog report over a synthetic mixed media lake (r8,
    `multimodal.probe_media_metadata`): each doc row synthesizes one
    of six payload kinds (BMP, PNG, lossless JPEG, u-law WAV,
    uncompressed AVI, or non-media junk), the HEADER-ONLY probe
    extracts typed metadata, and the report aggregates per
    (mime, codec) — object counts, max width, max duration — with
    every value stated in closed form by the oracle from the
    synthesis parameters. A sniffing bug, a header-field offset
    error, a duration arithmetic slip, or dropping unknown payloads
    (they must catalog as 'unknown') moves real values. Scale shape:
    synth + probe share one mapInPandas stage (payloads die in the
    UDF); the report aggregation runs on ~100-byte metadata rows."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 8).cast("int").alias("kind"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        pcm = (
            9000 * np.sin(2 * np.pi * 440 * np.arange(2000) / 8000)
        ).astype(np.int16)

        def payload(kind: int) -> bytes:
            if kind == 0:
                return mm.synth_bmp(16, 16, 7)
            if kind == 1:
                return mm.synth_png(16, 16, 7)
            if kind == 2:
                return mm._encode_jpeg_lossless(
                    np.full((16, 16), 90, dtype=np.int64)
                )
            if kind == 3:
                return mm._encode_wav_compressed(pcm, 8000, "ulaw")
            if kind == 4:
                frames = [
                    np.full((16, 16, 3), 40 + 20 * i, dtype=np.uint8)
                    for i in range(3)
                ]
                return mm.synth_avi(16, 16, frames)
            if kind == 5:
                return mm._encode_tiff(
                    np.full((16, 16, 3), 70, dtype=np.uint8),
                    packbits=True,
                )
            if kind == 6:
                return mm._encode_ico_png(
                    np.full((16, 16, 3), 90, dtype=np.uint8)
                )
            return b"opaque non-media payload"

        for pdf in batches:
            rows = [
                (int(m), payload(int(k)))
                for m, k in zip(pdf["media_id"], pdf["kind"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    lake = base.mapInPandas(synth, "media_id long, payload binary")
    meta = mm.probe_media_metadata(lake)
    return meta.groupBy("mime", "codec").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.max("width").cast("long").alias("max_width"),
        F.max("duration_ms").alias("max_duration_ms"),
    )

# ---------------------------------------------------------------------------
# URL-level dedup (the crawl-dedup normalization step; extends the
# reference's F1-F4 domain pipeline, `sql/mart/02_marts.sql:56-65`,
# from host extraction to a full canonical key). The testdata has no
# URL column, so the query synthesizes one deterministically from
# events rows (same precedent as domain_extract's synthesized URL
# column) covering every variant class the canonicalizer must
# collapse: scheme/host case, www prefix, default vs explicit port,
# param order, tracking params, fragments, trailing slashes.
# ---------------------------------------------------------------------------


@_q(
    "url_canonical_dedup",
    r"""
    WITH raw AS (
        SELECT (CASE event_id % 4 WHEN 0 THEN 'https' WHEN 1 THEN 'http'
                                  WHEN 2 THEN 'HTTPS' ELSE 'Http' END)
               || '://'
               || (CASE event_id % 3 WHEN 0 THEN 'Example.COM'
                                     WHEN 1 THEN 'www.example.com'
                                     ELSE 'example.com' END)
               || (CASE WHEN event_id % 5 = 0 THEN
                         (CASE WHEN event_id % 2 = 0 THEN ':443' ELSE ':80' END)
                        WHEN event_id % 5 = 1 THEN ':8080'
                        WHEN event_id % 5 = 2 THEN ':8080:x' ELSE '' END)
               || '/t/' || event_type
               || '/u' || CAST(user_id % 25 AS VARCHAR)
               || (CASE WHEN event_id % 2 = 0 THEN '/' ELSE '' END)
               || (CASE event_id % 4 WHEN 0 THEN '?a=1&b=2'
                                     WHEN 1 THEN '?b=2&a=1'
                                     WHEN 2 THEN '?a=1&UTM_Source=feed&b=2'
                                     ELSE '?b=2&a=1&FBclid=XYZ' END)
               || (CASE WHEN event_id % 7 = 0
                        THEN '#sec' || CAST(event_id % 3 AS VARCHAR)
                        ELSE '' END) AS url
        FROM events
    ),
    parts AS (
        SELECT url,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_extract(regexp_replace(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^#]*)', 1) AS nofrag
        FROM raw
    ),
    pieces AS (
        SELECT url, scheme, nofrag,
               regexp_extract(nofrag, '^([^/?]*)', 1) AS authority
        FROM parts
    ),
    fields AS (
        SELECT url, scheme,
               regexp_replace(lower(split_part(authority, ':', 1)),
                              '^www\.', '') AS host,
               regexp_extract(authority, '^[^:]*:(.*)$', 1) AS port,
               substring(nofrag, length(authority) + 1) AS pathquery
        FROM pieces
    ),
    assembled AS (
        SELECT url, scheme, host,
               CASE WHEN port <> ''
                         AND NOT (scheme = 'http'  AND port = '80')
                         AND NOT (scheme = 'https' AND port = '443')
                    THEN ':' || port ELSE '' END AS port_part,
               regexp_replace(regexp_extract(pathquery, '^([^?]*)', 1),
                              '/+$', '') AS path,
               list_sort(list_filter(
                   string_split(regexp_extract(pathquery, '\?(.*)$', 1), '&'),
                   p -> p <> ''
                        AND NOT regexp_matches(p, '(?i)^(utm_|gclid=|fbclid=|ref=)')
               )) AS params
        FROM fields
    )
    SELECT scheme || '://' || host || port_part || path
           || CASE WHEN len(params) > 0
                   THEN '?' || array_to_string(params, '&') ELSE '' END
               AS canonical_url,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT url) AS n_variants
    FROM assembled
    GROUP BY 1
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup report: synthesize raw URLs (deterministic
    variant classes over events), canonicalize with
    `scalars.canonical_url`, and group — n_rows counts collapsed rows
    per canonical key, n_variants the surviving raw spellings. The
    canonicalizer is pure native string/array expressions (no UDF);
    the oracle re-implements every rule in DuckDB SQL, so a drift in
    any rule (scheme/host case, www, default ports, tracking params,
    param order, fragments, trailing slashes) flips the hash.
    Scale: one scan → project → hash-agg on the canonical key — the
    exact shape of URL dedup over a 100 TB crawl."""
    ev = read_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    scheme_str = (
        F.when(eid % 4 == 0, F.lit("https"))
        .when(eid % 4 == 1, F.lit("http"))
        .when(eid % 4 == 2, F.lit("HTTPS"))
        .otherwise(F.lit("Http"))
    )
    host_str = (
        F.when(eid % 3 == 0, F.lit("Example.COM"))
        .when(eid % 3 == 1, F.lit("www.example.com"))
        .otherwise(F.lit("example.com"))
    )
    port_str = (
        F.when(
            eid % 5 == 0,
            F.when(eid % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")),
        )
        .when(eid % 5 == 1, F.lit(":8080"))
        .when(eid % 5 == 2, F.lit(":8080:x"))
        .otherwise(F.lit(""))
    )
    query_str = (
        F.when(eid % 4 == 0, F.lit("?a=1&b=2"))
        .when(eid % 4 == 1, F.lit("?b=2&a=1"))
        .when(eid % 4 == 2, F.lit("?a=1&UTM_Source=feed&b=2"))
        .otherwise(F.lit("?b=2&a=1&FBclid=XYZ"))
    )
    frag_str = F.when(
        eid % 7 == 0, F.concat(F.lit("#sec"), (eid % 3).cast("string"))
    ).otherwise(F.lit(""))
    url = F.concat(
        scheme_str,
        F.lit("://"),
        host_str,
        port_str,
        F.lit("/t/"),
        F.col("event_type"),
        F.lit("/u"),
        (F.col("user_id") % 25).cast("string"),
        F.when(eid % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        query_str,
        frag_str,
    )
    return (
        ev.select(url.alias("url"))
        .groupBy(scalars.canonical_url("url").alias("canonical_url"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("url").alias("n_variants"),
        )
    )


@_q(
    "embedding_knn_join",
    """
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings
    UNION ALL
    SELECT -1 AS query_id, TRUE AS recall_ok
    """,
)
def embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN-JOIN (r10): EVERY vector finds its approximate top-10
    — the semantic-dedup/self-similarity regime where the query set
    IS the corpus, exercising `knn_cosine_ivf(distributed_queries=
    True)`: probe cells assigned executor-side, candidate generation
    one shuffle join on cell, nothing query-sized on the driver (the
    collected path's max_query_rows guard names this as the
    corpus-scale alternative). The differential floor is the
    STRUCTURAL guarantee only (ADVICE r10): a vector's own cell is
    always its first probe, so the approximate top-10 always recovers
    the vector itself — hits >= 1 holds for every query regardless of
    data generation, k-means iteration count, or the auto
    n_cells/n_probe formula. The stronger MEASURED floor (min hits 2,
    mean 6.60-6.77/10 at every test scale with the √N-cells /
    quarter-probe auto point) is data-dependent — zero margin at the
    tail — so it is pinned separately in
    test_dedup_similarity.py::test_embedding_knn_join_measured_floor
    where a data regen shows up as a test edit, not a registry-wide
    differential failure. (Corpus tail is near-isotropic noise — mean
    top-10 cosine 0.35 — hence corpus-wide mean recall sits below the
    planted-easy vec_id<50 panel's 0.926.)

    ADVICE r11: the structural floor alone cannot see a recall
    regression from the driver, so one extra sentinel row
    (query_id=-1) carries a MEASURED-but-COARSE signal: mean hits
    across all queries >= 4/10. Measured mean is 6.6-8.7 at every
    test scale and probe point since r10 (quarter- and half-probe),
    so the floor has >2.5 hits of margin against data regens, while
    a genuine probe/assignment bug (mean collapses to ~1, the
    structural self-hit) flips the sentinel row and fails the
    driver's value-hash."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.knn_cosine_bruteforce(emb, queries, k=10).select(
        "query_id", "vec_id"
    )
    approx = similarity.knn_cosine_ivf(
        emb, queries, dim=64, k=10, iters=3, distributed_queries=True
    ).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").groupBy(
        "query_id"
    ).agg(F.count("*").alias("_hits"))
    per_query = (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_hits"), F.lit(0)).alias("_hits"),
        )
    )
    # One pass for both signals: rollup emits each per-query group
    # plus ONE grand-total group (query_id NULL — vec_id is never
    # null, so NULL unambiguously marks the sentinel). No second
    # evaluation of the kNN subtree, no global window.
    rolled = per_query.rollup("query_id").agg(
        F.avg("_hits").alias("_mean_hits")
    )
    return rolled.select(
        F.coalesce(F.col("query_id"), F.lit(-1)).alias("query_id"),
        F.when(
            F.col("query_id").isNull(), F.col("_mean_hits") >= 4.0
        )
        .otherwise(F.col("_mean_hits") >= 1.0)
        .alias("recall_ok"),
    )


@_q(
    "pq_knn_join",
    f"""
    WITH {_KMEANS_DIST_CTES},
    pcb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    pd AS (
        SELECT vec_id, cluster_id, s, cid,
               list_reduce(
                   list_transform(e[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM best CROSS JOIN pcb
    ),
    pbest AS (
        SELECT vec_id, cluster_id, s, cid FROM pd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, e AS qe, cid AS cell
        FROM d WHERE vec_id < 40
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist_sq, cid) <= 3
    ),
    qlut AS (
        SELECT q.query_id, p.s, p.cid,
               list_reduce(
                   list_transform(
                       q.qe[p.s * {_PQ_SUB} + 1 : (p.s + 1) * {_PQ_SUB}],
                       (x, i) -> (x - p.cv[i]) * (x - p.cv[i])),
                   (a, b) -> a + b) AS lv
        FROM (SELECT DISTINCT query_id, qe FROM qprobe) q CROSS JOIN pcb p
    ),
    cand AS (
        SELECT qp.query_id, b.vec_id, b.cluster_id, b.s, b.cid
        FROM qprobe qp JOIN pbest b ON b.cluster_id = qp.cell
    ),
    est AS (
        SELECT c.query_id, c.vec_id, c.cluster_id,
               list_reduce(list(l.lv ORDER BY c.s), (a, b) -> a + b)
                   AS est_raw
        FROM cand c JOIN qlut l
          ON l.query_id = c.query_id AND l.s = c.s AND l.cid = c.cid
        GROUP BY c.query_id, c.vec_id, c.cluster_id
    )
    SELECT query_id, vec_id, CAST(cluster_id AS INTEGER) AS cell,
           ROUND(est_raw, 6) AS est_dist
    FROM est
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY est_raw, vec_id) <= 10
    """,
)
def pq_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ kNN-JOIN (r10, `similarity.pq_knn_join`): 40 query
    vectors search the PQ-compressed corpus through the DISTRIBUTED
    path — executor-side probe assignment and per-query ADC tables
    built inside the scoring stage (cached per task), never inlined
    plan literals, so the same plan serves a corpus-sized query set.
    est_dist is bit-equal across engines (every fold — coarse probe
    distances, LUT entries, the m per-row adds — runs left-to-right
    over identical doubles on both sides; the equivalence with the
    single-query literal-LUT path is pinned by
    test_pq_knn_join_equals_single_query_path), so the per-query
    top-10 membership cannot flip."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.pq_knn_join(
        emb, qdf, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, nprobe=3, k=10
    )
    return out.select(
        "query_id", "vec_id", "cell", F.round("est_dist", 6).alias("est_dist")
    )


@_q(
    "pq_residual_knn_join",
    f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    cc AS (SELECT * FROM (VALUES {_KMEANS_CENTROID_VALUES}) AS t(ccid, ccv)),
    cd AS (
        SELECT vec_id, e, ccid, ccv,
               list_reduce(
                   list_transform(e, (x, i) -> (x - ccv[i]) * (x - ccv[i])),
                   (a, b) -> a + b) AS ds
        FROM v CROSS JOIN cc
    ),
    bestc AS (
        SELECT vec_id, e, ccid AS cluster_id, ccv FROM cd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ds, ccid) = 1
    ),
    rv AS (
        SELECT vec_id, cluster_id,
               list_transform(e, (x, i) -> x - ccv[i]) AS re
        FROM bestc
    ),
    pcb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, cid, cv)),
    pd AS (
        SELECT vec_id, cluster_id, s, cid,
               list_reduce(
                   list_transform(re[s * {_PQ_SUB} + 1 : (s + 1) * {_PQ_SUB}],
                                  (x, i) -> (x - cv[i]) * (x - cv[i])),
                   (a, b) -> a + b) AS ds
        FROM rv CROSS JOIN pcb
    ),
    pbest AS (
        SELECT vec_id, cluster_id, s, cid FROM pd
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY ds, cid) = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, e AS qe, ccid AS cell
        FROM cd WHERE vec_id < 40
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY ds, ccid) <= 3
    ),
    qres AS (
        SELECT qp.query_id, qp.cell,
               list_transform(qp.qe, (x, i) -> x - c.ccv[i]) AS qr
        FROM qprobe qp JOIN cc c ON c.ccid = qp.cell
    ),
    qlut AS (
        SELECT q.query_id, q.cell, p.s, p.cid,
               list_reduce(
                   list_transform(
                       q.qr[p.s * {_PQ_SUB} + 1 : (p.s + 1) * {_PQ_SUB}],
                       (x, i) -> (x - p.cv[i]) * (x - p.cv[i])),
                   (a, b) -> a + b) AS lv
        FROM qres q CROSS JOIN pcb p
    ),
    cand AS (
        SELECT qp.query_id, b.vec_id, b.cluster_id, b.s, b.cid
        FROM (SELECT DISTINCT query_id, cell FROM qprobe) qp
        JOIN pbest b ON b.cluster_id = qp.cell
    ),
    est AS (
        SELECT c.query_id, c.vec_id, c.cluster_id,
               list_reduce(list(l.lv ORDER BY c.s), (a, b) -> a + b)
                   AS est_raw
        FROM cand c JOIN qlut l
          ON l.query_id = c.query_id AND l.cell = c.cluster_id
         AND l.s = c.s AND l.cid = c.cid
        GROUP BY c.query_id, c.vec_id, c.cluster_id
    )
    SELECT query_id, vec_id, CAST(cluster_id AS INTEGER) AS cell,
           ROUND(est_raw, 6) AS est_dist
    FROM est
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY est_raw, vec_id) <= 10
    """,
)
def pq_residual_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-mode IVF-PQ kNN-JOIN (r10): codes quantize
    x − cc[cell], so the ADC table is per (query, cell) — built
    inside the distributed scoring stage (cache keyed (query, cell)),
    never a plan literal, with the same probe/join/fold discipline as
    `pq_knn_join`. est_dist stays bit-equal across engines and to the
    single-query `ivf_pq_search_residual`
    (test_pq_residual_knn_join_equals_single_query_path)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.pq_knn_join(
        emb, qdf, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, nprobe=3, k=10,
        residual=True,
    )
    return out.select(
        "query_id", "vec_id", "cell", F.round("est_dist", 6).alias("est_dist")
    )


@_q(
    "ivf_index_knn_join",
    """
    SELECT vec_id AS query_id,
           10 AS n_agree, 0 AS n_index_only, 0 AS n_fit_only,
           TRUE AS self_in_topk
    FROM embeddings WHERE vec_id < 20
    """,
)
def ivf_index_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF-index kNN join (r11): the production regime
    where the corpus is cell-assigned ONCE into a persisted index
    (`streaming/ingest.ivf_index_stream` maintains it incrementally;
    here the batch carrying assignment builds the same rows in-query)
    and query batches search it via `similarity.knn_join_ivf_index` —
    no k-means fit and no corpus assignment per batch. The driver row
    is an IN-QUERY DIFFERENTIAL: the persisted-index path is
    full-outer-joined per (query, neighbor, cosine, rank) against the
    fitted end-to-end path (`knn_cosine_ivf(distributed_queries=
    True)` with the same sizing — same centroids by determinism of
    the smallest-ids init + Lloyd folds), so the oracle is exact and
    STRUCTURAL: 10 agreeing rows per query, zero path-exclusive rows,
    self in every top-10 (a vector's own cell is always its first
    probe). Any divergence between the persisted-index and fitted
    paths — wrong cells, a dropped candidate, a tie broken
    differently — flips a count and fails the hash. numpy's pairwise
    summation makes the probe sims irreproducible in SQL at the last
    bit (why this oracle is a structural differential, not a value
    re-computation — same reason embedding_knn_join's is a bound)."""
    emb = read_table(spark, sf_dir, "embeddings")
    centroids = similarity.kmeans_centroids(emb, dim=64, n_cells=8, iters=2)
    index = similarity._assign_probe_cells(
        emb, "vec_id", "embedding", centroids, 1,
        vec_out="embedding", norm_out="_cn",
    )
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    via_index = similarity.knn_join_ivf_index(
        index, q, centroids, k=10, n_probe=4
    )
    fitted = similarity.knn_cosine_ivf(
        emb, q, dim=64, k=10, n_cells=8, n_probe=4, iters=2,
        distributed_queries=True,
    )
    keys = ["query_id", "vec_id", "cosine_sim", "rank"]
    both = via_index.withColumn("_a", F.lit(1)).join(
        fitted.withColumn("_b", F.lit(1)), keys, "full_outer"
    )
    return both.groupBy("query_id").agg(
        F.sum(
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1)
            .otherwise(0)
        ).cast("int").alias("n_agree"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
        .cast("int").alias("n_index_only"),
        F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0))
        .cast("int").alias("n_fit_only"),
        F.max(
            (F.col("query_id") == F.col("vec_id"))
            & F.col("_a").isNotNull()
        ).alias("self_in_topk"),
    )


@_q(
    "pq_index_knn_join",
    """
    SELECT m.mode, e.vec_id AS query_id,
           10 AS n_agree, 0 AS n_index_only, 0 AS n_inline_only
    FROM embeddings e
    CROSS JOIN (SELECT 'raw' AS mode UNION ALL SELECT 'residual') m
    WHERE e.vec_id < 40
    """,
)
def pq_index_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-PQ-index kNN join (r12): the production regime where
    the corpus is PQ-compressed ONCE into a persisted (id, cell,
    codes) index (`streaming/ingest.pq_index_stream` maintains it
    incrementally; here `similarity.pq_encode_corpus` builds the same
    rows in-query — the streamed codes are pinned bit-equal to this
    encode by test_pq_index_stream) and every query batch pays only
    probe + cell-join + ADC via `pq_knn_join(encoded=...)`. The
    driver row is an IN-QUERY DIFFERENTIAL, the `ivf_index_knn_join`
    pattern applied to BOTH PQ regimes: for raw AND residual codes,
    the encoded-index path is full-outer-joined per (query, neighbor,
    cell, est_dist) against the inline end-to-end path (stage 1
    re-encoded per run — identical projections, so est_dist is
    bit-equal), making the oracle exact and STRUCTURAL: 10 agreeing
    rows per (mode, query), zero path-exclusive rows. Any divergence
    — a code byte, a cell assignment, an ADC fold order, a tie broken
    differently — flips a count and fails the hash. The ADC values
    themselves are not SQL-reproducible at the last bit across
    engines for the residual mode's per-cell tables (same reason the
    IVF differential is structural), so the constant oracle is the
    strongest driver-checkable form."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    keys = ["query_id", "vec_id", "cell", "est_dist"]
    parts = []
    for mode, residual in (("raw", False), ("residual", True)):
        enc = similarity.pq_encode_corpus(
            emb, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, residual=residual
        ).select("vec_id", "cell", "codes")
        via_index = similarity.pq_knn_join(
            emb, qdf, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, nprobe=3, k=10,
            residual=residual, encoded=enc,
        )
        inline = similarity.pq_knn_join(
            emb, qdf, _KMEANS_CENTROIDS, _PQ_CODEBOOKS, nprobe=3, k=10,
            residual=residual,
        )
        both = via_index.withColumn("_a", F.lit(1)).join(
            inline.withColumn("_b", F.lit(1)), keys, "full_outer"
        )
        parts.append(
            both.groupBy("query_id")
            .agg(
                F.sum(
                    F.when(
                        F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1
                    ).otherwise(0)
                ).cast("int").alias("n_agree"),
                F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
                .cast("int").alias("n_index_only"),
                F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0))
                .cast("int").alias("n_inline_only"),
            )
            .withColumn("mode", F.lit(mode))
        )
    return parts[0].unionByName(parts[1]).select(
        "mode", "query_id", "n_agree", "n_index_only", "n_inline_only"
    )


@_q(
    "pq_rerank_knn_join",
    """
    SELECT e.vec_id AS query_id,
           10 AS n_agree, 0 AS n_rerank_only, 0 AS n_exact_only
    FROM embeddings e
    WHERE e.vec_id < 30
    """,
)
def pq_rerank_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ kNN-join exact-rerank stage (r12, VERDICT r11 #6 — the
    FAISS IVFPQR shape): ADC orders a candidate pool, the top-c fetch
    their RAW vectors and are re-scored by exact squared L2, and the
    cut to k happens on exact distance. The driver row pins the
    stage's ANCHOR IDENTITY as an in-query differential: with every
    cell probed and EVERY candidate reranked, the rerank path must
    return the true L2 top-10 — so it is full-outer-joined per
    (query, neighbor, exact_dist) against an exact L2 brute-force
    computed with the SAME zip_with/aggregate fold (bit-equal
    distances by construction), and the oracle is the exact constant:
    10 agreeing rows per query, zero path-exclusive rows. Any defect
    in the rerank plumbing — a candidate dropped before the cut, a
    wrong vector re-attached by either equi-join, a fold-order
    change, a tie broken differently — produces an exclusive row and
    fails the hash. The measured recall/cost curve at the PRODUCTION
    operating points (nprobe=3, c=2k..16k vs the probe-coverage
    ceiling) is recorded in SCALING.md §Similarity
    (`scripts/pq_rerank_recall_sweep.py` reproduces); recall-curve
    floors stay in pytest, the driver checks the identity.

    Scale shape: the rerank adds two equi-joins over n_q×c candidate
    rows (query then corpus vectors re-attached AFTER the ADC cut —
    vectors never ride through the ADC scan) + one per-query window;
    the exact side broadcasts the 30 fixed queries over one corpus
    scan."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rerank = similarity.pq_knn_join(
        emb, qdf, _KMEANS_CENTROIDS, _PQ_CODEBOOKS,
        nprobe=len(_KMEANS_CENTROIDS), k=10, rerank=10**9,
    ).select("query_id", "vec_id", "exact_dist")
    sq = F.aggregate(
        F.zip_with(
            F.col("_qv"),
            F.col("embedding"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("exact_dist"), F.asc("vec_id")
    )
    exact = (
        emb.join(
            F.broadcast(
                qdf.select("query_id", F.col("embedding").alias("_qv"))
            )
        )
        .select("query_id", "vec_id", sq.alias("exact_dist"))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= 10)
        .select("query_id", "vec_id", "exact_dist")
    )
    keys = ["query_id", "vec_id", "exact_dist"]
    both = rerank.withColumn("_a", F.lit(1)).join(
        exact.withColumn("_b", F.lit(1)), keys, "full_outer"
    )
    return (
        both.groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1
                ).otherwise(0)
            ).cast("int").alias("n_agree"),
            F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
            .cast("int").alias("n_rerank_only"),
            F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0))
            .cast("int").alias("n_exact_only"),
        )
        .select("query_id", "n_agree", "n_rerank_only", "n_exact_only")
    )


# ---------------------------------------------------------------------------
# Driver verification window.
#
# The driver hard-verifies (rows + schema + value hash vs the DuckDB
# oracle) exactly the FIRST 50 registry entries per round; everything
# else is enforced by the mirrored local gate (tests/test_oracle.py,
# all oracles, every run). Registration order is therefore a
# verification-routing decision, not an accident: the window below
# front-loads the queries that have never had a driver CORRECTNESS
# row (VERDICT r3 #3) plus one representative per SURVEY §2 operator
# family and everything added or changed this round. Previously
# driver-green queries rotate OUT — the local gate keeps enforcing
# them — and rotate back in future rounds.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW = [
    # --- r13 rotation (VERDICT r12 #5) ---
    # Lead: the registry's only two never-driver-checked entries
    # (registered r12 post-window; builder-emulated MATCH at 3 SFs,
    # COVERAGE named pq_index_knn_join the r13 candidate). Then the
    # 5 evergreen flagship marts, then every query whose physical
    # plan changed in the r12 optimization segment (88950b5..b3a3bb3:
    # Arrow kNN kernels, hash ladder, banding materialization, hashed
    # join keys, PQ literal/CSE) or this round (jaccard/containment
    # postings, span witness probes, graph lazy-checkpoint rounds,
    # CC pointer jumping, triangle/cooccurrence materialization, kNN
    # guards) — r12-window-green queries rotate back in ONLY if r13
    # touched them again (ivf_index_knn_join, incremental_near_dup,
    # referral_reach_bfs, referral_lpa_communities).
    "pq_index_knn_join",
    "pq_rerank_knn_join",
    # evergreen flagships (reference-mart semantics):
    "daily_metrics",
    "domain_extract",
    "user_activity",
    "dedup_keep_last",
    "scalar_summary",
    # r13 jaccard/containment postings restructure (3fc90d0):
    "doc_token_jaccard",
    "doc_token_jaccard_capped",
    "doc_containment_pairs",
    "cluster_keep_best",
    "corpus_datasheet",
    "leakage_safe_split",
    "near_dup_clusters",
    "near_dup_edit_distance",
    "near_dup_triangles",
    "quantize_embeddings_int8",
    "simhash_jaccard_consistency",
    "source_dup_matrix",
    "source_loo_impact",
    "source_overlap_matrix",
    "incremental_near_dup",
    # r13 tf postings + pair-key repartition (4f74b78):
    "doc_tf_cosine_pairs",
    # r12 hash ladder + r13 witness-restricted probes (6edfc27):
    "corpus_longest_repeated_span",
    "corpus_repeated_span_occurrences",
    # r12 gram hashing family:
    "doc_exact_substring_trim",
    "incremental_span_trim",
    "duplicate_token_spans",
    # r13 graph lazy-checkpoint rounds (4fbe48e) + CC pointer
    # jumping (d4d836d):
    "copurchase_kcore",
    "referral_weighted_sssp",
    "referral_reach_bfs",
    "referral_lpa_communities",
    "semantic_dedup_cells",
    "customer_golden_records",
    "curate_documents",
    # r13 triangle/cooccurrence materialization (906c032):
    "brand_copurchase_lift",
    "brand_item_item_cf",
    "brand_copurchase_pagerank",
    # r12 Arrow kNN kernels + r13 guards/probe kernel (6b86d35):
    "embedding_knn_join",
    "knn_cosine",
    "mutual_knn_pairs",
    "knn_cosine_lsh",
    "knn_cosine_ivf",
    "ivf_index_knn_join",
    # r12 banding materialization (33948ff):
    "fuzzy_decontamination",
    "doc_simhash_pairs",
    "doc_minhash_pairs",
    # r12 PQ encode CSE + constant-matrix literals (8ca288e):
    "pq_knn_join",
    "pq_residual_knn_join",
    "pq_codes",
]


def _reorder_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"unknown names in _DRIVER_WINDOW: {missing}"
    assert len(_DRIVER_WINDOW) == len(set(_DRIVER_WINDOW)) == 50
    window = set(_DRIVER_WINDOW)
    ordered = _DRIVER_WINDOW + [n for n in QUERIES if n not in window]
    # In-place so `from queries import QUERIES` bindings see the order.
    remaining = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(remaining)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_registry()
