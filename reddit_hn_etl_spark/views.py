"""SQL-surface registry: the engine's derived tables as temp views.

The reference is SQL-first (its marts are Postgres tables users query
directly — `sql/mart/02_marts.sql`); this module gives a SQL-only
user the same ergonomics on Spark: one call registers the raw
testdata tables AND the engine's derived surfaces as temp views, and
everything after that is plain ``spark.sql``.

Views are LAZY: registration stores the plan, not data — each query
against a view re-optimizes end to end (filters on the view push all
the way into the parquet scan). Only surfaces with lazy plans are
registered here; iterative operators (connected components) execute
eagerly and belong to explicit pipeline runs, not ambient views.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .functions import text as textfn
from .operators.sessions import session_summary
from .sources.tables import TESTDATA_TABLES, read_table


def register_analytics_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the base tables + derived analytics views; returns the
    registered view names.

    Derived surfaces:
      * ``user_sessions``         — gap-sessionized activity rollup
      * ``doc_quality_features``  — per-doc quality signals
      * ``doc_repetition_features`` — Gopher-style repetition signals
      * ``doc_fingerprints``      — normalized-content md5 per doc
    """
    names: list[str] = []
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)

    ev = read_table(spark, sf_dir, "events")
    session_summary(
        ev, key_cols=["user_id"], ts_col="ts", gap_seconds=1800,
        order_tiebreak=["event_id"],
    ).createOrReplaceTempView("user_sessions")
    names.append("user_sessions")

    docs = read_table(spark, sf_dir, "documents")
    textfn.quality_features(docs, "doc_id", "text").createOrReplaceTempView(
        "doc_quality_features"
    )
    names.append("doc_quality_features")

    textfn.repetition_features(docs, "doc_id", "text").createOrReplaceTempView(
        "doc_repetition_features"
    )
    names.append("doc_repetition_features")

    docs.select(
        "doc_id", textfn.fingerprint_md5("text").alias("fingerprint")
    ).createOrReplaceTempView("doc_fingerprints")
    names.append("doc_fingerprints")

    return names
