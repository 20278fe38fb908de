"""Merge with NULL key values: eqNullSafe join + presence markers —
a NULL-keyed row in both sides merges (not duplicated/misclassified)."""

from __future__ import annotations

import datetime as dt

from reddit_hn_etl_spark.operators.merge import merge_upsert

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 1, 2)


def test_null_key_rows_merge(spark):
    target = spark.createDataFrame(
        [(None, T1, 10), (1, T1, 20)], "k long, ts timestamp, v long"
    )
    source = spark.createDataFrame(
        [(None, T2, 99), (2, T2, 30)], "k long, ts timestamp, v long"
    )
    merged, m = merge_upsert(target, source, keys=["k"], freshness_col="ts")
    rows = {r.k: r for r in merged.collect()}
    assert m.inserted == 1 and m.updated == 1 and m.kept == 1
    assert rows[None].v == 99   # NULL-keyed row UPDATED, not re-inserted
    assert rows[1].v == 20 and rows[2].v == 30
    assert merged.count() == 3  # no duplicate NULL-key rows
