"""Differential tests for the PREPARED-but-unregistered codec oracle
queries (plans/pending_queries.py — VERDICT r6 #7): same strict
row-count + column-name + order-insensitive value compare the
registered queries get in test_oracle.py, so the day the registry
freeze lifts they move into plans/queries.py already driver-shaped
and suite-green."""

from __future__ import annotations

import pytest

from reddit_hn_etl_spark.plans.pending_queries import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)
from tests.test_oracle import _rowset


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_pending_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = PENDING_QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    cur = duck.execute(PENDING_ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    assert len(srows) > 0, f"{name}: vacuous 0-row match"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in set(dset)][:5]
        diff_d = [r for r in dset if r not in set(sset)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


def test_pending_names_not_registered_yet():
    """The freeze contract: pending queries must NOT be in the live
    registry (when one is promoted, delete it here)."""
    from reddit_hn_etl_spark.plans.queries import QUERIES

    clash = set(PENDING_QUERIES) & set(QUERIES)
    assert not clash, f"promote-then-delete from pending: {clash}"
