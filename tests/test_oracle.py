"""Differential test: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (`__spark_entry__.py` docstring):
row count + column-name set + order-insensitive value comparison. Any
mismatch here is a mismatch in CORRECTNESS_r{N}.json, so this test is
strict — exact equality on normalized cell values.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from reddit_hn_etl_spark.plans.queries import ORACLES, QUERIES


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; both engines hand back
        # python floats, so bit-identical values normalize identically.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in idx) for r in rows)


def _assert_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    cur = duck.execute(ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in set(dset)][:5]
        diff_d = [r for r in dset if r not in set(sset)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


# Even-index half of the registry; the odd-index half runs in chunk A2
# (test_oracle_b.py) so neither chunk breaches the 6:00 solo line as
# the registry grows.
@pytest.mark.parametrize("name", sorted(ORACLES)[0::2])
def test_query_matches_oracle(name, spark, duck, sf_dir):
    _assert_query_matches_oracle(name, spark, duck, sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    sdf.limit(5).collect()  # must at least execute cleanly
