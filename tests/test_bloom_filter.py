"""Runtime Bloom-filter join pushdown (VERDICT r3 #8).

Spark's `InjectRuntimeFilter` rule (on by default via
`spark.sql.optimizer.runtime.bloomFilter.enabled`) targets exactly the
`selective_order_lines` shape: a shuffle join where one side carries a
selective predicate. Locally the rule stays out for two size reasons —
the application-side scan is far below the 10 GiB threshold, and AQE
plans the tiny filtered side as a broadcast join (the rule only helps
shuffle joins). Both are emulated away here to pin the behavior the
query relies on at 100 TB: a `bloom_filter_agg` scalar subquery over
the filtered side's keys pushed into the lineitem scan as
`might_contain`, with results identical to the un-filtered plan.
"""

from __future__ import annotations

import pytest

from reddit_hn_etl_spark.plans.queries import QUERIES

from .conftest import SF_DIR

# r13: bloom injection e2e is exhaustive-marked (~20s incl fixture; run_suite chunk B runs it)
pytestmark = pytest.mark.exhaustive

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_spark(spark):
    saved = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bloom_filter_injected_and_result_parity(bloom_spark):
    df = QUERIES["selective_order_lines"](bloom_spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in opt, opt
    assert "might_contain" in opt, opt
    with_filter = sorted(map(tuple, df.collect()))

    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        df2 = QUERIES["selective_order_lines"](bloom_spark, SF_DIR)
        opt2 = df2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in opt2
        assert sorted(map(tuple, df2.collect())) == with_filter
    finally:
        bloom_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )


def test_bloom_filter_not_injected_for_broadcast_join(spark):
    """On default local thresholds the join broadcasts and the rule
    correctly stays out — injection would be pure overhead."""
    df = QUERIES["selective_order_lines"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in opt
