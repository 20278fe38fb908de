"""Bucketed co-located join: same-key bucketed tables join with NO
shuffle exchange on either side (the amortized-shuffle strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.sources.tables import (
    read_catalog_table,
    write_bucketed_table,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed_table(
        lineitem, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey"
    )

    bo = read_catalog_table(spark, "b_orders")
    bl = read_catalog_table(spark, "b_lineitem")
    # Disable broadcast so the planner must choose the join strategy a
    # big-big join would use — bucketed SMJ, no exchange, no sort.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, f"unexpected shuffle:\n{plan}"
        got = {r.o_orderpriority: r.n for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it's still correct
    expect = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    want = {r.o_orderpriority: r.n for r in expect.collect()}
    assert got == want
