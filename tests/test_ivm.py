"""Property tests for operators/ivm.py: the delta-join expansion
equals full recompute, composes across successive deltas, and
handles empty deltas and delta-only groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_hn_etl_spark.operators import ivm
from reddit_hn_etl_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"

KEYS = ["c_nationkey"]
NAMES = ["n_orders", "revenue"]


def _on():
    # built lazily: Column construction needs an active session
    return F.col("o_custkey") == F.col("c_custkey")


def _states():
    return {
        "n_orders": F.lit(1),
        "revenue": F.col("o_totalprice").cast("decimal(18,2)"),
    }


def _view_map(df):
    return {
        r["c_nationkey"]: (r["n_orders"], r["revenue"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def tables(spark):
    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return orders, cust


def test_incremental_equals_full_recompute(tables):
    orders, cust = tables
    o_new = orders.where(F.col("o_orderkey") % 5 == 0)
    o_old = orders.where(F.col("o_orderkey") % 5 != 0)
    c_new = cust.where(F.col("c_custkey") % 4 == 0)
    c_old = cust.where(F.col("c_custkey") % 4 != 0)

    base = ivm.join_agg_states(o_old, c_old, _on(), KEYS, _states())
    d = ivm.delta_states(o_old, o_new, c_old, c_new, _on(), KEYS, _states())
    maintained = ivm.apply_delta(base, d, KEYS, NAMES)
    direct = ivm.join_agg_states(orders, cust, _on(), KEYS, _states())
    assert _view_map(maintained) == _view_map(direct)


def test_two_step_composition(tables):
    """Applying Δ1 then Δ2 reaches the same states as one combined
    delta — the theorem that makes per-batch maintenance sound."""
    orders, cust = tables
    o0 = orders.where(F.col("o_orderkey") % 3 == 0)
    o1 = orders.where(F.col("o_orderkey") % 3 == 1)
    o2 = orders.where(F.col("o_orderkey") % 3 == 2)

    base = ivm.join_agg_states(o0, cust, _on(), KEYS, _states())
    empty_c = cust.where(F.lit(False))

    # step-by-step: Δ=o1 against base o0, then Δ=o2 against o0∪o1
    v1 = ivm.apply_delta(
        base,
        ivm.delta_states(o0, o1, cust, empty_c, _on(), KEYS, _states()),
        KEYS,
        NAMES,
    )
    v2 = ivm.apply_delta(
        v1,
        ivm.delta_states(
            o0.unionByName(o1), o2, cust, empty_c, _on(), KEYS, _states()
        ),
        KEYS,
        NAMES,
    )
    combined = ivm.apply_delta(
        base,
        ivm.delta_states(
            o0, o1.unionByName(o2), cust, empty_c, _on(), KEYS, _states()
        ),
        KEYS,
        NAMES,
    )
    assert _view_map(v2) == _view_map(combined)
    direct = ivm.join_agg_states(orders, cust, _on(), KEYS, _states())
    assert _view_map(v2) == _view_map(direct)


def test_empty_delta_is_identity(tables):
    orders, cust = tables
    base = ivm.join_agg_states(orders, cust, _on(), KEYS, _states())
    d = ivm.delta_states(
        orders,
        orders.where(F.lit(False)),
        cust,
        cust.where(F.lit(False)),
        _on(),
        KEYS,
        _states(),
    )
    assert d.count() == 0
    assert _view_map(ivm.apply_delta(base, d, KEYS, NAMES)) == _view_map(base)


def test_delta_only_group_appears(spark):
    """A group key that exists only in the delta must surface in the
    merged view with delta-only states (SUM over union semantics)."""
    a_old = spark.createDataFrame([(1, 10.0)], "k long, val double")
    a_new = spark.createDataFrame([(2, 5.0)], "k long, val double")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "k long, g string")
    on = F.col("a.k") == F.col("b.k")
    states = {"n": F.lit(1), "s": F.col("val").cast("decimal(18,2)")}

    def jas(a_df, b_df):
        return ivm.join_agg_states(
            a_df.alias("a"), b_df.alias("b"), on, ["g"], states
        )

    base = jas(a_old, b)
    d = ivm.delta_states(
        a_old.alias("a"),
        a_new.alias("a"),
        b.alias("b"),
        b.where(F.lit(False)).alias("b"),
        on,
        ["g"],
        states,
    )
    merged = {
        r["g"]: (r["n"], float(r["s"]))
        for r in ivm.apply_delta(base, d, ["g"], ["n", "s"]).collect()
    }
    assert merged == {"x": (1, 10.0), "y": (1, 5.0)}


def test_ivm_join_view_stream_matches_direct(spark, tmp_path):
    """Streaming maintenance (stream orders ⋈ static customer dim)
    must equal the direct batch join-aggregate, and a replayed batch
    append must be a no-op (batch_id dedup)."""
    import json
    import os as _os
    import time as _time

    from reddit_hn_etl_spark.streaming import ingest

    orders = [
        (1, 10, 100.25), (2, 11, 50.50), (3, 10, 20.00),
        (4, 12, 75.75), (5, 11, 30.25), (6, 10, 10.00),
    ]
    cust = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 1)], "c_custkey long, c_nationkey int"
    )
    src = tmp_path / "ivm_src"
    src.mkdir()
    states = str(tmp_path / "ivm_states")
    ckpt = str(tmp_path / "ivm_ckpt")
    base_t = _time.time() - 100
    for i, chunk in enumerate((orders[:2], orders[2:4], orders[4:])):
        p = src / f"b{i + 1}.jsonl"
        p.write_text(
            "\n".join(
                json.dumps(
                    {"o_orderkey": o, "o_custkey": c, "o_totalprice": v}
                )
                for o, c, v in chunk
            )
        )
        _os.utime(p, (base_t + 10 * i, base_t + 10 * i))

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_totalprice double"
        ).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = ingest.ivm_join_view_stream(
        stream,
        cust,
        _on(),
        KEYS,
        _states(),
        states_dir=states,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)

    got = _view_map(ingest.merged_join_view(spark, states, KEYS, NAMES))
    batch = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    want = _view_map(
        ivm.join_agg_states(batch, cust, _on(), KEYS, _states())
    )
    assert got == want

    # replay: re-append batch 0's delta verbatim -> merge unchanged
    b0 = spark.createDataFrame(
        orders[:2], "o_orderkey long, o_custkey long, o_totalprice double"
    )
    from pyspark.sql import functions as F2

    ivm.join_agg_states(b0, cust, _on(), KEYS, _states()).withColumn(
        "batch_id", F2.lit(0)
    ).write.mode("append").parquet(states)
    again = _view_map(ingest.merged_join_view(spark, states, KEYS, NAMES))
    assert again == want
