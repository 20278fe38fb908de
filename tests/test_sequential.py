"""Ordered per-key folds: EMA recurrence vs a hand-computed model,
order totality, and partitioning invariance."""

from __future__ import annotations

from reddit_hn_etl_spark.operators.sequential import ema_per_key


def _model(vals, alpha):
    out, acc = [], 0.0
    for i, v in enumerate(vals):
        acc = v if i == 0 else alpha * v + (1.0 - alpha) * acc
        out.append(acc)
    return out


def test_ema_matches_model_per_key(spark):
    rows = [
        # (event_id, user_id, value) — user 1 out of order on purpose
        (3, 1, 8.0),
        (1, 1, 2.0),
        (2, 1, 4.0),
        (1, 2, 10.0),
        (2, 2, 0.0),
        (1, 3, 7.5),  # single-row key: ema == value
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {
        (r.user_id, r.event_id): r.ema
        for r in ema_per_key(
            df, "user_id", ("event_id",), "value", alpha=0.25
        ).collect()
    }
    for uid, vals in ((1, [2.0, 4.0, 8.0]), (2, [10.0, 0.0]), (3, [7.5])):
        expect = _model(vals, 0.25)
        for i, e in enumerate(expect):
            assert got[(uid, i + 1)] == e  # bit-exact, same expression


def test_ema_is_partitioning_invariant(spark):
    rows = [(i, i % 7, float((i * 13) % 29)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    one = {
        (r.user_id, r.event_id): r.ema
        for r in ema_per_key(
            df.coalesce(1), "user_id", ("event_id",), "value"
        ).collect()
    }
    many = {
        (r.user_id, r.event_id): r.ema
        for r in ema_per_key(
            df.repartition(16), "user_id", ("event_id",), "value"
        ).collect()
    }
    assert one == many
