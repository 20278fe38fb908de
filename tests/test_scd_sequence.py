"""Planted-case tests for operators/scd.py (SCD2 history + ordered
sequence detection) — exact expected outputs on tiny literal feeds,
complementing the full-data differential rows in test_oracle.py."""

from __future__ import annotations

import datetime

from reddit_hn_etl_spark.operators.scd import (
    scd2_history,
    sequence_pattern_matches,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_scd2_intervals_and_last_writer_wins(spark):
    changes = spark.createDataFrame(
        [
            # user 1: two instants; the first instant has a tie that
            # must resolve to the higher event_id ('B').
            (10, 1, _ts("2024-01-01T00:00:00"), "A", 1.0),
            (11, 1, _ts("2024-01-01T00:00:00"), "B", 2.0),
            (12, 1, _ts("2024-01-02T00:00:00"), "C", 3.0),
            # user 2: single version, immediately current.
            (20, 2, _ts("2024-01-05T00:00:00"), "X", 9.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    out = {
        (r.user_id, r.version_n): (
            r.effective_from,
            r.effective_to,
            r.is_current,
            r.event_type,
        )
        for r in scd2_history(
            changes,
            key_cols=["user_id"],
            ts_col="ts",
            attr_cols=["event_type", "value"],
            tiebreak_col="event_id",
        ).collect()
    }
    assert out == {
        (1, 1): (
            _ts("2024-01-01T00:00:00"),
            _ts("2024-01-02T00:00:00"),
            False,
            "B",  # last writer at the tied instant
        ),
        (1, 2): (_ts("2024-01-02T00:00:00"), None, True, "C"),
        (2, 1): (_ts("2024-01-05T00:00:00"), None, True, "X"),
    }


def test_sequence_pattern_strict_order_and_span(spark):
    h = 3_600_000_000  # one hour in micros
    rows = [
        # user 1: signup(t0) → purchase(t1) → error(t2): one match,
        # and the LATEST purchase before the error wins (t1b).
        (1, 1, _ts("2024-01-01T00:00:00"), "signup"),
        (2, 1, _ts("2024-01-01T01:00:00"), "purchase"),
        (3, 1, _ts("2024-01-01T02:00:00"), "purchase"),
        (4, 1, _ts("2024-01-01T03:00:00"), "error"),
        # user 2: purchase BEFORE any signup → no match ever.
        (5, 2, _ts("2024-01-01T00:00:00"), "purchase"),
        (6, 2, _ts("2024-01-01T01:00:00"), "error"),
        # user 3: full chain but outside the max span.
        (7, 3, _ts("2024-01-01T00:00:00"), "signup"),
        (8, 3, _ts("2024-01-01T00:30:00"), "purchase"),
        (9, 3, _ts("2024-02-01T00:00:00"), "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = [
        (r.user_id, r.first_ts, r.second_ts, r.third_ts, r.span_micros)
        for r in sequence_pattern_matches(
            ev,
            key_col="user_id",
            ts_col="ts",
            type_col="event_type",
            first="signup",
            second="purchase",
            third="error",
            max_span_micros=24 * h,
            tiebreak_col="event_id",
        ).collect()
    ]
    assert out == [
        (
            1,
            _ts("2024-01-01T00:00:00"),
            _ts("2024-01-01T02:00:00"),
            _ts("2024-01-01T03:00:00"),
            3 * h,
        )
    ]
