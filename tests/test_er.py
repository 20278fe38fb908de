"""Unit tests for operators/er.py (Fellegi-Sunter decision model)."""

from __future__ import annotations

import math

from reddit_hn_etl_spark.operators import er


def test_fs_weights_signs():
    w_a, w_d = er.fs_weights(0.9, 0.05)
    assert w_a > 0 > w_d
    assert w_a == math.log(0.9 / 0.05)
    assert w_d == math.log((1 - 0.9) / (1 - 0.05))


def test_fellegi_sunter_scores_and_decisions(spark):
    rows = [
        (1, 2, True, True),    # both agree -> link
        (1, 3, True, False),   # mixed
        (1, 4, False, False),  # both disagree -> non_link
    ]
    pairs = spark.createDataFrame(
        rows, "key_a long, key_b long, agree_x boolean, agree_y boolean"
    )
    comps = [("agree_x", 0.9, 0.05), ("agree_y", 0.8, 0.1)]
    wx = er.fs_weights(0.9, 0.05)
    wy = er.fs_weights(0.8, 0.1)
    out = {
        r["key_b"]: (r["fs_score"], r["decision"])
        for r in er.fellegi_sunter(
            pairs, comps, link_threshold=4.0, possible_threshold=0.0
        ).collect()
    }
    assert out[2] == (wx[0] + wy[0], "link")
    assert out[3] == (wx[0] + wy[1], "possible")
    assert out[4] == (wx[1] + wy[1], "non_link")
