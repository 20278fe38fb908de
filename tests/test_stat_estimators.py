"""Brute-force definitional checks for the round-5 statistics
families: the distributed/window algebra must reproduce what the
textbook definition computes row-by-row in Python on the same data.

These complement the DuckDB oracles (which pin CROSS-ENGINE
equality): here we pin CORRECTNESS of the algebra itself.
"""

from __future__ import annotations

import math

import pytest

from reddit_hn_etl_spark.plans import queries as Q
from reddit_hn_etl_spark.sources.tables import read_table


def _events_rows(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return [
        (r["event_type"], r["ts"], r["user_id"], r["value"])
        for r in ev.select("event_type", "ts", "user_id", "value").collect()
        if r["value"] is not None
    ]


def test_mannwhitney_u_equals_pair_counting(spark, sf_dir):
    """2U from the midrank window algebra == the definitional pair
    count 2·#{a>b} + #{a=b} for every event type."""
    import datetime

    rows = _events_rows(spark, sf_dir)
    split = datetime.date(2024, 1, 16)
    samples = {}
    for et, ts, _uid, v in rows:
        if et == "purchase" and ts.date() >= split:
            v = v + 15.0  # the canary shift the query applies
        samples.setdefault(et, ([], []))[
            0 if ts.date() < split else 1
        ].append(v)
    got = {
        r["event_type"]: (r["u2_a"], r["n_a"], r["n_b"])
        for r in Q.QUERIES["value_mannwhitney_test"](spark, sf_dir).collect()
    }
    for et, (a, b) in samples.items():
        u2 = sum(
            2 if x > y else (1 if x == y else 0) for x in a for y in b
        )
        assert got[et] == (u2, len(a), len(b)), et


def test_ks_d_equals_bruteforce_sup(spark, sf_dir):
    """d_scaled == max over pooled points of |cumA·nB − cumB·nA|."""
    import datetime

    rows = _events_rows(spark, sf_dir)
    split = datetime.date(2024, 1, 16)
    samples = {}
    for et, ts, _uid, v in rows:
        if et == "purchase" and ts.date() >= split:
            v = v + 15.0
        samples.setdefault(et, ([], []))[
            0 if ts.date() < split else 1
        ].append(v)
    got = {
        r["event_type"]: r["d_scaled"]
        for r in Q.QUERIES["value_ks_test"](spark, sf_dir).collect()
    }
    for et, (a, b) in samples.items():
        na, nb = len(a), len(b)
        pts = sorted(set(a) | set(b))
        best = 0
        for p in pts:
            ca = sum(1 for x in a if x <= p)
            cb = sum(1 for x in b if x <= p)
            best = max(best, abs(ca * nb - cb * na))
        assert got[et] == best, et


def _cells(rows):
    """(event_type, dow, treated) -> (sum_cents, n), dow 0=Sunday."""
    cells = {}
    for et, ts, uid, v in rows:
        dow = (ts.weekday() + 1) % 7  # python Mon=0 -> Sun=0 convention
        cents = round(v * 100)
        key = (et, dow, uid % 2 == 0)
        s, n = cells.get(key, (0, 0))
        cells[key] = (s + cents, n + 1)
    return cells


def test_cem_att_equals_bruteforce(spark, sf_dir):
    rows = _events_rows(spark, sf_dir)
    cells = _cells(rows)
    strata = {}
    for (et, dow, tr), (s, n) in cells.items():
        strata.setdefault((et, dow), {})[tr] = (s, n)
    fp = 0
    n_treated = 0
    for arms in strata.values():
        if True in arms and False in arms:
            st, nt = arms[True]
            sc, nc = arms[False]
            contrib = st - nt * sc / nc
            fp += math.floor(contrib * 1048576.0 + 0.5)
            n_treated += nt
    expect = fp / 1048576.0 / n_treated
    out = Q.QUERIES["purchase_cem_att"](spark, sf_dir).collect()
    assert all(r["att_cents"] == pytest.approx(expect, abs=1e-12) for r in out)
    assert len(out) == len(
        [1 for a in strata.values() if True in a and False in a]
    )


def test_ipw_ate_equals_bruteforce(spark, sf_dir):
    rows = _events_rows(spark, sf_dir)
    cells = _cells(rows)
    strata = {}
    for (et, dow, tr), (s, n) in cells.items():
        strata.setdefault((et, dow), {})[tr] = (s, n)
    wt = wc = n_total = 0
    for arms in strata.values():
        if True in arms and False in arms:
            st, nt = arms[True]
            sc, nc = arms[False]
            n = nt + nc
            wt += math.floor(st * n / nt * 1048576.0 + 0.5)
            wc += math.floor(sc * n / nc * 1048576.0 + 0.5)
            n_total += n
    expect = (wt - wc) / 1048576.0 / n_total
    out = Q.QUERIES["purchase_ipw_ate"](spark, sf_dir).collect()
    assert all(
        r["ipw_ate_cents"] == pytest.approx(expect, abs=1e-12) for r in out
    )


def test_qini_curve_equals_bruteforce(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    per_user = {}
    for r in ev.select("user_id", "event_type", "value").collect():
        uid = r["user_id"]
        score, conv = per_user.get(uid, (0, 0))
        if r["event_type"] == "view":
            score += 1
        if (
            r["event_type"] == "purchase"
            and r["value"] is not None
            and r["value"] >= 200
        ):
            conv = 1
        per_user[uid] = (score, conv)
    units = sorted(
        ((-s, uid, c) for uid, (s, c) in per_user.items())
    )  # score desc, uid asc
    n = len(units)
    big, n_big = n // 10 + 1, n % 10
    deciles = {}
    for i, (_ns, uid, c) in enumerate(units, start=1):
        if i <= n_big * big:
            d = (i - 1) // big + 1
        else:
            d = n_big + (i - n_big * big - 1) // (n // 10) + 1
        nt, nc, ct, cc = deciles.get(d, (0, 0, 0, 0))
        if uid % 2 == 0:
            nt, ct = nt + 1, ct + c
        else:
            nc, cc = nc + 1, cc + c
        deciles[d] = (nt, nc, ct, cc)
    got = {
        r["decile"]: (r["n_treated"], r["n_control"], r["conv_treated"],
                      r["conv_control"], r["qini"])
        for r in Q.QUERIES["uplift_qini_deciles"](spark, sf_dir).collect()
    }
    cnt_t = cnt_c = cv_t = cv_c = 0
    for d in sorted(deciles):
        nt, nc, ct, cc = deciles[d]
        cnt_t, cnt_c = cnt_t + nt, cnt_c + nc
        cv_t, cv_c = cv_t + ct, cv_c + cc
        qini = (
            cv_t - cv_c * (cnt_t / cnt_c) if cnt_c > 0 else None
        )
        gnt, gnc, gct, gcc, gq = got[d]
        assert (gnt, gnc, gct, gcc) == (nt, nc, ct, cc), d
        if qini is None:
            assert gq is None, d
        else:
            assert gq == pytest.approx(qini, abs=1e-12), d
