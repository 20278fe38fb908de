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


def test_logrank_equals_python_definition(spark, sf_dir):
    """O, E, V and z from the window algebra == the textbook
    per-event-day walk in plain Python (with the same 5-day treated
    delay the query plants)."""
    import datetime

    ev = read_table(spark, sf_dir, "events")
    rows = ev.select("user_id", "event_type", "ts").collect()
    t0 = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            if u not in t0 or r["ts"] < t0[u]:
                t0[u] = r["ts"]
    horizon = max(r["ts"] for r in rows)
    tp = {}
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        u = r["user_id"]
        if u not in t0:
            continue
        gate = t0[u] + datetime.timedelta(days=5 if u % 2 == 0 else 0)
        if r["ts"] >= gate and (u not in tp or r["ts"] < tp[u]):
            tp[u] = r["ts"]
    dur = []
    for u, s in t0.items():
        end = tp.get(u, horizon)
        dur.append(
            (u % 2 == 0, (end.date() - s.date()).days, u in tp)
        )
    times = sorted(set(d for _a, d, o in dur if o))
    o1 = 0
    e_fp = v_fp = 0
    for t in times:
        n1 = sum(1 for a, d, _o in dur if a and d >= t)
        n2 = sum(1 for a, d, _o in dur if not a and d >= t)
        d1 = sum(1 for a, d, o in dur if a and o and d == t)
        d2 = sum(1 for a, d, o in dur if not a and o and d == t)
        n, dd = n1 + n2, d1 + d2
        if dd == 0 or n < 2:
            continue
        o1 += d1
        e_fp += math.floor(dd * n1 / n * 1073741824.0 + 0.5)
        v_fp += math.floor(
            dd * n1 / n * (1.0 - n1 / n) * (n - dd) / (n - 1)
            * 1073741824.0 + 0.5
        )
    got = Q.QUERIES["signup_purchase_logrank"](spark, sf_dir).collect()[0]
    assert got["observed_treated"] == o1
    assert got["expected_treated"] == e_fp / 1073741824.0
    z = (o1 - e_fp / 1073741824.0) / math.sqrt(v_fp / 1073741824.0)
    assert got["z"] == pytest.approx(z, abs=1e-12)


def test_bradley_terry_matches_plain_float_mm(spark, sf_dir):
    """The fixed-point MM strengths track a plain-float Python MM
    run (same duels, same 3 iterations) to well under the 2^-30
    grid's accumulated tolerance."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = {}
    prows = {r["p_partkey"]: r["p_brand"] for r in part.collect()}
    for r in li.select("l_partkey", "l_shipdate", "l_extendedprice").collect():
        key = (prows[r["l_partkey"]], r["l_shipdate"].year, r["l_shipdate"].month)
        rev[key] = rev.get(key, 0) + round(float(r["l_extendedprice"]) * 100)
    months = sorted(set((y, m) for (_b, y, m) in rev))
    brands = sorted(set(b for (b, _y, _m) in rev))
    n_ab, wins = {}, {b: 0 for b in brands}
    for y, m in months:
        have = [(b, rev.get((b, y, m))) for b in brands if (b, y, m) in rev]
        for i in range(len(have)):
            for j in range(i + 1, len(have)):
                (ba, ra), (bb, rb) = have[i], have[j]
                if ra == rb:
                    continue
                k = (min(ba, bb), max(ba, bb))
                n_ab[k] = n_ab.get(k, 0) + 1
                wins[ba if ra > rb else bb] += 1
    s = {b: 1.0 for b in brands}
    for _ in range(3):
        den = {b: 0.0 for b in brands}
        for (a, b), n in n_ab.items():
            den[a] += n / (s[a] + s[b])
            den[b] += n / (s[a] + s[b])
        s = {
            b: (wins[b] / den[b] if wins[b] and den[b] else 0.0)
            for b in brands
        }
    tot = sum(s.values())
    got = {
        r["brand"]: (r["n_wins"], r["strength"])
        for r in Q.QUERIES["brand_bradley_terry"](spark, sf_dir).collect()
    }
    assert set(got) == set(brands)
    for b in brands:
        assert got[b][0] == wins[b], b
        assert got[b][1] == pytest.approx(s[b] / tot, abs=1e-5), b


def test_textrank_matches_python_pagerank(spark, sf_dir):
    """Top-15 TextRank scores == a plain Python weighted PageRank
    (same 3 rounds, damping 7/8, per-round 1e-12 rounding)."""
    docs = read_table(spark, sf_dir, "documents")
    import re

    edges = {}
    for r in docs.select("text").collect():
        w = [t for t in re.split(r"\s+", r["text"].lower().strip()) if t]
        for a, b in zip(w, w[1:]):
            if a == b:
                continue
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    adj = {}
    for (a, b), wgt in edges.items():
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + wgt
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + wgt
    deg = {v: sum(nb.values()) for v, nb in adj.items()}
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(3):
        nxt = {v: 0.0 for v in adj}
        for v, nb in adj.items():
            for u, wgt in nb.items():
                nxt[u] += r[v] * wgt / deg[v]
        r = {v: round(0.125 / n + 0.875 * nxt[v], 12) for v in adj}
    want = sorted(((-s, v) for v, s in r.items()))[:15]
    got = Q.QUERIES["corpus_textrank_keywords"](spark, sf_dir).collect()
    got = {g["term"]: (g["textrank"], g["rnk"]) for g in got}
    for rank, (neg_s, term) in enumerate(want, start=1):
        assert term in got, term
        assert got[term][1] == rank
        assert got[term][0] == pytest.approx(-neg_s, abs=5e-12), term


def test_heaps_beta_matches_polyfit(spark, sf_dir):
    """The fixed-point OLS β is within the 2^-18 grid's tolerance of
    numpy's lstsq fit on the same (ln N, ln V) points."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents")
    rows = sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    )
    import re

    seen, cum_tok, pts = set(), 0, []
    for _did, text in rows:
        w = [t for t in re.split(r"\s+", text.lower().strip()) if t]
        cum_tok += len(w)
        seen.update(w)
        if cum_tok >= 1 and len(seen) >= 1:
            pts.append((math.log(cum_tok), math.log(len(seen))))
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    beta = np.polyfit(x, y, 1)[0]
    got = Q.QUERIES["corpus_heaps_fit"](spark, sf_dir).collect()[0]
    assert got["heaps_beta"] == pytest.approx(beta, abs=1e-4)
    assert got["vocab_size"] == len(seen)
