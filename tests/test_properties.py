"""Property-based differential tests (hypothesis): core operators vs
brute-force Python models on random inputs. Complements the
DuckDB-oracle suite — these hit edge shapes (empty overlaps, equal
timestamps, singleton groups) random SQL data rarely produces.

Examples are kept small and few: each example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from reddit_hn_etl_spark.operators.dedup import dedup_keep_last
from reddit_hn_etl_spark.operators.merge import merge_upsert
from reddit_hn_etl_spark.operators.sessions import session_summary

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = dt.datetime(2024, 1, 1)

# (key, freshness_minute, value) rows; small key/ts domains force
# collisions, equal-timestamp ties, and disjoint/overlapping key sets.
row = st.tuples(
    st.integers(0, 5), st.integers(0, 10), st.integers(-100, 100)
)
rows = st.lists(row, min_size=0, max_size=20)


def _df(spark, data):
    return spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), v) for k, m, v in data],
        "k long, ts timestamp, v long",
    )


def _merge_model(target, source):
    """Reference semantics of sql/load/03_merge.sql: per key, source
    applies iff key absent or source strictly fresher."""
    # dedup source: freshest per key (ties broken by larger v to
    # mirror dedup_keep_last(order_by=[ts, v]))
    src = {}
    for k, m, v in source:
        if k not in src or (m, v) > (src[k][0], src[k][1]):
            src[k] = (m, v)
    tgt = {k: (m, v) for k, m, v in target}  # unique keys by construction
    out = dict(tgt)
    inserted = updated = 0
    for k, (m, v) in src.items():
        if k not in out:
            out[k] = (m, v)
            inserted += 1
        elif m > out[k][0]:
            out[k] = (m, v)
            updated += 1
    return out, inserted, updated


@given(target=rows, source=rows)
@SET
def test_merge_matches_model(spark, target, source):
    # make target keys unique (staging invariant: PK per key)
    tgt = list({k: (k, m, v) for k, m, v in target}.values())
    t_df, s_df = _df(spark, tgt), _df(spark, source)
    merged, metrics = merge_upsert(
        dedup_keep_last(t_df, ["k"], ["ts", "v"]),
        dedup_keep_last(s_df, ["k"], ["ts", "v"]),
        keys=["k"],
        freshness_col="ts",
    )
    got = {r.k: ((r.ts - BASE).seconds // 60, r.v) for r in merged.collect()}
    want, ins, upd = _merge_model(
        [(k, m, v) for k, m, v in
         {k: (k, m, v) for k, m, v in tgt}.values()],
        source,
    )
    assert got == want
    assert (metrics.inserted, metrics.updated) == (ins, upd)


@given(data=rows)
@SET
def test_dedup_keep_last_matches_model(spark, data):
    out = dedup_keep_last(_df(spark, data), ["k"], ["ts", "v"]).collect()
    got = {r.k: ((r.ts - BASE).seconds // 60, r.v) for r in out}
    want = {}
    for k, m, v in data:
        if k not in want or (m, v) > want[k]:
            want[k] = (m, v)
    assert got == want


def _session_model(data, gap_minutes):
    """Brute-force sessionization (sorted scan per key)."""
    per_key = {}
    for k, m, v in data:
        per_key.setdefault(k, []).append((m, v))
    out = {}
    for k, evs in per_key.items():
        evs.sort()  # (minute, v) — v acts as the deterministic tiebreak
        sess_no = 0
        prev = None
        for m, v in evs:
            if prev is None or (m - prev) * 60 > gap_minutes * 60:
                sess_no += 1
                out[(k, sess_no)] = [m, m, 0]
            out[(k, sess_no)][1] = m
            out[(k, sess_no)][2] += 1
            prev = m
    return {
        key: (start, end, n) for key, (start, end, n) in out.items()
    }


@given(data=rows, gap=st.integers(1, 4))
@SET
def test_sessionize_matches_model(spark, data, gap):
    out = session_summary(
        _df(spark, data), key_cols=["k"], ts_col="ts",
        gap_seconds=gap * 60, order_tiebreak=["v"],
    ).collect()
    got = {
        (r.k, r.session_no): (
            (r.session_start - BASE).seconds // 60,
            (r.session_end - BASE).seconds // 60,
            r.n_events,
        )
        for r in out
    }
    assert got == _session_model(data, gap)


def _asof_model(left, right):
    """Brute force: for each left row the right row with greatest
    ts <= left ts (ties on ts resolved by the dedup: max v wins)."""
    # dedup right per (k, ts): keep max v (mirrors dedup_keep_last order)
    r = {}
    for k, m, v in right:
        if (k, m) not in r or v > r[(k, m)]:
            r[(k, m)] = v
    out = []
    for k, m, v in left:
        cands = [(rm, rv) for (rk, rm), rv in r.items() if rk == k and rm <= m]
        match = max(cands) if cands else None
        out.append((k, m, v, match[1] if match else None,
                    match[0] if match else None))
    return sorted(out)


@given(left=rows, right=rows)
@SET
def test_asof_join_matches_model(spark, left, right):
    from reddit_hn_etl_spark.operators.dedup import dedup_keep_last
    from reddit_hn_etl_spark.operators.joins import asof_join

    l_df = _df(spark, left)
    r_df = dedup_keep_last(
        _df(spark, right), keys=["k", "ts"], order_by=["v"]
    ).select("k", F.col("ts").alias("rts"), F.col("v").alias("rv"))
    out = asof_join(
        l_df, r_df, on=["k"], left_ts="ts", right_ts="rts", value_cols=["rv"]
    ).collect()
    got = sorted(
        (
            r.k,
            (r.ts - BASE).seconds // 60,
            r.v,
            r.rv,
            None if r.matched_ts is None else (r.matched_ts - BASE).seconds // 60,
        )
        for r in out
    )
    assert got == _asof_model(left, right)


def _pit_model(left, right, tol_min):
    """Brute force point-in-time: per left row the right row with
    greatest ts STRICTLY < left ts; nulled if staler than tol_min."""
    r = {}
    for k, m, v in right:
        if (k, m) not in r or v > r[(k, m)]:
            r[(k, m)] = v
    out = []
    for k, m, v in left:
        cands = [(rm, rv) for (rk, rm), rv in r.items() if rk == k and rm < m]
        match = max(cands) if cands else None
        if match is not None and tol_min is not None and m - match[0] > tol_min:
            match = None
        out.append((k, m, v, match[1] if match else None,
                    match[0] if match else None))
    return sorted(out)


@given(left=rows, right=rows, tol=st.sampled_from([None, 0, 2, 5]))
@SET
def test_pit_join_matches_model(spark, left, right, tol):
    """Strict (<) tie semantics and the freshness tolerance: a
    same-instant right row must NOT match (lookahead leakage), and a
    match older than the tolerance nulls the features but keeps the
    left row."""
    from reddit_hn_etl_spark.operators.joins import pit_join

    l_df = _df(spark, left)
    r_df = dedup_keep_last(
        _df(spark, right), keys=["k", "ts"], order_by=["v"]
    ).select("k", F.col("ts").alias("rts"), F.col("v").alias("rv"))
    out = pit_join(
        l_df, r_df, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"],
        tolerance_sec=None if tol is None else tol * 60,
    ).collect()
    got = sorted(
        (
            r.k,
            (r.ts - BASE).seconds // 60,
            r.v,
            r.rv,
            None if r.matched_ts is None else (r.matched_ts - BASE).seconds // 60,
        )
        for r in out
    )
    assert got == _pit_model(left, right, tol)


@given(
    vals=st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()),
        min_size=0, max_size=40,
    ),
    parts=st.integers(1, 7),
)
@SET
def test_prefix_sum_matches_model(spark, vals, parts):
    """Hierarchical prefix sum == brute-force running sum for any
    value signs, NULLs (add 0), and partition counts — including more
    partitions than rows (empty range buckets)."""
    from reddit_hn_etl_spark.operators.prefix import prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    out = prefix_sum(
        df, order_col="k", value_col="v", num_partitions=parts
    ).collect()
    acc, model = 0, {}
    for i, v in enumerate(vals):
        acc += v or 0
        model[i] = v, acc
    assert {r.k: (r.v, r.running) for r in out} == model


def test_prefix_sum_plan_has_no_full_data_single_partition(spark):
    """The full-data exchange must be rangepartitioning; the only
    SinglePartition window sits above the per-partition totals agg."""
    from reddit_hn_etl_spark.operators.prefix import prefix_sum

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    plan = (
        prefix_sum(df, "k", "v", num_partitions=4, checkpoint=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan, plan
    main, _, offsets_branch = plan.partition("_pfx_total")
    assert "SinglePartition" not in main, main
    # The offsets branch MAY single-partition — it holds one row per
    # range partition, not per data row.
    assert "hashpartitioning(_pfx_pid" in offsets_branch, offsets_branch


@given(
    vals=st.lists(st.integers(0, 9), min_size=0, max_size=30),
    n=st.integers(1, 6),
    parts=st.integers(1, 5),
    desc=st.booleans(),
)
@SET
def test_global_ntile_matches_spark_window(spark, vals, n, parts, desc):
    """Hierarchical global_ntile == Spark's NTILE(n) OVER (ORDER BY …)
    under a total order, for N<n, N%n!=0, duplicates-broken-by-key,
    and either direction."""
    from pyspark.sql import Window
    from reddit_hn_etl_spark.operators.prefix import global_ntile

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    got = global_ntile(
        df, n, ["v", "k"], descending=[desc, False],
        out_col="b", num_partitions=parts,
    ).collect()
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("k")]
    want = df.select(
        "k", F.ntile(n).over(Window.orderBy(*order)).alias("b")
    ).collect()
    assert {r.k: r.b for r in got} == {r.k: r.b for r in want}
    # The literal-count fast path must agree with the counted path.
    lit = global_ntile(
        df, n, ["v", "k"], descending=[desc, False],
        out_col="b", num_partitions=parts, total_rows=len(vals),
    ).collect()
    assert {r.k: r.b for r in lit} == {r.k: r.b for r in want}


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=0, max_size=20,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=0, max_size=8,
    ),
    buckets=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
@SET
def test_salted_join_matches_plain(spark, left, right, buckets, how):
    """salted_join must be invisible in the result for ANY bucket
    count / join type — including empty sides, duplicate keys on both
    sides (cartesian sub-blocks), and unmatched left rows."""
    from reddit_hn_etl_spark.operators.joins import salted_join

    ldf = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(left)], "k long, lv long, rid long"
    )
    rdf = spark.createDataFrame(right, "k long, rv long")
    plain = sorted(map(tuple, ldf.join(rdf, "k", how).collect()))
    salted = sorted(
        map(tuple, salted_join(ldf, rdf, "k", buckets, how=how).collect())
    )
    assert salted == plain


# --- repetition features vs a Python model -------------------------------

# Tiny alphabet forces heavy gram collisions; whitespace runs and
# empty docs hit the tokenizer edge cases.
doc_text = st.lists(
    st.sampled_from(["a", "b", "ab", "ba"]), min_size=0, max_size=12
).map(" ".join)
docs_strategy = st.lists(doc_text, min_size=1, max_size=8)


def _repetition_model(text):
    toks = [t for t in text.strip().lower().split() if t]
    if not toks:
        return None
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def top_frac(grams):
        if not grams:
            return 0.0
        top = max(grams.count(g) for g in set(grams))
        return round(top / len(grams), 4)

    return {
        "n_tokens": len(toks),
        "top_unigram_frac": top_frac(toks),
        "top_bigram_frac": top_frac(bigrams),
        "distinct_ratio": round(len(set(toks)) / len(toks), 4),
    }


@given(docs=docs_strategy)
@SET
def test_repetition_features_match_model(spark, docs):
    from reddit_hn_etl_spark.functions.text import repetition_features

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: {
            "n_tokens": r.n_tokens,
            "top_unigram_frac": r.top_unigram_frac,
            "top_bigram_frac": r.top_bigram_frac,
            "distinct_ratio": r.distinct_ratio,
        }
        for r in repetition_features(df, "doc_id", "text").collect()
    }
    want = {
        i: m
        for i, m in ((i, _repetition_model(t)) for i, t in enumerate(docs))
        if m is not None  # token-less docs yield no grams → no row
    }
    assert got == want


# --- connected components vs union-find ----------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0, max_size=25,
)


def _uf_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots, then map every vertex to the MIN
    # member of its component (the operator's label contract)
    roots: dict[int, list[int]] = {}
    for v in list(parent):
        roots.setdefault(find(v), []).append(v)
    out = {}
    for members in roots.values():
        lo = min(members)
        for v in members:
            out[v] = lo
    return out


@given(pairs=edges_strategy)
@SET
def test_connected_components_match_union_find(spark, pairs):
    from reddit_hn_etl_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        pairs or [(0, 0)], "doc_a long, doc_b long"
    )
    got = {
        r.vertex: r.component for r in connected_components(df).collect()
    }
    want = _uf_components(pairs or [(0, 0)])
    assert got == want


# --- jaccard_pairs vs brute force ----------------------------------------

jdocs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8
    ).map(" ".join),
    min_size=2, max_size=6,
)


def _brute_jaccard(docs, n=2, threshold=0.2):
    def shingles(text):
        toks = [t for t in text.strip().lower().split() if t]
        return {
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        }

    out = {}
    ss = [shingles(t) for t in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if not ss[i] or not ss[j]:
                continue
            inter = len(ss[i] & ss[j])
            if inter == 0:
                continue
            jac = inter / len(ss[i] | ss[j])
            if jac >= threshold:
                out[(i, j)] = round(jac, 4)
    return out


@given(docs=jdocs_strategy)
@SET
def test_jaccard_pairs_match_brute_force(spark, docs):
    from reddit_hn_etl_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, "doc_id", "text", n=2,
                               threshold=0.2).collect()
    }
    assert got == _brute_jaccard(docs)


@given(pairs=edges_strategy)
@SET
def test_star_components_match_union_find(spark, pairs):
    from reddit_hn_etl_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        pairs or [(0, 0)], "doc_a long, doc_b long"
    )
    got = {
        r.vertex: r.component
        for r in connected_components_star(df).collect()
    }
    assert got == _uf_components(pairs or [(0, 0)])


def _brute_triangles(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = sorted({v for e in und for v in e})
    adj = {v: set() for v in verts}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = {v: 0 for v in verts}
    for i, a in enumerate(verts):
        for b in (x for x in verts[i + 1:] if x in adj[a]):
            for c in (x for x in verts if x > b and x in adj[a] and x in adj[b]):
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    out = {}
    for v in verts:
        d = len(adj[v])
        clust = round(2 * tri[v] / (d * (d - 1)), 4) if d > 1 else 0.0
        out[v] = (d, tri[v], clust)
    return out


@given(pairs=edges_strategy)
@SET
def test_triangle_stats_match_bruteforce(spark, pairs):
    from reddit_hn_etl_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(pairs or [(0, 1)], "doc_a long, doc_b long")
    got = {
        r.vertex: (r.degree, r.triangles, r.clustering)
        for r in triangle_stats(df).collect()
    }
    assert got == _brute_triangles(pairs or [(0, 1)])


def _brute_containment(docs, threshold):
    grams = {
        i: set(t.lower().split()) for i, t in docs
    }
    out = {}
    for a, sa in grams.items():
        for b, sb in grams.items():
            if a == b or not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= threshold:
                out[(a, b)] = round(c, 4)
    return out


texts_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.lists(
            st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"]),
            min_size=1, max_size=8,
        ).map(" ".join),
    ),
    min_size=1, max_size=8, unique_by=lambda t: t[0],
)


@given(docs=texts_strategy, threshold=st.sampled_from([0.3, 0.5, 1.0]))
@SET
def test_containment_matches_bruteforce(spark, docs, threshold):
    from reddit_hn_etl_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(
            df, "doc_id", "text", n=1, threshold=threshold
        ).collect()
    }
    assert got == _brute_containment(docs, threshold)


# --- duplicate_spans vs brute force --------------------------------

# Tiny vocab + short docs force overlapping/adjacent/cross-doc span
# shapes random real text never produces.
_span_doc = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
).map(" ".join)
_span_corpus = st.lists(_span_doc, min_size=1, max_size=5)


def _spans_model(texts, k=3):
    grams = {}  # gram -> set(doc)
    pos = []  # (doc, p, gram)
    for d, t in enumerate(texts):
        w = t.split()
        for p in range(len(w) - k + 1):
            g = " ".join(w[p : p + k])
            grams.setdefault(g, set()).add(d)
            pos.append((d, p, g))
    dup = {g for g, docs in grams.items() if len(docs) >= 2}
    hits = sorted({(d, p) for d, p, g in pos if g in dup})
    out = set()
    cur = None
    for d, p in hits:
        if cur and cur[0] == d and p == cur[2] + 1:
            cur = (d, cur[1], p)
        else:
            if cur:
                out.add((cur[0], cur[1], cur[2] + k - 1, cur[2] + k - cur[1]))
            cur = (d, p, p)
    if cur:
        out.add((cur[0], cur[1], cur[2] + k - 1, cur[2] + k - cur[1]))
    return out


@given(texts=_span_corpus)
@SET
def test_duplicate_spans_matches_bruteforce(spark, texts):
    from reddit_hn_etl_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(df, "doc_id", "text", k=3).collect()
    }
    assert got == _spans_model(texts, k=3)


# --- sequence_pattern_matches vs brute force -----------------------

_seq_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 8),  # minute
        st.sampled_from(["A", "B", "C", "x"]),
    ),
    min_size=0,
    max_size=16,
)


def _seq_model(events, max_span_min):
    out = set()
    by_user: dict = {}
    for i, (u, m, t) in enumerate(events):
        by_user.setdefault(u, []).append((m, i, t))
    for u, evs in by_user.items():
        evs.sort()
        for ci, (cm, cid, ct) in enumerate(evs):
            if ct != "C":
                continue
            bs = [e for e in evs[:ci] if e[2] == "B"]
            if not bs:
                continue
            bm, bid, _ = bs[-1]
            b_idx = evs.index((bm, bid, "B"))
            as_ = [e for e in evs[:b_idx] if e[2] == "A"]
            if not as_:
                continue
            am, aid, _ = as_[-1]
            if (cm - am) * 60_000_000 <= max_span_min * 60_000_000:
                out.add((u, am, bm, cm))
    return out


@given(events=_seq_events)
@SET
def test_sequence_pattern_matches_bruteforce(spark, events):
    from reddit_hn_etl_spark.operators.scd import sequence_pattern_matches

    rows = [
        (i, u, BASE + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (
            r.user_id,
            (r.first_ts - BASE).total_seconds() / 60,
            (r.second_ts - BASE).total_seconds() / 60,
            (r.third_ts - BASE).total_seconds() / 60,
        )
        for r in sequence_pattern_matches(
            df,
            key_col="user_id",
            ts_col="ts",
            type_col="event_type",
            first="A",
            second="B",
            third="C",
            max_span_micros=5 * 60_000_000,
            tiebreak_col="event_id",
        ).collect()
    }
    assert got == _seq_model(events, 5)


edge = st.tuples(st.integers(0, 9), st.integers(0, 9))


@given(pairs=st.lists(edge, min_size=1, max_size=15))
@SET
def test_pagerank_matches_power_iteration(spark, pairs):
    """Undirected PageRank vs a brute-force power iteration with the
    identical update rule; total mass exactly 1 on every random
    graph (self-loops excluded like the operator's callers do)."""
    from reddit_hn_etl_spark.operators.graph import pagerank

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["vertex"]: r["pagerank"]
        for r in pagerank(edges, n_iter=3, damping=0.875).collect()
    }
    sym = set()
    for a, b in pairs:
        sym.add((a, b))
        sym.add((b, a))
    verts = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in verts}
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(3):
        s = {v: 0.0 for v in verts}
        for a, b in sorted(sym):
            s[b] += r[a] / deg[a]
        r = {v: 0.125 / n + 0.875 * s[v] for v in verts}
    assert set(got) == set(verts)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in verts:
        assert abs(got[v] - r[v]) < 1e-9


@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.one_of(st.none(), st.integers(-5, 5))),
        min_size=0,
        max_size=15,
    )
)
@SET
def test_constraint_report_matches_hand_count(spark, data):
    """CHECK semantics on random frames with NULLs: a NULL rule
    result never counts as a violation; counts match a Python model
    exactly."""
    from reddit_hn_etl_spark.operators.checks import constraint_report

    df = spark.createDataFrame(data, "k long, v long") if data else (
        spark.createDataFrame([], "k long, v long")
    )
    rep = {
        r["constraint"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in constraint_report(
            df,
            {
                "v_nonneg": F.col("v") >= 0,       # NULL v -> passes
                "k_small": F.col("k") < 4,
                "v_not_null": F.col("v").isNotNull(),
            },
        ).collect()
    }
    n = len(data)
    v_nonneg = sum(1 for _, v in data if v is not None and v < 0)
    k_small = sum(1 for k, _ in data if k >= 4)
    v_null = sum(1 for _, v in data if v is None)
    assert rep["v_nonneg"] == (n, v_nonneg, v_nonneg == 0)
    assert rep["k_small"] == (n, k_small, k_small == 0)
    assert rep["v_not_null"] == (n, v_null, v_null == 0)


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.lists(
                st.floats(
                    min_value=-4.0, max_value=4.0,
                    allow_nan=False, allow_infinity=False, width=32,
                ),
                min_size=2, max_size=2,
            ),
        ),
        min_size=1, max_size=12,
    ),
    parts=st.integers(1, 5),
)
@SET
def test_cluster_means_quantized_partitioning_invariant(spark, vecs, parts):
    """The oracle property that makes the Lloyd update differential-
    testable: floored-grid int sums equal a Python model EXACTLY,
    under any repartitioning (order-free integer arithmetic)."""
    import math

    from reddit_hn_etl_spark.operators.kmeans import cluster_means_quantized

    df = spark.createDataFrame(
        vecs, "cluster_id int, embedding array<float>"
    ).repartition(parts)
    got = {
        (r["cluster_id"], r["pos"]): (r["n_members"], r["mean_q"])
        for r in cluster_means_quantized(df, scale=1_000_000).collect()
    }
    model: dict = {}
    for cid, v in vecs:
        # float32 storage: quantize the STORED value, like the engine
        import struct

        for pos, x in enumerate(v):
            x32 = struct.unpack("f", struct.pack("f", x))[0]
            q = math.floor(x32 * 1_000_000.0)
            n, ssum = model.get((cid, pos), (0, 0))
            model[(cid, pos)] = (n + 1, ssum + q)
    assert set(got) == set(model)
    for key, (n, ssum) in model.items():
        gn, gmean = got[key]
        assert gn == n
        assert gmean == (float(ssum) / 1_000_000.0) / n


# --- skyline_2d vs brute-force dominance ---------------------------------

sky_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=0, max_value=6),   # min_col (cost)
        st.integers(min_value=0, max_value=6),   # max_col (benefit)
    ),
    min_size=1,
    max_size=24,
)


def _brute_skyline(rows):
    keep = []
    for i, (g, c, b) in enumerate(rows):
        dominated = any(
            g2 == g and c2 <= c and b2 >= b and (c2 < c or b2 > b)
            for j, (g2, c2, b2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            keep.append((g, c, b))
    return sorted(keep)


@given(rows=sky_strategy)
@SET
def test_skyline_matches_bruteforce(spark, rows):
    from reddit_hn_etl_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(rows, "g string, cost long, benefit long")
    got = sorted(
        (r.g, r.cost, r.benefit)
        for r in skyline_2d(
            df, group_cols=["g"], min_col="cost", max_col="benefit"
        ).collect()
    )
    assert got == _brute_skyline(rows)


# --- cooccurrence_pairs vs brute-force counting --------------------------

basket_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),       # basket
        st.sampled_from(["w", "x", "y", "z"]),       # item
    ),
    min_size=0,
    max_size=30,
)


@given(rows=basket_strategy)
@SET
def test_cooccurrence_matches_bruteforce(spark, rows):
    from reddit_hn_etl_spark.operators.relational import cooccurrence_pairs

    df = spark.createDataFrame(
        rows or [(0, "w")], "basket long, item string"
    )
    out = {
        (r.item_a, r.item_b): (
            r.pair_baskets, r.baskets_a, r.baskets_b, r.n_baskets
        )
        for r in cooccurrence_pairs(
            df, basket_col="basket", item_col="item"
        ).collect()
    }

    inc = set(rows or [(0, "w")])
    baskets = {}
    for b, i in inc:
        baskets.setdefault(b, set()).add(i)
    item_cnt = {}
    for b, items in baskets.items():
        for i in items:
            item_cnt[i] = item_cnt.get(i, 0) + 1
    want = {}
    for b, items in baskets.items():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                k = (s[i], s[j])
                want[k] = want.get(k, 0) + 1
    expected = {
        k: (v, item_cnt[k[0]], item_cnt[k[1]], len(baskets))
        for k, v in want.items()
    }
    assert out == expected


# --- bfs_distances vs brute-force BFS ------------------------------------

bfs_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=20,
    ),
    st.sets(st.integers(min_value=0, max_value=9), min_size=1, max_size=3),
    st.integers(min_value=0, max_value=3),
)


def _brute_bfs(edges, seeds, max_hops):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    nxt.add(u)
        for u in nxt:
            dist[u] = h
        frontier = nxt
    return dist


@given(data=bfs_strategy)
@SET
def test_bfs_distances_match_bruteforce(spark, data):
    from reddit_hn_etl_spark.operators.graph import bfs_distances

    edges, seeds, max_hops = data
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    sdf = spark.createDataFrame([(s,) for s in seeds], "v long")
    got = {
        r.vertex: r.dist
        for r in bfs_distances(edf, sdf, max_hops=max_hops).collect()
    }
    assert got == _brute_bfs(edges or [(0, 0)], seeds, max_hops)


def test_builtin_regr_matches_moment_closed_form(spark):
    """Spark's regr_slope/regr_intercept/regr_r2 vs the five-moment
    closed form used by the brand_price_regression oracle — the
    built-ins are demonstrated here, the query layer keeps the
    exact-integer-moment formulation for cross-engine bit stability.
    """
    rows = [(1.0, 2.0), (2.0, 2.5), (3.0, 5.0), (4.0, 4.5), (5.0, 7.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = df.select(
        F.regr_slope("y", "x").alias("slope"),
        F.regr_intercept("y", "x").alias("intercept"),
        F.regr_r2("y", "x").alias("r2"),
    ).collect()[0]
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) ** 2) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(got.slope - slope) < 1e-9
    assert abs(got.intercept - intercept) < 1e-9
    assert abs(got.r2 - r2) < 1e-9


# --- jaro_winkler_py vs DuckDB's C++ implementation ----------------------

jw_text = st.text(
    alphabet=st.sampled_from("abcXY#01 "), min_size=0, max_size=12
)


@given(a=jw_text, b=jw_text)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_matches_duckdb(a, b):
    import duckdb

    from reddit_hn_etl_spark.functions.text import jaro_winkler_py

    want = duckdb.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(jaro_winkler_py(a, b) - want) < 1e-9


# --- cusum_per_key vs brute-force fold -----------------------------------

cusum_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=50),     # order
        st.integers(min_value=-40, max_value=40),   # value
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=cusum_strategy, target=st.integers(min_value=-5, max_value=5))
@SET
def test_cusum_matches_bruteforce(spark, rows, target):
    from reddit_hn_etl_spark.operators.sequential import cusum_per_key

    df = spark.createDataFrame(
        [(k, o, float(v), float(target)) for k, o, v in rows],
        "k string, o long, v double, tgt double",
    )
    out = cusum_per_key(df, "k", ("o",), "v", "tgt")
    got = {(r.k, r.o): r.cusum for r in out.collect()}

    want = {}
    for key in {k for k, _, _ in rows}:
        acc = 0.0
        for _, o, v in sorted(
            (r for r in rows if r[0] == key), key=lambda r: r[1]
        ):
            acc = max(0.0, acc + (float(v) - float(target)))
            want[(key, o)] = acc
    assert got == want


# --- label_propagation vs brute-force synchronous LPA --------------------

lpa_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=16,
)


def _brute_lpa(edges, n_iter):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        nxt = {}
        for v in adj:
            counts = {}
            for u in adj[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(
                counts, key=lambda l: (-counts[l], l)
            )
        labels = nxt
    return labels


@given(edges=lpa_strategy, n_iter=st.integers(min_value=1, max_value=3))
@SET
def test_label_propagation_matches_bruteforce(spark, edges, n_iter):
    from reddit_hn_etl_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.community
        for r in label_propagation(df, n_iter=n_iter).collect()
    }
    assert got == _brute_lpa(edges, n_iter)


def test_builtin_skewness_matches_moment_closed_form(spark):
    """Spark's skewness() vs the three-power-sum closed form used by
    the value_distribution_moments oracle (population convention)."""
    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(F.skewness("x").alias("s")).collect()[0].s
    n = len(vals)
    m1 = sum(vals) / n
    m2 = sum(v * v for v in vals) / n
    m3 = sum(v ** 3 for v in vals) / n
    want = (m3 - 3 * m1 * m2 + 2 * m1 ** 3) / (m2 - m1 * m1) ** 1.5
    assert abs(got - want) < 1e-9


# --- Count-Min sketch vs brute-force model --------------------------------

cms_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=40
)


@given(items=cms_strategy)
@SET
def test_cms_never_undercounts_and_is_partitioning_invariant(spark, items):
    import hashlib

    from reddit_hn_etl_spark.operators.sketch import (
        cms_estimates,
        cms_table,
    )

    depth, width = 4, 8  # tiny width forces collisions
    df = spark.createDataFrame([(i,) for i in items], "k string")
    table = cms_table(df, "k", depth=depth, width=width)
    probes = df.distinct()
    got = {
        r.k: r.est
        for r in cms_estimates(
            table, probes, "k", depth=depth, width=width
        ).collect()
    }

    # brute-force model with the same md5 bucket function
    def bucket(r, item):
        h = hashlib.md5(f"{r}|{item}".encode()).hexdigest()[:15]
        return int(h, 16) % width

    cells: dict = {}
    for it in items:
        for r in range(depth):
            key = (r, bucket(r, it))
            cells[key] = cells.get(key, 0) + 1
    truth: dict = {}
    for it in items:
        truth[it] = truth.get(it, 0) + 1
    for it, n in truth.items():
        est = min(cells.get((r, bucket(r, it)), 0) for r in range(depth))
        assert got[it] == est
        assert est >= n

    # partitioning invariance: different partition count, same table
    t2 = cms_table(df.repartition(7), "k", depth=depth, width=width)
    a = {(r.r, r.bucket): r.cnt for r in table.collect()}
    b = {(r.r, r.bucket): r.cnt for r in t2.collect()}
    assert a == b


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.text(
                alphabet="abcxyz", min_size=1, max_size=4
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=1, max_value=5),
)
def test_ngram_array_matches_model(spark, docs, n):
    """dedup.ngram_array (the zip_with n-gram builder every shingle
    consumer now shares) == the obvious Python sliding window, for
    every doc length / n combination including empty and shorter-
    than-n docs."""
    from reddit_hn_etl_spark.operators.dedup import ngram_array

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, w array<string>",
    )
    got = {
        r["doc_id"]: list(r["g"])
        for r in df.select(
            "doc_id", ngram_array(F.col("w"), n).alias("g")
        ).collect()
    }
    for i, toks in enumerate(docs):
        expect = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
        assert got[i] == expect, (i, toks, n)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()),
                 min_size=0, max_size=40),
        min_size=1, max_size=5,
    ),
    n=st.integers(1, 37),
)
@SET
def test_ngram_doubling_matches_python_model(spark, docs, n):
    """`ngram_array_doubling` (r8 — the O(log n)-depth builder the
    LRS binary search uses at large n) vs the obvious Python n-gram
    model, over random token lists crossing every n/size boundary
    (n > size → empty, n == size → one gram, repeats kept)."""
    from reddit_hn_etl_spark.operators.dedup import (
        ngram_array_doubling,
        tokens,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", ngram_array_doubling(tokens("text"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(docs):
        want = [" ".join(t[j : j + n]) for j in range(len(t) - n + 1)]
        assert got[i] == want, (i, n, t)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("aa bb cc".split()), min_size=0,
                 max_size=8),
        min_size=1, max_size=4,
    ),
    min_docs=st.integers(2, 3),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_longest_repeated_span_matches_brute_force(spark, docs, min_docs):
    """`longest_repeated_span_length` (r8 binary search over hashed
    L-grams) vs the O(n^3) brute-force model on tiny random corpora —
    the 3-token alphabet forces heavy cross-doc gram collisions,
    short docs hit the empty/min_docs-unsatisfiable edges, and the
    exact-string re-verification runs on every found answer."""
    from reddit_hn_etl_spark.operators.dedup import (
        longest_repeated_span_length,
    )

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = longest_repeated_span_length(df, "doc_id", "text",
                                       min_docs=min_docs)

    best = 0
    for length in range(1, max((len(t) for t in docs), default=0) + 1):
        grams: dict = {}
        for i, t in enumerate(docs):
            for j in range(len(t) - length + 1):
                grams.setdefault(tuple(t[j : j + length]), set()).add(i)
        if any(len(v) >= min_docs for v in grams.values()):
            best = length
    assert got == best, (docs, min_docs, got, best)

    # occurrence mode (r9, min_count): same brute force but counting
    # POSITIONS — within-doc repeats count; the 3-token alphabet
    # makes single-doc repetition frequent, exercising exactly the
    # cases distinct-doc counting cannot see
    got_occ = longest_repeated_span_length(
        df, "doc_id", "text", min_count=min_docs
    )
    best_occ = 0
    for length in range(1, max((len(t) for t in docs), default=0) + 1):
        counts: dict = {}
        for t in docs:
            for j in range(len(t) - length + 1):
                key = tuple(t[j : j + length])
                counts[key] = counts.get(key, 0) + 1
        if any(v >= min_docs for v in counts.values()):
            best_occ = length
    assert got_occ == best_occ, (docs, min_docs, got_occ, best_occ)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("aa bb cc".split()), min_size=0,
                 max_size=10),
        min_size=1, max_size=5,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_duplicate_spans_matches_brute_force(spark, docs):
    """`remove_duplicate_spans` (r9 ExactSubstr removal) vs the
    direct Python model: mark every position covered by a k-gram
    shared by >= 2 distinct docs, drop it, reassemble. The 3-token
    alphabet forces dense cross-doc gram collisions and the size-0
    docs hit the empty-row contract."""
    from reddit_hn_etl_spark.operators.dedup import remove_duplicate_spans

    k = 2
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_tokens, r.n_tokens_removed)
        for r in remove_duplicate_spans(df, "doc_id", "text", k=k).collect()
    }

    gram_docs: dict = {}
    for i, t in enumerate(docs):
        for j in range(len(t) - k + 1):
            gram_docs.setdefault(tuple(t[j : j + k]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    for i, t in enumerate(docs):
        covered = set()
        for j in range(len(t) - k + 1):
            if tuple(t[j : j + k]) in dup:
                covered.update(range(j, j + k))
        keep = [tok for j, tok in enumerate(t) if j not in covered]
        assert got[i] == (" ".join(keep), len(t), len(covered)), (
            docs, i, got[i]
        )
    assert set(got) == set(range(len(docs)))


# ---------------------------------------------------------------------------
# canonical_url (functions/scalars.py): differential vs a direct
# Python model of the 6 documented rules, plus idempotence
# (canonical(canonical(u)) == canonical(u)) — the invariant that makes
# a canonical key safe to persist and re-canonicalize across pipeline
# versions. URLs are generated from a component grammar (no IPv6 —
# documented out of scope).
# ---------------------------------------------------------------------------

_TRACKING = ("utm_", "gclid=", "fbclid=", "ref=")


def _model_canonical(url: str) -> str:
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    scheme = m.group(1).lower() if m else ""
    rest = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", url)
    nofrag = rest.split("#", 1)[0]
    m2 = re.match(r"^([^/?]*)", nofrag)
    authority = m2.group(1)
    hostport = authority.split(":", 1)
    host = re.sub(r"^www\.", "", hostport[0].lower())
    port = hostport[1] if len(hostport) > 1 else ""
    keep = port != "" and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    )
    port_part = f":{port}" if keep else ""
    pathquery = nofrag[len(authority):]
    path = re.sub(r"/+$", "", pathquery.split("?", 1)[0])
    query = pathquery.split("?", 1)[1] if "?" in pathquery else ""
    params = sorted(
        p
        for p in query.split("&")
        if p != "" and not any(p.lower().startswith(t) for t in _TRACKING)
    )
    qp = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port_part}{path}{qp}"


_url_strategy = st.builds(
    lambda scheme, www, host, port, segs, slash, params, frag: (
        scheme
        + "://"
        + www
        + host
        + port
        + "".join("/" + s for s in segs)
        + slash
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["http", "https", "HTTPS", "Http", "ftp"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.sampled_from(["example.com", "Example.COM", "sub.host.org"]),
    # multi-colon authorities (malformed / userinfo-ish) exercise the
    # port-is-everything-after-the-FIRST-colon rule — engine and model
    # must agree that ':8080:1' and ':8080:2' stay distinct.
    port=st.sampled_from(["", ":80", ":443", ":8080", ":8080:1", ":8080:2"]),
    segs=st.lists(
        st.text(
            alphabet="abcA1.-_~%", min_size=1, max_size=4
        ),
        max_size=3,
    ),
    slash=st.sampled_from(["", "/", "//"]),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "b=10", "z=", "utm_source=x", "utm_c=y",
             "gclid=G", "fbclid=F", "ref=hn", "refresh=1", "",
             # case-variant tracking params (matched case-insensitively)
             "UTM_SOURCE=X", "REF=y", "Ref=hn", "FBclid=Q", "Refresh=1"]
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#top", "#a?b=2"]),
)


@given(urls=st.lists(_url_strategy, min_size=1, max_size=24))
@SET
def test_canonical_url_matches_model_and_is_idempotent(spark, urls):
    from reddit_hn_etl_spark.functions.scalars import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.c
        for r in df.select(
            canonical_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == [_model_canonical(u) for u in urls]
    df2 = spark.createDataFrame([(c,) for c in got], "url string")
    got2 = [
        r.c
        for r in df2.select(
            canonical_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got2 == got


# ---------------------------------------------------------------------------
# _assign_probe_cells (operators/similarity.py): the distributed
# probe-assignment stage of the IVF kNN-join vs a direct numpy model —
# per query, the n_probe nearest centroid cells under the documented
# (-cosine, cell index) tie-break, with the query vector riding along
# unchanged. Centroid/vector grids are coarse so exact similarity TIES
# occur and the stable tie-break is actually exercised.
# ---------------------------------------------------------------------------

_vec = st.lists(
    st.sampled_from([-2.0, -1.0, 0.0, 1.0, 2.0]), min_size=4, max_size=4
)


@given(
    centroids=st.lists(_vec, min_size=3, max_size=6),
    queries=st.lists(_vec, min_size=1, max_size=8),
    n_probe=st.integers(1, 3),
)
@SET
def test_assign_probe_cells_matches_numpy_model(
    spark, centroids, queries, n_probe
):
    import numpy as np

    from reddit_hn_etl_spark.operators.similarity import _assign_probe_cells

    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "query_id long, embedding array<double>",
    )
    got = sorted(
        (r.query_id, r.cell, tuple(r._qvec))
        for r in _assign_probe_cells(
            qdf, "query_id", "embedding", centroids, n_probe
        ).collect()
    )
    c = np.asarray(centroids, dtype=np.float64)
    cn = c / np.maximum(np.linalg.norm(c, axis=1), 1e-12)[:, None]
    want = []
    for i, v in enumerate(queries):
        q = np.asarray(v, dtype=np.float64)
        sims = np.round((q / max(np.linalg.norm(q), 1e-12)) @ cn.T, 12)
        order = np.argsort(-sims, kind="stable")[:n_probe]
        want.extend((i, int(cell), tuple(q)) for cell in order)
    assert got == sorted(want)
