"""Misc query-surface pins: array-valued aggregates, scalar edge cases.

The driver registry intentionally exposes the *string-joined* form of
array aggregates (its pandas canonicalizer can't hash list cells);
these tests pin the natural array-valued variants.
"""

from __future__ import annotations

from reddit_hn_etl_spark.plans.queries import (
    user_event_type_sets,
    user_event_type_sets_array,
)


def test_domain_from_url_scheme_case(spark):
    """Pin the documented divergence from the reference: uppercase
    schemes are stripped (reference would emit the junk domain
    'https:'); lowercase-scheme URLs behave identically to the
    reference composition."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.functions.scalars import domain_from_url

    df = spark.createDataFrame(
        [
            ("HTTPS://Example.com/x",),
            ("https://example.com/x",),
            ("http://Sub.Host.org",),
            ("",),
            (None,),
        ],
        "url string",
    )
    got = [r.d for r in df.select(domain_from_url(F.col("url")).alias("d")).collect()]
    assert got == [
        "example.com",     # divergence: reference yields 'https:'
        "example.com",     # identical to reference
        "sub.host.org",
        "(no_domain)",
        "(no_domain)",
    ]


def test_canonical_url_rules(spark):
    """Pin every canonicalization rule of scalars.canonical_url one
    by one (case, www, default/explicit ports, fragment, tracking
    params, param sort, empty params, trailing slashes, NULL/empty
    passthrough) — the url_canonical_dedup oracle mirrors these in
    SQL, so this is the engine-side half of the differential."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.functions.scalars import canonical_url

    cases = [
        # scheme/host case + www + default https port + fragment
        ("HTTPS://WWW.Example.COM:443/A/b/#frag", "https://example.com/A/b"),
        # http default port + tracking params dropped + params sorted
        (
            "http://example.com:80/p?utm_source=x&b=2&a=1",
            "http://example.com/p?a=1&b=2",
        ),
        # explicit non-default port kept
        ("https://example.com:8080/p", "https://example.com:8080/p"),
        # http with :443 is NOT a default port — kept
        ("http://example.com:443/p", "http://example.com:443/p"),
        # empty + tracking-only query drops the '?'
        ("https://example.com/p?utm_campaign=z&fbclid=Q", "https://example.com/p"),
        # gclid= and ref= are tracking; refresh=1 is NOT (prefix match
        # requires the '=' right after the name)
        (
            "https://example.com/p?gclid=1&ref=hn&refresh=1",
            "https://example.com/p?refresh=1",
        ),
        # tracking prefixes match case-INSENSITIVELY (like the
        # case-normalized scheme/host); Refresh=1 still survives
        # because the prefix needs the '=' right after 'ref'
        (
            "https://example.com/p?REF=y&UTM_SOURCE=x&Refresh=1&b=1",
            "https://example.com/p?Refresh=1&b=1",
        ),
        # multi-colon authority: the port is everything after the
        # FIRST colon, kept verbatim — distinct spellings stay distinct
        ("http://example.com:8080:1/p", "http://example.com:8080:1/p"),
        ("http://example.com:8080:2/p", "http://example.com:8080:2/p"),
        # trailing slash runs collapse; bare root has no path
        ("https://example.com///", "https://example.com"),
        # query without path; duplicate '&&' yields no empty param
        ("https://example.com?b=2&&a=1", "https://example.com?a=1&b=2"),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_event_type_sets_array(spark, sf_dir):
    """Array variant agrees element-wise with the driver's joined-string
    variant, and every array is sorted (deterministic)."""
    arr = {
        r["user_id"]: (list(r["event_types"]), r["n_types"])
        for r in user_event_type_sets_array(spark, sf_dir).collect()
    }
    joined = {
        r["user_id"]: (r["event_types"], r["n_types"])
        for r in user_event_type_sets(spark, sf_dir).collect()
    }
    assert arr.keys() == joined.keys()
    for uid, (types, n) in arr.items():
        assert types == sorted(types)
        assert len(types) == n
        j_types, j_n = joined[uid]
        assert ",".join(types) == j_types
        assert n == j_n
    assert len(arr) > 0


def test_dsir_log_weights_separate_planted_domains(spark):
    """Target docs use vocab A, raw-only docs vocab B: every target
    doc must score positive (its tokens are relatively more likely
    under the target model) and every off-target doc negative; a
    doc with no target overlap scores lower than a mixed one."""
    from reddit_hn_etl_spark.functions.text import dsir_log_weights

    rows = [
        (1, "alpha alpha beta alpha", True),
        (2, "alpha beta alpha alpha", True),
        (3, "gamma delta gamma delta", False),
        (4, "gamma gamma delta gamma", False),
        (5, "alpha gamma", False),  # mixed, off-target
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            df, df.tgt, id_col="doc_id", text_col="text", n_buckets=64
        ).collect()
    }
    assert got[1] > 0 and got[2] > 0
    assert got[3] < 0 and got[4] < 0
    assert got[3] < got[5] < got[1]


def test_constraint_report_null_passes_and_one_scan(spark):
    """SQL CHECK semantics: NULL rule results pass, only FALSE
    violates; all rules share one aggregation pass (no per-rule
    scans in the plan)."""
    from reddit_hn_etl_spark.operators.checks import constraint_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, amount double"
    )
    from pyspark.sql import functions as F

    rep = constraint_report(
        df,
        {
            "amount_positive": F.col("amount") > 0,  # NULL row passes
            "id_small": F.col("id") < 100,
        },
    )
    got = {r["constraint"]: (r["n_violations"], r["passed"]) for r in rep.collect()}
    assert got["amount_positive"] == (1, False)  # only the -5 row
    assert got["id_small"] == (0, True)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final.count("Scan ExistingRDD") == 1


def test_mann_kendall_matches_brute_force(spark, sf_dir):
    """S, tie-corrected variance, and z of the registered query match
    a straight numpy-free brute-force recomputation over the same
    per-type daily series."""
    import math
    from collections import Counter

    from reddit_hn_etl_spark.plans.queries import QUERIES

    rows = QUERIES["daily_mann_kendall"](spark, sf_dir).collect()
    assert rows, "empty MK result"
    # rebuild the daily series directly
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.sources.tables import read_table

    ev = read_table(spark, str(sf_dir), "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    got_daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"), cents.alias("c"))
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in got_daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["cents"]))
    for row in rows:
        xs = [c for _, c in sorted(series[row["event_type"]])]
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var_s)
        assert row["n_days"] == n and row["s_stat"] == s
        assert row["var_s"] == var_s
        assert abs(row["z_stat"] - z) < 1e-11


def test_spearman_matches_brute_force(spark, sf_dir):
    """rho of the registered query equals Pearson-on-average-ranks
    computed with plain Python fractions-free arithmetic."""
    import math

    from reddit_hn_etl_spark.plans.queries import QUERIES

    rows = QUERIES["daily_spearman_corr"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.sources.tables import read_table

    ev = read_table(spark, str(sf_dir), "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    got_daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"), cents.alias("c"))
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"), F.count(F.lit(1)).alias("ne"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in got_daily:
        series.setdefault(r["event_type"], []).append((r["cents"], r["ne"]))

    def doubled_ranks(vals):
        order = sorted(vals)
        return [2 * (1 + order.index(v)) + order.count(v) - 1 for v in vals]

    for row in rows:
        pts = series[row["event_type"]]
        rx = doubled_ranks([p[0] for p in pts])
        ry = doubled_ranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        rho = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert row["n_days"] == n
        assert abs(row["rho"] - rho) < 1e-11


def test_conformal_qhat_is_exact_order_statistic(spark, sf_dir):
    """q̂ equals the ⌈0.9(n+1)⌉-th smallest calibration residual
    recomputed driver-side, and coverage lands in a sane band around
    the nominal 90% on this near-exchangeable data."""
    import math

    from reddit_hn_etl_spark.plans.queries import QUERIES

    rows = QUERIES["value_conformal_intervals"](spark, sf_dir).collect()
    assert rows
    import hashlib

    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.sources.tables import read_table

    ev = read_table(spark, str(sf_dir), "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    raw = ev.select("event_id", "event_type", cents.alias("cents")).collect()
    calib: dict[str, list] = {}
    for r in raw:
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[0]
        if h in "01234567":
            calib.setdefault(r["event_type"], []).append(r["cents"])
    for row in rows:
        xs = calib[row["event_type"]]
        n = len(xs)
        s = sum(xs)
        # integer-exact residual discipline (r5): |cents·n − Σcents|
        # ≡ n·|cents − mean| — same order statistic, zero floats
        resid_int = sorted(abs(x * n - s) for x in xs)
        k = math.ceil(0.9 * (n + 1))
        assert row["n_calib"] == n
        assert abs(row["qhat"] - resid_int[k - 1] / n) < 1e-6
        assert 0.8 <= row["coverage"] <= 1.0


def test_mutual_knn_pairs_are_symmetric_topk(spark, sf_dir):
    """Every emitted pair must appear in BOTH endpoints' exact top-5
    neighbor lists, recomputed driver-side with numpy."""
    import numpy as np

    from reddit_hn_etl_spark.plans.queries import QUERIES
    from reddit_hn_etl_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    rows = QUERIES["mutual_knn_pairs"](spark, sf_dir).collect()
    assert rows
    emb = (
        read_table(spark, str(sf_dir), "embeddings")
        .where(F.col("vec_id") % 4 == 0)
        .collect()
    )
    ids = [r["vec_id"] for r in emb]
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    topk = {}
    for i, vid in enumerate(ids):
        order = sorted(
            ((S[i, j], -ids[j]) for j in range(len(ids)) if j != i),
            reverse=True,
        )[:5]
        topk[vid] = {-t[1] for t in order}
    for r in rows:
        assert r["hi_id"] in topk[r["lo_id"]], r
        assert r["lo_id"] in topk[r["hi_id"]], r


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    """JL with m=16: the measured squared-distance ratios concentrate
    around 1; assert median within [0.6, 1.6] and every ratio
    positive (numpy cross-check of one pair)."""
    import hashlib

    import numpy as np

    from reddit_hn_etl_spark.plans.queries import QUERIES, _jl_planes

    rows = QUERIES["embedding_jl_distortion"](spark, sf_dir).collect()
    assert rows
    ratios = sorted(r["dist_ratio"] for r in rows)
    assert all(r > 0 for r in ratios)
    med = ratios[len(ratios) // 2]
    assert 0.6 <= med <= 1.6
    # numpy recomputation for the first emitted pair
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.sources.tables import read_table

    pair = rows[0]
    emb = (
        read_table(spark, str(sf_dir), "embeddings")
        .where(F.col("vec_id").isin(pair["lo_id"], pair["hi_id"]))
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    P = np.array(_jl_planes(), dtype=np.float64)
    d = vecs[pair["lo_id"]] - vecs[pair["hi_id"]]
    ratio = float((P @ d) @ (P @ d)) / (16 * float(d @ d))
    assert abs(ratio - pair["dist_ratio"]) < 1e-4


def test_peak_concurrency_matches_brute_force(spark, sf_dir):
    """Sweep-line peak == brute-force max overlap recomputed
    driver-side from the same deterministic session intervals."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.plans.queries import QUERIES
    from reddit_hn_etl_spark.sources.tables import read_table

    rows = {
        r["event_type"]: r
        for r in QUERIES["peak_concurrent_sessions"](spark, sf_dir).collect()
    }
    assert rows
    ev = read_table(spark, str(sf_dir), "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    raw = ev.select(
        "event_type",
        start.alias("s"),
        (start + (F.lit(60) + cents % 1800) * 1000000).alias("e"),
    ).collect()
    by_type: dict[str, list] = {}
    for r in raw:
        by_type.setdefault(r["event_type"], []).append((r["s"], r["e"]))
    for et, ivs in by_type.items():
        bounds = sorted(
            [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs]
        )  # (-1 sorts before +1 at equal t: half-open semantics)
        cur = peak = 0
        peak_at = None
        for t, d in bounds:
            cur += d
            if cur > peak:
                peak, peak_at = cur, t
        row = rows[et]
        assert row["n_sessions"] == len(ivs)
        assert row["peak_concurrency"] == peak
        assert row["peak_at_us"] == peak_at
        assert peak >= 2  # discriminating data, not vacuous


def test_twap_matches_brute_force(spark, sf_dir):
    """TWAP == driver-side Σ cents·gap / Σ gap over the same
    (type, day) event sequences."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.plans.queries import QUERIES
    from reddit_hn_etl_spark.sources.tables import read_table

    got = {
        (r["event_type"], str(r["day"])): r
        for r in QUERIES["type_daily_twap"](spark, sf_dir).collect()
    }
    assert got
    ev = read_table(spark, str(sf_dir), "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    raw = ev.select(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        cents.alias("c"),
        "event_id",
    ).collect()
    series: dict[tuple, list] = {}
    for r in raw:
        series.setdefault((r["event_type"], r["day"]), []).append(
            (r["t"], r["event_id"], r["c"])
        )
    for key, pts in series.items():
        pts.sort()
        num = den = 0
        for (t1, _, c), (t2, _, _) in zip(pts, pts[1:]):
            num += c * (t2 - t1)
            den += t2 - t1
        if den == 0:
            assert key not in got
            continue
        row = got[key]
        assert row["observed_us"] == den
        assert row["n_gaps"] == len(pts) - 1
        assert abs(row["twap_value"] - num / den / 100.0) < 1e-6


def test_isotropy_identity_equals_bruteforce_pairs(duck):
    """||Σq||² − Σ||q||² must equal the brute-force Σ_{a≠b}<q_a,q_b>
    EXACTLY (all integers on the 1e-6 grid) — the N²→N identity the
    isotropy audit rests on."""
    ss, t = duck.execute("""
        WITH qx AS (
            SELECT vec_id, CAST(u.pos AS INTEGER) pos,
                   CAST(FLOOR(CAST(u.x AS DOUBLE)*1000000.0) AS BIGINT) q
            FROM embeddings,
                 LATERAL (SELECT unnest(embedding) x,
                          unnest(range(0,len(embedding))) pos) u),
        s AS (SELECT pos, SUM(q) sd FROM qx GROUP BY pos)
        SELECT (SELECT SUM(sd*sd) FROM s), (SELECT SUM(q*q) FROM qx)
    """).fetchone()
    brute = duck.execute("""
        WITH qx AS (
            SELECT vec_id, CAST(u.pos AS INTEGER) pos,
                   CAST(FLOOR(CAST(u.x AS DOUBLE)*1000000.0) AS BIGINT) q
            FROM embeddings,
                 LATERAL (SELECT unnest(embedding) x,
                          unnest(range(0,len(embedding))) pos) u)
        SELECT COALESCE(SUM(a.q*b.q), 0) FROM qx a
        JOIN qx b ON a.pos = b.pos AND a.vec_id <> b.vec_id
    """).fetchone()[0]
    assert ss - t == brute and brute != 0


def test_cdc_chunk_boundaries_survive_prefix_insertion(duck):
    """The CDC selling point: prepending text re-chunks only the
    neighborhood of the edit — chunks after the first post-edit cut
    are IDENTICAL (fixed-size blocks would shift every boundary)."""
    chunk_sql = """
        WITH d AS (SELECT ? AS text),
        g AS (
            SELECT text, CAST(length(text) AS BIGINT) AS n,
                   list_filter(range(8, CAST(length(text) AS BIGINT)),
                       i -> CAST(('0x' || substring(md5(
                                substr(text, CAST(i AS INTEGER) - 7, 8)),
                                1, 15)) AS BIGINT) % 32 = 31) AS cuts
            FROM d
        ),
        b AS (SELECT text,
                     list_prepend(CAST(0 AS BIGINT),
                                  list_append(cuts, n)) AS bs
              FROM g)
        SELECT list_transform(range(1, len(bs)),
                   j -> substr(text, CAST(bs[j] + 1 AS INTEGER),
                               CAST(bs[j + 1] - bs[j] AS INTEGER)))
        FROM b
    """
    base = duck.execute(
        "SELECT text FROM documents WHERE length(text) > 200 LIMIT 1"
    ).fetchone()[0]
    orig = duck.execute(chunk_sql, [base]).fetchone()[0]
    edited = duck.execute(chunk_sql, ["XYZ " + base]).fetchone()[0]
    assert "".join(orig) == base and "".join(edited) == "XYZ " + base
    # all but the first few chunks of the edited doc appear verbatim
    # in the original chunking (boundaries resynchronize)
    tail = edited[2:]
    assert len(tail) >= 3
    assert all(c in orig for c in tail)


def test_bench_lists_partition_registry():
    """Sweep lists + BENCH_EXCLUDED partition the registry exactly:
    every query is either benched or excluded-with-reason (VERDICT r5
    #4 — the exclusion set is enumerated and auditable), never both,
    never neither; probe queries are a subset of the exact-pairs
    exclusions and their twins are benched."""
    import bench
    from reddit_hn_etl_spark.plans.queries import QUERIES

    names = (
        bench.BENCH_QUERIES
        + bench.BENCH_QUERIES_R2
        + bench.BENCH_QUERIES_R4
        + bench.BENCH_QUERIES_R5
        + bench.BENCH_QUERIES_R6
        + bench.BENCH_QUERIES_R9
        + bench.BENCH_QUERIES_R10
        + bench.BENCH_QUERIES_R11
        + bench.BENCH_QUERIES_R12
    )
    assert len(names) == len(set(names)), "duplicate sweep entries"
    swept, excluded = set(names), set(bench.BENCH_EXCLUDED)
    assert not swept & excluded
    assert swept | excluded == set(QUERIES), (
        sorted(set(QUERIES) - swept - excluded),
        sorted((swept | excluded) - set(QUERIES)),
    )
    assert set(bench.BENCH_EXCLUDED.values()) <= {
        "exact-pairs",
        "approx-eval",
        "micro",
        "synth-bounded",
    }
    for exact, twin in bench.EXACT_PAIRS_PROBE.items():
        assert bench.BENCH_EXCLUDED.get(exact) == "exact-pairs"
        assert twin in swept, (exact, twin)


def test_bench_outlier_rerun_rule():
    """VERDICT r10 #4: on a degraded box (parallelism < 28) the bench
    re-runs any query whose two-axis-normalized time regressed >2×
    vs the prior round's record. Pure-function pins: the flag fires
    only under BOTH conditions, normalization uses the prior round's
    OWN calib/parallelism stamps, and a healthy box never re-runs."""
    import bench

    prior = {
        "cpu_calib_ms": 100.0,
        "cpu_parallelism": 32.0,
        "cpu_parallelism_of": 32,
        "queries": {"q_slow": 10.0, "q_ok": 10.0, "q_gone": 5.0},
    }
    timings = {"q_slow": 45.0, "q_ok": 12.0, "q_new": 99.0, "q_gone": None}
    # degraded box, same calib: q_slow normalized 45*0.5=22.5 > 2*10
    flagged = bench.outlier_names(timings, 100.0, 16.0, 32, prior)
    assert flagged == ["q_slow"]
    # healthy box: rule is off even with the same regression
    assert bench.outlier_names(timings, 100.0, 30.0, 32, prior) == []
    # no prior round: off
    assert bench.outlier_names(timings, 100.0, 16.0, 32, None) == []
    # prior box twice as slow (calib 200): prior norm = 12*0.5 = 6;
    # current at half parallelism norm = raw*0.5 — raw 26 → 13 > 12
    # flags, raw 22 → 11 does not (both axes enter the comparison)
    prior2 = dict(prior, cpu_calib_ms=200.0, queries={"q_ok": 12.0})
    assert bench.outlier_names(
        {"q_ok": 26.0}, 100.0, 16.0, 32, prior2
    ) == ["q_ok"]
    assert bench.outlier_names(
        {"q_ok": 22.0}, 100.0, 16.0, 32, prior2
    ) == []
    # ADVICE r11: the degraded-box gate is RELATIVE (cur_par <
    # 0.875 * cur_par_of), not the absolute 28 that misclassified
    # every smaller box. On an 8-core box delivering 7.5/8 (~94%),
    # the rule is OFF even with a >2× normalized regression ...
    prior8 = {
        "cpu_calib_ms": 100.0,
        "cpu_parallelism": 8.0,
        "cpu_parallelism_of": 8,
        "queries": {"q_slow": 10.0},
    }
    assert bench.outlier_names(
        {"q_slow": 45.0}, 100.0, 7.5, 8, prior8
    ) == []
    # ... and ON when the same box delivers 4/8 (50%).
    assert bench.outlier_names(
        {"q_slow": 45.0}, 100.0, 4.0, 8, prior8
    ) == ["q_slow"]


def test_bench_record_outlier_rule():
    """VERDICT r12 #3: BENCH_r12 crowned url_canonical_dedup slowest
    at 30.3 s (solo ~3 s) — a steal burst on a query with no
    prior-round record, invisible to the >2x degraded-box rule. The
    additive record-rule flags queries ABSENT from the prior
    slowest-20 whose normalized time exceeds 2.5x the normalized
    prior cutoff (the 20th-slowest bound), on ANY box."""
    import bench

    prior = {
        "cpu_calib_ms": 100.0,
        "cpu_parallelism": 32.0,
        "cpu_parallelism_of": 32,
        "queries": {"q_a": 10.0, "q_b": 5.0},  # cutoff = 5.0
    }
    # healthy box, same calib: q_new 30 s > 2.5*5 -> flagged even
    # though the degraded-box rule is off; q_a has a prior record so
    # the record-rule never touches it; q_mid 12 s <= 12.5 passes.
    timings = {"q_a": 45.0, "q_new": 30.0, "q_mid": 12.0, "q_none": None}
    assert bench.record_outlier_names(
        timings, 100.0, 32.0, 32, prior
    ) == ["q_new"]
    # two-axis normalization enters: at half parallelism the same
    # 30 s normalizes to 15 s > 12.5 still flags, but 24 s -> 12 does
    # not.
    assert bench.record_outlier_names(
        {"q_new": 24.0}, 100.0, 16.0, 32, prior
    ) == []
    # no prior summary (or an empty per-query map): off.
    assert bench.record_outlier_names(timings, 100.0, 32.0, 32, None) == []
    assert (
        bench.record_outlier_names(
            timings, 100.0, 32.0, 32, {"cpu_calib_ms": 100.0, "queries": {}}
        )
        == []
    )


def test_bench_r01_subtotal_self_describing():
    """VERDICT r11 #5: a sweeps=1 bench includes first-run plan
    compile in the r01-comparable subtotal; the summary must say so
    in-band (cold flag + first-sweep subtotal) so BENCH_rN.json alone
    can't be misread as a warm regression."""
    import bench

    q0, q1 = bench.BENCH_QUERIES[0], bench.BENCH_QUERIES[1]
    first = {q0: 5.0, q1: 7.0, "not_r01": 99.0}
    # one sweep: best == first, flagged cold
    got = bench.r01_subtotal_fields(first, dict(first), sweeps_done=1)
    assert got == {
        "r01_comparable_subtotal": 12.0,
        "r01_subtotal_cold": True,
        "r01_subtotal_first_sweep": 12.0,
    }
    # two sweeps: best improves, flag off, cold bound preserved
    best = {q0: 3.0, q1: 6.5, "not_r01": 50.0}
    got = bench.r01_subtotal_fields(first, best, sweeps_done=2)
    assert got == {
        "r01_comparable_subtotal": 9.5,
        "r01_subtotal_cold": False,
        "r01_subtotal_first_sweep": 12.0,
    }
    # a query that never completed (None in best) drops from the
    # best-of subtotal without poisoning it
    got = bench.r01_subtotal_fields(first, {q0: 3.0, q1: None}, 2)
    assert got["r01_comparable_subtotal"] == 3.0


def test_bench_parallelism_denominator_not_hardcoded():
    """ADVICE r9 (fixed 712a827), exercised with a non-32 worker
    count as VERDICT r10 #4 asks: the parallelism probe's denominator
    follows the requested worker count, and the ratio can never
    exceed it."""
    import bench

    par = bench.cpu_multicore_parallelism(4)
    assert 0.0 < par <= 4.0 + 0.3  # small timer jitter headroom
    n = bench.two_axis_norm(10.0, 100.0, 2.0, 4)
    assert n is not None and abs(n - 5.0) < 1e-9
    assert bench.two_axis_norm(10.0, 0.0, 2.0, 4) is None


def test_bench_prior_summary_loader():
    """load_prior_summary parses the driver's tail-truncated record
    (only the final self-contained summary line is guaranteed to
    survive) and picks the HIGHEST round by number, not lexically."""
    import json as _json
    import os as _os

    import bench

    root = _os.path.dirname(_os.path.abspath(bench.__file__))
    prior = bench.load_prior_summary(root)
    assert prior is not None and "cpu_calib_ms" in prior
    # matches the newest BENCH_r*.json by round number
    import glob
    import re

    # main-round records only — variant artifacts (BENCH_r12_c8.json,
    # the driver's 8-core scaling run) tie the round number and must
    # not become the outlier-rule baseline
    newest = max(
        (
            p
            for p in glob.glob(_os.path.join(root, "BENCH_r*.json"))
            if re.fullmatch(r"BENCH_r\d+\.json", _os.path.basename(p))
        ),
        key=lambda p: int(re.search(r"r(\d+)", _os.path.basename(p)).group(1)),
    )
    rec = _json.load(open(newest, encoding="utf-8"))
    tail = rec["tail"]
    want = _json.loads(tail[tail.rfind('{"metric"'):])
    assert prior["value"] == want["value"]
