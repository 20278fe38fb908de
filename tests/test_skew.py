"""Skewed-key correctness under AQE: a pathologically skewed join
(90% of rows on one key) still produces exact results, and the
salted-aggregation pattern agrees with the plain one."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_skewed_join_correctness(spark):
    n = 50_000
    # 90% of left rows hit key 0; right side is a small dim.
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    joined = left.join(right, "k")
    assert joined.count() == n  # every left row matches exactly once
    hot = joined.where(F.col("k") == 0)
    assert hot.count() == 45_000 and hot.select("v").distinct().count() == 1


def test_salted_agg_equals_plain_on_skew(spark):
    n = 30_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.lit(1).alias("one"),
    )
    plain = {r.k: r.c for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    salted = (
        df.withColumn("_salt", F.col("one") * (F.rand(seed=1) * 16).cast("int"))
        .groupBy("k", "_salt").agg(F.count("*").alias("pc"))
        .groupBy("k").agg(F.sum("pc").alias("c"))
    )
    got = {r.k: r.c for r in salted.collect()}
    assert got == plain


def test_salted_join_equals_plain(spark):
    """operators/joins.salted_join is result-identical to the plain
    join (inner AND left, unmatched rows preserved), and the physical
    join really runs on (key, _salt)."""
    from reddit_hn_etl_spark.operators.joins import salted_join

    n = 20_000
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
    )
    # dim covers only even keys → odd-key rows are unmatched
    right = spark.range(0, 50, 2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )

    for how in ("inner", "left"):
        plain = left.join(right, on="k", how=how)
        salted = salted_join(left, right, key="k", salt_buckets=4, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how

    plan = salted_join(
        left, right, key="k", salt_buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_aqe_skew_join_splits_partitions(spark):
    """SCALING.md's skew posture leans on AQE's skew-join for the
    automatic path (salting is the manual fallback): with a planted
    hot key and the skew thresholds lowered to laptop sizes, the
    final adaptive plan must mark the sort-merge join as skew=true
    (OptimizeSkewedJoin split the hot partition) and the join result
    must equal the no-AQE run."""
    import pyspark.sql.functions as F

    hot = spark.range(0, 60_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = hot.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution, so the
        # inspected plan is the finalized adaptive one (count() would
        # finalize a different wrapped plan)
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        assert joined.count() == n
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_df_cap_bounds_inverted_index_self_join_skew(spark):
    """VERDICT r5 #6: the pair-join families' skew posture. The
    inverted-index self-join (dedup.jaccard_pairs / tf_cosine_pairs
    shape) shuffles on the SHINGLE, so a ubiquitous shingle ("the" in
    every doc) lands df^2 candidate pairs on one shuffle partition —
    AQE's skew split cannot help because the blow-up is join OUTPUT,
    not input bytes. The documented mitigation is the df_cap switch:
    shingles with document frequency > cap carry no dedup signal and
    are dropped before the join.

    This test plants the hot shingle and (a) models per-shuffle-
    partition candidate load with Spark's own hash partitioning
    (pmod(hash(shingle), P) — murmur3, the same function
    HashPartitioning uses): the hot bucket dominates uncapped and the
    max/mean ratio collapses to near-uniform with the cap on; (b)
    pins the capped operator's exact semantics (intersections over
    rare shingles only, denominators over FULL set sizes) against a
    brute-force oracle; (c) confirms the planted near-dup pairs
    survive the cap (recall is not the price of the skew fix)."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.operators.dedup import jaccard_pairs

    n_docs, cap, parts = 300, 8, 32
    rows = []
    for i in range(n_docs):
        # every doc carries the ubiquitous token; rare tokens are
        # doc-local except for 10 planted near-dup pairs that share
        # their full rare set
        base = i - (n_docs - 10) if i >= n_docs - 10 else i
        rows.append(
            (i, f"ubiq r{base}a r{base}b r{base}c")
        )
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.col("text"), r"\s+"))
        ).alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))

    def bucket_load(fr):
        # candidate-pair volume a shuffle partition receives = sum of
        # df^2 over the shingles hashed into it
        loads = [
            r["load"]
            for r in fr.groupBy(
                F.pmod(F.hash("shingle"), F.lit(parts)).alias("b")
            )
            .agg(F.sum(F.col("df") * F.col("df")).alias("load"))
            .collect()
        ]
        return max(loads) / (sum(loads) / len(loads))

    ratio_uncapped = bucket_load(freq)
    ratio_capped = bucket_load(freq.where(F.col("df") <= cap))
    # hot shingle: df = n_docs -> its bucket alone carries ~n_docs^2
    # of the ~n_docs^2 + 4^2*rare total -> ratio ~ P
    assert ratio_uncapped > 10, ratio_uncapped
    assert ratio_capped < 3, ratio_capped

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(
            docs, "doc_id", "text", n=1, threshold=0.3, df_cap=cap
        ).collect()
    }
    # brute-force the documented capped semantics
    toks = {i: set(t.split()) for i, t in rows}
    df_all: dict = {}
    for t in toks.values():
        for s in t:
            df_all[s] = df_all.get(s, 0) + 1
    rare = {s for s, d in df_all.items() if d <= cap}
    want = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            inter = len(toks[a] & toks[b] & rare)
            if not inter:
                continue
            j = inter / (len(toks[a]) + len(toks[b]) - inter)
            if j >= 0.3:
                want[(a, b)] = round(j, 4)
    assert got == want and len(want) == 10
    # the 10 planted pairs all survive with intersection 3 of union 5
    assert all(abs(v - 0.6) < 1e-9 for v in got.values())


def test_df_cap_bounds_cross_sides_join_skew(spark):
    """VERDICT r6 #3: the CROSS-sides variant (jaccard_pairs_cross —
    the decontamination shape) has the same hot-shingle hazard as the
    self-join: one boilerplate shingle present in most bench AND
    corpus docs puts |A_df|·|B_df| candidates on one shuffle bucket.
    Same three assertions as the self-join test above: (a) per-bucket
    candidate load (Σ df_A·df_B by pmod(hash(shingle), P) — the same
    murmur3 bucketing HashPartitioning uses) is dominated by the hot
    bucket uncapped and near-uniform with the CORPUS-side cap on; (b)
    the capped operator's semantics are pinned vs brute force
    (intersections over corpus-rare shingles only, FULL set-size
    denominators); (c) the planted contamination pairs survive."""
    from pyspark.sql import functions as F

    from reddit_hn_etl_spark.operators.dedup import jaccard_pairs_cross

    n_bench, n_corpus, cap, parts = 40, 300, 8, 32
    bench_rows = []
    for i in range(n_bench):
        # every bench doc carries the boilerplate token; rare tokens
        # are doc-local
        bench_rows.append((i, f"ubiq b{i}x b{i}y b{i}z"))
    corpus_rows = []
    for j in range(n_corpus):
        cid = 1000 + j
        if j < 10:
            # planted contamination: corpus doc shares bench doc j's
            # full rare set (plus the boilerplate)
            corpus_rows.append((cid, f"ubiq b{j}x b{j}y b{j}z"))
        else:
            corpus_rows.append((cid, f"ubiq c{j}x c{j}y c{j}z"))
    bench = spark.createDataFrame(bench_rows, "doc_id int, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")

    def df_of(side):
        return (
            side.select(
                F.explode(
                    F.array_distinct(F.split(F.col("text"), r"\s+"))
                ).alias("shingle")
            )
            .groupBy("shingle")
            .agg(F.count("*").alias("df"))
        )

    fa = df_of(bench).withColumnRenamed("df", "df_a")
    fb = df_of(corpus).withColumnRenamed("df", "df_b")

    def bucket_load(fb_side):
        # cross-join candidate volume per shuffle partition = sum of
        # df_a * df_b over the shingles hashed into it
        loads = [
            r["load"]
            for r in fa.join(fb_side, "shingle")
            .groupBy(F.pmod(F.hash("shingle"), F.lit(parts)).alias("b"))
            .agg(F.sum(F.col("df_a") * F.col("df_b")).alias("load"))
            .collect()
        ]
        return max(loads) / (sum(loads) / len(loads))

    ratio_uncapped = bucket_load(fb)
    ratio_capped = bucket_load(fb.where(F.col("df_b") <= cap))
    # hot shingle: df_a*df_b = 40*300 vs ~10 planted rare matches
    assert ratio_uncapped > 10, ratio_uncapped
    assert ratio_capped < 3, ratio_capped

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_cross(
            bench, corpus, "doc_id", "text", n=1, threshold=0.3, df_cap=cap
        ).collect()
    }
    # brute-force the documented capped semantics: corpus-side df
    # bans, intersections over surviving shingles, FULL set sizes
    btoks = {i: set(t.split()) for i, t in bench_rows}
    ctoks = {i: set(t.split()) for i, t in corpus_rows}
    df_b_all: dict = {}
    for t in ctoks.values():
        for s in t:
            df_b_all[s] = df_b_all.get(s, 0) + 1
    allowed = {s for s, d in df_b_all.items() if d <= cap}
    want = {}
    for a, ta in btoks.items():
        for b, tb in ctoks.items():
            inter = len(ta & tb & allowed)
            if not inter:
                continue
            jac = inter / (len(ta) + len(tb) - inter)
            if jac >= 0.3:
                want[(a, b)] = round(jac, 4)
    assert got == want and len(want) == 10
    # the planted pairs: 3 rare shared of union 5 (ubiq dropped from
    # the intersection but kept in both set sizes)
    assert all(abs(v - 0.6) < 1e-9 for v in got.values())
