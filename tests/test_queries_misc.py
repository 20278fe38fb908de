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
