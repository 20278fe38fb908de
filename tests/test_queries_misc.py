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
