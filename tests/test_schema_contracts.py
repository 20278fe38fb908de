"""Registry-wide driver-canonicalizability contract (suite chunks
E2/E2b).

Split out of test_plan_contracts.py (chunk E solo-timed 5:11 on the
r9 contended box and both registry-wide walkers grow with the
registry): chunk E keeps the physical-plan walker, this file keeps
the schema walker. r11: the walker itself is split into even/odd
halves of the SORTED registry (the same self-balancing parity trick
as oracle chunks A/A2) — each half is its own suite chunk, keeping
both under the 6:00 solo line as the registry grows (VERDICT r10
#6; E2 solo-timed 4:57 on the judge's box, within sight of the
line). Both iterate registered queries but assert independent
contracts.
"""

from __future__ import annotations
import pytest

from reddit_hn_etl_spark.plans.queries import ORACLES, QUERIES


def _walk_half(spark, sf_dir, parity: int) -> None:
    """Driver-canonicalizability contract (r8, from the r7 driver
    failure): the driver compares Spark vs oracle results by sorting
    a pandas frame over ALL columns and hashing — a top-level
    array/map/struct column makes pandas raise `unhashable type:
    'list'` and burns the window slot (pq_codes/pq_residual_codes,
    CORRECTNESS_r07). Every oracle-backed query must therefore emit
    only scalar top-level columns (join arrays to CSV strings, or
    explode). Oracle-less (rows-only) queries are exempt — the driver
    only counts them."""
    from pyspark.sql import types as T

    bad: list[str] = []
    for i, name in enumerate(sorted(QUERIES)):
        if i % 2 != parity or name not in ORACLES:
            continue
        schema = QUERIES[name](spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "oracle-backed queries with driver-unhashable columns:\n"
        + "\n".join(bad)
    )


@pytest.mark.exhaustive
def test_registry_driver_canonicalizable_schemas_even(spark, sf_dir):
    _walk_half(spark, sf_dir, 0)


@pytest.mark.exhaustive
def test_registry_driver_canonicalizable_schemas_odd(spark, sf_dir):
    _walk_half(spark, sf_dir, 1)
