"""Differential-privacy release primitives (Dwork et al. 2006).

The mechanism a training-data pipeline uses to publish aggregate
statistics about a private corpus (per-slice counts, histograms)
without exposing individual rows: add Laplace(Δ/ε) noise to each
exact count. At 100 TB the exact counts are one partial/final hash
aggregation; the noise is a per-GROUP scalar expression — the DP
release costs nothing beyond the aggregation itself.

Determinism contract: production DP uses a cryptographic RNG, but a
differential-testing harness needs both engines to draw the SAME
noise. `deterministic_uniform` derives u ∈ (0, 1) from md5 of the
group key — the same engine-reproducible construct as the CMS/Bloom
bucket hashes (operators/sketch.py) — and `laplace_noise` applies
the inverse CDF. Swapping the md5 seed column for a real RNG is a
one-line change at deploy time; everything else (sensitivity
bookkeeping, the release shape) is unchanged.

No reference-repo counterpart (SURVEY.md §2.12 extension family,
alongside `customer_kanonymity_risk` and `pii_redaction`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^53 — the largest power of two whose integers are all exact in a
# double; (v + 0.5) / 2^53 is strictly inside (0, 1) for v in
# [0, 2^53), so the Laplace inverse CDF below never sees ln(0).
_TWO_53 = 9007199254740992


def deterministic_uniform(key: Column) -> Column:
    """u ∈ (0, 1) derived from md5(key): 15 hex chars → 60-bit int,
    mod 2^53, then (v + 0.5) / 2^53. Bit-identical in Spark and
    DuckDB (both parse the hex via the same base-16 semantics and
    the arithmetic is exact-integer-to-double)."""
    v = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") % F.lit(
        _TWO_53
    )
    return (v.cast("double") + F.lit(0.5)) / F.lit(float(_TWO_53))


def laplace_noise(u: Column, scale: Column | float) -> Column:
    """Laplace(0, scale) via the inverse CDF: for u < 1/2 the draw is
    scale·ln(2u), else −scale·ln(2(1−u)). |noise| ≤ scale·ln 2^54
    ≈ 37.4·scale — bounded, so a ROUND(, 6) grid absorbs the last-ulp
    libm ln() differences across engines."""
    s = F.lit(scale) if isinstance(scale, float) else scale
    return F.when(u < 0.5, s * F.log(2.0 * u)).otherwise(
        -s * F.log(2.0 * (1.0 - u))
    )


def laplace_noise_sql(u_expr: str, scale: float) -> str:
    """The ANSI-SQL twin of `laplace_noise` for DuckDB oracles —
    textually the same operation order so the pre-round doubles agree
    to the last ulp of ln()."""
    return (
        f"CASE WHEN {u_expr} < 0.5 THEN {scale!r} * ln(2.0 * ({u_expr})) "
        f"ELSE -({scale!r}) * ln(2.0 * (1.0 - ({u_expr}))) END"
    )


def gumbel_noise(u: Column) -> Column:
    """Gumbel(0, 1) via the inverse CDF −ln(−ln u) — the noise of the
    exponential mechanism's report-noisy-max formulation (the same
    Gumbel-max trick `dsir_gumbel_sample` uses for sampling): adding
    Gumbel noise to ε·utility/(2Δ) and taking the argmax IS the
    exponential mechanism (McSherry & Talwar 2007)."""
    return -F.log(-F.log(u))


def gumbel_noise_sql(u_expr: str) -> str:
    """ANSI-SQL twin of `gumbel_noise`."""
    return f"-ln(-ln({u_expr}))"


DETERMINISTIC_UNIFORM_SQL = (
    "((CAST(('0x' || substring(md5({key}), 1, 15)) AS BIGINT) "
    f"% {_TWO_53}) + 0.5) / {float(_TWO_53)!r}"
)
