"""Fellegi–Sunter probabilistic record linkage scoring.

The engine already has the two classic BLOCKING schemes
(`sorted_neighborhood_pairs`, segment blocking in
`customer_name_jw_pairs`) and fuzzy field scoring (the Jaro–Winkler
Pandas UDF). This module adds the DECISION layer that turns field
agreements into a match verdict — the Fellegi–Sunter (1969) model
every production linker (Splink, dedupe.io) implements:

    score(pair) = Σ_i  ln(m_i/u_i)            if field i agrees
                       ln((1−m_i)/(1−u_i))    if it disagrees

where m_i = P(agree | same entity) and u_i = P(agree | different
entities). Pairs above the upper threshold are links, between the
thresholds possible links (clerical review), below, non-links.

Determinism: the per-field weights are computed ONCE in Python
(`math.log`) and inlined as double literals into the plan — the same
literals the DuckDB oracle embeds — so the score is a fixed-order sum
of identical doubles on both engines; bit-equal, no tolerance. The
m/u parameters are caller-supplied or EM-estimated: the
`fs_em_weights` query (plans/queries.py) trains them with a fully
oracle-checked EM — the sufficient statistics are the 2^k
agreement-PATTERN counts (exact ints, one distributed agg), and the
iterations run as UNROLLED scalar expressions over a pivoted 1-row
frame, generated once and evaluated verbatim by both engines, so
even the float trajectory is differential-testable.

Scale shape: pure projection over the blocked pair set — zero
shuffle beyond what blocking already did; weights are literals in
whole-stage codegen. Cost is |candidate pairs|, which blocking
bounds.

(The reference repo has no linkage surface; SURVEY §2.12 extension —
completes the entity-resolution family.)
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement, disagreement) log-likelihood-ratio weights."""
    assert 0.0 < u < m < 1.0, (m, u)
    return math.log(m / u), math.log((1.0 - m) / (1.0 - u))


def fellegi_sunter(
    pairs: DataFrame,
    comparisons: Sequence[tuple[str, float, float]],
    link_threshold: float,
    possible_threshold: float,
    score_col: str = "fs_score",
    decision_col: str = "decision",
) -> DataFrame:
    """Score blocked candidate pairs.

    ``comparisons``: (boolean agreement column, m, u) per field —
    agreement columns must be non-null (fold missingness into the
    agreement predicate upstream). Adds ``score_col`` (fixed-order
    sum of literal weights) and ``decision_col``
    ('link' / 'possible' / 'non_link').
    """
    score: Column | None = None
    for col, m, u in comparisons:
        w_a, w_d = fs_weights(m, u)
        term = F.when(F.col(col), F.lit(w_a)).otherwise(F.lit(w_d))
        score = term if score is None else score + term
    assert score is not None, "need at least one comparison"
    decision = (
        F.when(F.col(score_col) >= F.lit(float(link_threshold)), "link")
        .when(F.col(score_col) >= F.lit(float(possible_threshold)), "possible")
        .otherwise("non_link")
    )
    return pairs.withColumn(score_col, score).withColumn(
        decision_col, decision
    )
