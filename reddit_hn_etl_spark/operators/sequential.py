"""Ordered per-key folds: genuinely sequential recurrences over each
key's event history.

Some feature transforms are irreducibly sequential — exponential
moving averages, decaying counters, last-k state machines — the value
at row i depends on the FULL ordered prefix, so no window-function
rewrite exists (a closed-form prefix expression like
Σ α(1−α)^(i−j)·v_j needs (1−α)^(−j) scaling that overflows doubles on
long histories). The Spark-native shape for this is
``applyInPandas``: one hash shuffle on the key, each key's history
folded in order inside a single Arrow batch.

Scale posture (100 TB): parallelism is the KEY cardinality, and one
key's history must fit in a task — the right contract for
user/session/entity features (bounded per-entity history), the wrong
one for a single global series. Hot keys are one task each; for
unbounded histories or streaming arrival, the same recurrence runs
under ``applyInPandasWithState`` (streaming/ingest.py holds the
stateful-op patterns) where the carried accumulator IS the state and
history never materializes.

The fold body evaluates the recurrence with the EXACT float
expression the DuckDB oracle's ``list_reduce`` lambda uses
(``α·v + (1−α)·acc``, same operand order), so results are
bit-identical across engines — the driver hash-compare needs no
tolerance. Deliberately NOT pandas ``ewm``: its C kernel computes an
algebraically equal but differently-rounded expression.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def ema_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ema",
) -> DataFrame:
    """Per-key exponential moving average at every row.

    ``ema_0 = v_0``; ``ema_i = α·v_i + (1−α)·ema_{i−1}`` over rows
    ordered by ``order_cols`` (pass a unique tiebreaker last — order
    must be total or the fold is nondeterministic). Output: the input
    schema plus ``out_col`` (double).

    One shuffle on ``key_col``; each group is one Arrow batch folded
    sequentially (the recurrence is inherently order-dependent).
    """
    a = float(alpha)
    order = list(order_cols)
    # fresh StructType — StructType.add would mutate the DataFrame's
    # cached schema object in place
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        out = vals.copy()
        acc = 0.0
        for i in range(len(vals)):
            # same operand order as the oracle's list_reduce lambda
            acc = vals[i] if i == 0 else a * vals[i] + (1.0 - a) * acc
            out[i] = acc
        pdf[out_col] = out
        return pdf

    return df.groupBy(key_col).applyInPandas(fold, schema)


def cusum_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    target_col: str,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided CUSUM (Page 1954) per key: ``s_0 = 0``;
    ``s_i = max(0, s_{i−1} + (v_i − target))`` over rows ordered by
    ``order_cols``. The classic sequential change-point statistic —
    the running evidence that the series drifted ABOVE its reference
    level, reset whenever the evidence goes negative.

    ``target_col`` is a per-key constant column (join the reference
    level in before calling). Same contract and scale posture as
    ``ema_per_key``: one shuffle on the key, one ordered Arrow fold
    per key, bit-identical to a ``list_reduce`` with the same lambda
    (``greatest(0.0, acc + (v − target))``) seeded by a prepended 0.
    """
    order = list(order_cols)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        tgt = pdf[target_col].to_numpy(dtype="float64")
        out = vals.copy()
        acc = 0.0
        for i in range(len(vals)):
            # same operand order as the oracle's list_reduce lambda
            nxt = acc + (vals[i] - tgt[i])
            acc = nxt if nxt > 0.0 else 0.0
            out[i] = acc
        pdf[out_col] = out
        return pdf

    return df.groupBy(key_col).applyInPandas(fold, schema)


def holt_winters_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.25,
    beta: float = 0.125,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt's double exponential smoothing per key (level + trend —
    the forecasting recurrence one state can't carry; `ema_per_key`
    is the one-state special case):

    ``level_0 = v_0``, ``trend_0 = 0``;
    ``level_i = α·v_i + (1−α)·(level_{i−1} + trend_{i−1})``;
    ``trend_i = β·(level_i − level_{i−1}) + (1−β)·trend_{i−1}``.

    The one-step-ahead forecast is ``level + trend`` (project it
    downstream). Defaults α=1/4, β=1/8 are binary-exact, so with
    exact-integer inputs every smoothed value is the same IEEE
    double an oracle evaluating the LITERAL expressions produces
    (a recursive CTE — a 2-state recurrence doesn't fit a scalar
    list_reduce). Same contract and scale posture as `ema_per_key`:
    one shuffle on the key, one ordered Arrow fold per key.
    """
    a, b = float(alpha), float(beta)
    order = list(order_cols)
    schema = StructType(
        list(df.schema.fields)
        + [StructField(level_col, DoubleType()),
           StructField(trend_col, DoubleType())]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        lvl_out = vals.copy()
        tr_out = vals.copy()
        lvl, tr = 0.0, 0.0
        for i in range(len(vals)):
            if i == 0:
                lvl, tr = vals[0], 0.0
            else:
                # same operand order as the oracle's recursive CTE
                lvl_new = a * vals[i] + (1.0 - a) * (lvl + tr)
                tr = b * (lvl_new - lvl) + (1.0 - b) * tr
                lvl = lvl_new
            lvl_out[i] = lvl
            tr_out[i] = tr
        pdf[level_col] = lvl_out
        pdf[trend_col] = tr_out
        return pdf

    return df.groupBy(key_col).applyInPandas(fold, schema)


def holt_winters_fixed_point_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    int_value_col: str,
    alpha: tuple[int, int] = (1, 4),
    beta: tuple[int, int] = (1, 8),
    scale_bits: int = 20,
    level_col: str = "level_fp",
    trend_col: str = "trend_fp",
) -> DataFrame:
    """Holt double exponential smoothing as an EXACT integer
    fixed-point recurrence — the engine-proof twin of
    :func:`holt_winters_per_key`.

    The float version bets on cross-engine bit-equality of a chained
    float recurrence (``0.25·x + 0.75·(l+t)``); round 4's driver run
    called that bet (FMA contraction / engine-version drift are real).
    This variant carries level and trend as BIGINT multiples of
    ``2^-scale_bits`` of the input unit, with rational smoothing
    factors ``alpha = an/ad``, ``beta = bn/bd``:

    ``L_0 = x_0·S``, ``T_0 = 0`` (``S = 2^scale_bits``);
    ``L_i = ⌊(an·x_i·S + (ad−an)·(L+T)) / ad⌋`` (floor);
    ``T_i = ⌊(bn·(L_i−L_{i−1}) + (bd−bn)·T_{i−1}) / bd⌋``.

    Every state is an int64 (floor division — Python ``//`` — matches
    the oracle's portable SQL floor ``(a − (((a % d) + d) % d)) // d``;
    DuckDB ``//`` truncates but the adjusted numerator divides
    exactly). Downstream, ``L/S`` is an exact power-of-2 double while
    ``L ≤ 2^52``, so emitted doubles are bit-identical by
    construction, not by luck. Headroom: inputs up to ~4·10^8 with the
    default 20 scale bits keep ``ad·(L+T)`` under 2^62.

    Same physical shape as the float twin: one hash shuffle on the
    key, one ordered Arrow fold per key; per-key history must fit a
    task (entity-feature contract, not single-global-series).
    """
    import pandas as pd

    an, ad = int(alpha[0]), int(alpha[1])
    bn, bd = int(beta[0]), int(beta[1])
    if not (0 < an < ad and 0 < bn < bd):
        raise ValueError("alpha/beta must be proper positive fractions")
    scale = 1 << scale_bits
    order = list(order_cols)
    schema = StructType(
        list(df.schema.fields)
        + [StructField(level_col, LongType()),
           StructField(trend_col, LongType())]
    )

    def fold(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        vals = pdf[int_value_col].tolist()
        lvls: list[int] = []
        trs: list[int] = []
        lvl = tr = 0
        for i, v in enumerate(vals):
            x = int(v) * scale
            if i == 0:
                lvl, tr = x, 0
            else:
                # Python // floors — identical to the oracle's
                # portable-floor SQL on every sign combination.
                lvl_new = (an * x + (ad - an) * (lvl + tr)) // ad
                tr = (bn * (lvl_new - lvl) + (bd - bn) * tr) // bd
                lvl = lvl_new
            lvls.append(lvl)
            trs.append(tr)
        pdf[level_col] = pd.Series(lvls, dtype="int64")
        pdf[trend_col] = pd.Series(trs, dtype="int64")
        return pdf

    return df.groupBy(key_col).applyInPandas(fold, schema)
