"""Distributed PCA primitives over embedding columns.

Embedding-space curation (SemDeDup-style clustering, dedup, and
retrieval — see `operators/kmeans.py`, `operators/similarity.py`)
improves measurably when vectors are mean-centered / decorrelated
first (the SemDeDup paper whitens before clustering; D4 (Tirumala et
al. 2023) runs its dedup+diversify loop in a reduced space). This
module provides the two distributed halves of that preprocessing:

1. **`second_moments_quantized`** — ONE pass over the corpus that
   produces everything PCA needs: per-dimension-pair counts, first
   moments and the Gram matrix, all in **exact integer arithmetic**
   (coordinates floored onto a 1/scale grid, partial sums as int64).
   The pass is `mapInPandas` (Arrow batches, one numpy
   `int64` matmul per batch — no per-row Python) followed by a
   single `groupBy(i, j)` whose input is **dim·(dim+1)/2 rows per
   batch, not per vector**: the map side already collapsed each
   batch to one partial triangle, so the shuffle is
   O(partitions · dim²) regardless of corpus size. At dim=64 that
   is 2 080 rows per task — the same "ship k·dim partials, never
   N·dim rows" shape as the k-means update step.
2. **`covariance`** — the closed-form finish: cov(i,j) =
   (G_ij − s_i·s_j/n)/n, evaluated as one fixed double expression
   over the exact integer sums. Because the integers are exact on
   any engine and any partitioning, the doubles are reproducible
   bit-for-bit (the expression contains no fusable a·b+c chain, so
   FMA contraction — the `kmeans_assign` gotcha — cannot bite).
3. **`top_component`** — the top eigenvector via UNROLLED power
   iteration on the dim×dim covariance (tiny — kilobytes), kept as
   DataFrame ops so the whole chain stays differential-testable
   against a SQL oracle. Every per-round quantity (matvec result,
   norm, normalized vector) is ROUNDed to 9 decimals on both
   engines: plain-SUM association noise across 64 doubles is
   ~1e-16, eight orders below the 1e-9 grid, so the rounded state
   is engine-identical and each round starts from bit-equal input
   (the `graph.pagerank` discipline, with a coarser grid because
   component magnitudes are O(0.1), not O(1/n)).
4. **`project`** — corpus-scale projection onto driver-collected
   components: a zip-product fold per vector with each product
   ROUNDed before the fold so DuckDB's list_reduce∘list_transform
   FMA fusion cannot produce 1-ulp drift (rounding is a hard
   optimization barrier; the fold then adds engine-identical
   doubles in array order).

Scale notes (100 TB posture): the only corpus-sized work is the
moments pass (one scan, O(dim²) shuffle) and the projection (one
scan, zero shuffle). Everything between — covariance finish, power
iteration — operates on ≤ dim² rows. Int64 partial sums are safe to
~10⁶ vectors per Arrow batch at |v|≤2, scale=10⁶ (product ≤ 4·10¹²,
batch ≤ 10⁴ rows ⇒ ≤ 4·10¹⁶); the final cross-batch aggregation
switches to DECIMAL(38,0) so global sums can never wrap even at
10¹¹ rows.

(The reference repo has no linear-algebra surface; this extends the
LLM-data-pipeline family per SURVEY.md §2.12.)
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_MOMENT_SCHEMA = (
    "i int, j int, n_part long, si_part long, sj_part long, g_part long"
)


def second_moments_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact-integer second-moment statistics in one distributed pass.

    Returns one row per upper-triangle dimension pair (i ≤ j):
    ``(i, j, n, s_i, s_j, gram)`` where ``q = floor(double(v)·scale)``
    and ``gram = Σ q_i·q_j``, ``s_i = Σ q_i`` over all vectors. The
    map side computes one int64 ``QᵀQ`` matmul per Arrow batch and
    emits only the dim·(dim+1)/2 partial triangle; the final sums
    aggregate as DECIMAL(38,0) so no row count can overflow them.
    """
    import numpy as np

    iu_i, iu_j = np.triu_indices(dim)
    iu_i = iu_i.astype("int32")
    iu_j = iu_j.astype("int32")
    fscale = float(scale)

    def partials(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            q = np.floor(mat * fscale).astype(np.int64)
            g = q.T @ q
            s = q.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu_i,
                    "j": iu_j,
                    "n_part": np.int64(q.shape[0]),
                    "si_part": s[iu_i],
                    "sj_part": s[iu_j],
                    "g_part": g[iu_i, iu_j],
                }
            )

    dec = "decimal(38,0)"
    return (
        df.select(vec_col)
        .mapInPandas(partials, _MOMENT_SCHEMA)
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("n_part").cast(dec)).alias("n"),
            F.sum(F.col("si_part").cast(dec)).alias("s_i"),
            F.sum(F.col("sj_part").cast(dec)).alias("s_j"),
            F.sum(F.col("g_part").cast(dec)).alias("gram"),
        )
    )


def covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
    round_digits: int = 12,
) -> DataFrame:
    """Upper-triangle covariance matrix ``(i, j, n, gram, cov)``.

    ``cov = (G_d − s_i_d·s_j_d/n_d)/n_d/scale²`` with every ``_d`` an
    exact-integer-to-double cast — reproducible bit-for-bit across
    engines (see module docstring), ROUNDed only as belt and braces.
    ``gram`` is emitted as a decimal string so the oracle can compare
    the exact integer, not a float shadow of it.
    """
    m = second_moments_quantized(df, vec_col, dim, scale)
    sc2 = float(scale) * float(scale)
    n_d = F.col("n").cast("double")
    cov = (
        (
            F.col("gram").cast("double")
            - F.col("s_i").cast("double") * F.col("s_j").cast("double") / n_d
        )
        / n_d
        / F.lit(sc2)
    )
    return m.select(
        "i",
        "j",
        F.col("n").cast("long").alias("n"),
        F.col("gram").cast("string").alias("gram"),
        F.round(cov, round_digits).alias("cov"),
    )


def top_component(
    cov_df: DataFrame,
    dim: int = 64,
    n_iter: int = 3,
    round_digits: int = 9,
) -> DataFrame:
    """Top principal component by unrolled, grid-rounded power
    iteration from the uniform unit start ``1/sqrt(dim)``.

    ``cov_df`` is the upper triangle from :func:`covariance`. Returns
    one row per dimension: ``(pos, loading, eigenvalue)`` where
    ``loading`` is the round-``n_iter`` normalized vector and
    ``eigenvalue`` its Rayleigh quotient — both on the 1e-9 grid so
    an oracle repeating the same rounded recurrence lands on the
    identical doubles. All DataFrames involved hold ≤ dim² rows; the
    joins broadcast.
    """
    spark = cov_df.sparkSession
    sym = cov_df.select("i", "j", "cov").unionAll(
        cov_df.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    )
    sym = sym.localCheckpoint(eager=True)  # cut the lineage once; tiny

    v = spark.range(dim).select(
        F.col("id").cast("int").alias("pos"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim)))).alias("vv"),
    )
    for _ in range(n_iter):
        # sym["cov"], not sym.cov — DataFrame.cov is a method, so the
        # attribute form returns a bound method instead of the Column.
        w = (
            sym.join(v, sym.j == v.pos)
            .groupBy(sym.i.alias("pos"))
            .agg(F.round(F.sum(sym["cov"] * v.vv), round_digits).alias("w"))
        )
        nm = w.agg(
            F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), round_digits)
            .alias("nm")
        )
        v = w.crossJoin(nm).select(
            "pos", F.round(F.col("w") / F.col("nm"), round_digits).alias("vv")
        )
    # materialize once: `v` feeds the Rayleigh join twice plus the
    # output crossJoin — re-planning the iteration chain per
    # reference costs minutes of scheduling on kilobyte data
    v = v.localCheckpoint(eager=True)

    a = v.select(F.col("pos").alias("ai"), F.col("vv").alias("av"))
    b = v.select(F.col("pos").alias("bi"), F.col("vv").alias("bv"))
    ray = (
        sym.join(a, sym.i == F.col("ai"))
        .join(b, sym.j == F.col("bi"))
        .agg(
            F.round(
                F.sum(F.col("cov") * F.col("av") * F.col("bv")), round_digits
            ).alias("eigenvalue")
        )
    )
    return v.crossJoin(ray).select(
        "pos", F.col("vv").alias("loading"), "eigenvalue"
    )


def deflated_component(
    cov_df: DataFrame,
    dim: int = 64,
    n_iter: int = 3,
    round_digits: int = 9,
) -> DataFrame:
    """Second principal component by Hotelling deflation: run
    :func:`top_component`'s rounded recurrence to get (v₁, λ₁), form
    ``C₂ = C − λ₁·v₁v₁ᵀ`` (each entry ROUNDed to 1e-12 — the
    subtraction is an a·b−c shape a compiler may FMA-contract, so
    the grid pins it), then power-iterate C₂ with the same 1e-9
    grid. Returns one row per dimension:
    ``(pos, loading2, eigenvalue2, v1_dot)`` where ``v1_dot`` is the
    v₁·v₂ residual overlap — small but NOT zero at 3 unconverged
    rounds; bit-equal, emitted so the oracle pins it as a value.
    Still O(dim²) rows end to end.
    """
    spark = cov_df.sparkSession
    # eager checkpoints: `first` and the iterated `v` are referenced
    # several times below; without a materialization boundary each
    # reference re-executes the whole nested iteration chain (dozens
    # of tiny jobs — minutes of pure scheduling on kilobytes).
    first = top_component(cov_df, dim, n_iter, round_digits).localCheckpoint(
        eager=True
    )
    sym = cov_df.select("i", "j", "cov").unionAll(
        cov_df.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    )
    a = first.select(
        F.col("pos").alias("ai"),
        F.col("loading").alias("av"),
        F.col("eigenvalue").alias("lam"),
    )
    b = first.select(F.col("pos").alias("bi"), F.col("loading").alias("bv"))
    c2 = (
        sym.join(a, sym.i == F.col("ai"))
        .join(b, sym.j == F.col("bi"))
        .select(
            "i",
            "j",
            F.round(
                F.col("cov") - F.col("lam") * F.col("av") * F.col("bv"), 12
            ).alias("cov"),
        )
        .localCheckpoint(eager=True)
    )

    v = spark.range(dim).select(
        F.col("id").cast("int").alias("pos"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim)))).alias("vv"),
    )
    for _ in range(n_iter):
        w = (
            c2.join(v, c2.j == v.pos)
            .groupBy(c2.i.alias("pos"))
            .agg(F.round(F.sum(c2["cov"] * v.vv), round_digits).alias("w"))
        )
        nm = w.agg(
            F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), round_digits)
            .alias("nm")
        )
        v = w.crossJoin(nm).select(
            "pos", F.round(F.col("w") / F.col("nm"), round_digits).alias("vv")
        )
    v = v.localCheckpoint(eager=True)

    ray2 = (
        c2.join(
            v.select(F.col("pos").alias("ai"), F.col("vv").alias("av")),
            c2.i == F.col("ai"),
        )
        .join(
            v.select(F.col("pos").alias("bi"), F.col("vv").alias("bv")),
            c2.j == F.col("bi"),
        )
        .agg(
            F.round(
                F.sum(F.col("cov") * F.col("av") * F.col("bv")), round_digits
            ).alias("eigenvalue2")
        )
    )
    dot = (
        v.join(
            first.select(F.col("pos"), F.col("loading").alias("v1")), "pos"
        )
        .agg(
            F.round(F.sum(F.col("vv") * F.col("v1")), round_digits)
            .alias("v1_dot")
        )
    )
    return (
        v.crossJoin(ray2)
        .crossJoin(dot)
        .select(
            "pos",
            F.col("vv").alias("loading2"),
            "eigenvalue2",
            "v1_dot",
        )
    )


def project(
    df: DataFrame,
    component: Sequence[float],
    vec_col: str = "embedding",
    out_col: str = "score",
    round_digits: int = 9,
) -> DataFrame:
    """Project every vector onto a driver-held component (kilobytes).

    Zero-shuffle single scan: score = ordered fold over
    ``round(e_pos · v_pos, 9)`` products. Rounding each product
    BEFORE the fold is load-bearing: it is an optimization barrier
    that stops DuckDB's list_reduce∘list_transform FMA contraction
    (the `kmeans_assign` gotcha), so both engines add the same
    doubles in the same order and the fold is bit-equal.
    """
    lit_v = F.lit([float(x) for x in component])
    prods = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        lit_v,
        lambda x, y: F.round(x * y, round_digits),
    )
    score = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    return df.withColumn(out_col, score)
