"""Corpus curation: the composed LLM-training-data pipeline.

The north-star use case that motivates the operator set: given a raw
document table, produce a training-ready corpus by chaining

  1. quality gate        — functions/text.quality_features score
  2. language filter     — functions/text.lang_id ∈ allowed set
  3. exact dedup         — operators/dedup.dedup_exact (md5 groups)
  4. near-dup removal    — operators/dedup.minhash_lsh_pairs →
                           operators/graph connected components for
                           TRANSITIVE clusters; the representative is
                           the min id or, with keep_policy
                           "best_quality", the highest-quality member
                           (graph.keep_best_per_cluster)
  5. token budgeting     — whitespace + BPE-ish token counts and the
                           cumulative corpus budget

Every stage is a lazy DataFrame plan built from already-verified
operators; the composition itself is verified by unit test with
planted duplicates and a rows-only driver query.

Scale shape: stages 1-2 are pure projections (no shuffle); stage 3 is
one hash shuffle; stage 4 is the banded LSH join; stage 5 is a
projection + one global agg. Nothing quadratic, nothing collected to
the driver except the final stats row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as textfn
from ..operators import dedup


@dataclass
class CurationConfig:
    min_quality: float = 0.5
    allowed_langs: tuple[str, ...] = ()  # empty = keep all
    minhash_threshold: float = 0.8
    num_hashes: int = 64
    bands: int = 16
    shingle_n: int = 3
    # near-dup cluster representative: "min_id" (stable default) or
    # "best_quality" (highest quality_score survives, ties → min id)
    keep_policy: str = "min_id"
    # Candidate-pair generator for the near-dup stage:
    #   "minhash"       — banded MinHash-LSH (the 100 TB default;
    #                     hash-family-specific, so only bound-checkable)
    #   "exact_jaccard" — the inverted-index exact n-gram Jaccard join
    #                     (deterministic and SQL-reproducible; right
    #                     for moderate corpora and for differential
    #                     testing of the WHOLE composed pipeline).
    # ``minhash_threshold`` is the similarity cut for whichever
    # generator is selected.
    near_dup_method: str = "minhash"


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurationConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, audit) where ``kept_docs`` is the curated
    corpus annotated with quality/token columns and ``audit`` is one
    row per ORIGINAL document recording its fate:
    kept | low_quality | wrong_lang | exact_dup | near_dup.
    """
    cfg = config or CurationConfig()

    feats = textfn.quality_features(docs, id_col, text_col)
    # The corpus may already carry columns with the feature names
    # (e.g. a raw n_chars); the computed features win — drop the
    # originals so the join stays unambiguous.
    clashes = [
        c for c in docs.columns if c != id_col and c in feats.columns
    ]
    annotated = (
        docs.drop(*clashes).join(feats, on=id_col)
        .withColumn("lang_pred", textfn.lang_id(text_col))
        .withColumn("n_tokens_bpe", textfn.token_count_bpe_ish(text_col))
        .withColumn("fingerprint", textfn.fingerprint_md5(text_col))
    )

    low_q = F.col("quality_score") < cfg.min_quality
    wrong_lang = (
        ~F.col("lang_pred").isin(list(cfg.allowed_langs))
        if cfg.allowed_langs
        else F.lit(False)
    )

    # Exact dedup: keep the min-id doc of each identical-content group.
    exact = dedup.dedup_exact(docs, [text_col], id_col).select(
        F.col(f"keep_{id_col}").alias("_keep_id")
    )

    survivors = annotated.where(~low_q & ~wrong_lang)
    survivors = survivors.join(
        exact, survivors[id_col] == exact["_keep_id"], "left"
    ).withColumn("_exact_dup", F.col("_keep_id").isNull()).drop("_keep_id")

    # Near-dup removal among exact-survivors: connected components
    # over the candidate-pair graph, keep the min-id representative
    # per cluster. (A greedy drop-every-doc_b pass is NOT transitive:
    # with pairs (1,3),(2,3), doc 2 would survive although it is a
    # dup of 1 via 3.)
    pool = survivors.where(~F.col("_exact_dup"))
    if cfg.near_dup_method == "exact_jaccard":
        near_pairs = dedup.jaccard_pairs(
            pool.select(id_col, text_col),
            id_col,
            text_col,
            n=cfg.shingle_n,
            threshold=cfg.minhash_threshold,
        )
    elif cfg.near_dup_method == "minhash":
        near_pairs = dedup.minhash_lsh_pairs(
            pool.select(id_col, text_col),
            id_col,
            text_col,
            num_hashes=cfg.num_hashes,
            bands=cfg.bands,
            shingle_n=cfg.shingle_n,
            threshold=cfg.minhash_threshold,
        )
    else:
        raise ValueError(
            f"unknown near_dup_method: {cfg.near_dup_method!r} "
            "(expected 'minhash' or 'exact_jaccard')"
        )
    if cfg.keep_policy == "best_quality":
        from ..operators.graph import connected_components, keep_best_per_cluster

        cc = connected_components(near_pairs)
        reps = keep_best_per_cluster(
            cc,
            annotated.select(F.col(id_col), F.col("quality_score")),
            id_col=id_col,
        )
        near_drop = reps.where(~F.col("is_rep")).select(F.col(id_col))
    else:
        from ..operators.graph import dedup_clusters

        near_drop = dedup_clusters(near_pairs).select(
            F.col("drop_id").alias(id_col)
        )

    kept = pool.join(near_drop, on=id_col, how="left_anti").drop("_exact_dup")

    fate = (
        annotated.select(id_col)
        .join(
            kept.select(F.col(id_col), F.lit("kept").alias("_f1")), id_col, "left"
        )
        .join(
            near_drop.select(F.col(id_col), F.lit("near_dup").alias("_f2")),
            id_col,
            "left",
        )
        .join(
            annotated.where(low_q).select(
                F.col(id_col), F.lit("low_quality").alias("_f3")
            ),
            id_col,
            "left",
        )
        .join(
            annotated.where(wrong_lang & ~low_q).select(
                F.col(id_col), F.lit("wrong_lang").alias("_f4")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("_f3", "_f4", "_f2", "_f1", F.lit("exact_dup")).alias(
                "fate"
            ),
        )
    )
    return kept, fate


def corpus_stats(kept: DataFrame) -> DataFrame:
    """One-row corpus budget summary for the curated set."""
    return kept.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens_bpe").cast("long").alias("total_tokens_bpe"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


def export_training_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurationConfig | None = None,
    tokens_per_shard: int = 2000,
    train_nibbles: str = "0123456789ab",
) -> tuple[DataFrame, DataFrame]:
    """End-to-end training-data export: curate → leakage-safe
    content-hash split → token-budget shard packing.

    Returns (shards, manifest): ``shards`` is the curated corpus
    annotated with (split, shard_id) — ready to write partitioned by
    those two columns; ``manifest`` is one row per (split, shard_id)
    with doc/token counts, the file-level contract a trainer consumes.

    Composition of already-verified pieces: `curate_corpus` (quality →
    lang → exact dedup → transitive near-dup clusters), the md5
    content-hash split (near-dups are GONE by this stage, so content
    hashing cannot leak a twin across splits — the residual risk
    `leakage_safe_split` handles pre-dedup), and the hierarchical
    prefix sum for the running token budget (per split — no
    SinglePartition window over the corpus).

    Scale: curation's shuffles + one range exchange per split for the
    packing; the write is partitionBy(split, shard_id) with in-file
    sort by id.
    """
    from ..operators.prefix import prefix_sum

    kept, _fate = curate_corpus(docs, id_col, text_col, config)
    nibble = F.substring(F.md5(F.col(text_col).cast("binary")), 1, 1)
    split_col = F.when(
        nibble.isin(*train_nibbles), F.lit("train")
    ).otherwise(F.lit("val"))
    annotated = kept.withColumn("split", split_col)

    packed = []
    for split_name in ("train", "val"):
        part = annotated.where(F.col("split") == split_name)
        cum = prefix_sum(
            part.select(id_col, F.col("n_tokens_bpe").alias("_tok")),
            order_col=id_col,
            value_col="_tok",
            out_col="_running",
        )
        shard = cum.select(
            F.col(id_col),
            F.floor((F.col("_running") - 1) / tokens_per_shard)
            .cast("long")
            .alias("shard_id"),
        )
        packed.append(
            part.join(shard, on=id_col).select(
                *[F.col(c) for c in annotated.columns], "shard_id"
            )
        )
    shards = packed[0].unionByName(packed[1])
    manifest = (
        shards.groupBy("split", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens_bpe").cast("long").alias("n_tokens"),
        )
    )
    return shards, manifest
