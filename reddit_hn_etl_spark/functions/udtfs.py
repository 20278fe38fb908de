"""Python user-defined table functions (Spark 4 UDTF API).

The one genuinely row-multiplying Python extension point Spark
offers besides explode-style builtins: a UDTF turns one input row
into N output rows with its own schema, callable from SQL with
``LATERAL`` correlation. This module keeps the engine's UDTF surface
in one place and Arrow-optimized (``useArrow=True`` — batch
transfer, not per-row pickling).

Performance posture (SURVEY §2.10 discipline): UDTFs are still a
Python-executor path. For anything expressible with builtin
``explode``/``transform``/``slice`` — including the chunker below,
whose DataFrame-native twin is the registered `doc_chunking` query —
the builtin wins at scale; the UDTF exists for logic that genuinely
needs imperative per-row expansion (stateful tokenizers, decoders)
and to keep that path tested end-to-end against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_idx int, n_chunk_tokens int, chunk_text string",
    useArrow=True,
)
class ChunkTokens:
    """Overlapping fixed-size token windows over a whitespace-token
    text: starts at 0, stride ``stride``, window ``size``; the final
    partial window is emitted (training pipelines keep the tail).

    Mirrors the arithmetic of the DataFrame-native chunker exactly so
    the DuckDB generate_series oracle covers both formulations.
    """

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = [t for t in text.split() if t]
        if not toks:
            return
        idx = 0
        for start in range(0, len(toks), stride):
            chunk = toks[start : start + size]
            yield idx, len(chunk), " ".join(chunk)
            idx += 1
            if start + size >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Idempotently register the engine's UDTFs on a session."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
