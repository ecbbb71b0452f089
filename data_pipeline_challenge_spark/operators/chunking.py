"""Document chunking — fixed-size token windows (the LLM-training prep op).

Two implementations of the same semantics:

- :func:`chunk_tokens` — pure Catalyst (sequence → slice → posexplode),
  whole-stage-friendly, oracle-checkable; the production path.
- :func:`chunk_text_udtf` — the same operator as a Python UDTF (Spark 4
  ``@udtf``), covering the table-function API surface; built by a factory
  so the class ships by value (repo closure convention). Tested equal to
  the Catalyst version.

Overlapping windows (stride < size) are supported in both — the common
sliding-context chunking for long-document training data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 10,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``size`` tokens,
    starting every ``stride`` tokens (default: non-overlapping). Returns
    (id, chunk_idx int, chunk string, n_tokens int). Documents shorter than
    one token still yield their single (possibly empty-ish) chunk only if
    non-empty; trailing partial chunks are kept."""
    stride = stride or size
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.when(
        F.size(toks) > 0,
        F.ceil((F.greatest(F.size(toks) - size, F.lit(0))) / F.lit(stride)).cast("int") + 1,
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk"),
            # clamp at 0: with stride > size the final chunk can start
            # past the end (slice yields ""), and the raw difference
            # would go negative — the UDTF twin emits 0 there.
            F.greatest(
                F.least(F.size(toks) - i * stride, F.lit(size)), F.lit(0)
            ).cast("int").alias("n_tokens"),
        ),
    )
    return (
        df.filter(F.size(toks) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def chunk_text_udtf(size: int = 10, stride: int | None = None):
    """Factory for the UDTF variant (class defined inside so cloudpickle
    ships it by value — executors need no package install)."""
    from pyspark.sql.functions import udtf

    step = stride or size

    @udtf(returnType="doc_id: bigint, chunk_idx: int, chunk: string, n_tokens: int")
    class ChunkText:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            # Mirror the Catalyst twin exactly: split('', ' ') -> [''] (one
            # empty token → one chunk); only a NULL text yields nothing.
            toks = text.split(" ") if text is not None else []
            if not toks:
                return
            idx = 0
            start = 0
            while True:
                window = toks[start : start + size]
                yield doc_id, idx, " ".join(window), len(window)
                if start + size >= len(toks):
                    break
                start += step
                idx += 1

    return ChunkText
