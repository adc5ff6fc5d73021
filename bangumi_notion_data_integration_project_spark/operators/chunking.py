"""Fixed-size token-window document chunking with overlap — the
RAG / embedding-prep primitive (split each document into ~N-token
chunks, consecutive chunks sharing an overlap so no span is cut
mid-context).

Entirely per-row: chunk boundaries are integer arithmetic on the
token array, the chunk list is a higher-order ``transform`` over a
``sequence`` of start offsets, and ``posexplode`` emits one row per
chunk. Zero shuffle — chunking 100 TB is a map-only stage whose output
partitioning follows the input. All boundary math is integer-exact, so
a SQL oracle reproduces chunk membership bit-for-bit.

There is no equivalent in the reference (it syncs row-shaped API data,
not documents); this extends the engine for LLM-pipeline use the same
way operators/dedup.py and operators/similarity.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``
    (0-based, ``stride = chunk_size - overlap``). The final chunk may
    be shorter than ``chunk_size``; a document shorter than one chunk
    yields exactly one chunk; empty/blank documents yield none.

    Output: (id_col, chunk_id, chunk_text, n_chunk_tokens).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap

    toks = tokens(text_col)
    # NULL text → size() is NULL → treat as empty (no chunks), matching
    # the blank-text path
    n = F.coalesce(F.size(toks), F.lit(0))
    # 1 + ceil((n - chunk_size) / stride) chunks, in pure int math:
    # ceil(a/s) == floor((a + s - 1) / s) for a >= 0
    extra = F.greatest(n - chunk_size, F.lit(0))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        (F.lit(1) + F.floor((extra + stride - 1) / stride)).cast("int")
    )
    starts = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i * stride + 1, chunk_size), " ")
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("long").alias("n_chunk_tokens"),
    )
