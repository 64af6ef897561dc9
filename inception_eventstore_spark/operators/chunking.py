"""Context-window chunking: split documents into fixed-size overlapping
chunks for training/embedding pipelines.

A pre-training or RAG-indexing pipeline needs each document cut into
windows of at most ``chunk_chars`` with ``overlap_chars`` of shared
context between consecutive windows (stride = chunk - overlap). The
whole operator is one narrow projection + ``explode`` over a generated
index sequence — no shuffle, no UDF, fully codegen'd — so at 100 TB it
streams through the scan at parquet read speed and the chunk count per
task is bounded by the input split size.

Chunk arithmetic (identical integer math in the DuckDB oracle):
``n_chunks = (max(len - overlap, 1) + stride - 1) div stride`` for
non-empty text, zero chunks for empty text; chunk i covers characters
``[i*stride, i*stride + chunk_chars)`` (0-based), so every character
belongs to at least one chunk and consecutive chunks share exactly
``overlap_chars`` characters (except a possibly-shorter final chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    docs: DataFrame,
    chunk_chars: int,
    overlap_chars: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Returns (id, chunk_idx, chunk_start, chunk_text) with ``chunk_idx``
    and ``chunk_start`` 0-based. Empty documents produce no chunks.
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not 0 <= overlap_chars < chunk_chars:
        raise ValueError(
            f"overlap_chars must be in [0, chunk_chars), got {overlap_chars}"
        )
    stride = chunk_chars - overlap_chars
    n = F.length(F.col(text_col))
    n_chunks = F.expr(
        f"(greatest(length(`{text_col}`) - {overlap_chars}, 1) "
        f"+ {stride - 1}) div {stride}"
    )
    return (
        docs.where(n > 0)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks.cast("long") - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("chunk_start"),
            F.substring(
                F.col(text_col),
                (F.col("chunk_idx") * stride + 1).cast("int"),
                chunk_chars,
            ).alias("chunk_text"),
        )
    )


def chunk_stats(
    chunks: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document chunk counts and total chunked characters — the
    sanity aggregate a chunking job reports (one partial-agg shuffle)."""
    return chunks.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.length("chunk_text").cast("long")).alias("chunk_chars_total"),
    )
