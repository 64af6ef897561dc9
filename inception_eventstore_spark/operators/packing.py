"""Sequence packing: arrange documents into fixed token-budget training
sequences.

LLM pre-training consumes fixed-length sequences; the standard
preparations are (a) concat-and-chunk — concatenate the token stream in
a canonical document order and cut every ``budget`` tokens, documents
may straddle a cut — and (b) greedy first-fit — a document that would
overflow the open sequence starts a new one, no document is split.

Spark-first scale shapes:

- The global running token offset that concat-and-chunk needs is NOT a
  ``Window.orderBy`` over the whole table (that collapses to a single
  partition — the classic scale killer). ``token_offsets`` runs the
  textbook two-phase scan: per-shard window cumsum (one shuffle on the
  shard key) + a driver-side prefix sum over the per-shard totals
  (thousands of longs, not rows) broadcast back as shard offsets. The
  shard key is ``id div shard_size``, so the canonical order (ascending
  id) is preserved across shard boundaries.
- Greedy packing is a sequential recurrence (each placement depends on
  the previous fill), so it is inherently per-shard imperative:
  ``pack_greedy`` runs first-fit inside each shard via
  ``applyInPandas`` — shards pack independently and in parallel, and
  determinism comes from the (shard, id) order, not the partitioning.
  Cross-shard waste is at most one underfull sequence per shard.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shard_expr(docs: DataFrame, id_col: str, shard_size: int) -> F.Column:
    """Deterministic order-preserving shard key with a BOUNDED shard
    count (≈ rows / shard_size) for ANY id distribution — dense, sparse
    or hashed. ``id div shard_size`` degenerates when ids are sparse
    (xxhash64 ids → one shard per row → the driver-side prefix sum
    scales with row count); instead the shard width adapts to the
    observed [min, max] so the prefix structures stay O(#shards).
    Shards are contiguous id ranges (``id div width`` is monotone), so
    ascending-id order across shard boundaries is preserved. One tiny
    min/max/count agg job derives the width; the result is a pure
    function of the data, not of partitioning."""
    row = docs.agg(
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    if not row["n"]:
        return F.lit(0).cast("long")
    if row["lo"] is None:
        raise ValueError(
            f"{id_col!r} is NULL for every row — packing needs a "
            "non-null numeric id to define the canonical order"
        )
    lo, hi, n = int(row["lo"]), int(row["hi"]), int(row["n"])
    n_shards = max(1, (n + shard_size - 1) // shard_size)
    width = max(1, (hi - lo) // n_shards + 1)
    if n_shards == 1 or width > (1 << 62):
        # single shard (or a width literal that would overflow the
        # int64 SQL literal for full-range hashed ids) — constant key
        return F.lit(0).cast("long")
    return F.expr(f"`{id_col}` div {width}").cast("long")


def token_offsets(
    docs: DataFrame,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    shard_size: int = 1_000_000,
) -> DataFrame:
    """docs + ``tok_start``: the exclusive running sum of ``n_tok_col``
    in ascending ``id_col`` order, computed scale-safely (see module
    docstring). Ids may be sparse or hashed — the shard key adapts to
    the id range (``_shard_expr``), and the result is shard-invariant:
    tok_start is the same global prefix sum whatever the sharding."""
    sharded = docs.withColumn(
        "_shard", _shard_expr(docs, id_col, shard_size)
    )

    totals = (
        sharded.groupBy("_shard")
        .agg(F.sum(F.col(n_tok_col).cast("long")).alias("_total"))
        .collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r._shard):
        offsets[row._shard] = acc
        acc += row._total
    spark = docs.sparkSession
    offset_df = spark.createDataFrame(
        [(int(s), int(o)) for s, o in offsets.items()],
        "_shard long, _shard_off long",
    )

    w = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn(
        "_local_end", F.sum(F.col(n_tok_col).cast("long")).over(w)
    )
    return (
        local.join(F.broadcast(offset_df), "_shard")
        .withColumn(
            "tok_start",
            F.col("_shard_off") + F.col("_local_end") - F.col(n_tok_col),
        )
        .drop("_shard", "_shard_off", "_local_end")
    )


def pack_chunked(
    docs: DataFrame,
    budget: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    shard_size: int = 1_000_000,
) -> DataFrame:
    """Concat-and-chunk assignment: each doc gets the sequence its
    FIRST token lands in (``seq_id``), its offset inside that sequence,
    and whether it straddles a cut. Zero-token docs occupy no stream
    positions; they attach to the sequence at their offset."""
    offs = token_offsets(docs, n_tok_col, id_col, shard_size)
    return (
        offs.withColumn("seq_id", F.expr(f"tok_start div {budget}"))
        .withColumn(
            "seq_offset", F.col("tok_start") - F.col("seq_id") * budget
        )
        .withColumn(
            "_last",
            F.col("tok_start")
            + F.greatest(F.col(n_tok_col).cast("long") - 1, F.lit(0)),
        )
        .withColumn(
            "spans_cut",
            (F.expr(f"_last div {budget}") != F.col("seq_id")).cast(
                "boolean"
            ),
        )
        .drop("_last")
    )


def _greedy_rows(
    pdf: pd.DataFrame, budget: int, id_col: str, n_tok_col: str
) -> pd.DataFrame:
    pdf = pdf.sort_values(id_col)
    bins, fills = [], []
    b, fill = 0, 0
    for n in pdf[n_tok_col].astype("int64"):
        n_eff = min(int(n), budget)  # over-budget docs own a full bin
        if fill > 0 and fill + n_eff > budget:
            b, fill = b + 1, 0
        bins.append(b)
        fill += n_eff
        fills.append(fill)
    pdf = pdf.copy()
    pdf["bin_in_shard"] = pd.Series(bins, index=pdf.index, dtype="int64")
    pdf["bin_fill"] = pd.Series(fills, index=pdf.index, dtype="int64")
    return pdf


def pack_greedy(
    docs: DataFrame,
    budget: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    shard_size: int = 1_000_000,
) -> DataFrame:
    """First-fit-in-order packing per shard (no document is split; a
    doc longer than the budget occupies a bin alone, truncation is the
    tokenizer's concern). Output adds ``shard``, ``bin_in_shard`` and
    the running ``bin_fill`` after placement; (shard, bin_in_shard) is
    the global sequence key.

    The recurrence runs in pandas per shard — shards are independent,
    so parallelism = number of shards, and the result is a pure
    function of (id order, token counts), not of partitioning. Shards
    come from ``_shard_expr`` (≈ shard_size rows each for any id
    distribution), so sparse/hashed ids never degenerate to
    one-doc-per-shard packing."""
    sharded = docs.withColumn(
        "shard", _shard_expr(docs, id_col, shard_size)
    )
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in sharded.dtypes
    ) + ", bin_in_shard long, bin_fill long"
    return sharded.groupBy("shard").applyInPandas(
        lambda pdf: _greedy_rows(pdf, budget, id_col, n_tok_col),
        out_schema,
    )


def packing_stats(
    packed: DataFrame,
    budget: int,
    seq_cols: Iterable[str] = ("shard", "bin_in_shard"),
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Per-run packing efficiency: sequences, docs/seq, fill rate."""
    per_seq = packed.groupBy(*seq_cols).agg(
        F.count("*").alias("docs"),
        F.sum(F.least(F.col(n_tok_col).cast("long"), F.lit(budget))).alias(
            "tokens"
        ),
    )
    return per_seq.agg(
        F.count("*").alias("sequences"),
        F.round(F.avg("docs"), 6).alias("avg_docs_per_seq"),
        F.round(F.avg(F.col("tokens") / F.lit(float(budget))), 6).alias(
            "avg_fill"
        ),
    )
