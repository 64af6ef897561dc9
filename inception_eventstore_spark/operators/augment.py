"""Deterministic training-data augmentation plans.

Span corruption (T5 / UL2 denoising) decides, for every token
position of every document, whether it starts or continues a masked
span. Doing that with a driver RNG would make the plan
seed-and-partitioning dependent; here the mask is CONTENT-KEYED — a
portable md5 hash of (seed, doc_id, position) — so any engine, any
partitioning, and any retry produces the identical corruption plan
(the same property all of ``operators/sampling.py`` is built on).

Reference intent: the reference engine stores opaque payloads and
leaves transformation to handlers (CassandraEventStore.cs:163-175);
augmentation is part of the driver-mandated LLM-pipeline surface, not
a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.sampling import md5_prefix60

_SIXTY = 1 << 60


def span_corruption_plan(
    docs: DataFrame,
    rate_permille: int = 150,
    seed: str = "v1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_masked, n_spans, max_span_len, mask_rate) —
    the per-document summary of a T5-style span-corruption plan
    (Raffel et al. 2020, §3.1.4: mask ~15% of tokens, consecutive
    masked tokens collapse into one sentinel span).

    Token position ``i`` of document ``d`` is masked iff
    ``md5(seed:d:i) < rate`` — content-keyed, so the plan is
    reproducible across engines/retries and documents re-corrupt
    identically in every epoch unless the seed changes. Spans are
    maximal runs of masked positions (via lag + an island id), the
    quantity that maps 1:1 to sentinel tokens in the corrupted
    encoding.

    Scale: the token text itself is never shuffled — only (doc_id,
    position) pairs explode; every window partitions by doc_id (each
    partition is one document's positions, bounded by document
    length). Empty documents are absent, as in packing."""
    if not 0 < rate_permille < 1000:
        raise ValueError("rate_permille must be in (0, 1000)")
    from inception_eventstore_spark.operators.dedup import tokens

    thr = (_SIXTY * int(rate_permille)) // 1000
    n = F.size(tokens(text_col))
    pos = (
        docs.where(n > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("idx"),
        )
        .withColumn(
            "m",
            (
                md5_prefix60(
                    F.concat_ws(
                        ":",
                        F.lit("span-" + seed),
                        F.col(id_col).cast("string"),
                        F.col("idx").cast("string"),
                    )
                )
                < F.lit(thr)
            ).cast("int"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("idx")
    flagged = pos.withColumn(
        "s",
        F.when(
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(w), F.lit(0)) == 0),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("m").cast("bigint").alias("n_masked"),
        F.sum("s").cast("bigint").alias("n_spans"),
    )
    masked = flagged.where(F.col("m") == 1)
    wm = Window.partitionBy(id_col).orderBy("idx")
    runs = (
        masked.withColumn(
            "grp", F.col("idx") - F.row_number().over(wm)
        )
        .groupBy(id_col, "grp")
        .agg(F.count("*").alias("_len"))
        .groupBy(id_col)
        .agg(F.max("_len").cast("bigint").alias("max_span_len"))
    )
    return (
        per_doc.join(runs, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_masked",
            "n_spans",
            F.coalesce("max_span_len", F.lit(0))
            .cast("bigint")
            .alias("max_span_len"),
            F.round(
                F.col("n_masked").cast("double") / F.col("n_tokens"), 6
            ).alias("mask_rate"),
        )
    )
