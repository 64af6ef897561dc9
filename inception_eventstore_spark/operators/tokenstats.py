"""Tokenizer fertility / cost statistics per language.

The mixture-design diagnostic every multilingual pre-training pipeline
computes before fixing token budgets: a token budget allocated in
TOKENS buys different amounts of TEXT per language, because tokenizer
fertility (tokens per word, bytes per token) varies wildly across
scripts (Rust/BPE tokenizers: ~1.2 tokens/word for English vs 3+ for
agglutinative or non-Latin-script text). Feeding `sampling.
token_budget_allocation` with per-language fertility converts a token
plan into a document plan.

All JVM column expressions over one scan: whitespace words
(`text.token_count`), BPE-ish subword count (`text.
bpe_ish_token_count` — the letter-run/digit-run/punct regex family),
UTF-8 bytes (`octet_length` of the encoded text). Ratios rounded to
6 dp for the cross-engine hash (counts are exact integers; the
denominators are sums over a language, far from 6-dp half boundaries
for ratio values that are quotients of large co-prime-ish integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.text import (
    bpe_ish_token_count,
    token_count,
)


def token_fertility(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_docs, n_words, n_subwords, n_bytes, subwords_per_word,
    bytes_per_subword, subwords_per_doc): per-language tokenizer cost
    table. One partial-aggregated scan; output is |languages| rows."""
    per = docs.select(
        F.col(lang_col).alias("lang"),
        token_count(text_col).alias("_w"),
        bpe_ish_token_count(text_col).alias("_s"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("_b"),
    )
    agg = per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_w").cast("bigint").alias("n_words"),
        F.sum("_s").cast("bigint").alias("n_subwords"),
        F.sum("_b").cast("bigint").alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_subwords",
        "n_bytes",
        F.round(
            F.col("n_subwords").cast("double") / F.col("n_words"), 6
        ).alias("subwords_per_word"),
        F.round(
            F.col("n_bytes").cast("double") / F.col("n_subwords"), 6
        ).alias("bytes_per_subword"),
        F.round(
            F.col("n_subwords").cast("double") / F.col("n_docs"), 6
        ).alias("subwords_per_doc"),
    )
