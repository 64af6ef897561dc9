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


def vocab_growth_buckets(
    docs: DataFrame,
    lo: int,
    width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The distributed half of :func:`vocab_growth`: per-bucket (docs,
    tokens, new_types) with first-occurrence attribution. Split out so
    the plan gate can inspect the aggregation DAG (the public function
    collects these ≤ n_buckets rows for the driver-side cumsum)."""
    from inception_eventstore_spark.operators.dedup import tokens

    bucket_of = lambda c: ((c - F.lit(lo)) / F.lit(width)).cast(  # noqa: E731
        "bigint"
    )
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("_id").alias("_first"))
    new_types = first.groupBy(bucket_of(F.col("_first")).alias("bucket")).agg(
        F.count("*").cast("bigint").alias("new_types")
    )
    volumes = docs.groupBy(bucket_of(F.col(id_col)).alias("bucket")).agg(
        F.count("*").cast("bigint").alias("docs"),
        F.sum(F.size(tokens(text_col))).cast("bigint").alias("tokens"),
    )
    return volumes.join(new_types, "bucket", "left").fillna(
        {"new_types": 0}
    )


def vocab_growth(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: how many NEW token types each
    successive corpus slice contributes — the diagnostic for "is more
    data still buying new vocabulary?" (sub-linear growth is healthy;
    a late slice spiking new types signals a domain shift or encoding
    corruption in that shard).

    Each distinct token enters the vocabulary at its FIRST document
    (min doc id), so the curve needs no running window over the corpus:
    one explode → min-aggregate per token (partial-aggregated, |vocab|
    rows), bucket the first-doc ids into ``n_buckets`` fixed id-range
    slices, and take the cumulative sum over the ≤ n_buckets rows —
    driver-scale arithmetic, skew-free at any corpus size. Token
    totals per bucket ride the same scan. Output per bucket:
    (bucket, docs, tokens, new_types, cum_tokens, cum_types,
    ttr_u = cum_types·2^20 div cum_tokens — integer type-token ratio).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    ids = docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if ids["lo"] is None:
        raise ValueError("empty corpus")
    lo, hi = int(ids["lo"]), int(ids["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)

    per = vocab_growth_buckets(
        docs, lo, width, id_col=id_col, text_col=text_col
    )
    rows = sorted(per.collect(), key=lambda r: r["bucket"])
    cum_t = cum_v = 0
    out = []
    for r in rows:
        cum_t += int(r["tokens"])
        cum_v += int(r["new_types"])
        out.append(
            (
                int(r["bucket"]),
                int(r["docs"]),
                int(r["tokens"]),
                int(r["new_types"]),
                cum_t,
                cum_v,
                (cum_v * (1 << 20)) // max(cum_t, 1),
            )
        )
    spark = docs.sparkSession
    return spark.createDataFrame(
        out,
        "bucket long, docs long, tokens long, new_types long, "
        "cum_tokens long, cum_types long, ttr_u long",
    )


def zipf_fit(
    docs: DataFrame,
    top: int = 500,
    text_col: str = "text",
) -> DataFrame:
    """(n_points, total_tf, slope, intercept, r2) — the OLS fit of
    ln(term frequency) on ln(frequency rank) over the ``top`` most
    frequent tokens: Zipf's law says slope ≈ −1 for natural language,
    and the deviation is a cheap corpus-health signal (templated /
    machine-generated text flattens the head, |slope| << 1; a
    truncated or deduplicated-to-death corpus steepens it). The
    power-law companion to the Heaps-law `vocab_growth` curve.

    One explode + one partial-aggregated vocab count (one row per
    distinct token shuffles, never per occurrence), ranks via the
    two-phase shard rank over the FULL vocab (billion-token
    vocabularies never sit in one task), then a 5-sum scalar fold
    over the ``top`` head rows. Float sums are over ≤ ``top`` values
    spanning a few orders of magnitude; 6-dp rounding sits ~10⁶ ulps
    above any cross-engine accumulation-order jitter."""
    from inception_eventstore_spark.functions.ranking import (
        grouped_row_number,
    )
    from inception_eventstore_spark.operators.dedup import tokens

    tf = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
    )
    ranked = grouped_row_number(
        tf,
        order_cols=[F.col("tf").desc(), F.col("token")],
        rank_col="_r",
    ).where(F.col("_r") <= int(top))
    pts = ranked.select(
        F.log(F.col("_r").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
        F.col("tf"),
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_points").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return s.select(
        "n_points",
        "total_tf",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
        F.round(
            F.when(vary > 0, cov * cov / (varx * vary)), 6
        ).alias("r2"),
    )


def vocab_oov_rates(
    docs: DataFrame,
    vocab_size: int = 16,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_tokens, oov_tokens, oov_types, oov_ppm) — per-language
    out-of-vocabulary rate against the corpus's own top-``vocab_size``
    token vocabulary: the coverage check run before pinning a
    tokenizer vocab, because OOV mass is NEVER uniform across
    languages (a vocab trained on an English-heavy mix can cover 99%
    of English occurrences and 60% of Chinese) and the languages that
    overflow into <unk>/byte-fallback pay the fertility cost.

    The vocab is a TakeOrdered head (ties break lexically, so the
    boundary is deterministic cross-engine) broadcast to the exploded
    token stream — the corpus shuffles only for the per-language
    aggregate (one partial-aggregated groupBy). ``oov_ppm`` is BIGINT
    div — bit-exact on any engine."""
    from inception_eventstore_spark.operators.dedup import tokens

    ex = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokens(text_col)).alias("token"),
    )
    vocab = (
        ex.groupBy("token")
        .agg(F.count("*").alias("_tf"))
        .orderBy(F.col("_tf").desc(), F.col("token"))
        .limit(int(vocab_size))
        .select("token")
    )
    flagged = ex.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "token", "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_tokens"),
            F.countDistinct(
                F.when(F.col("_in").isNull(), F.col("token"))
            )
            .cast("bigint")
            .alias("oov_types"),
        )
        .select(
            "lang",
            "n_tokens",
            "oov_tokens",
            "oov_types",
            F.expr(
                "CAST((oov_tokens * 1000000) div n_tokens AS BIGINT)"
            ).alias("oov_ppm"),
        )
    )
