"""Count-based n-gram language-model scoring (KenLM-style, in-engine).

Data-curation pipelines score documents by likelihood under a cheap
reference LM (CCNet buckets corpora by LM perplexity; Gopher and many
quality filters use the same signal). This module fits the simplest
useful such model — an add-one-smoothed bigram model — entirely as
DataFrame algebra, so it runs wherever the corpus lives with no model
artifact to ship:

    P(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + 1) / (c1(w_{i-1}) + V)

with ``c2`` the reference bigram count, ``c1(a) = Σ_b c2(a, b)`` and
``V`` the reference unigram vocabulary size. A document's score is the
mean natural log-probability over its bigrams (higher = more fluent
under the reference); documents with < 2 tokens have no bigrams and are
dropped.

Scale shape: both the corpus and reference sides reduce to
(token_a, token_b) pairs via one explode each; the count table is built
with a partial-agg groupBy, and scoring is an equi-join on the bigram
key followed by one per-doc aggregation. Every step is JVM-side and
map-side-combinable; the only shuffles are the count groupBys and the
score join — there is no UDF and no driver-side model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.dedup import tokens


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, a, b) — consecutive token pairs. The token array is staged
    as a column before the slice/zip (CLAUDE.md invariant: lambdas
    re-evaluate unstaged array expressions per element)."""
    staged = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_tk")
    ).where(F.size("_tk") >= 2)
    return staged.select(
        "_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("_tk"), 1, F.size("_tk") - 1),
                F.slice(F.col("_tk"), 2, F.size("_tk") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("_bg"),
    ).select("_id", F.col("_bg.a").alias("_a"), F.col("_bg.b").alias("_b"))


def bigram_counts(
    ref: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Reference model: ((a, b) → c2 table, a → c1 table, vocab size).

    The count tables are pure aggregates of the reference corpus — at
    100 TB they are materialized once per reference snapshot and reused
    by every scoring run (orders of magnitude smaller than the corpus:
    one row per distinct bigram / left token)."""
    bg = _bigrams(ref, id_col, text_col)
    c2 = bg.groupBy("_a", "_b").agg(F.count("*").alias("_c2"))
    c1 = c2.groupBy("_a").agg(F.sum("_c2").alias("_c1"))
    vocab = (
        ref.select(F.explode(tokens(text_col)).alias("_t"))
        .agg(F.countDistinct("_t"))
        .collect()[0][0]
    )
    return c2, c1, int(vocab)


def bigram_lm_score(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, lm_score): mean ln P(w_i | w_{i-1}) per document
    under the add-one bigram model counted from ``ref`` (default: the
    corpus itself — self-scoring flags outlier documents).

    Bigrams absent from the reference fall back to the smoothing floor
    1 / (c1(a) + V) — c1 joined on the left token alone, so a seen
    left token keeps its true continuation mass (1 / V only when the
    left token itself is unseen)."""
    ref = ref if ref is not None else docs
    c2, c1, vocab = bigram_counts(ref, id_col, text_col)
    bg = _bigrams(docs, id_col, text_col)
    scored = bg.join(c2, ["_a", "_b"], "left").join(c1, ["_a"], "left").select(
        "_id",
        F.log(
            (F.coalesce(F.col("_c2"), F.lit(0)).cast("double") + 1.0)
            / (F.coalesce(F.col("_c1"), F.lit(0)).cast("double") + float(vocab))
        ).alias("_lp"),
    )
    return scored.groupBy("_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("lm_score"),
    ).select(F.col("_id").alias(id_col), "n_bigrams", "lm_score")
