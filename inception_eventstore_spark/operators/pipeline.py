"""End-to-end LLM training-corpus curation (SURVEY §2 F composition).

The individual operators (dedup, language id, quality scoring, token
budgeting) compose into the standard curation flow a training-data
pipeline runs over raw documents:

    raw docs ──► exact dedup (normalized content, keep smallest id)
             ──► annotate (lang_pred, quality features, token counts)
             ──► filter (quality threshold, language allow-list)
             ──► per-language budget rollup

Everything is JVM column expressions; the only shuffles are the dedup
window (8-byte content-hash key) and the final rollup — the annotation
pass is map-side and pipelined into the same stage as the filter. At
100 TB this is one shuffle more than a plain scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.dedup import dedup_exact
from inception_eventstore_spark.operators.text import lang_id, quality_features


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.35,
    langs: list[str] | None = None,
    drop_unknown_lang: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated documents: deduped (normalized content, smallest id kept),
    annotated with ``lang_pred`` / quality features / ``n_tokens``, and
    filtered to ``quality_score >= min_quality`` (plus an optional
    language allow-list; 'und' dropped by default)."""
    base = dedup_exact(docs, id_col=id_col, text_col=text_col)
    annotated = quality_features(base, text_col=text_col).withColumn(
        "lang_pred", lang_id(text_col)
    )
    kept = annotated.where(F.col("quality_score") >= F.lit(min_quality))
    if drop_unknown_lang:
        kept = kept.where(F.col("lang_pred") != "und")
    if langs is not None:
        kept = kept.where(F.col("lang_pred").isin(list(langs)))
    return kept


def curation_summary(kept: DataFrame) -> DataFrame:
    """Per-language training-budget rollup of a curated corpus:
    (lang_pred, kept_docs, total_tokens, avg_quality)."""
    return (
        kept.groupBy("lang_pred")
        .agg(
            F.count("*").cast("long").alias("kept_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )
