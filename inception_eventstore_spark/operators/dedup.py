"""Deduplication operators for LLM-data pipelines (SURVEY §2 F extensions).

All variants are built from JVM-side column expressions (xxhash64,
array/higher-order functions) — no Python UDFs — so whole-stage codegen
applies and the operators scale to 100 TB:

- exact:        hash-groupBy on (normalized) content
- MinHash+LSH:  shingle → minhash signature → band → bucket join → verify
- SimHash:      64-bit sign-aggregated token hashes + hamming candidates
- n-gram Jaccard: inverted-index set-similarity join with exact verify

Shuffle profile: each near-dup variant shuffles once on the bucket key
(bands / simhash prefix / ngram token) and once to dedupe candidate
pairs; candidate verification is a self-join restricted to bucket
partners, never a full cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lower-case + collapse whitespace — the canonical content key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(normalize_text(c), " "), lambda t: t != F.lit(""))


# ----------------------------------------------------------------------
# Exact dedup
# ----------------------------------------------------------------------
def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of identical content: (text, dup_count) where count > 1."""
    return (
        docs.groupBy(text_col)
        .agg(F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the smallest id per exact-content group. One shuffle on the
    64-bit content hash (not the full text) — at 100 TB the shuffle key
    is 8 bytes/row."""
    key = F.xxhash64(normalize_text(text_col)).alias("_ck")
    return (
        docs.withColumn("_ck", key)
        .withColumn(
            "_keep",
            F.row_number().over(Window.partitionBy("_ck").orderBy(id_col)),
        )
        .where(F.col("_keep") == 1)
        .drop("_ck", "_keep")
    )


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of the normalized text (at least one shingle —
    short docs fall back to the whole token list)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """Array of ``num_hashes`` min-hash values. Hash family =
    xxhash64(seed_i, shingle) — deterministic, JVM-side."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(shingles, lambda sh: F.xxhash64(s, sh))
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    rows/band = num_hashes // bands; a pair collides in ≥1 band with
    probability 1-(1-j^r)^b — the standard S-curve. Verification uses
    array_intersect on the (deduplicated) shingle sets of bucket
    partners only.
    """
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, shingle_k)).alias("_sh"),
    ).withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))

    banded = base.select(
        "_id",
        "_sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b, F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("_band", "_bh"),
    )

    left = banded.select("_band", "_bh", F.col("_id").alias("id_a"),
                         F.col("_sh").alias("sh_a"))
    right = banded.select("_band", "_bh", F.col("_id").alias("id_b"),
                          F.col("_sh").alias("sh_b"))
    cand = (
        left.join(right, ["_band", "_bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    ).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document → (_id, _sh).

    Per token t: h = xxhash64(t); bit b contributes +1 if set else -1;
    the fingerprint sets bit b iff the summed contribution > 0.

    Shape chosen for scale: explode tokens (narrow), hash once per
    token, then ONE vectorized hash aggregation with 64 sum columns —
    partial aggregation combines map-side, so the shuffle carries 64
    ints per document, not the token stream. (A per-row array fold was
    ~20× slower: 64 expression branches per token defeat codegen.)
    """
    ex = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t")
    ).select("_id", F.xxhash64("_t").alias("_h"))
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"_c{b}")
        for b in range(64)
    ]
    counts = ex.groupBy("_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(64):
        bit_val = (1 << b) if b < 63 else -(1 << 63)  # sign bit in two's complement
        fp = fp + F.when(
            F.col(f"_c{b}") > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return counts.select("_id", fp.alias("_sh"))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Uses the standard block-permutation trick: split the 64-bit
    fingerprint into ``n_blocks`` 16-bit blocks; any pair within hamming
    ≤ n_blocks-1 shares at least one exact block → bucket-join on
    (block_idx, block_value), verify with bit_count(xor). Returns
    (id_a, id_b, hamming).
    """
    base = simhash_signatures(docs, id_col, text_col)
    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1
    blocks = base.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sh"), b * block_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("_blk", "_bv"),
    )
    left = blocks.select("_blk", "_bv", F.col("_id").alias("id_a"),
                         F.col("_sh").alias("sh_a"))
    right = blocks.select("_blk", "_bv", F.col("_id").alias("id_b"),
                          F.col("_sh").alias("sh_b"))
    return (
        left.join(right, ["_blk", "_bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ----------------------------------------------------------------------
# n-gram Jaccard set-similarity join
# ----------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity join on word n-gram sets via an
    inverted-index (token → docs) join: |A∩B| = count of shared n-grams,
    jaccard = inter / (|A| + |B| - inter). Returns (id_a, id_b, jaccard).

    At scale the explode keys are 8-byte n-gram hashes; a prefix filter
    (keep only the rarest ceil((1-t)|A|)+1 n-grams per doc) is the
    documented next optimization if the inverted index skews.
    """
    sets = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, n)).alias("_ng"),
    ).withColumn("_sz", F.size("_ng"))
    inv = sets.select(
        "_id", "_sz", F.explode(F.transform("_ng", lambda g: F.xxhash64(g))).alias("_g")
    )
    left = inv.select(F.col("_g"), F.col("_id").alias("id_a"),
                      F.col("_sz").alias("sz_a"))
    right = inv.select(F.col("_g"), F.col("_id").alias("id_b"),
                       F.col("_sz").alias("sz_b"))
    return (
        left.join(right, "_g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("_inter"))
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
