"""Text-analysis operators for LLM-data pipelines (SURVEY §2 F extensions).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — all JVM-side column expressions so they
run inside whole-stage codegen over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.dedup import normalize_text, tokens

#: Tiny per-language stopword lists — enough signal for a heuristic
#: n-gram/stopword language id without external models.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "他", "这", "不"),
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: count word pieces + punctuation via regex — the
    standard ~chars/4 heuristic refined by splitting on non-alphanumerics."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.filter(
        F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != F.lit("")
    )
    # long words count as ceil(len/4) subword units
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4)).cast("int"),
    )


def stopword_hits(col: Column | str, lang: str) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(col: Column | str) -> Column:
    """Best-guess language = argmax over stopword hit counts; 'und' when
    nothing matches. For zh (no whitespace tokens) falls back to CJK
    character presence.

    Scored as an argmax over per-language filter counts (an all-langs
    single fold with an array accumulator benchmarked ~3× slower — the
    per-token array allocation defeats codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    langs = [l for l in STOPWORDS if l != "zh"]
    pairs = F.array(
        *[
            F.struct(
                stopword_hits(c, l).alias("hits"), F.lit(l).alias("lang")
            )
            for l in langs
        ]
    )
    best = F.array_max(pairs)
    # rlike stops at the first CJK hit; the regexp_replace formulation
    # rebuilt the whole string just to test presence (~2× lang_id cost)
    cjk = c.rlike("[一-鿿]")
    return (
        F.when(cjk, F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio / repetition features plus a
    composite ``quality_score`` in [0, 1]."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", ""))
    n_stop = sum(
        (stopword_hits(text_col, l) for l in STOPWORDS), F.lit(0)
    )
    n_uniq = F.size(F.array_distinct(toks))
    out = (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_m", n_chars)
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "uniq_token_ratio",
            F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_word_len",
            F.when(
                n_tok > 0,
                # Σ token lengths = length of the empty-joined array —
                # same exact integer, codegen'd instead of an
                # interpreted F.aggregate fold (CLAUDE.md 30× rule, r12)
                F.length(F.array_join(toks, "")) / n_tok,
            ).otherwise(F.lit(0.0)),
        )
    )
    # Composite: reward lengths in a sane band, some stopwords, low
    # punctuation, lexical diversity.
    len_score = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    score = (
        len_score * F.lit(0.3)
        + F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * F.lit(0.2)
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * F.lit(0.2)
        + F.col("uniq_token_ratio") * F.lit(0.3)
    )
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint64(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    normalized content (rolling-hash analog; stable across runs)."""
    return F.xxhash64(normalize_text(col))


def content_digest(col: Column | str) -> Column:
    """Portable 128-bit content fingerprint: lowercase md5 hex of the
    UTF-8 normalized content. Any SQL engine computes the same value, so
    the declared query is oracle-paired; ``fingerprint64`` (xxhash64)
    remains the cheap 8-byte key for hot-path joins."""
    return F.md5(F.encode(normalize_text(col), "UTF-8"))


def vocabulary(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus vocabulary: (token, tf, df) by descending term
    frequency (ties broken by token), where ``tf`` is total occurrences
    and ``df`` the number of distinct documents containing the token.

    One explode + one partial-agg groupBy; the top-k is a TakeOrdered
    (per-partition heap + driver merge), never a full sort — at 100 TB
    the shuffle carries one row per distinct token, not per
    occurrence."""
    from inception_eventstore_spark.operators.dedup import tokens

    ex = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token")
    )
    return (
        ex.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(k)
    )


def text_stats_by_lang(docs: DataFrame) -> DataFrame:
    """The declared text-analysis rollup: docs + chars per language."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("lang")
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the CHARACTER
    distribution plus control/replacement-character fractions — the
    standard mojibake / binary-garbage / low-diversity quality signal
    (encoding corruption collapses entropy toward the replacement char;
    base64 blobs and key-mash spam push it toward ln(alphabet)).

    H = ln(n) − (Σ_c k_c·ln k_c)/n from one character explode and two
    partial-aggregated groupBys (per (doc, char) counts are the only
    wide exchange; distinct chars per doc is bounded by the alphabet,
    so the second agg is tiny). The control/replacement fractions are
    pure length arithmetic on the raw string — no explode. Returns
    (id, n_chars, char_entropy, ctrl_frac, repl_frac); empty docs are
    dropped (entropy of nothing is undefined).
    """
    d = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).where(F.length("_t") > 0)
    counts = (
        d.select("_id", F.explode(F.split("_t", "")).alias("_c"))
        .groupBy("_id", "_c")
        .agg(F.count("*").alias("_k"))
    )
    ent = counts.groupBy("_id").agg(
        F.sum("_k").cast("bigint").alias("n_chars"),
        F.round(
            F.log(F.sum("_k").cast("double"))
            - F.sum(F.col("_k") * F.log("_k")) / F.sum("_k"),
            6,
        ).alias("char_entropy"),
    )
    # control chars except \t\n\r; U+FFFD replacement char
    ctrl = F.length("_t") - F.length(
        F.regexp_replace("_t", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    )
    repl = F.length("_t") - F.length(
        F.regexp_replace("_t", "�", "")
    )
    fracs = d.select(
        "_id",
        F.round(ctrl / F.length("_t"), 6).alias("ctrl_frac"),
        F.round(repl / F.length("_t"), 6).alias("repl_frac"),
    )
    return ent.join(fracs, "_id").select(
        F.col("_id").alias(id_col),
        "n_chars",
        "char_entropy",
        "ctrl_frac",
        "repl_frac",
    )


def nfc(col: Column | str) -> Column:
    """Unicode NFC (canonical composition) of a string column, as an
    Arrow-batched pandas UDF — Spark has no JVM NFC builtin, so this is
    the one justified python seam in the text family (same policy as
    the multimodal codec kernels); the DuckDB oracle twin is
    ``nfc_normalize``, making the seam cross-engine-checked rather
    than merely test-pinned."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda v: None if v is None else unicodedata.normalize("NFC", v)
        )

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


def unicode_clean(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, text_clean) — the standard ingest-side text canonicalizer:

    1. strip control characters (except \\t \\n \\r) and U+FFFD
       replacement chars — the mojibake/binary-garbage residue
       `char_entropy` scores,
    2. Unicode NFC composition (é as ONE codepoint, Å for the
       angstrom sign, …) so downstream hashing/dedup never splits on
       representation,
    3. collapse whitespace runs to single spaces and trim.

    Steps 1 and 3 are JVM regexp_replace (codegen); step 2 is the
    `nfc` Arrow seam. Exactly this pipeline — same operation ORDER —
    is declared as the oracle SQL, so the whole composition is
    hash-verified against DuckDB, not just the pieces. Case is
    preserved (unlike `dedup.normalize_text`, the lossy dedup KEY —
    this produces the text you keep)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    c = F.regexp_replace(c, "�", "")
    c = nfc(c)
    c = F.trim(F.regexp_replace(c, "[ \\t\\n\\x0b\\f\\r]+", " "))
    return docs.select(F.col(id_col), c.alias("text_clean"))


def string_indexer(
    docs: DataFrame,
    col: str = "text",
    tokenize: bool = True,
) -> DataFrame:
    """(token|value, freq, idx) — dense contiguous ids 0..V−1 assigned
    frequency-first (ties lexical): the embedding-table index map every
    training pipeline builds (id 0 = most frequent, so frequency-
    bucketed embedding shards stay hot-first). ``tokenize=True``
    indexes the distinct TOKENS of a text column; False indexes the
    column's distinct raw values.

    The ranking runs over the DISTINCT-value table — |V| rows, orders
    of magnitude smaller than the corpus — via the two-phase shard
    rank (`functions/ranking.grouped_row_number`), never a
    ``partitionBy(lit(1))`` window: a single-partition window caps the
    vocabulary at one task's memory, and web-scale corpora carry
    billion-value vocabularies (URLs, user ids). The id assignment is
    fully deterministic, so re-runs (and other engines) reproduce the
    identical map."""
    from inception_eventstore_spark.functions.ranking import (
        grouped_row_number,
    )

    if tokenize:
        vals = docs.select(F.explode(tokens(col)).alias("value"))
    else:
        vals = docs.select(F.col(col).alias("value")).where(
            F.col("value").isNotNull()
        )
    freq = vals.groupBy("value").agg(F.count("*").alias("freq"))
    ranked = grouped_row_number(
        freq,
        order_cols=[F.col("freq").desc(), F.col("value")],
        rank_col="_rn",
    )
    return ranked.select(
        "value",
        "freq",
        (F.col("_rn") - 1).cast("bigint").alias("idx"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, fp): winnowing document fingerprints — the MOSS
    local-fingerprinting algorithm (Schleimer, Wilkerson, Aiken 2003):
    hash every character k-gram of the normalized text, slide a window
    of ``w`` consecutive hashes, and select each window's MINIMUM hash
    (rightmost on ties). Guarantees: any shared substring of length
    >= k + w - 1 yields at least one shared fingerprint, and selection
    density is ~2/(w+1) — position-local, unlike MinHash's global
    sketch, so matches LOCALIZE (which passage was copied), the
    property plagiarism/provenance detection needs.

    All JVM expressions: normalization + k-gram hashing in one
    projection, selection as ONE running window per document —
    rightmost-min-of-window computed order-free by packing
    (hash, position) into a single BIGINT key, hash * 2^23 + (2^23-1-pos)
    (40-bit md5 prefix * 2^23 tops out at exactly 2^63-1; min of the
    packed key IS the lexicographic (min hash, max pos)). The position
    field caps a document at 2^23-1 (~8.4M) k-grams — ~8 MB of
    normalized text; beyond that the offset term would borrow from the
    hash bits and silently corrupt both fields, so the operator RAISES
    on oversized documents (filter them upstream — a single 8 MB+
    blob is extraction junk in any curation pipeline, and its per-doc
    running window would be a straggler task anyway). Docs shorter
    than one full window keep the minimum of what they have — the
    standard degenerate case. Positions are 1-based gram starts in the
    normalized text; output is the DISTINCT selected set.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    from pyspark.sql import Window as _W

    m = 1 << 23
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    staged = docs.select(F.col(id_col), norm.alias("_norm")).where(
        F.length("_norm") >= k
    )
    n_grams = F.length("_norm") - k + 1
    staged = staged.withColumn(
        "_norm",
        F.when(n_grams <= m - 1, F.col("_norm")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "winnow_fingerprints: document has more than "
                        f"{m - 1} k-grams (position field is 23 bits); "
                        "filter oversized documents first: "
                    ),
                    F.col(id_col).cast("string"),
                )
            )
        ),
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_norm") - k + 1),
        lambda i: F.col("_norm").substr(i, F.lit(k)),
    )
    g = staged.select(
        id_col, F.posexplode(grams).alias("_p0", "_g")
    ).select(
        id_col,
        (F.col("_p0") + 1).alias("_pos"),
        F.conv(
            F.substring(F.md5(F.encode(F.col("_g"), "UTF-8")), 1, 10),
            16, 10,
        ).cast("bigint").alias("_h"),
    )
    packed = (F.col("_h") * m + (F.lit(m - 1) - F.col("_pos")))
    win = (
        _W.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(-(w - 1), _W.currentRow)
    )
    sel = (
        g.withColumn("_k", packed)
        .withColumn("_sel", F.min("_k").over(win))
        .withColumn("_n", F.count("*").over(_W.partitionBy(id_col)))
        # only FULL windows select (pos >= w); a doc with fewer than w
        # grams has one clipped window at its last gram = global min
        .where(
            (F.col("_pos") >= w)
            | ((F.col("_n") < w) & (F.col("_pos") == F.col("_n")))
        )
        .select(
            id_col,
            (F.lit(m - 1) - F.pmod("_sel", F.lit(m))).alias("pos"),
            F.expr(f"_sel div {m}").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_matches(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None | str = "auto",
) -> DataFrame:
    """(id_a, id_b, n_shared): ordered document pairs sharing >=
    ``min_shared`` winnowing fingerprints — the MOSS match report.
    Inverted-index join on the fingerprint value (never an all-pairs
    document join): pairs form only where a fingerprint collides, so
    cost tracks actual overlap.

    ``max_df`` drops fingerprints appearing in more than that many
    documents BEFORE the pair join — MOSS's own common-code rule
    (boilerplate shared by everyone signals nothing and contributes
    cnt² pairs each); with it the join fan-out is bounded by
    Σ min(df, max_df)² instead of Σ df², the difference between a
    corpus-quadratic and an overlap-linear report on boilerplate-heavy
    corpora. The DEFAULT is ``"auto"`` = max(10, 0.1% of the corpus)
    — the frequency dial must be ON unless the caller explicitly opts
    out with ``None``, because an uncapped run degenerates quadratic
    on exactly the boilerplate-heavy corpora the report targets (the
    auto cap costs one count job over the id column)."""
    if max_df == "auto":
        n_docs = docs.select(id_col).count()
        max_df = max(10, n_docs // 1000)
    # the fingerprint relation feeds THREE consumers (the df filter and
    # both sides of the inverted-index self-join) — persist it or the
    # whole per-char-position hash + per-doc window pipeline executes
    # three times (guide §5; measured 4.6 → 1.8 s isolated at sf0.1).
    # persist → eager-checkpoint the bounded result → unpersist (the
    # containment_pairs discipline, VERDICT r11 #1): a bare persist
    # pins the CacheManager entry until the session clears it, leaking
    # storage in long-lived sessions and letting identical warm-bench
    # rebuilds read the previous pass's cache. The match report is
    # bounded by Σ min(df, max_df)² — pair-sized, cheap to checkpoint.
    fp = winnow_fingerprints(docs, k, w, id_col, text_col).select(
        F.col(id_col).alias("_id"), "fp"
    ).distinct().persist()
    fp.count()
    if max_df is not None:
        keep = (
            fp.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= int(max_df))
            .select("fp")
        )
        fp = fp.join(keep, "fp", "left_semi")
    a = fp.select(F.col("_id").alias("id_a"), "fp")
    b = fp.select(F.col("_id").alias("id_b"), "fp")
    out = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    ).localCheckpoint(eager=True)
    fp.unpersist()
    return out


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    max_phrase_len: int = 4,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-level RAKE keyword extraction (Rose 2010, "Automatic
    keyword extraction from individual documents"): candidate phrases
    are maximal stopword-free token runs (delimiters = the language's
    stopword list), each word scores degree/freq where freq = its
    occurrences inside candidates and degree = Σ lengths of the
    candidates containing it, and a phrase scores the sum of its
    words' scores. Phrases longer than ``max_phrase_len`` are dropped
    (the standard RAKE noise guard — and the fan-out bound).

    Exactness: word scores are small-denominator rationals — exactly
    the 6-dp half-boundary class — so each is TRUNCATED to integer
    micro-units (div(degree·2^20, freq), identical in any engine) and
    the phrase score is their exact BIGINT sum; ranking ties break on
    the phrase text.

    Scale shape: one posexplode projection, a per-document running
    delimiter count (window bounded by document length, never a
    corpus-sized partition), two partial-aggregated rollups (per
    phrase instance, per word), a broadcast word-score join back, and
    a TakeOrdered top-k — the corpus shuffles only as (doc, phrase)
    and word keys, never as pairs.
    """
    if lang not in STOPWORDS:
        raise ValueError(f"no stopword list for lang {lang!r}")
    if max_phrase_len < 1:
        raise ValueError("max_phrase_len must be >= 1")
    from pyspark.sql import Window

    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokens(text_col)).alias("_pos", "_tok"),
    ).withColumn("_delim", F.array_contains(sw, F.col("_tok")))
    wd = (
        Window.partitionBy("_doc")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    words = (
        toks.withColumn(
            "_pid", F.sum(F.col("_delim").cast("int")).over(wd)
        )
        .where(~F.col("_delim"))
        .select("_doc", "_pid", "_pos", "_tok")
        .localCheckpoint(eager=False)  # feeds three rollups
    )
    plen = words.groupBy("_doc", "_pid").agg(
        F.count("*").cast("bigint").alias("_plen"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_tok"))
                ),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("phrase"),
    ).where(F.col("_plen") <= max_phrase_len)
    kept_words = words.join(
        plen.select("_doc", "_pid", "_plen"), ["_doc", "_pid"]
    )
    wstats = kept_words.groupBy("_tok").agg(
        F.count("*").cast("bigint").alias("_freq"),
        F.sum("_plen").cast("bigint").alias("_deg"),
    )
    wscore = wstats.select(
        "_tok",
        F.expr("div(_deg * 1048576, _freq)").alias("_ws"),
    )
    inst = (
        kept_words.join(F.broadcast(wscore), "_tok")
        .groupBy("_doc", "_pid")
        .agg(F.sum("_ws").cast("bigint").alias("_score"))
        .join(plen, ["_doc", "_pid"])
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.min("_plen").cast("bigint").alias("n_words"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.min("_score").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "phrase")
        .limit(int(top_k))
    )


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Flesch reading ease (Flesch 1948) from the classic
    whitespace/punctuation/vowel-group heuristics — the readability
    axis of corpus quality scoring (too-low = legalese/boilerplate,
    implausibly-high = fragment noise; filters pair it with
    quality_features' length/stopword signals).

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    Heuristics, identical in both engines: sentences = count of
    ``[.!?]+`` runs (min 1); syllables = count of ``[aeiouy]+`` vowel
    groups over the lowercased text — vowel groups never span a
    space, so the global count equals the per-word sum — plus 1 for
    each vowel-less word (the "every word has a syllable" floor).
    Output (id, n_words, n_sentences, n_syllables, flesch_milli) with
    flesch_milli = floor(flesch·1000): the ratios are single exact-
    integer divisions and one fixed-order linear combination, so the
    double is bit-identical cross-engine and the floor is safe (the
    pq.py quantization convention). Docs with no words report NULL.

    Scale: one map-only pass — two regexp counts and one staged-array
    filter per row, no shuffle, no UDF."""
    toks = tokens(text_col)
    staged = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        toks.alias("_toks"),
    )
    w = F.size("_toks").cast("bigint")
    s = F.greatest(
        F.regexp_count(F.col("_txt"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    syl = (
        F.regexp_count(F.lower(F.col("_txt")), F.lit("[aeiouy]+"))
        + F.size(
            F.filter(
                F.col("_toks"), lambda t: ~t.rlike("[aeiouy]")
            )
        )
    ).cast("bigint")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w.cast("double") / s.cast("double"))
        - F.lit(84.6) * (syl.cast("double") / w.cast("double"))
    )
    return staged.select(
        F.col(id_col),
        w.alias("n_words"),
        s.alias("n_sentences"),
        syl.alias("n_syllables"),
        F.when(w > 0, F.floor(flesch * F.lit(1000.0)).cast("bigint"))
        .alias("flesch_milli"),
    )
