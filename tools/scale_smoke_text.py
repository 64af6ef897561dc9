"""Text/dedup scale smoke: the dedup + curation family at ~100k docs.

The sf fixtures hold 5k documents — small enough that bench timings are
dominated by per-stage fixed costs. This smoke synthesizes a 20× corpus
(each sf0.1 doc replicated with a distinct integer prefix so content is
unique, plus planted near-duplicate pairs) and times the three near-dup
operators, exact dedup, and the curation pipeline end-to-end. The point
is the SCALING SHAPE: a bucketed candidate join should grow
near-linearly in docs, not quadratically.

Usage: python tools/scale_smoke_text.py [sf_dir] [replication]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from inception_eventstore_spark.operators import dedup as D
    from inception_eventstore_spark.operators.pipeline import (
        curate_corpus,
        curation_summary,
    )
    from inception_eventstore_spark.session import get_spark
    from inception_eventstore_spark.sources.tables import load_table

    # local mode: driver JVM == executor; 100k-doc agg state needs heap
    spark = get_spark(
        "scale-smoke-text",
        extra_configs={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    # replicate with a per-copy prefix: contents stay unique across
    # copies (no cross-copy exact dups), sizes scale linearly
    copies = spark.range(reps).select(F.col("id").alias("_copy"))
    # every 7th token is rewritten per copy (different positions AND
    # replacements per copy), pushing cross-copy 3-gram jaccard to
    # ~0.2 — realistic near-dup density instead of every copy being a
    # 0.97-jaccard twin of its siblings (which correctly yields ~1M
    # true pairs and benchmarks verification volume, not candidate
    # generation). Copy 0 stays verbatim so the planted twins match it.
    toks = F.split(F.col("text"), " ")
    mutated = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i % 7 == F.pmod(F.col("_copy"), F.lit(7)),
                F.concat(t, F.lit("x"), F.col("_copy").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    corpus = (
        base.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * F.lit(1_000_000)).alias("doc_id"),
            F.concat(
                F.lit("copy"), F.col("_copy").cast("string"), F.lit(" "),
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(mutated),
            ).alias("text"),
        )
    )
    # plant near-dups: every 100th doc of copy 0 gets an upper-cased,
    # padded twin (exact dup after normalization) — recovered by exact
    # dedup AND by every near-dup operator at jaccard 1.0
    planted = (
        base.where(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.concat(F.lit("copy0 "), F.upper("text"), F.lit("  ")).alias("text"),
        )
    )
    corpus = corpus.unionByName(planted)
    corpus = corpus.repartition(32).persist()
    n_docs = corpus.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, df):
        """Times count() for lazy DataFrames; pass a thunk for operators
        that do eager work at construction (connected_components
        checkpoints per round) so that work lands inside the timer."""
        t0 = time.time()
        if callable(df):
            df = df()
        counts[name] = df.count()
        timings[name] = round(time.time() - t0, 2)

    run("dedup_exact_groups", D.exact_duplicate_groups(
        corpus.select(D.normalize_text("text").alias("text"))))
    mh_pairs = D.minhash_lsh_pairs(corpus, threshold=0.8).persist()
    run("dedup_minhash_lsh", mh_pairs)
    run("dedup_simhash", D.simhash_near_duplicates(corpus, max_hamming=3))
    run("dedup_ngram_jaccard", D.ngram_jaccard_pairs(corpus, n=3, threshold=0.8))
    run("corpus_curation", curation_summary(
        curate_corpus(corpus, min_quality=0.65)))

    # round-2 additions: gopher metrics / corpus line dedup / PII /
    # bloom membership — all must stay near-linear in docs
    from inception_eventstore_spark.operators.bloom import (
        bloom_membership_dedup,
    )
    from inception_eventstore_spark.operators.curation import (
        gopher_quality_flags,
        remove_duplicate_lines,
        top_ngram_fraction,
    )
    from inception_eventstore_spark.operators.pii import redact_documents

    run("curation_gopher_flags", gopher_quality_flags(corpus))
    run("curation_top_bigram", top_ngram_fraction(corpus))
    run("dedup_corpus_lines", remove_duplicate_lines(corpus))
    run("pii_redaction", redact_documents(corpus))
    # membership probe: odd-id half of the corpus against the even half
    run("dedup_bloom_membership", lambda: bloom_membership_dedup(
        corpus.where(F.col("doc_id") % 2 == 1),
        corpus.where(F.col("doc_id") % 2 == 0),
    ))

    # round-2 additions: decontamination / DSIR / packing — broadcast
    # and two-phase-cumsum shapes must also stay near-linear
    from inception_eventstore_spark.operators.decontaminate import (
        contaminated_ids,
    )
    from inception_eventstore_spark.operators.importance import (
        importance_scores,
        token_logratios,
    )
    from inception_eventstore_spark.operators.packing import pack_chunked
    from inception_eventstore_spark.operators.text import token_count

    bench_docs = corpus.where(F.col("doc_id") % 997 == 0)
    run("decontaminate_flags", lambda: contaminated_ids(
        corpus, bench_docs, n=5))
    run("dsir_scores", lambda: importance_scores(
        corpus, token_logratios(bench_docs, corpus)))
    with_tok = corpus.select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    run("pack_chunked", lambda: pack_chunked(
        with_tok, budget=2048, shard_size=1_000_000))

    # round-3 additions: chunking / vocabulary / bigram LM / mixture /
    # batch ANN — narrow explodes, TakeOrdered, count-table joins and a
    # single-scan distance matmul; all must stay near-linear in docs
    from inception_eventstore_spark.operators.chunking import chunk_text
    from inception_eventstore_spark.operators.lm import bigram_lm_score
    from inception_eventstore_spark.operators.sampling import (
        temperature_mixture,
    )
    from inception_eventstore_spark.operators.text import vocabulary

    run("chunk_text", chunk_text(corpus, chunk_chars=512, overlap_chars=64))
    run("vocab_top1000", vocabulary(corpus, k=1000))
    run("lm_bigram_score", lambda: bigram_lm_score(corpus))
    with_domain = corpus.withColumn(
        "lang", (F.col("doc_id") % 5).cast("string")
    )
    run("temperature_mixture", lambda: temperature_mixture(
        with_domain, domain_col="lang", alpha=0.5))

    from inception_eventstore_spark.operators.similarity import (
        multi_query_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < 16).collect()
    run("sim_multi_topk_16q", lambda: multi_query_topk(
        emb.where(F.col("vec_id") >= 16),
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows],
        k=10,
    ))

    # cluster closure over the real near-dup pair graph + quality-aware
    # survivor pick (round-3: only the clustered subset is windowed)
    from inception_eventstore_spark.operators.components import (
        connected_components,
        dedup_survivors,
    )

    run("cc_over_minhash_pairs", lambda: connected_components(mh_pairs))
    run("dedup_survivors", lambda: dedup_survivors(
        corpus.withColumn("quality", F.length("text").cast("long")),
        mh_pairs, quality_col="quality"))
    mh_pairs.unpersist()
    # worst-case diameter stress: a 100k-node path would take 100k
    # rounds of naive label propagation; the alternating-star algorithm
    # must close it in O(log² n) rounds
    chain = spark.range(100_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    run("cc_100k_node_chain", lambda: connected_components(chain))

    # round-3 second wave: retrieval / substring spans / fuzzy linkage /
    # KNN graph / PageRank / rolling anomalies — single-scan or
    # bounded-key-join shapes that must stay near-linear
    from inception_eventstore_spark.operators.graph import pagerank
    from inception_eventstore_spark.operators.linkage import fuzzy_join
    from inception_eventstore_spark.operators.retrieval import bm25_topk
    from inception_eventstore_spark.operators.similarity import knn_graph
    from inception_eventstore_spark.operators.timeseries import (
        zscore_anomalies,
    )

    run("retrieval_bm25", lambda: bm25_topk(
        corpus, ["merge", "spark", "window"], k=10))
    run("dedup_substring_spans", lambda: D.duplicate_substring_spans(
        corpus, min_len=40))
    names = corpus.select(
        "doc_id", F.substring("text", 1, 24).alias("name")
    )
    pos = (F.col("doc_id") % 12 + 2).cast("int")
    corrupted = names.select(
        F.col("doc_id").alias("rid"),
        F.concat(
            F.col("name").substr(F.lit(1), pos - 1),
            F.col("name").substr(pos + 1, F.length("name")),
        ).alias("name"),
    )
    run("fuzzy_join_100k_names", lambda: fuzzy_join(
        names, corrupted, "name", "name",
        left_id="doc_id", right_id="rid"))
    run("knn_graph_k5", lambda: knn_graph(emb, k=5, n_blocks=8))
    h = F.xxhash64(F.col("id").cast("string"))
    h2 = F.xxhash64((F.col("id") + 7).cast("string"))
    edges_1m = spark.range(1_000_000).select(
        F.pmod(h, F.lit(100_000)).alias("src"),
        F.pmod(h2, F.lit(100_000)).alias("dst"),
    )
    run("pagerank_1m_edges", lambda: pagerank(edges_1m, iterations=3))
    events = load_table(spark, sf_dir, "events")
    run("rolling_anomalies_events", lambda: zscore_anomalies(events))

    # r4 second wave: tokenizer application, collocations, URL
    # canonicalization and model scoring at the same 100k-doc volume
    from inception_eventstore_spark.operators.domains import (
        canonical_doc_urls,
    )
    from inception_eventstore_spark.operators.lm import (
        bpe_encode_words,
        skipgram_ppmi,
    )
    from inception_eventstore_spark.operators.scoring import (
        linear_quality_score,
    )
    from inception_eventstore_spark.operators.text import string_indexer

    run("bpe_encode_words", lambda: bpe_encode_words(
        corpus, [("t", "h"), ("th", "e"), ("e", "</w>"), ("s", "</w>")]))
    run("skipgram_ppmi", lambda: skipgram_ppmi(
        corpus, window=2, min_pair_count=5))
    run("quality_model_score", lambda: linear_quality_score(
        corpus, dim=256))
    run("canonical_doc_urls", lambda: canonical_doc_urls(corpus))
    run("string_indexer", lambda: string_indexer(corpus))

    # r5 wave: winnowing fingerprints + MOSS matches (max_df bounds the
    # pair fan-out at 100k docs), CCNet perplexity buckets, soft dedup
    # weights over the minhash pair graph, graded contamination
    from inception_eventstore_spark.operators.components import (
        soft_dedup_weights,
    )
    from inception_eventstore_spark.operators.curation import ppl_buckets
    from inception_eventstore_spark.operators.decontaminate import (
        contamination_fraction,
    )
    from inception_eventstore_spark.operators.text import (
        winnow_fingerprints,
        winnow_matches,
    )

    run("winnow_fingerprints", lambda: winnow_fingerprints(corpus))
    # max_df=30: the 20-copy replication gives every cross-copy-shared
    # fingerprint df ~21, so a tighter cap (correctly) drops them all;
    # 30 keeps them and the planted twins surface as matches
    run(
        "winnow_matches_maxdf30",
        lambda: winnow_matches(corpus, min_shared=5, max_df=30),
    )
    run("ppl_buckets", lambda: ppl_buckets(corpus.withColumn(
        "lang", (F.col("doc_id") % 5).cast("string"))))
    run(
        "soft_dedup_weights",
        lambda: soft_dedup_weights(
            corpus, D.minhash_lsh_pairs(corpus, threshold=0.8)
        ),
    )
    bench_docs = corpus.where(F.col("doc_id") % 101 == 0)
    run(
        "contamination_fraction",
        lambda: contamination_fraction(corpus, bench_docs, n=5),
    )

    corpus.unpersist()
    print(json.dumps({
        "sf_dir": sf_dir,
        "base_docs": n_base,
        "corpus_docs": n_docs,
        "planted_pairs": counts.get("dedup_exact_groups"),
        "counts": counts,
        "timings": timings,
        "total_sec": round(sum(timings.values()), 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
