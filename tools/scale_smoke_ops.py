"""Second-wave operator scale smoke: PageRank / basket rules / stupid
backoff / batch BM25 at ~10× the sf0.1 volume (VERDICT r3 next-round
#4 — confirm the shapes hold where the shuffles actually hurt).

Replication offsets the KEYS per copy (orderkey/custkey/suppkey/
partkey/doc_id), so the graphs and baskets grow in NODES and EDGES —
10× distinct customers and suppliers, ~12M directed purchase edges at
reps=10 — not in per-key multiplicity (which would shrink relative
shuffle width and flatter the smoke). Document text gets a per-copy
token prefix so vocabulary and n-gram tables also scale.

Usage: python tools/scale_smoke_ops.py [sf_dir] [replication]
Prints one JSON line with row volumes + timings.
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from inception_eventstore_spark.operators import graph as G
    from inception_eventstore_spark.operators import retrieval as RT
    from inception_eventstore_spark.operators.basket import association_rules
    from inception_eventstore_spark.operators.lm import stupid_backoff_score
    from inception_eventstore_spark.session import get_spark
    from inception_eventstore_spark.sources.tables import load_table

    spark = get_spark(
        "scale-smoke-ops",
        extra_configs={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    volumes: dict[str, int] = {}

    li0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    o0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    mx = li0.agg(
        F.max("l_orderkey").alias("ok"),
        F.max("l_partkey").alias("pk"),
        F.max("l_suppkey").alias("sk"),
    ).first()
    mxc = o0.agg(F.max("o_custkey").alias("ck")).first()
    okb, pkb, skb, ckb = (
        int(mx["ok"]) + 1,
        int(mx["pk"]) + 1,
        int(mx["sk"]) + 1,
        int(mxc["ck"]) + 1,
    )
    copies = spark.range(reps).select(F.col("id").alias("_rep"))
    li = (
        li0.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("_rep") * okb).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_rep") * pkb).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("_rep") * skb).alias("l_suppkey"),
        )
    )
    o = (
        o0.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("_rep") * okb).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_rep") * ckb).alias("o_custkey"),
        )
    )

    # -- PageRank: 3 iterations over the replicated purchase graph ----
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("cn"),
        (F.col("l_suppkey") * 2 + 1).alias("sn"),
    )
    edges = j.select(
        F.explode(
            F.array(
                F.struct(F.col("cn").alias("src"), F.col("sn").alias("dst")),
                F.struct(F.col("sn").alias("src"), F.col("cn").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    volumes["edges"] = edges.count()
    t0 = time.time()
    pr = G.pagerank(edges, iterations=3)
    volumes["pagerank_nodes"] = pr.count()
    timings["pagerank_3iter"] = round(time.time() - t0, 3)

    # -- label propagation: 3 iterations, same 12M-edge graph ---------
    t0 = time.time()
    lpa = G.label_propagation(edges, iterations=3)
    volumes["lpa_nodes"] = lpa.count()
    timings["label_propagation_3iter"] = round(time.time() - t0, 3)

    # -- HITS (r9): 4 iterations of the dmax-normalized integer
    # recurrence on the same 12M-edge graph — the pagerank loop shape
    # (cached edges, broadcast score joins, partial-agg in-sums) must
    # hold at 100× exactly as pagerank's does ------------------------
    t0 = time.time()
    hits = G.hits_scores(edges, iterations=4)
    volumes["hits_nodes"] = hits.count()
    timings["hits_4iter"] = round(time.time() - t0, 3)

    # -- triangles + Adamic-Adar need a non-bipartite graph: fold the
    # purchase graph into a K-node collision graph (keys knuth-hashed
    # so copies don't align), ~12M edges over 1M nodes, deg≈20 --------
    K = 1_000_000
    tri_edges = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.pmod(F.col("o_custkey") * 2654435761, F.lit(K)).alias("src"),
        F.pmod(F.col("l_partkey") * 40503, F.lit(K)).alias("dst"),
    )
    t0 = time.time()
    tc = G.triangle_counts(tri_edges)
    volumes["triangle_nodes"] = tc.count()
    timings["triangle_counts"] = round(time.time() - t0, 3)

    t0 = time.time()
    aa = G.adamic_adar(tri_edges, min_common=2, top_n=100, max_degree=32)
    volumes["adamic_adar_top"] = len(aa.collect())
    timings["adamic_adar_hubcap32"] = round(time.time() - t0, 3)

    # -- basket rules over 10× distinct baskets -----------------------
    t0 = time.time()
    rules = association_rules(
        li, basket_col="l_orderkey", item_col="l_partkey", min_pair_count=2
    )
    top = rules.orderBy(F.col("lift").desc(), "item_a", "item_b").limit(100)
    volumes["basket_rules_top"] = len(top.collect())
    timings["basket_lift"] = round(time.time() - t0, 3)

    # -- documents 10×: per-copy token prefix scales the vocabulary ---
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dmax = int(d0.agg(F.max("doc_id")).first()[0]) + 1
    docs = (
        d0.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_rep") * dmax).alias("doc_id"),
            F.concat(
                F.lit("copytok"), F.col("_rep").cast("string"),
                F.lit(" "), F.col("text"),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)  # replicate once, not per count table
    )
    volumes["docs"] = docs.count()

    t0 = time.time()
    sb = stupid_backoff_score(docs)
    sb.write.format("noop").mode("overwrite").save()
    timings["lm_stupid_backoff"] = round(time.time() - t0, 3)

    t0 = time.time()
    qdf = spark.createDataFrame(
        [(1, ["spark", "merge"]), (2, ["window", "key"]), (3, ["batch"])],
        "query_id long, terms array<string>",
    )
    volumes["bm25_multi_rows"] = RT.bm25_multi_topk(docs, qdf, k=5).count()
    timings["retrieval_bm25_multi"] = round(time.time() - t0, 3)

    # -- BPE merge learning: the corpus-scale pass is ONE (word, freq)
    # rollup; each round then re-pairs only the vocabulary (r10) ------
    from inception_eventstore_spark.operators.lm import (
        bpe_learn_merges,
        tokens,
    )

    # second-level replication (×4, fresh vocab prefix) lifts the BPE
    # corpus past 10M tokens — the rollup is the only token-scale pass
    bpe_docs = (
        docs.crossJoin(
            spark.range(4).select(F.col("id").alias("_rep2"))
        )
        .select(
            F.concat(
                F.lit("bpetok"), F.col("_rep2").cast("string"),
                F.lit(" "), F.col("text"),
            ).alias("text"),
        )
    )
    volumes["bpe_tokens"] = int(
        bpe_docs.select(
            F.size(tokens("text")).alias("n")
        ).agg(F.sum("n")).first()[0]
    )
    assert volumes["bpe_tokens"] >= 10_000_000, volumes["bpe_tokens"]
    t0 = time.time()
    learned = bpe_learn_merges(bpe_docs, n_merges=4).collect()
    timings["bpe_learn_merges_4"] = round(time.time() - t0, 3)
    assert len(learned) == 4 and all(
        r["pair_count"] > 0 for r in learned
    ), f"bpe merge rounds degenerate: {learned}"
    volumes["bpe_top_pair_count"] = int(learned[0]["pair_count"])

    # -- epoch shuffle: two-phase shard rank over the replicated corpus —
    # the permutation must be total (max rank == count) with NO
    # single-partition Exchange (the r4 scale-killer this replaced)
    from inception_eventstore_spark.operators.sampling import (
        epoch_shuffle_rank,
        weighted_sample,
    )

    t0 = time.time()
    ranked = epoch_shuffle_rank(docs.select("doc_id"), epoch=1)
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.max("shuffle_rank").alias("mx"),
        F.countDistinct("shuffle_rank").alias("dr"),
    ).first()
    timings["epoch_shuffle_50k"] = round(time.time() - t0, 3)
    assert int(agg["n"]) == int(agg["mx"]) == int(agg["dr"]), (
        "epoch shuffle rank is not a total permutation: "
        f"n={agg['n']} max={agg['mx']} distinct={agg['dr']}"
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "epoch_shuffle_rank funnels through a single partition"
    )

    t0 = time.time()
    ws = weighted_sample(
        docs.select("doc_id", F.length("text").alias("w")), "w", k=1000,
        id_col="doc_id",
    )
    volumes["weighted_sample_rows"] = ws.count()
    timings["weighted_sample_50k"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "replication": reps,
                "volumes": volumes,
                "timings": timings,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
