"""Round-3 additions: BM25 retrieval, fuzzy linkage, exact-substring
spans, KNN graph, BPE pair counts, PMI collocations, PageRank."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import graph as G
from inception_eventstore_spark.operators import linkage as LK
from inception_eventstore_spark.operators import lm as LM
from inception_eventstore_spark.operators import retrieval as RT
from inception_eventstore_spark.operators import similarity as S
from inception_eventstore_spark.operators.dedup import (
    duplicate_substring_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark shuffles data across the cluster"),
        (1, "spark caches data in memory for reuse"),
        (2, "the optimizer prunes parquet partitions"),
        (3, "data skew breaks the shuffle stage"),
        (4, "completely unrelated text about gardening roses"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBm25:
    def test_matches_python_reference(self, corpus):
        terms = ["spark", "data"]
        got = {
            r["doc_id"]: r["score"]
            for r in RT.bm25_topk(corpus, terms, k=10).collect()
        }
        toks = {
            r["doc_id"]: r["text"].split()
            for r in corpus.collect()
        }
        want = RT.bm25_score_py(toks, terms)
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6)

    def test_ranking_sane(self, corpus):
        # docs containing both terms outrank docs with one; gardening
        # doc matches nothing
        res = RT.bm25_topk(corpus, ["spark", "data"], k=10).collect()
        ids = [r["doc_id"] for r in res]
        assert 4 not in ids
        assert set(ids[:2]) == {0, 1}  # both terms
        assert res[0]["score"] >= res[-1]["score"]

    def test_k_cut(self, corpus):
        assert RT.bm25_topk(corpus, ["data"], k=2).count() == 2

    def test_empty_query_raises(self, corpus):
        with pytest.raises(ValueError):
            RT.bm25_topk(corpus, [])

    def test_inverted_index_postings(self, corpus):
        idx = RT.build_inverted_index(corpus)
        row = idx.where(
            (F.col("token") == "spark") & (F.col("doc_id") == 0)
        ).first()
        assert row["tf"] == 1 and row["dl"] == 6
        # every posting's dl equals that doc's token count
        assert idx.where(F.col("doc_id") == 3).first()["dl"] == 6


class TestFuzzyJoin:
    def _df(self, spark, vals, name="v"):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], f"id long, {name} string"
        )

    def test_finds_all_distance1_pairs(self, spark):
        left = self._df(spark, ["martha", "jonathan", "zoe", "xyzzy"])
        right = self._df(
            spark,
            ["marta",      # deletion
             "jonathon",   # substitution
             "zoey",       # insertion
             "completely"],
        )
        got = {
            (r["left_val"], r["right_val"], r["dist"])
            for r in LK.fuzzy_join(
                left, right, "v", "v", left_id="id", right_id="id"
            ).collect()
        }
        assert ("martha", "marta", 1) in got
        assert ("jonathan", "jonathon", 1) in got
        assert ("zoe", "zoey", 1) in got
        assert all(p[1] != "completely" for p in got)

    def test_equals_bruteforce(self, spark):
        import random

        rng = random.Random(7)
        base = ["".join(rng.choice("ab") for _ in range(5)) for _ in range(40)]
        left = self._df(spark, base)
        right = self._df(spark, base[::-1])
        got = {
            (r["left_val"], r["right_val"])
            for r in LK.fuzzy_join(left, right, "v", "v").collect()
        }
        brute = {
            (a, b)
            for a in base
            for b in base
            if _lev(a, b) <= 1
        }
        assert got == brute

    def test_exact_match_distance0(self, spark):
        left = self._df(spark, ["same"])
        right = self._df(spark, ["same"])
        rows = LK.fuzzy_join(left, right, "v", "v").collect()
        assert len(rows) == 1 and rows[0]["dist"] == 0

    def test_radius2_rejected(self, spark):
        df = self._df(spark, ["a"])
        with pytest.raises(ValueError):
            LK.fuzzy_join(df, df, "v", "v", max_dist=2)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


class TestDuplicateSubstringSpans:
    def test_planted_span(self, spark):
        shared = "the quick brown fox jumps over the lazy dog again"
        docs = spark.createDataFrame(
            [
                (0, "AAAA " + shared + " BBBB"),
                (1, "CCCCCC " + shared + " DDDD"),
                (2, "nothing in common here at all with anything else"),
            ],
            "doc_id long, text string",
        )
        spans = duplicate_substring_spans(docs, min_len=20).collect()
        by_doc = {r["doc_id"]: r for r in spans}
        assert set(by_doc) == {0, 1}
        # the duplicated region includes the spaces AROUND the planted
        # text (both docs have them): " "+shared+" ", doc 0 from char 5
        assert by_doc[0]["span_start"] == 5
        assert by_doc[0]["span_len"] == len(shared) + 2
        assert by_doc[1]["span_start"] == 7
        assert by_doc[1]["span_len"] == len(shared) + 2

    def test_within_doc_repeat(self, spark):
        block = "x" * 30
        docs = spark.createDataFrame(
            [(0, block + "-middle-" + block)], "doc_id long, text string"
        )
        spans = duplicate_substring_spans(docs, min_len=10).collect()
        # both copies of the block are duplicated grams; the runs are
        # disjoint (the middle breaks them), so two spans
        assert len(spans) == 2

    def test_short_docs_skipped(self, spark):
        docs = spark.createDataFrame(
            [(0, "tiny"), (1, "tiny")], "doc_id long, text string"
        )
        assert duplicate_substring_spans(docs, min_len=10).count() == 0


class TestKnnGraph:
    def test_matches_bruteforce(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 8))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        got = S.knn_graph(df, k=3, n_blocks=4).collect()
        by_src = {}
        for r in got:
            by_src.setdefault(r["src"], []).append((r["rank"], r["dst"]))
        assert set(by_src) == set(range(40))
        D = ((vecs[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(D, np.inf)
        for s in range(40):
            want = list(np.argsort(D[s], kind="stable")[:3])
            gotlist = [d for _, d in sorted(by_src[s])]
            assert gotlist == want, f"src {s}"

    def test_dist_values(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [6.0, 8.0])],
            "vec_id long, embedding array<double>",
        )
        rows = {
            (r["src"], r["dst"]): r["dist"]
            for r in S.knn_graph(df, k=1, n_blocks=2).collect()
        }
        assert rows[(0, 1)] == pytest.approx(5.0)
        assert rows[(2, 1)] == pytest.approx(5.0)


class TestBpePairCounts:
    def test_hand_counts(self, spark):
        docs = spark.createDataFrame(
            [(0, "low low lower")], "doc_id long, text string"
        )
        got = {
            (r["sym_a"], r["sym_b"]): r["pair_count"]
            for r in LM.bpe_pair_counts(docs).collect()
        }
        # 'low' freq 2 → (l,o)=2, (o,w)=2, (w,</w>)=2
        # 'lower' freq 1 → (l,o)+1, (o,w)+1, (w,e), (e,r), (r,</w>)
        assert got[("l", "o")] == 3
        assert got[("o", "w")] == 3
        assert got[("w", "</w>")] == 2
        assert got[("e", "r")] == 1
        assert got[("r", "</w>")] == 1

    def test_top_n(self, spark):
        docs = spark.createDataFrame(
            [(0, "aa ab aa")], "doc_id long, text string"
        )
        top = LM.bpe_pair_counts(docs, top_n=1).collect()
        assert len(top) == 1 and top[0]["sym_a"] == "a"

    def test_merges_second_iteration(self, spark):
        docs = spark.createDataFrame(
            [(0, "low low lower")], "doc_id long, text string"
        )
        # after merging (l,o): 'low'→[lo,w,</w>] ×2, 'lower'→[lo,w,e,r,</w>]
        got = {
            (r["sym_a"], r["sym_b"]): r["pair_count"]
            for r in LM.bpe_pair_counts(docs, merges=[("l", "o")]).collect()
        }
        assert got[("lo", "w")] == 3
        assert got[("w", "</w>")] == 2
        assert got[("w", "e")] == 1
        assert ("l", "o") not in got

    def test_merges_chain(self, spark):
        docs = spark.createDataFrame(
            [(0, "low lowest")], "doc_id long, text string"
        )
        got = {
            (r["sym_a"], r["sym_b"]): r["pair_count"]
            for r in LM.bpe_pair_counts(
                docs, merges=[("l", "o"), ("lo", "w")]
            ).collect()
        }
        # 'low'→[low,</w>], 'lowest'→[low,e,s,t,</w>]
        assert got[("low", "</w>")] == 1
        assert got[("low", "e")] == 1
        assert got[("s", "t")] == 1

    def test_merges_greedy_runs(self, spark):
        # back-to-back occurrences must ALL merge left-to-right:
        # 'aaaa' under (a,a) → [aa, aa, </w>], never [aa, a, a, </w>]
        docs = spark.createDataFrame(
            [(0, "aaaa aaa")], "doc_id long, text string"
        )
        got = {
            (r["sym_a"], r["sym_b"]): r["pair_count"]
            for r in LM.bpe_pair_counts(docs, merges=[("a", "a")]).collect()
        }
        # aaaa → aa aa </w>; aaa → aa a </w>
        assert got[("aa", "aa")] == 1
        assert got[("aa", "a")] == 1
        assert got[("a", "</w>")] == 1
        assert got[("aa", "</w>")] == 1
        assert ("a", "a") not in got


class TestPmi:
    def test_hand_pmi(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b a b c d")], "doc_id long, text string"
        )
        got = {
            (r["tok_a"], r["tok_b"]): (r["pair_count"], r["pmi"])
            for r in LM.pmi_collocations(docs, min_pair_count=1).collect()
        }
        # pairs: (a,b)×2 (b,a) (b,c) (c,d); T=5
        # margins (left): a:2 b:2 c:1 ; (right): b:2 a:1 c:1 d:1
        n, pmi = got[("a", "b")]
        assert n == 2
        assert pmi == pytest.approx(round(math.log(2 * 5 / (2 * 2)), 6))
        n, pmi = got[("c", "d")]
        assert pmi == pytest.approx(round(math.log(1 * 5 / (1 * 1)), 6))

    def test_min_count_filters(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b a b c d")], "doc_id long, text string"
        )
        got = LM.pmi_collocations(docs, min_pair_count=2).collect()
        assert {(r["tok_a"], r["tok_b"]) for r in got} == {("a", "b")}


class TestPageRank:
    def _pr_py(self, edges, iters, d=0.85):
        nodes = sorted({u for e in edges for u in e})
        n = len(nodes)
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        r = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            acc = {v: 0.0 for v in nodes}
            for s, t in edges:
                acc[t] += r[s] / out[s]
            r = {v: (1 - d) / n + d * acc[v] for v in nodes}
        return r

    def test_matches_python(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["rank"]
            for r in G.pagerank(df, iterations=4).collect()
        }
        want = self._pr_py(edges, 4)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)

    def test_parallel_edges_weighted(self, spark):
        # duplicate edge doubles the contribution share routing
        e1 = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 3)], "src long, dst long"
        )
        got = {
            r["node"]: r["rank"]
            for r in G.pagerank(e1, iterations=1).collect()
        }
        want = self._pr_py([(1, 2), (1, 2), (1, 3)], 1)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
        assert got[2] > got[3]

    def test_empty_raises(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError):
            G.pagerank(df)


class TestReviewFixes:
    def test_fuzzy_join_rejects_overlong_values(self, spark):
        long = spark.createDataFrame([(0, "x" * 65)], "id long, v string")
        short = spark.createDataFrame([(0, "x" * 64)], "id long, v string")
        with pytest.raises(ValueError, match="max_len"):
            LK.fuzzy_join(long, short, "v", "v")
        # raising max_len restores losslessness for the same pair
        rows = LK.fuzzy_join(
            long, short, "v", "v", max_len=80
        ).collect()
        assert len(rows) == 1 and rows[0]["dist"] == 1
        # explicit opt-in keeps identity-only recall without raising
        assert (
            LK.fuzzy_join(long, short, "v", "v", allow_long=True).count()
            == 0
        )

    def test_substring_spans_never_overlap(self, spark):
        # grams 'abc' (pos 1) and 'cde' (pos 3) both duplicated, 'bcd'
        # not: the two char spans [1,3] and [3,5] overlap at char 3 and
        # must merge into ONE span [1,5]
        docs = spark.createDataFrame(
            [(0, "abcde"), (1, "abcZZ"), (2, "ZZcde")],
            "doc_id long, text string",
        )
        spans = duplicate_substring_spans(docs, min_len=3).collect()
        d0 = sorted(
            (r["span_start"], r["span_end"])
            for r in spans
            if r["doc_id"] == 0
        )
        assert d0 == [(1, 5)]
        for doc in {r["doc_id"] for r in spans}:
            ivs = sorted(
                (r["span_start"], r["span_end"])
                for r in spans
                if r["doc_id"] == doc
            )
            for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
                assert e1 < s2, "spans must be disjoint"

    def test_knn_graph_string_ids(self, spark):
        df = spark.createDataFrame(
            [("a", [0.0, 0.0]), ("b", [3.0, 4.0]), ("c", [6.0, 8.0])],
            "vec_id string, embedding array<double>",
        )
        rows = {
            (r["src"], r["dst"]): r["dist"]
            for r in S.knn_graph(df, k=1, n_blocks=2).collect()
        }
        assert rows[("a", "b")] == pytest.approx(5.0)
        assert rows[("c", "b")] == pytest.approx(5.0)


class TestBasket:
    def _baskets(self, spark):
        rows = [
            (1, "bread"), (1, "butter"), (1, "milk"),
            (2, "bread"), (2, "butter"),
            (3, "bread"), (3, "beer"),
            (4, "beer"), (4, "chips"),
            (5, "bread"), (5, "butter"), (5, "beer"),
            (5, "bread"),  # duplicate (basket,item) must count once
        ]
        return spark.createDataFrame(rows, "basket_id long, item_id string")

    def test_pair_counts_hand_checked(self, spark):
        from inception_eventstore_spark.operators.basket import (
            item_pair_counts,
        )

        got = {
            (r["item_a"], r["item_b"]): r["pair_count"]
            for r in item_pair_counts(self._baskets(spark)).collect()
        }
        assert got[("bread", "butter")] == 3
        assert got[("beer", "bread")] == 2
        assert got[("beer", "chips")] == 1
        assert ("butter", "milk") in got

    def test_rules_metrics(self, spark):
        from inception_eventstore_spark.operators.basket import (
            association_rules,
        )

        got = {
            (r["item_a"], r["item_b"]): r
            for r in association_rules(
                self._baskets(spark), min_pair_count=1
            ).collect()
        }
        # N=5, c(bread)=4, c(butter)=3, c_ab=3
        r = got[("bread", "butter")]
        assert r["support"] == pytest.approx(3 / 5)
        assert r["lift"] == pytest.approx(round(3 * 5 / (4 * 3), 6))
        assert r["conf_a_to_b"] == pytest.approx(0.75)
        assert r["conf_b_to_a"] == pytest.approx(1.0)

    def test_mega_basket_excluded(self, spark):
        from inception_eventstore_spark.operators.basket import (
            item_pair_counts,
        )

        rows = [(1, f"i{j}") for j in range(50)] + [(2, "i0"), (2, "i1")]
        df = spark.createDataFrame(rows, "basket_id long, item_id string")
        got = item_pair_counts(df, max_basket_items=10).collect()
        assert {(r["item_a"], r["item_b"]) for r in got} == {("i0", "i1")}

    def test_empty_raises(self, spark):
        from inception_eventstore_spark.operators.basket import (
            association_rules,
        )

        df = spark.createDataFrame([], "basket_id long, item_id string")
        with pytest.raises(ValueError):
            association_rules(df)


class TestLshKnnGraph:
    def test_planted_twins_found(self, spark):
        rng = np.random.default_rng(9)
        base = rng.normal(size=(30, 16)) * 5
        rows = []
        for i in range(30):
            rows.append((2 * i, [float(x) for x in base[i]]))
            rows.append(
                (2 * i + 1, [float(x) for x in base[i] + 0.01])
            )
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = S.lsh_knn_graph(df, k=1, n_planes=8, dim=16).collect()
        top1 = {r["src"]: r["dst"] for r in got if r["rank"] == 1}
        # every vector's twin is ~0.04 away while other points are ~O(10):
        # the twin shares the bucket (identical up to 0.01) and must be
        # the returned nearest neighbor
        hits = sum(1 for s, d in top1.items() if d == (s ^ 1))
        assert hits >= 56  # ≥ 93% of 60 (bucket-edge cases allowed)

    def test_recall_vs_exact(self, spark):
        rng = np.random.default_rng(10)
        vecs = rng.normal(size=(80, 16))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(80)],
            "vec_id long, embedding array<double>",
        )
        exact = {
            (r["src"], r["dst"])
            for r in S.knn_graph(df, k=3, n_blocks=4).collect()
        }
        approx = {
            (r["src"], r["dst"])
            for r in S.lsh_knn_graph(
                df, k=3, n_planes=4, dim=16
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        # measured 0.61 at 4 planes + radius 1 on random gaussians (the
        # HARD case for cosine-family LSH — no cluster structure);
        # recall rises with structure (see planted-twin test) and with
        # fewer planes / more probes
        assert recall >= 0.5
        # approximate edges are REAL distances (subset semantics, no
        # fabricated neighbors beyond the bucket union)
        assert all(s != d for s, d in approx)

    def test_radius2_improves_recall(self, spark):
        rng = np.random.default_rng(10)
        vecs = rng.normal(size=(80, 16))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(80)],
            "vec_id long, embedding array<double>",
        )
        exact = {
            (r["src"], r["dst"])
            for r in S.knn_graph(df, k=3, n_blocks=4).collect()
        }

        def recall(radius):
            approx = {
                (r["src"], r["dst"])
                for r in S.lsh_knn_graph(
                    df, k=3, n_planes=4, dim=16, probe_radius=radius
                ).collect()
            }
            return len(exact & approx) / len(exact)

        r1, r2 = recall(1), recall(2)
        # radius 2 probes a strict superset of buckets → recall can
        # only rise; at 4 planes it reaches the full bucket union
        assert r2 >= r1
        assert r2 >= 0.8

    def test_radius3_rejected(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(NotImplementedError):
            S.lsh_knn_graph(df, probe_radius=3, dim=2)


class TestBm25Multi:
    def test_matches_single_query_path(self, spark, corpus):
        qdf = spark.createDataFrame(
            [
                (1, ["spark", "data"]),
                (2, ["optimizer"]),
                (3, ["gardening", "roses"]),
            ],
            "query_id long, terms array<string>",
        )
        multi = RT.bm25_multi_topk(corpus, qdf, k=10).collect()
        by_q = {}
        for r in multi:
            by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
        for qid, terms in ((1, ["spark", "data"]), (2, ["optimizer"]),
                           (3, ["gardening", "roses"])):
            single = {
                r["doc_id"]: r["score"]
                for r in RT.bm25_topk(corpus, terms, k=10).collect()
            }
            assert by_q.get(qid, {}) == pytest.approx(single), qid

    def test_ranks_dense_per_query(self, spark, corpus):
        qdf = spark.createDataFrame(
            [(1, ["data"])], "query_id long, terms array<string>"
        )
        rows = RT.bm25_multi_topk(corpus, qdf, k=2).collect()
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]


class TestBpeEncodeTrain:
    @staticmethod
    def _py_encode(word: str, merges):
        syms = list(word) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def test_encode_python_parity(self, spark):
        texts = ["the theme then there", "aaaa aab the an and",
                 "hat that math she the"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "</w>")]
        got = {
            r["w"]: (r["pieces"], r["n_pieces"])
            for r in LM.bpe_encode_words(df, merges).collect()
        }
        words = set(" ".join(texts).split())
        assert set(got) == words
        for w in words:
            expect = self._py_encode(w, merges)
            assert got[w] == (expect, len(expect)), w

    def test_encode_runs_merge_greedily(self, spark):
        # 'aaaa' → [aa, aa, </w>]: left-to-right non-overlapping
        df = spark.createDataFrame([(0, "aaaa aaa")], ["doc_id", "text"])
        got = {r["w"]: r["pieces"]
               for r in LM.bpe_encode_words(df, [("a", "a")]).collect()}
        assert got["aaaa"] == ["aa", "aa", "</w>"]
        assert got["aaa"] == ["aa", "a", "</w>"]

    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [(0, "the the cat"), (1, "cat")], ["doc_id", "text"]
        )
        merges = [("t", "h"), ("th", "e"), ("the", "</w>")]
        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"])
            for r in LM.bpe_token_counts(df, merges).collect()
        }
        # 'the' → ['the</w>'] = 1 piece; 'cat' → c a t </w> = 4
        assert got == {0: (3, 1 + 1 + 4), 1: (1, 4)}

    def test_train_loop_matches_python(self, spark):
        texts = ["the the the thorn then", "the this that"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        merges = LM.bpe_train(df, n_merges=3, min_pair_count=2)
        # python reference: same greedy argmax with (count desc, pair asc)
        from collections import Counter

        words = Counter(" ".join(texts).split())
        py_merges = []
        for _ in range(3):
            pc = Counter()
            for w, f in words.items():
                syms = self._py_encode(w, py_merges)[: None]
                for x, y in zip(syms, syms[1:]):
                    pc[(x, y)] += f
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            py_merges.append(best[0])
        assert merges == py_merges

    def test_train_then_encode_compresses(self, spark):
        from inception_eventstore_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        merges = LM.bpe_train(docs, n_merges=8)
        assert len(merges) == 8
        base = LM.bpe_encode_words(docs, []).agg(
            F.sum(F.col("freq") * F.col("n_pieces"))
        ).first()[0]
        enc = LM.bpe_encode_words(docs, merges).agg(
            F.sum(F.col("freq") * F.col("n_pieces"))
        ).first()[0]
        assert enc < base  # 8 merges strictly shrink the piece count


class TestRrfFuse:
    def _lists(self, spark):
        from inception_eventstore_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            ["query_id", "item_id", "rank"],
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2)], ["query_id", "item_id", "rank"]
        )
        return rrf_fuse, a, b

    def test_scores_and_order(self, spark):
        rrf_fuse, a, b = self._lists(spark)
        rows = {r["item_id"]: r for r in rrf_fuse([a, b]).collect()}
        ppb = lambda r: 1_000_000_000 // (60 + r)
        # item 11 appears in both lists: rank 2 + rank 1
        assert rows[11]["rrf_ppb"] == ppb(2) + ppb(1)
        assert rows[11]["n_lists"] == 2
        assert rows[10]["rrf_ppb"] == ppb(1) and rows[10]["n_lists"] == 1
        order = [
            r["item_id"]
            for r in sorted(rows.values(), key=lambda r: r["fused_rank"])
        ]
        assert order[0] == 11  # two contributions beat any single one

    def test_item_id_tie_break(self, spark):
        from inception_eventstore_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(1, 20, 1), (1, 5, 1)], ["query_id", "item_id", "rank"]
        )
        b = a.where("item_id < 0")  # empty second list
        out = rrf_fuse([a]).orderBy("fused_rank").collect()
        assert [r["item_id"] for r in out] == [5, 20]  # equal score -> id

    def test_top_n_cut_and_guards(self, spark):
        import pytest

        rrf_fuse, a, b = self._lists(spark)
        assert rrf_fuse([a, b], top_n=2).count() == 2
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([a], rrf_k=0)


class TestTfidfCosine:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark engine spark spark"),
                (2, "spark engine"),
                (3, "engine room with many extra words diluting the norm"),
                (4, "unrelated text entirely"),
            ],
            ["doc_id", "text"],
        )

    def _q(self, spark, terms):
        return spark.createDataFrame(
            [(1, terms)], "query_id long, terms array<string>"
        )

    def test_ranking_and_reference_math(self, spark):
        import math

        from inception_eventstore_spark.operators.retrieval import (
            tfidf_cosine_multi_topk,
        )

        out = tfidf_cosine_multi_topk(
            self._docs(spark), self._q(spark, ["spark"]), k=4
        ).collect()
        got = {r["doc_id"]: (r["rank"], r["score"]) for r in out}
        # docs without any query term produce no (query, doc) row
        assert set(got) == {1, 2}
        # reference: doc 2 is the purest 'spark' doc by cosine
        corpus = {
            1: "spark engine spark spark".split(),
            2: "spark engine".split(),
            3: "engine room with many extra words diluting the norm".split(),
            4: "unrelated text entirely".split(),
        }
        n = len(corpus)
        df = {
            t: sum(1 for d in corpus.values() if t in d)
            for t in {w for d in corpus.values() for w in d}
        }
        idf = {t: math.log((1 + n) / (f + 1)) + 1.0 for t, f in df.items()}

        def cos(doc, terms):
            w = {
                t: doc.count(t) * idf[t] for t in set(doc)
            }
            dn = math.sqrt(sum(x * x for x in w.values()))
            qw = {t: idf[t] for t in terms if t in idf}
            qn = math.sqrt(sum(x * x for x in qw.values()))
            dot = sum(w.get(t, 0.0) * qw[t] for t in qw)
            return round(dot / (dn * qn), 6)

        for d in (1, 2):
            assert abs(got[d][1] - cos(corpus[d], ["spark"])) < 2e-6
        order = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        want_top = max(
            (cos(corpus[d], ["spark"]), -d) for d in (1, 2)
        )
        assert order[0] == -want_top[1]

    def test_repeated_query_terms_reweight(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            tfidf_cosine_multi_topk,
        )

        single = tfidf_cosine_multi_topk(
            self._docs(spark), self._q(spark, ["spark", "engine"]), k=4
        ).collect()
        doubled = tfidf_cosine_multi_topk(
            self._docs(spark),
            self._q(spark, ["spark", "spark", "engine"]),
            k=4,
        ).collect()
        s1 = {r["doc_id"]: r["score"] for r in single}
        s2 = {r["doc_id"]: r["score"] for r in doubled}
        # doubling 'spark' in the query pulls the spark-heavy doc up
        assert s2[1] > s1[1]

    def test_empty_corpus_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.retrieval import (
            tfidf_cosine_multi_topk,
        )

        with pytest.raises(ValueError):
            tfidf_cosine_multi_topk(
                self._docs(spark).where("doc_id < 0"),
                self._q(spark, ["x"]),
            )


class TestRetrievalNdcg:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i + 1, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def _queries(self, spark, qs):
        return spark.createDataFrame(
            qs, "query_id long, terms array<string>"
        )

    def test_ideal_ranking_scores_one(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            retrieval_ndcg,
        )

        # single term, tf differs: BM25 order (higher tf first) is
        # rel-ideal (both rel=1) → ndcg exactly 1
        docs = self._docs(spark, ["apple apple", "apple pear"])
        out = retrieval_ndcg(
            docs, self._queries(spark, [(1, ["apple"])]), k=2
        ).collect()
        assert len(out) == 1
        assert out[0]["ndcg"] == 1.0
        assert out[0]["dcg"] == out[0]["idcg"]

    def test_tf_inflation_misranks_and_ndcg_drops(self, spark):
        import math

        from inception_eventstore_spark.operators.retrieval import (
            retrieval_ndcg,
        )

        # d1 = x-spam (rel 1) outscores d2 = "x y" (rel 2) on BM25
        # because y's idf is crushed by the y-only filler docs →
        # ranking is inverted vs relevance → ndcg < 1
        docs = self._docs(
            spark, ["x x x x x x", "x y", "y", "y", "y", "y"]
        )
        out = retrieval_ndcg(
            docs, self._queries(spark, [(1, ["x", "y"])]), k=2
        ).collect()
        (r,) = out
        w2 = 1.0 / math.log2(3)
        dcg = 1.0 + 3.0 * w2
        idcg = 3.0 + 1.0 * w2
        assert abs(r["dcg"] - round(dcg, 6)) < 2e-6
        assert abs(r["idcg"] - round(idcg, 6)) < 2e-6
        assert abs(r["ndcg"] - round(dcg / idcg, 6)) < 2e-6
        assert r["ndcg"] < 1.0

    def test_no_match_query_dropped(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            retrieval_ndcg,
        )

        docs = self._docs(spark, ["apple", "pear"])
        out = retrieval_ndcg(
            docs,
            self._queries(spark, [(1, ["apple"]), (2, ["zebra"])]),
            k=3,
        ).collect()
        assert [r["query_id"] for r in out] == [1]

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.retrieval import (
            retrieval_ndcg,
        )

        docs = self._docs(spark, ["apple"])
        with pytest.raises(ValueError):
            retrieval_ndcg(
                docs, self._queries(spark, [(1, ["apple"])]), k=0
            )


class TestItemItemTopk:
    def _mk(self, spark, baskets):
        rows = [(bk, it) for bk, items in baskets for it in items]
        return spark.createDataFrame(rows, ["basket_id", "item_id"])

    def test_hand_computed_cosine(self, spark):
        """Items 1 and 2 co-occur in 2 of their 2/4 baskets:
        cos² = 4/(2·4) = 0.5 → 524288 micro. Item 3 co-occurs once
        with 2 → filtered by min_pair_count=2."""
        from inception_eventstore_spark.operators.basket import (
            item_item_topk,
        )

        baskets = [
            (10, [1, 2]),
            (11, [1, 2]),
            (12, [2, 3]),
            (13, [2]),
        ]
        got = {
            (r["item_a"], r["item_b"]): (
                r["pair_count"],
                r["n_a"],
                r["n_b"],
                r["cos2_micro"],
                r["rank"],
            )
            for r in item_item_topk(
                self._mk(spark, baskets), k=5, min_pair_count=2
            ).collect()
        }
        assert got[(1, 2)] == (2, 2, 4, (4 * 1048576) // 8, 1)
        assert got[(2, 1)] == (2, 4, 2, (4 * 1048576) // 8, 1)
        assert (2, 3) not in got and (3, 2) not in got

    def test_rank_orders_by_overlap_share(self, spark):
        """Item 1's best neighbor is the one sharing ALL its baskets
        (cos² = co²/(n·n)), not the merely popular one."""
        from inception_eventstore_spark.operators.basket import (
            item_item_topk,
        )

        baskets = [
            (1, [1, 2, 3]),
            (2, [1, 2, 3]),
            (3, [3]),
            (4, [3]),
            (5, [3]),
            (6, [3]),
        ]
        # cos²(1,2) = 4/(2·2) = 1.0; cos²(1,3) = 4/(2·6) = 1/3
        rows = item_item_topk(
            self._mk(spark, baskets), k=2, min_pair_count=2
        ).where(F.col("item_a") == 1).orderBy("rank").collect()
        assert [r["item_b"] for r in rows] == [2, 3]
        assert rows[0]["cos2_micro"] == 1048576
        assert rows[1]["cos2_micro"] == 1048576 // 3

    def test_k_truncates_and_guard(self, spark):
        from inception_eventstore_spark.operators.basket import (
            item_item_topk,
        )

        baskets = [(b, [1, 2, 3, 4]) for b in range(3)]
        rows = item_item_topk(
            self._mk(spark, baskets), k=2, min_pair_count=2
        ).collect()
        per_a = {}
        for r in rows:
            per_a.setdefault(r["item_a"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2] for v in per_a.values())
        with pytest.raises(ValueError):
            item_item_topk(self._mk(spark, baskets), k=0)


class TestPhraseSearch:
    def test_counts_and_positions(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            phrase_search,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick fox the quick dog"),
                (2, "quick the fox"),
                (3, "the quick the quick the quick"),
                (4, "nothing here"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(docs, ["the", "quick"]).collect()
        }
        assert got == {1: 2, 3: 3}

    def test_repeated_token_phrase(self, spark):
        """'buffalo buffalo' — one token filling two slots: the
        distinct-slot anchor vote must still require CONSECUTIVE
        positions."""
        from inception_eventstore_spark.operators.retrieval import (
            phrase_search,
        )

        docs = spark.createDataFrame(
            [
                (1, "buffalo buffalo buffalo"),
                (2, "buffalo x buffalo"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(docs, ["buffalo", "buffalo"]).collect()
        }
        assert got == {1: 2}

    def test_case_folding_and_guard(self, spark):
        import pytest as _pt

        from inception_eventstore_spark.operators.retrieval import (
            phrase_search,
        )

        docs = spark.createDataFrame(
            [(1, "Spark SQL engine")], "doc_id long, text string"
        )
        got = phrase_search(docs, ["spark", "SQL"]).collect()
        assert len(got) == 1 and got[0]["n_matches"] == 1
        with _pt.raises(ValueError):
            phrase_search(docs, [])
