"""Round-11 operators: KN continuation stats, retrieval MAP, graph
modularity, split-conformal intervals, BH-FDR sign tests."""

from __future__ import annotations

from fractions import Fraction
from math import comb

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts, start=1)],
        "doc_id long, text string",
    )


class TestKnContinuation:
    def test_versatile_beats_bursty(self, spark):
        from inception_eventstore_spark.operators.lm import kn_continuation

        # "francisco" always follows "san" (1 left context);
        # "runs" follows many distinct words — same unigram count
        texts = [
            "san francisco", "san francisco", "san francisco",
            "dog runs", "cat runs", "bird runs",
        ]
        out = {
            r["token"]: r
            for r in kn_continuation(_docs(spark, texts), k=10).collect()
        }
        assert out["francisco"]["n_token"] == out["runs"]["n_token"] == 3
        assert out["francisco"]["n_left_contexts"] == 1
        assert out["runs"]["n_left_contexts"] == 3
        assert out["runs"]["p_cont_ppm"] == 3 * out["francisco"]["p_cont_ppm"]
        # bigram types: (san,francisco),(dog,runs),(cat,runs),(bird,runs)
        assert out["runs"]["p_cont_ppm"] == 3_000_000 // 4

    def test_ppm_exact(self, spark):
        from inception_eventstore_spark.operators.lm import kn_continuation

        out = kn_continuation(_docs(spark, ["a b", "a b", "c b"]), k=3)
        rows = {r["token"]: r for r in out.collect()}
        # N = 6 tokens; b count 3 -> p_uni = 500000
        assert rows["b"]["p_uni_ppm"] == 500_000
        # types: (a,b), (c,b) -> b continues 2 of 2 types
        assert rows["b"]["p_cont_ppm"] == 1_000_000

    def test_k_guard(self, spark):
        from inception_eventstore_spark.operators.lm import kn_continuation

        with pytest.raises(ValueError, match="k must be"):
            kn_continuation(_docs(spark, ["a b"]), k=0)


class TestRetrievalMap:
    def _queries(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, terms array<string>"
        )

    def test_perfect_ranking_ap_1(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            retrieval_map,
        )

        # only doc 1 contains both terms -> R=1, it ranks first -> AP=1
        docs = _docs(spark, [
            "apple banana apple banana",
            "apple apple apple",
            "cherry cherry",
        ])
        q = self._queries(spark, [(1, ["apple", "banana"])])
        row = retrieval_map(docs, q, k=5).collect()[0]
        assert row["n_rel"] == 1 and row["n_rel_topk"] == 1
        assert row["ap_ppm"] == 1_000_000

    def test_ap_exact_integer_form(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            retrieval_map,
        )

        # two relevant docs; check AP against the hand-computed value
        docs = _docs(spark, [
            "x y x y x y",          # relevant, high tf
            "x x x x x x x x",      # irrelevant (no y), strong on x
            "x y",                  # relevant, weak
            "z z z",                # irrelevant
        ])
        q = self._queries(spark, [(7, ["x", "y"])])
        row = retrieval_map(docs, q, k=5).collect()[0]
        assert row["n_rel"] == 2
        # recompute AP from the realized hit ranks exactly
        from inception_eventstore_spark.operators.retrieval import (
            bm25_multi_topk,
        )

        ranked = bm25_multi_topk(docs, q, k=5).orderBy("rank").collect()
        rel_ids = {1, 3}
        c, terms = 0, []
        for r in ranked:
            if r["doc_id"] in rel_ids:
                c += 1
                terms.append(Fraction(c, r["rank"]))
        ap = sum(terms) / min(2, 5)
        assert row["ap_ppm"] == (ap.numerator * 1_000_000) // ap.denominator

    def test_k_guard(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            retrieval_map,
        )

        with pytest.raises(ValueError, match="k must be"):
            retrieval_map(
                _docs(spark, ["a"]), self._queries(spark, [(1, ["a"])]),
                k=0,
            )


class TestModularity:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_two_cliques(self, spark):
        from inception_eventstore_spark.operators.graph import modularity

        # two triangles joined by one bridge: m = 7
        pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
            "node long, label long",
        )
        out = {r["label"]: r for r in
               modularity(self._edges(spark, pairs), labels).collect()}
        # community 1: nodes 1,2,3 degrees 2,2,3 -> d=7, m_intra=3
        assert out[1]["n_nodes"] == 3
        assert out[1]["degree_sum"] == 7
        assert out[1]["m_intra"] == 3
        assert out[1]["q_num"] == 4 * 7 * 3 - 49
        assert out[1]["q_den"] == 4 * 49
        # symmetric community
        assert out[4]["q_num"] == out[1]["q_num"]
        # Q = sum q_num / q_den = (35+35)/196 ~ 0.357 — positive split
        assert sum(r["q_num"] for r in out.values()) > 0

    def test_single_community_q_zero(self, spark):
        from inception_eventstore_spark.operators.graph import modularity

        # everything in one community: Q = m/m - (2m/2m)^2 = 0 exactly
        pairs = [(1, 2), (2, 3), (1, 3)]
        labels = spark.createDataFrame(
            [(1, 9), (2, 9), (3, 9)], "node long, label long"
        )
        rows = modularity(self._edges(spark, pairs), labels).collect()
        assert len(rows) == 1
        assert rows[0]["q_num"] == 0

    def test_directed_dedup(self, spark):
        from inception_eventstore_spark.operators.graph import modularity

        # duplicate + reversed + self-loop edges canonicalize away
        pairs = [(1, 2), (2, 1), (1, 2), (1, 1)]
        labels = spark.createDataFrame(
            [(1, 1), (2, 1)], "node long, label long"
        )
        rows = modularity(self._edges(spark, pairs), labels).collect()
        assert rows[0]["m_intra"] == 1 and rows[0]["q_den"] == 4


class TestConformalInterval:
    def test_coverage_guarantee_exact(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            conformal_interval,
        )

        events = spark.createDataFrame(
            [(i, "t", float(i % 97)) for i in range(4000)],
            "event_id long, event_type string, value double",
        )
        row = conformal_interval(events, alpha_ppm=100_000).collect()[0]
        assert row["n_cal"] > 0 and row["n_test"] > 0
        # q_rank is the exact ceil((n+1)*0.9) clamp
        expect = min(
            row["n_cal"], ((row["n_cal"] + 1) * 900_000 + 999_999) // 10**6
        )
        assert row["q_rank"] == expect
        # split-conformal guarantee: realized coverage near/above target
        # (exchangeable iid-ish fixture; allow small-sample slack)
        assert row["coverage_ppm"] >= 850_000
        assert row["target_ppm"] == 900_000

    def test_alpha_guard(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            conformal_interval,
        )

        events = spark.createDataFrame(
            [(1, "t", 1.0)], "event_id long, event_type string, value double"
        )
        with pytest.raises(ValueError, match="alpha_ppm"):
            conformal_interval(events, alpha_ppm=0)

    def test_degenerate_residuals_zero(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            conformal_interval,
        )

        # constant value -> all residuals 0 -> qhat 0, full coverage
        events = spark.createDataFrame(
            [(i, "t", 5.0) for i in range(400)],
            "event_id long, event_type string, value double",
        )
        row = conformal_interval(events).collect()[0]
        assert row["qhat_u"] == 0
        assert row["coverage_ppm"] == 1_000_000


class TestSignTestBh:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "grp string, d int, v long"
        )

    def test_monotone_group_rejected(self, spark):
        from inception_eventstore_spark.operators.profile import (
            sign_test_bh,
        )

        rows = []
        # group "up": strictly increasing over the window -> k_up = n
        # groups "f1".."f4": constant -> k_up = 0 -> p = 1
        for d in range(100, 121):
            rows.append(("up", d, 1000 + d))
            for g in ("f1", "f2", "f3", "f4"):
                rows.append((g, d, 500))
        out = sign_test_bh(
            self._df(spark, rows), "grp", "d", "v", horizon=21,
            q_ppm=50_000,
        ).collect()
        byg = {r["grp"]: r for r in out}
        n = 20
        assert byg["up"]["k_up"] == n and byg["up"]["p_num"] == 1
        assert byg["up"]["rank"] == 1 and byg["up"]["rejected"] == 1
        assert byg["f1"]["p_num"] == 2**n  # k_up = 0 -> full tail
        assert byg["f1"]["rejected"] == 0
        # BH math: p_1 = 1/2^20 <= (1/5)*0.05 -> rejected
        assert Fraction(1, 2**n) <= Fraction(1, 5) * Fraction(1, 20)

    def test_zero_fill_and_tail_exact(self, spark):
        from inception_eventstore_spark.operators.profile import (
            sign_test_bh,
        )

        # one group, data only on the last day: window zero-fills the
        # rest, so exactly ONE up-move -> p_num = tail at k=1
        out = sign_test_bh(
            self._df(spark, [("g", 50, 7)]), "grp", "d", "v",
            horizon=9,
        ).collect()[0]
        n = 8
        assert out["k_up"] == 1
        assert out["p_num"] == sum(comb(n, j) for j in range(1, n + 1))
        assert out["p_den"] == 2**n

    def test_guards(self, spark):
        from inception_eventstore_spark.operators.profile import (
            sign_test_bh,
        )

        df = self._df(spark, [("g", 1, 1)])
        with pytest.raises(ValueError, match="horizon"):
            sign_test_bh(df, "grp", "d", "v", horizon=64)
        with pytest.raises(ValueError, match="max_groups"):
            sign_test_bh(
                self._df(
                    spark, [(f"g{i}", 1, 1) for i in range(4)]
                ),
                "grp", "d", "v", horizon=5, max_groups=3,
            )


class TestHilbertIndex:
    @staticmethod
    def _xy2d(n, x, y):
        # the operator's nonnegative restatement: consumed bit dropped
        # by mod BEFORE the flip (bitwise variants go negative where
        # two's-complement & and div/mod disagree)
        d, s = 0, n // 2
        while s > 0:
            rx = (x // s) % 2
            ry = (y // s) % 2
            d += s * s * ((3 * rx) ^ ry)
            x %= s
            y %= s
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def test_exhaustive_grid_matches_reference(self, spark):
        from inception_eventstore_spark.sources.zorder import (
            with_hilbert_index,
        )

        n = 16
        grid = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)],
            "x long, y long",
        )
        got = {
            (r["x"], r["y"]): r["_h"]
            for r in with_hilbert_index(
                grid, F.col("x"), F.col("y"), bits=4
            ).collect()
        }
        pos = {}
        for (x, y), d in got.items():
            assert d == self._xy2d(n, x, y)
            pos[d] = (x, y)
        # defining Hilbert properties: bijection + unit Manhattan step
        assert sorted(pos) == list(range(n * n))
        assert all(
            abs(pos[d][0] - pos[d + 1][0])
            + abs(pos[d][1] - pos[d + 1][1]) == 1
            for d in range(n * n - 1)
        )

    def test_bits_guard(self, spark):
        from inception_eventstore_spark.sources.zorder import (
            with_hilbert_index,
        )

        df = spark.createDataFrame([(0, 0)], "x long, y long")
        with pytest.raises(ValueError, match="bits"):
            with_hilbert_index(df, F.col("x"), F.col("y"), bits=0)
