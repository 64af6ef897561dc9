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


class TestAssortativity:
    def test_star_perfectly_disassortative(self, spark):
        from inception_eventstore_spark.operators.graph import (
            assortativity,
        )

        edges = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "src long, dst long"
        )
        row = assortativity(edges).collect()[0]
        # K1,3: directed pairs (3,1)x3 + (1,3)x3
        assert row["m_directed"] == 6
        assert row["sum_x"] == 12
        assert row["sum_xx"] == 30
        assert row["sum_xy"] == 18
        assert row["r_assort"] == -1.0

    def test_regular_graph_degenerate(self, spark):
        from inception_eventstore_spark.operators.graph import (
            assortativity,
        )

        # 4-cycle: every degree 2 -> zero variance -> r NULL
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        row = assortativity(edges).collect()[0]
        assert row["r_assort"] is None


class TestKmvSetOps:
    def test_exact_regime(self, spark):
        from inception_eventstore_spark.operators.sketches import (
            kmv_set_ops,
        )

        a = spark.createDataFrame([(i,) for i in range(1, 11)], "v long")
        b = spark.createDataFrame([(i,) for i in range(6, 16)], "v long")
        row = kmv_set_ops(a, b, "v", k=64).collect()[0]
        # both sides < k: sketches ARE the sets, everything exact
        assert row["n_a"] == 10 and row["est_a"] == 10
        assert row["n_b"] == 10 and row["est_b"] == 10
        assert row["n_union"] == 15 and row["est_union"] == 15
        assert row["n_common"] == 5
        assert row["est_intersection"] == 5
        assert row["jaccard_ppm"] == 5_000_000 // 15

    def test_disjoint_zero_intersection(self, spark):
        from inception_eventstore_spark.operators.sketches import (
            kmv_set_ops,
        )

        a = spark.createDataFrame([(i,) for i in range(20)], "v long")
        b = spark.createDataFrame([(i,) for i in range(100, 120)], "v long")
        row = kmv_set_ops(a, b, "v", k=64).collect()[0]
        assert row["n_common"] == 0
        assert row["est_intersection"] == 0 and row["jaccard_ppm"] == 0

    def test_estimator_regime_plausible(self, spark):
        from inception_eventstore_spark.operators.sketches import (
            kmv_set_ops,
        )

        a = spark.createDataFrame([(i,) for i in range(3000)], "v long")
        b = spark.createDataFrame(
            [(i,) for i in range(1500, 4500)], "v long"
        )
        row = kmv_set_ops(a, b, "v", k=64).collect()[0]
        # ~1/sqrt(64) = 12.5% sketch error; generous envelope
        assert 2000 < row["est_a"] < 4500
        assert 3000 < row["est_union"] < 7000
        assert 600 < row["est_intersection"] < 3200


class TestCrostonDaily:
    def _events(self, spark, day_counts):
        import datetime as dt

        rows = []
        base = dt.datetime(2024, 1, 1)
        eid = 0
        for day, n in day_counts:
            for _ in range(n):
                rows.append((eid, base + dt.timedelta(days=day - 1)))
                eid += 1
        return spark.createDataFrame(rows, "event_id long, ts timestamp")

    def test_hand_recurrence(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            croston_daily,
        )

        q = 1 << 20
        out = croston_daily(
            self._events(spark, [(1, 2), (4, 6)])
        ).orderBy("day_index").collect()
        assert [r["day_index"] for r in out] == [1, 4]
        r1, r2 = out
        assert r1["z_micro"] == 2 * q and r1["p_micro"] == q
        assert r1["f_ppm"] == 2_000_000
        # t=4: gap 3: z = 2q + (6q-2q)//4 = 3q; p = q + (3q-q)//4 = 1.5q
        assert r2["z_micro"] == 3 * q
        assert r2["p_micro"] == q + q // 2
        assert r2["f_ppm"] == (3 * q * 1_000_000) // (q + q // 2)

    def test_guards(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            croston_daily,
        )

        with pytest.raises(ValueError, match="demand days"):
            croston_daily(self._events(spark, [(1, 3)]))
        with pytest.raises(ValueError, match="alpha"):
            croston_daily(
                self._events(spark, [(1, 1), (2, 1)]), alpha=(5, 4)
            )


class TestGainsTable:
    def test_separable_scores(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            gains_table,
        )

        # 20 rows, scores 20..1; the 10 best-scored are the responders
        df = spark.createDataFrame(
            [(i, float(20 - i), 1 if i < 10 else 0) for i in range(20)],
            "k long, s double, y long",
        )
        rows = gains_table(df, "s", "y", "k", n_buckets=10).collect()
        assert [r["bucket"] for r in rows] == list(range(10))
        assert all(r["n"] == 2 for r in rows)
        assert [r["resp"] for r in rows] == [2] * 5 + [0] * 5
        # top bucket: lift = (2/2) / (10/20) = 2x exactly
        assert rows[0]["cum_lift_ppm"] == 2_000_000
        assert rows[0]["rate_ppm"] == 1_000_000
        # through bucket 4 every responder is captured
        assert rows[4]["cum_capture_ppm"] == 1_000_000
        # full population: lift 1x by construction
        assert rows[9]["cum_lift_ppm"] == 1_000_000

    def test_bucket_guard(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            gains_table,
        )

        df = spark.createDataFrame([(1, 1.0, 1)], "k long, s double, y long")
        with pytest.raises(ValueError, match="n_buckets"):
            gains_table(df, "s", "y", "k", n_buckets=1)


class TestWassersteinBinned:
    def test_point_masses_exact_distance(self, spark):
        from inception_eventstore_spark.operators.profile import (
            wasserstein_binned,
        )

        a = spark.createDataFrame([(0.0,)] * 100, "v double")
        b = spark.createDataFrame([(10.0,)] * 100, "v double")
        row = wasserstein_binned(a, b, "v", lo=0.0, hi=16.0, bins=16)
        r = row.collect()[0]
        # masses 10 bins apart: W1 = 10 bin units exactly
        assert r["n_a"] == 100 and r["n_b"] == 100
        assert r["w1_bin_ppm"] == 10_000_000

    def test_identical_zero(self, spark):
        from inception_eventstore_spark.operators.profile import (
            wasserstein_binned,
        )

        a = spark.createDataFrame(
            [(float(i % 7),) for i in range(50)], "v double"
        )
        r = wasserstein_binned(a, a, "v", lo=0.0, hi=8.0, bins=8)
        assert r.collect()[0]["w1_bin_ppm"] == 0

    def test_guards(self, spark):
        from inception_eventstore_spark.operators.profile import (
            wasserstein_binned,
        )

        a = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="hi > lo"):
            wasserstein_binned(a, a, "v", lo=1.0, hi=1.0)
        with pytest.raises(ValueError, match="bins"):
            wasserstein_binned(a, a, "v", lo=0.0, hi=1.0, bins=1)
