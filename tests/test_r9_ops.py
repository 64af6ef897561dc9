"""Tests for the r9 additions: one-way ANOVA, Welch's t, McNemar,
Kendall τ-b on the day axis, Nelson-Aalen hazard, forecast accuracy,
Jelinek-Mercer retrieval, out-of-fold target encoding, and HITS
(operators/profile.py, funnel.py, timeseries.py, retrieval.py,
sampling.py, graph.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.profile import (
    anova_oneway,
    kendall_tau_daily,
    mcnemar_paired,
    welch_ttest,
)

TS = dt.datetime(2024, 1, 1, 12, 0)


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )


def _q(v: float) -> int:
    return math.floor(v * 1048576.0)


class TestAnova:
    def test_matches_textbook_f(self, spark):
        # three groups with clearly different means; values are exact
        # 2^-20-multiples so quantization is lossless and the classic
        # F formula applies exactly
        data = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0],
                "c": [7.0, 8.0, 9.0]}
        rows, eid = [], 0
        for g, vs in data.items():
            for v in vs:
                rows.append((eid, TS, eid, g, v))
                eid += 1
        out = anova_oneway(_ev(spark, rows)).collect()[0]
        assert (out.n_rows, out.k_groups) == (9, 3)
        # hand ANOVA: group means 2,5,8; grand 5; ssb=54; ssw=6
        # F = (54/2)/(6/6) = 27
        assert out.f_stat == pytest.approx(27.0, abs=1e-3)

    def test_identical_groups_f_zero(self, spark):
        rows = []
        for i, g in enumerate(("a", "b")):
            for j, v in enumerate((1.0, 2.0, 3.0)):
                rows.append((i * 10 + j, TS, i, g, v))
        out = anova_oneway(_ev(spark, rows)).collect()[0]
        assert abs(out.f_stat) < 1e-5

    def test_single_group_null(self, spark):
        rows = [(i, TS, i, "a", float(i)) for i in range(4)]
        out = anova_oneway(_ev(spark, rows)).collect()[0]
        assert out.k_groups == 1 and out.f_stat is None


class TestWelch:
    def test_matches_hand_formula(self, spark):
        a = [1.0, 2.0, 3.0, 4.0]
        b = [10.0, 12.0, 14.0, 16.0, 18.0]
        rows, eid = [], 0
        for v in a:
            rows.append((eid, TS, eid, "click", v)); eid += 1
        for v in b:
            rows.append((eid, TS, eid, "purchase", v)); eid += 1
        out = welch_ttest(_ev(spark, rows)).collect()[0]
        assert (out.n_a, out.n_b) == (4, 5)
        ma, mb = sum(a) / 4, sum(b) / 5
        va = sum((x - ma) ** 2 for x in a) / 3
        vb = sum((x - mb) ** 2 for x in b) / 4
        se2 = va / 4 + vb / 5
        t = (ma - mb) / math.sqrt(se2)
        df = se2 ** 2 / ((va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4)
        assert out.t_welch == pytest.approx(t, abs=1e-4)
        assert out.df_welch == pytest.approx(df, abs=1e-3)

    def test_degenerate_single_row_arm(self, spark):
        rows = [(0, TS, 0, "click", 1.0), (1, TS, 1, "purchase", 2.0),
                (2, TS, 2, "purchase", 3.0)]
        out = welch_ttest(_ev(spark, rows)).collect()[0]
        assert (out.n_a, out.n_b) == (1, 2)
        assert out.t_welch is None and out.df_welch is None


class TestMcNemar:
    def test_counts_and_statistic(self, spark):
        # 3 click-only, 1 purchase-only, 2 both, 1 neither-ish (view)
        rows, eid = [], 0
        for u in (1, 2, 3):
            rows.append((eid, TS, u, "click", 1.0)); eid += 1
        rows.append((eid, TS, 4, "purchase", 1.0)); eid += 1
        for u in (5, 6):
            rows.append((eid, TS, u, "click", 1.0)); eid += 1
            rows.append((eid, TS, u, "purchase", 1.0)); eid += 1
        rows.append((eid, TS, 7, "view", 1.0)); eid += 1
        out = mcnemar_paired(_ev(spark, rows)).collect()[0]
        assert (out.n_users, out.b_disc, out.c_disc) == (7, 3, 1)
        assert out.chi2_u == (2 * 2 * 1048576) // 4  # (3-1)^2/(3+1)

    def test_no_discordant_null(self, spark):
        rows = [(0, TS, 1, "view", 1.0), (1, TS, 2, "view", 1.0)]
        out = mcnemar_paired(_ev(spark, rows)).collect()[0]
        assert out.chi2_u is None


class TestKendall:
    def _series(self, spark, xs, ys):
        # xs[d] events on day d; ys[d] distinct users on day d
        rows, eid = [], 0
        for d, (x, y) in enumerate(zip(xs, ys)):
            assert y <= x
            for i in range(x):
                rows.append(
                    (eid, TS + dt.timedelta(days=d), i % y, "view", 1.0)
                )
                eid += 1
        return _ev(spark, rows)

    def test_perfect_concordance(self, spark):
        out = kendall_tau_daily(
            self._series(spark, [2, 4, 6, 8], [1, 2, 3, 4])
        ).collect()[0]
        assert (out.n_days, out.n_pairs) == (4, 6)
        assert (out.concordant, out.discordant) == (6, 0)
        assert out.tau_ppm == 1000000

    def test_perfect_discordance(self, spark):
        # x rises while y falls -> every pair discordant
        out = kendall_tau_daily(
            self._series(spark, [5, 6, 7, 8], [4, 3, 2, 1])
        ).collect()[0]
        assert (out.concordant, out.discordant) == (0, 6)
        assert out.tau_ppm == -1000000

    def test_ties_reduce_denominator(self, spark):
        # x = 4,4,6 (one tied x pair), y = 1,2,3
        out = kendall_tau_daily(
            self._series(spark, [4, 4, 6], [1, 2, 3])
        ).collect()[0]
        assert out.tie_x == 1 and out.tie_y == 0
        # nc = 2 (pairs with distinct x and y), nd = 0
        assert out.concordant == 2
        expect = math.floor(2e6 / math.sqrt((3 - 1) * 3.0))
        assert out.tau_ppm == expect


class TestNelsonAalen:
    def test_hand_hazard(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            nelson_aalen_hazard,
        )

        rows, eid = [], 0
        # users 1-4 sign up day 0; 1 purchases day 1, 2 purchases
        # day 2; 3 censored day 2 (last event), 4 censored day 3
        for u in (1, 2, 3, 4):
            rows.append((eid, TS, u, "signup", 1.0)); eid += 1
        rows.append((eid, TS + dt.timedelta(days=1), 1, "purchase", 1.0)); eid += 1
        rows.append((eid, TS + dt.timedelta(days=2), 2, "purchase", 1.0)); eid += 1
        rows.append((eid, TS + dt.timedelta(days=2), 3, "view", 1.0)); eid += 1
        rows.append((eid, TS + dt.timedelta(days=3), 4, "view", 1.0)); eid += 1
        out = {
            r.t_days: r
            for r in nelson_aalen_hazard(
                _ev(spark, rows), "signup", "purchase"
            ).collect()
        }
        assert set(out) == {1, 2}
        # day 1: 4 at risk, 1 event -> H = 10^9 // 4
        assert out[1].n_risk == 4
        assert out[1].hazard_ppb == 10**9 // 4
        # day 2: 3 at risk, 1 event -> H += 10^9 // 3
        assert out[2].n_risk == 3
        assert out[2].hazard_ppb == 10**9 // 4 + 10**9 // 3


class TestForecastAccuracy:
    def test_hand_mase(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            forecast_accuracy,
        )

        # 14 days: week 1 counts 1..7, week 2 counts 2..8 (each day
        # +1 vs the week before -> every seasonal error is 1;
        # day-over-day naive errors are 1 except the -4 jump at d7)
        counts = [1, 2, 3, 4, 5, 6, 7, 2, 3, 4, 5, 6, 7, 8]
        rows, eid = [], 0
        for d, c in enumerate(counts):
            for i in range(c):
                rows.append(
                    (eid, TS + dt.timedelta(days=d), i, "view", 1.0)
                )
                eid += 1
        out = forecast_accuracy(
            _ev(spark, rows), season_days=7
        ).collect()[0]
        assert (out.n_days, out.n_eval, out.n_naive) == (14, 7, 13)
        s7 = sum(abs(counts[d] - counts[d - 7]) for d in range(7, 14))
        s1 = sum(abs(counts[d] - counts[d - 1]) for d in range(1, 14))
        assert out.mase_ppm == (s7 * 13 * 10**6) // (s1 * 7)
        su = sum(
            (2 * abs(counts[d] - counts[d - 7]) * 1048576)
            // (counts[d] + counts[d - 7])
            for d in range(7, 14)
        )
        assert out.smape_mean_u == su // 7


class TestJelinekMercer:
    def test_reference_scores(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            ql_jelinek_mercer_topk,
        )

        docs = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"),
             (3, "durian durian")],
            "doc_id long, text string",
        )
        out = ql_jelinek_mercer_topk(
            docs, ["apple", "banana"], k=3, lam=0.2
        ).collect()
        corpus = {1: ["apple", "banana", "apple"],
                  2: ["banana", "cherry"], 3: ["durian", "durian"]}
        sdl = 7
        cf = {"apple": 2, "banana": 2}
        expect = {}
        for d, toks in corpus.items():
            s = 0.0
            for t in ("apple", "banana"):
                s += math.log(
                    0.8 * toks.count(t) / len(toks) + 0.2 * cf[t] / sdl
                )
            expect[d] = round(s, 6)
        got = {r.doc_id: r.score for r in out}
        for d in corpus:
            assert got[d] == pytest.approx(expect[d], abs=1e-6)
        # doc 1 must rank first
        assert out[0].doc_id == 1

    def test_zero_length_doc_participates(self, spark):
        from inception_eventstore_spark.operators.retrieval import (
            ql_jelinek_mercer_topk,
        )

        docs = spark.createDataFrame(
            [(1, "apple"), (2, "")], "doc_id long, text string"
        )
        out = ql_jelinek_mercer_topk(docs, ["apple"], k=5, lam=0.5)
        assert {r.doc_id for r in out.collect()} == {1, 2}


class TestTargetEncoding:
    def test_loo_by_fold_exact(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            grouped_kfold,
            target_encode_kfold,
        )

        rows = [(i, TS, i, "a", float(i)) for i in range(20)]
        df = _ev(spark, rows)
        enc = {
            (r.cat, r.fold): r
            for r in target_encode_kfold(
                df, "event_type", "value", k=3
            ).collect()
        }
        folds = {
            r.user_id: r.fold
            for r in grouped_kfold(df, 3, "user_id").collect()
        }
        import collections

        s = collections.Counter()
        n = collections.Counter()
        for i in range(20):
            s[folds[i]] += _q(float(i))
            n[folds[i]] += 1
        s_tot, n_tot = sum(s.values()), sum(n.values())
        for f in set(folds.values()):
            r = enc[("a", f)]
            assert r.n_in == n[f]
            assert r.n_out == n_tot - n[f]
            assert r.enc_u == (s_tot - s[f]) // (n_tot - n[f])

    def test_whole_category_in_one_fold_null(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            target_encode_kfold,
        )

        rows = [(0, TS, 42, "a", 1.0), (1, TS, 42, "a", 2.0)]
        out = target_encode_kfold(
            _ev(spark, rows), "event_type", "value", k=5
        ).collect()
        assert len(out) == 1 and out[0].enc_u is None


class TestHits:
    def test_hand_iteration(self, spark):
        from inception_eventstore_spark.operators.graph import hits_scores

        edges = spark.createDataFrame(
            [(1, 10), (2, 10), (2, 11), (3, 11)], "src long, dst long"
        )
        out = {
            r.node: r for r in hits_scores(edges, iterations=2).collect()
        }
        # python replica of the declared integer recurrence
        E = [(1, 10), (2, 10), (2, 11), (3, 11)]
        nodes = {1, 2, 3, 10, 11}
        deg = {n: 0 for n in nodes}
        for s, d in E:
            deg[s] += 1
            deg[d] += 1
        dmax = max(deg.values())
        h = {n: 1 << 30 for n in nodes}
        a = {}
        for _ in range(2):
            a = {n: 0 for n in nodes}
            for s, d in E:
                a[d] += h[s]
            a = {n: v // dmax for n, v in a.items()}
            h2 = {n: 0 for n in nodes}
            for s, d in E:
                h2[s] += a[d]
            h = {n: v // dmax for n, v in h2.items()}
        for n in nodes:
            assert out[n].hub_u == h[n], n
            assert out[n].auth_u == a[n], n
        # hub 2 points at both authorities -> strongest hub
        assert out[2].hub_u == max(r.hub_u for r in out.values())

    def test_max_degree_guard(self, spark):
        from inception_eventstore_spark.operators.graph import hits_scores

        with pytest.raises(ValueError, match="iterations"):
            hits_scores(
                spark.createDataFrame([(1, 2)], "src long, dst long"),
                iterations=0,
            )
