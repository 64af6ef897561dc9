"""Tests for the r8 analytics family: chi-square independence,
Kruskal-Wallis, Spearman-on-midranks, IPW ATE, seasonal decomposition,
and the permutation test (operators/profile.py, timeseries.py,
sampling.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.profile import (
    chi_square_independence,
    ipw_ate,
    kruskal_wallis,
    spearman_user_corr,
)
from inception_eventstore_spark.operators.sampling import (
    permutation_pvalue,
)
from inception_eventstore_spark.operators.timeseries import (
    seasonal_decompose_daily,
)

TS = dt.datetime(2024, 1, 1, 12, 0)  # 2024-01-01 is a Monday


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )


class TestChiSquare:
    def test_known_contingency(self, spark):
        # 2 types x 2 weekdays, hand-checkable marginals
        rows, eid = [], 0
        for day, counts in ((0, {"a": 30, "b": 10}), (1, {"a": 10, "b": 30})):
            for typ, k in counts.items():
                for _ in range(k):
                    rows.append((eid, TS + dt.timedelta(days=day), 1, typ, 1.0))
                    eid += 1
        out = chi_square_independence(_ev(spark, rows)).collect()[0]
        assert (out.n, out.n_rows, out.n_cols, out.dof) == (80, 2, 2, 1)
        # python reference, identical micro-unit quantization
        n, su = 80, 0
        for o, rt, ct in ((30, 40, 40), (10, 40, 40), (10, 40, 40), (30, 40, 40)):
            d = float(o * n - rt * ct)
            su += math.floor(d * d / (float(n) * float(rt) * float(ct)) * 1048576.0)
        assert out.chi2 == pytest.approx(round(su / 1048576.0, 6), abs=1e-9)
        # 2x2 chi2 = n(ad-bc)^2 / (r1 r2 c1 c2) = 80*(800)^2/40^4 = 20
        assert out.chi2 == pytest.approx(20.0, abs=1e-4)
        assert out.cramers_v == pytest.approx(0.5, abs=1e-4)

    def test_independent_mix_is_zero(self, spark):
        rows, eid = [], 0
        for day in range(2):
            for typ, k in (("a", 20), ("b", 10)):
                for _ in range(k):
                    rows.append((eid, TS + dt.timedelta(days=day), 1, typ, 1.0))
                    eid += 1
        out = chi_square_independence(_ev(spark, rows)).collect()[0]
        assert out.chi2 == 0.0
        assert out.cramers_v == 0.0

    def test_empty_cell_contributes_expected_mass(self, spark):
        # type 'b' never occurs on day 1 -> zero-filled cell must add
        # its expected count to chi2 (grid, not just observed cells)
        rows, eid = [], 0
        for _ in range(10):
            rows.append((eid, TS, 1, "a", 1.0)); eid += 1
            rows.append((eid, TS + dt.timedelta(days=1), 1, "a", 1.0)); eid += 1
            rows.append((eid, TS, 1, "b", 1.0)); eid += 1
        out = chi_square_independence(_ev(spark, rows)).collect()[0]
        # o=0 cell: e = 10*10/30; contribution e = 10/3; full 2x2 chi2 = 7.5
        assert out.chi2 == pytest.approx(7.5, abs=1e-4)

    def test_single_category_dof_zero(self, spark):
        rows = [(i, TS + dt.timedelta(days=i % 3), 1, "a", 1.0)
                for i in range(9)]
        out = chi_square_independence(_ev(spark, rows)).collect()[0]
        assert out.dof == 0 and out.chi2 == 0.0
        assert out.cramers_v is None


def _kw_reference(samples: dict[str, list[float]]):
    """Scipy-free tie-corrected H with the operator's exact
    micro-unit quantization of each group's R^2/n term."""
    pooled = sorted(v for vs in samples.values() for v in vs)
    n = len(pooled)
    # midrank x2 per distinct value
    mid = {}
    below = 0
    for v in sorted(set(pooled)):
        t = pooled.count(v)
        mid[v] = 2 * below + t + 1
        below += t
    s_u = 0
    for vs in samples.values():
        rs = sum(mid[v] for v in vs)
        s_u += math.floor(float(rs) * float(rs) / (4.0 * float(len(vs))) * 1048576.0)
    tie = sum(pooled.count(v) ** 3 - pooled.count(v) for v in set(pooled))
    n_d = float(n)
    h = 12.0 * (float(s_u) / 1048576.0) / (n_d * (n_d + 1.0)) - 3.0 * (n_d + 1.0)
    return h / (1.0 - float(tie) / (n_d * n_d * n_d - n_d)), tie


class TestKruskalWallis:
    def _make(self, spark, samples):
        rows, eid = [], 0
        for g, vs in samples.items():
            for v in vs:
                rows.append((eid, TS, 1, g, float(v))); eid += 1
        return _ev(spark, rows)

    def test_matches_reference_with_ties(self, spark):
        samples = {
            "a": [1.0, 2.0, 2.0, 3.0, 5.0],
            "b": [2.0, 4.0, 4.0, 6.0],
            "c": [1.0, 1.0, 7.0, 8.0, 9.0, 9.0],
        }
        out = kruskal_wallis(self._make(spark, samples)).collect()
        href, tie = _kw_reference(samples)
        n = sum(len(v) for v in samples.values())
        assert len(out) == 3
        assert all(r.n == n and r.tie_sum == tie for r in out)
        assert out[0].h_tied == pytest.approx(round(href, 6), abs=1e-9)
        # rank sums over all groups total n(n+1) exactly
        assert sum(r.rank_sum_x2 for r in out) == n * (n + 1)
        got = {r.grp: r.n_g for r in out}
        assert got == {g: len(v) for g, v in samples.items()}

    def test_identical_groups_h_near_zero(self, spark):
        samples = {"a": [1.0, 2.0, 3.0, 4.0], "b": [1.0, 2.0, 3.0, 4.0]}
        out = kruskal_wallis(self._make(spark, samples)).collect()
        assert abs(out[0].h_tied) < 0.01

    def test_separated_groups_large_h(self, spark):
        samples = {"lo": [float(i) for i in range(10)],
                   "hi": [float(i + 100) for i in range(10)]}
        out = kruskal_wallis(self._make(spark, samples)).collect()
        assert out[0].h_tied > 10.0

    def test_empty_raises(self, spark):
        with pytest.raises(ValueError, match="no non-null rows"):
            kruskal_wallis(_ev(spark, []))


def _spearman_reference(xy):
    """Pearson on midranks, exact python ints until the final floats."""
    def midranks(vals):
        mid, below = {}, 0
        for v in sorted(set(vals)):
            t = vals.count(v)
            mid[v] = 2 * below + t + 1
            below += t
        return [mid[v] for v in vals]

    xs, ys = [p[0] for p in xy], [p[1] for p in xy]
    rx, ry = midranks(xs), midranks(ys)
    n = len(xy)
    s = n * (n + 1)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num, dx, dy = n * sxy - s * s, n * sxx - s * s, n * syy - s * s
    return float(num) / math.sqrt(float(dx) * float(dy))


class TestSpearman:
    def _make(self, spark, users):
        """users: list of (n_events, total_value)."""
        rows, eid = [], 0
        for u, (cnt, tot) in enumerate(users):
            each = tot / cnt
            for _ in range(cnt):
                rows.append((eid, TS, u, "click", each)); eid += 1
        return _ev(spark, rows)

    def test_perfect_monotone(self, spark):
        users = [(i + 1, float(10 * (i + 1))) for i in range(8)]
        out = spearman_user_corr(self._make(spark, users)).collect()[0]
        assert out.rho == pytest.approx(1.0, abs=1e-9)
        assert out.n == 8

    def test_reversed_monotone(self, spark):
        users = [(i + 1, float(100 - 10 * i)) for i in range(8)]
        out = spearman_user_corr(self._make(spark, users)).collect()[0]
        assert out.rho == pytest.approx(-1.0, abs=1e-9)

    def test_ties_match_reference(self, spark):
        # many users sharing event counts -> heavy x-ties
        users = [(2, 5.0), (2, 7.0), (3, 6.0), (3, 9.0), (5, 8.0),
                 (2, 11.0), (5, 4.0)]
        out = spearman_user_corr(self._make(spark, users)).collect()[0]
        xy = [(c, math.floor(t / c * 1048576.0) * c) for c, t in users]
        # per-user _y is the SUM of per-event floors
        xy = [(c, sum([math.floor(t / c * 1048576.0)] * c)) for c, t in users]
        ref = _spearman_reference(xy)
        assert out.rho == pytest.approx(round(ref, 6), abs=1e-9)
        # rank-sum identity the docstring promises
        n = out.n
        assert out.sxx >= 0 and out.n == len(users)

    def test_too_few_rows_raises(self, spark):
        with pytest.raises(ValueError, match="at least 2"):
            spearman_user_corr(self._make(spark, [(1, 5.0)]))


class TestIpwAte:
    def test_constant_effect_recovered(self, spark):
        # treated (odd users) purchase exactly 10 more than control
        # within every activity level -> ATE = 10, naive biased
        rows, eid = [], 0
        for u in range(40):
            level = (u // 2) % 4 + 1  # activity level, both arms in each
            for d in range(level):
                rows.append((eid, TS + dt.timedelta(days=d), u, "click", 1.0))
                eid += 1
            base = 5.0 * level
            y = base + (10.0 if u % 2 == 1 else 0.0)
            rows.append((eid, TS, u, "purchase", y)); eid += 1
        out = ipw_ate(_ev(spark, rows)).collect()[0]
        assert out.n_users == 40
        assert out.n_treated == 20 and out.n_control == 20
        assert out.ate == pytest.approx(10.0, abs=0.01)
        assert out.naive_diff == pytest.approx(10.0, abs=0.01)

    def test_empty_arm_strata_dropped(self, spark):
        # only even users (control) at the lowest activity level:
        # bottom strata have no treated arm and must be dropped
        rows, eid = [], 0
        for u in range(20):
            if u % 2 == 0:
                rows.append((eid, TS, u, "view", 1.0)); eid += 1
            else:
                for d in range(5):
                    rows.append(
                        (eid, TS + dt.timedelta(days=d), u, "click", 1.0))
                    eid += 1
                rows.append((eid, TS, u, "purchase", 7.0)); eid += 1
        out = ipw_ate(_ev(spark, rows)).collect()[0]
        assert out.n_strata_dropped > 0
        assert out.n_strata_used + out.n_strata_dropped == 10

    def test_ml_fit_path_runs(self, spark):
        rows, eid = [], 0
        for u in range(30):
            for d in range(u % 3 + 1):
                rows.append((eid, TS + dt.timedelta(days=d), u, "click", 1.0))
                eid += 1
            rows.append((eid, TS, u, "purchase", float(u % 5))); eid += 1
        out = ipw_ate(_ev(spark, rows), fit="ml").collect()[0]
        assert out.n_users == 30


class TestSeasonalDecompose:
    def _weekly(self, spark, weeks=6, amp=(9, 1, 2, 3, 4, 5, 6)):
        """Pure weekly signal: count for weekday w is amp[w]."""
        rows, eid = [], 0
        for d in range(weeks * 7):
            day = TS + dt.timedelta(days=d)
            w = d % 7  # TS is a Monday -> phase 0 == Monday
            for _ in range(amp[w]):
                rows.append((eid, day, 1, "view", 1.0)); eid += 1
        return _ev(spark, rows)

    def test_identity_and_pure_seasonal(self, spark):
        out = seasonal_decompose_daily(self._weekly(spark)).collect()
        assert len(out) == 6 * 7 - 6  # 3 edge days dropped each side
        mean_u = (9 + 1 + 2 + 3 + 4 + 5 + 6) * 1048576 // 7
        for r in out:
            # exact additive identity
            assert r.n_events * 1048576 == r.trend_u + r.seasonal_u + r.resid_u
            # pure periodic signal: trend is flat at the weekly mean
            assert r.trend_u == mean_u
            # residual is the truncating-div crumb, < 1 count
            assert abs(r.resid_u) < 1048576
        # seasonal for the Monday phase ~ (9 - 30/7) counts
        mon = [r for r in out if r.day.weekday() == 0]
        assert all(
            abs(r.seasonal_u - (9 * 1048576 - mean_u)) <= 7 for r in mon
        )

    def test_negative_seasonal_truncation_matches_python(self, spark):
        # weekday 1 is far BELOW trend -> negative detrended numerator
        out = seasonal_decompose_daily(self._weekly(spark)).collect()
        tue = [r for r in out if r.day.weekday() == 1]
        mean_u = 30 * 1048576 // 7
        det = 1 * 1048576 - mean_u  # negative
        n = len(tue)
        # python // floors; the engines truncate -> compare via int()
        total = det * n
        q = -((-total) // n) if total < 0 else total // n
        assert q == int(math.trunc(total / n))  # float/int cross-check
        assert all(r.seasonal_u == q for r in tue)

    def test_even_period_raises(self, spark):
        with pytest.raises(ValueError, match="odd"):
            seasonal_decompose_daily(self._weekly(spark), period=6)

    def test_empty_raises(self, spark):
        with pytest.raises(ValueError, match="no rows"):
            seasonal_decompose_daily(_ev(spark, []))


class TestPermutationPvalue:
    def _groups(self, spark, a_vals, b_vals):
        rows, eid = [], 0
        for v in a_vals:
            rows.append((eid, TS, 1, "click", float(v))); eid += 1
        for v in b_vals:
            rows.append((eid, TS, 1, "purchase", float(v))); eid += 1
        return _ev(spark, rows)

    def test_planted_effect_small_p(self, spark):
        df = self._groups(
            spark, [float(i) for i in range(40)],
            [float(i + 500) for i in range(40)],
        )
        out = permutation_pvalue(df, b=199).collect()[0]
        assert (out.n_a, out.n_b, out.b) == (40, 40, 199)
        assert out.t_obs == pytest.approx(-500.0, abs=1e-3)
        assert out.p_value == pytest.approx(1.0 / 200.0, abs=1e-9)
        assert out.n_extreme == 0

    def test_null_distribution_large_p(self, spark):
        vals = [float(i % 17) for i in range(60)]
        df = self._groups(spark, vals, list(reversed(vals)))
        out = permutation_pvalue(df, b=199).collect()[0]
        assert out.p_value > 0.5  # identical distributions

    def test_pvalue_never_zero_and_bounded(self, spark):
        df = self._groups(spark, [1.0, 2.0], [100.0, 200.0])
        out = permutation_pvalue(df, b=19).collect()[0]
        assert 0.0 < out.p_value <= 1.0

    def test_b_validation(self, spark):
        df = self._groups(spark, [1.0], [2.0])
        with pytest.raises(ValueError, match="b must be"):
            permutation_pvalue(df, b=5)


from inception_eventstore_spark.operators.histogram import (  # noqa: E402
    v_optimal_histogram,
)
from inception_eventstore_spark.operators.profile import (  # noqa: E402
    cochran_armitage,
)


def _brute_force_vopt(bins, k):
    """Enumerate every segmentation of the bin list; return the
    minimal total integer cost (the DP's optimality reference)."""
    import itertools

    n = len(bins)
    pc = [0] * (n + 1); ps = [0] * (n + 1); pss = [0] * (n + 1)
    for b, (c, s, ss) in enumerate(bins):
        pc[b + 1] = pc[b] + c; ps[b + 1] = ps[b] + s
        pss[b + 1] = pss[b] + ss

    def cost(i, j):
        c = pc[j + 1] - pc[i]
        if c == 0:
            return 0
        s = ps[j + 1] - ps[i]; ss = pss[j + 1] - pss[i]
        return ss * (1 << 20) - (s * s * (1 << 20)) // c

    best = None
    for splits in itertools.combinations(range(n - 1), k - 1):
        lo, tot = 0, 0
        for m in splits:
            tot += cost(lo, m); lo = m + 1
        tot += cost(lo, n - 1)
        if best is None or tot < best:
            best = tot
    return best


class TestVOptimalHistogram:
    def _df(self, spark, values):
        return spark.createDataFrame(
            [(float(v),) for v in values], "value double")

    def test_two_clusters_split_found(self, spark):
        vals = [1.0] * 50 + [1.1] * 40 + [9.0] * 30 + [9.2] * 20
        out = v_optimal_histogram(
            self._df(spark, vals), n_bins=8, k=2
        ).orderBy("seg").collect()
        assert len(out) == 2
        assert sum(r.n_rows for r in out) == 140
        # the split separates the clusters -> within-segment SSE tiny
        lo_seg, hi_seg = out
        assert lo_seg.n_rows == 90 and hi_seg.n_rows == 50
        # segments tile the bin axis
        assert lo_seg.lo_bucket == 0 and hi_seg.hi_bucket == 7
        assert hi_seg.lo_bucket == lo_seg.hi_bucket + 1

    def test_dp_is_optimal_vs_brute_force(self, spark):
        # irregular multimodal data, small enough to enumerate
        vals = ([0.1] * 7 + [0.5] * 3 + [2.0] * 9 + [2.2] * 4
                + [5.0] * 6 + [7.7] * 2 + [8.0] * 8 + [9.9] * 5)
        df = self._df(spark, vals)
        out = v_optimal_histogram(df, n_bins=8, k=3).orderBy("seg").collect()
        # rebuild the exact bin table the operator used
        import math as _m
        q = [_m.floor(v * 256.0) for v in vals]
        lo, hi = min(q), max(q)
        bins = [[0, 0, 0] for _ in range(8)]
        for x in q:
            b = min(7, (x - lo) * 8 // (hi - lo + 1))
            bins[b][0] += 1; bins[b][1] += x; bins[b][2] += x * x
        want = _brute_force_vopt([tuple(b) for b in bins], 3)
        got = 0
        for r in out:
            c, s = r.n_rows, r.sum_q
            i, j = r.lo_bucket, r.hi_bucket
            ss = sum(bins[b][2] for b in range(i, j + 1))
            got += 0 if c == 0 else ss * (1 << 20) - (s * s * (1 << 20)) // c
        assert got == want
        assert sum(r.n_rows for r in out) == len(vals)

    def test_constant_column_single_bucket(self, spark):
        out = v_optimal_histogram(
            self._df(spark, [3.5] * 25), n_bins=8, k=2
        ).collect()
        assert sum(r.n_rows for r in out) == 25
        assert all(r.sse_q == 0 for r in out)

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="2 <= k"):
            v_optimal_histogram(self._df(spark, [1.0]), n_bins=4, k=5)
        with pytest.raises(ValueError, match="no non-null"):
            v_optimal_histogram(self._df(spark, []), n_bins=4, k=2)


class TestCochranArmitage:
    def _users(self, spark, spec):
        """spec: list of (n_users, dose_days, converts: bool)."""
        rows, eid, uid = [], 0, 0
        for n_users, days, conv in spec:
            for _ in range(n_users):
                for d in range(days):
                    rows.append(
                        (eid, TS + dt.timedelta(days=d), uid, "view", 1.0))
                    eid += 1
                if conv:
                    rows.append((eid, TS, uid, "purchase", 9.0)); eid += 1
                uid += 1
        return _ev(spark, rows)

    def test_planted_trend_detected(self, spark):
        spec = []
        for dose in range(1, 6):
            conv = 4 * dose  # conversion rises with dose
            spec.append((conv, dose, True))
            spec.append((20 - conv, dose, False))
        out = cochran_armitage(self._users(spark, spec)).collect()[0]
        assert out.n_users == 100 and out.n_resp == 60
        assert out.z_ca > 3.0
        # exact integer reference on the dose table
        dosetab = [(d, 20, 4 * d) for d in range(1, 6)]
        n = sum(t[1] for t in dosetab); r = sum(t[2] for t in dosetab)
        swr = sum(d * ri for d, _, ri in dosetab)
        swn = sum(d * ni for d, ni, _ in dosetab)
        assert out.trend_num == n * swr - r * swn

    def test_flat_rate_small_z(self, spark):
        spec = []
        for dose in range(1, 6):
            spec.append((8, dose, True))
            spec.append((12, dose, False))
        out = cochran_armitage(self._users(spark, spec)).collect()[0]
        assert abs(out.z_ca) < 0.5
        assert out.trend_num == 0

    def test_reversed_trend_negative(self, spark):
        spec = []
        for dose in range(1, 6):
            conv = 4 * (6 - dose)
            spec.append((conv, dose, True))
            spec.append((20 - conv, dose, False))
        out = cochran_armitage(self._users(spark, spec)).collect()[0]
        assert out.z_ca < -3.0

    def test_degenerate_single_dose_null(self, spark):
        spec = [(10, 2, True), (10, 2, False)]
        out = cochran_armitage(self._users(spark, spec)).collect()[0]
        assert out.z_ca is None


from inception_eventstore_spark.operators.retrieval import (  # noqa: E402
    ql_dirichlet_topk,
)
from inception_eventstore_spark.operators.timeseries import (  # noqa: E402
    haar_energy_daily,
)


class TestQlDirichlet:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_matches_python_reference(self, spark):
        texts = [
            "spark merge window spark spark",
            "merge window merge table",
            "table key value store store store",
            "window window window",
        ]
        out = ql_dirichlet_topk(
            self._docs(spark, texts), ["spark", "merge"], k=4, mu=10.0
        ).collect()
        # driver-side reference with identical arithmetic
        toks = [t.split() for t in texts]
        sdl = sum(len(t) for t in toks)
        cf = {q: sum(t.count(q) for t in toks) for q in ("merge", "spark")}
        want = {}
        for i, t in enumerate(toks):
            s = 0.0
            for q in ("merge", "spark"):
                s += math.log(
                    (float(t.count(q)) + 10.0 * float(cf[q]) / float(sdl))
                    / (float(len(t)) + 10.0))
            want[i] = round(s, 6)
        got = {r.doc_id: r.score for r in out}
        assert got == pytest.approx(want, abs=1e-9)
        # doc 0 (both terms frequent, short) must win
        assert out[0].doc_id == 0

    def test_missing_terms_penalized_not_excluded(self, spark):
        texts = ["spark spark spark", "table key value"]
        out = {r.doc_id: r.score for r in ql_dirichlet_topk(
            self._docs(spark, texts), ["spark"], k=2, mu=5.0).collect()}
        assert set(out) == {0, 1}          # smoothing keeps doc 1 in
        assert out[0] > out[1]

    def test_zero_cf_terms_dropped(self, spark):
        texts = ["spark spark", "merge merge"]
        out = ql_dirichlet_topk(
            self._docs(spark, texts), ["spark", "nosuchterm"], k=2
        ).collect()
        assert len(out) == 2  # scores from 'spark' alone, no ln(0)

    def test_guards(self, spark):
        d = self._docs(spark, ["a"])
        with pytest.raises(ValueError, match="non-empty"):
            ql_dirichlet_topk(d, [])
        with pytest.raises(ValueError, match="mu must be"):
            ql_dirichlet_topk(d, ["a"], mu=0.0)


def _haar_reference(xs, levels):
    out = [(0, len(xs), sum(x * x for x in xs))]
    cur = list(xs)
    for lvl in range(1, levels + 1):
        a = cur[0::2]; b = cur[1::2]
        det = [x - y for x, y in zip(a, b)]
        cur = [x + y for x, y in zip(a, b)]
        out.append((lvl, len(det), sum(d * d for d in det)))
    return out


class TestHaarEnergy:
    def _daily(self, spark, counts):
        rows, eid = [], 0
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, TS + dt.timedelta(days=d), 1, "view", 1.0))
                eid += 1
        return _ev(spark, rows)

    def test_matches_python_pyramid(self, spark):
        counts = [5, 1, 4, 4, 9, 2, 6, 6, 3, 3, 8, 1, 0, 7, 2, 5,
                  1, 1, 2, 9, 4, 4, 4, 4, 0, 0, 5, 6, 7, 2, 3, 1]
        out = haar_energy_daily(self._daily(spark, counts)).collect()
        want = _haar_reference(counts, 5)
        got = [(r.level, r.n_coeffs, r.energy) for r in out]
        assert got == want

    def test_zero_padding_past_span(self, spark):
        counts = [3, 3, 3, 3]  # only 4 observed days -> 28 zero-pad
        out = haar_energy_daily(self._daily(spark, counts)).collect()
        want = _haar_reference(counts + [0] * 28, 5)
        assert [(r.level, r.n_coeffs, r.energy) for r in out] == want

    def test_constant_signal_detail_free(self, spark):
        out = haar_energy_daily(self._daily(spark, [4] * 32)).collect()
        for r in out:
            if r.level >= 1:
                assert r.energy == 0

    def test_alternating_signal_all_level1(self, spark):
        sig = [6, 0] * 16
        out = {r.level: r.energy
               for r in haar_energy_daily(self._daily(spark, sig)).collect()}
        assert out[1] == 16 * 36 and out[2] == 0 and out[5] == 0

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="no rows"):
            haar_energy_daily(_ev(spark, []))
        with pytest.raises(ValueError, match="levels"):
            haar_energy_daily(self._daily(spark, [1]), levels=0)


from inception_eventstore_spark.operators.linkage import (  # noqa: E402
    entity_clusters,
)
from inception_eventstore_spark.operators.timeseries import (  # noqa: E402
    changepoints_lsq,
)


class TestChangepointsLsq:
    def _daily(self, spark, counts):
        rows, eid = [], 0
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, TS + dt.timedelta(days=d), 1, "view", 1.0))
                eid += 1
        return _ev(spark, rows)

    def test_planted_regimes_recovered(self, spark):
        counts = [5] * 6 + [20] * 5 + [2] * 7
        out = changepoints_lsq(
            self._daily(spark, counts), k=3
        ).orderBy("seg").collect()
        assert [(r.lo_day, r.hi_day) for r in out] == [
            (0, 5), (6, 10), (11, 17)]
        assert [r.total for r in out] == [30, 100, 14]
        assert all(r.sse_q == 0 for r in out)  # constant regimes

    def test_dp_optimal_vs_brute_force(self, spark):
        counts = [3, 7, 1, 9, 9, 8, 2, 2, 3, 14, 13, 1]
        out = changepoints_lsq(self._daily(spark, counts), k=3).collect()
        bins = [(1, c, c * c) for c in counts]
        want = _brute_force_vopt(bins, 3)
        got = 0
        for r in out:
            seg = counts[r.lo_day: r.hi_day + 1]
            c, s, ss = len(seg), sum(seg), sum(x * x for x in seg)
            got += ss * (1 << 20) - (s * s * (1 << 20)) // c
        assert got == want
        assert sum(r.n_days for r in out) == len(counts)

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="no rows"):
            changepoints_lsq(_ev(spark, []))
        long = self._daily(spark, [1, 1])
        with pytest.raises(ValueError, match="max_span_days"):
            changepoints_lsq(long, max_span_days=1)


class TestEntityClusters:
    def _frames(self, spark, lefts, rights):
        L = spark.createDataFrame(
            [(i + 1, s) for i, s in enumerate(lefts)],
            "lid long, lname string")
        R = spark.createDataFrame(
            [(i + 1, s) for i, s in enumerate(rights)],
            "rid long, rname string")
        return L, R

    def test_chain_clustering_and_isolates(self, spark):
        # left 'anna' and left 'ana' both link to right 'ana' (dist
        # 1 / 0) -> one cluster; 'bob' stays isolated self-labeled
        L, R = self._frames(spark, ["anna", "bob", "ana"], ["ana"])
        out = {r.node: r.component for r in entity_clusters(
            L, R, "lname", "rname", "lid", "rid",
            right_id_offset=100).collect()}
        assert out == {1: 1, 2: 2, 3: 1, 101: 1}

    def test_offset_guard(self, spark):
        L, R = self._frames(spark, ["a"], ["a"])
        with pytest.raises(ValueError, match="right_id_offset"):
            entity_clusters(L, R, "lname", "rname", "lid", "rid",
                            right_id_offset=1)

    def test_all_nodes_present(self, spark):
        L, R = self._frames(
            spark, ["alpha", "beta", "gamma"], ["alpa", "betta", "zzz"])
        out = entity_clusters(
            L, R, "lname", "rname", "lid", "rid",
            right_id_offset=100).collect()
        assert len(out) == 6
        comp = {r.node: r.component for r in out}
        assert comp[101] == 1 and comp[102] == 2  # dist-1 matches
        assert comp[103] == 103                   # unmatched variant


from inception_eventstore_spark.operators.curation import (  # noqa: E402
    blocklist_hits,
    boilerplate_fraction,
)


class TestBoilerplateFraction:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_planted_boilerplate_scored(self, spark):
        footer = "subscribe now"
        texts = [f"unique line {i}\n{footer}\n  {footer}  " for i in range(12)]
        texts.append("all alone")
        out = {r.doc_id: r for r in boilerplate_fraction(
            self._docs(spark, texts), min_df=10).collect()}
        for i in range(12):
            # 3 lines, 2 are the common footer (trim-normalized)
            assert (out[i].n_lines, out[i].n_boiler) == (3, 2)
            assert out[i].boiler_ppm == 2 * 1000000 // 3
        assert (out[12].n_lines, out[12].n_boiler) == (1, 0)

    def test_within_doc_repeat_not_corpus_df(self, spark):
        # a line repeated 20x in ONE doc has df=1 -> not boilerplate
        texts = ["spam\n" * 20 + "tail", "other"]
        out = {r.doc_id: r for r in boilerplate_fraction(
            self._docs(spark, texts), min_df=2).collect()}
        assert out[0].n_boiler == 0

    def test_empty_lines_dropped(self, spark):
        texts = ["a\n\n  \nb", "c"]
        out = {r.doc_id: r for r in boilerplate_fraction(
            self._docs(spark, texts), min_df=2).collect()}
        assert out[0].n_lines == 2


class TestBlocklistHits:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_exact_token_matching(self, spark):
        texts = ["spam and ham and spam", "classic words only",
                 "SPAM shouted"]
        out = {r.doc_id: r for r in blocklist_hits(
            self._docs(spark, texts), ["spam", "ass"]).collect()}
        assert (out[0].n_tokens, out[0].n_hits) == (5, 2)
        assert out[0].hit_ppm == 2 * 1000000 // 5
        # 'classic' must NOT match blocklisted 'ass' (token, not substring)
        assert out[1].n_hits == 0
        # tokenizer lowercases
        assert out[2].n_hits == 1

    def test_empty_terms_raise(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            blocklist_hits(self._docs(spark, ["a"]), [])


from inception_eventstore_spark.operators.profile import (  # noqa: E402
    simpsons_check,
)
from inception_eventstore_spark.operators.timeseries import (  # noqa: E402
    holt_winters_daily,
)


def _hw_reference(xs, p=7, a=(1, 4), b=(1, 4), g=(1, 4)):
    def tdiv(x, y):
        q = abs(x) // abs(y)
        return q if (x >= 0) == (y >= 0) else -q

    an, ad = a; bn, bd = b; gn, gd = g
    Q = 1 << 20
    lvl = tdiv(sum(xs[:p]) * Q, p)
    trd = 0
    seas = [xs[i] * Q - lvl for i in range(p)]
    out = []
    for t in range(p, len(xs)):
        xq = xs[t] * Q
        s_used = seas[t % p]
        err = xq - (lvl + trd + s_used)
        new_l = tdiv(an * (xq - s_used) + (ad - an) * (lvl + trd), ad)
        new_b = tdiv(bn * (new_l - lvl) + (bd - bn) * trd, bd)
        new_s = tdiv(gn * (xq - new_l) + (gd - gn) * s_used, gd)
        lvl, trd = new_l, new_b
        seas[t % p] = new_s
        out.append((t, xs[t], lvl, trd, s_used, err))
    return out


class TestHoltWinters:
    def _daily(self, spark, counts):
        rows, eid = [], 0
        for d, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, TS + dt.timedelta(days=d), 1, "view", 1.0))
                eid += 1
        return _ev(spark, rows)

    def test_matches_python_recurrence(self, spark):
        counts = [4, 9, 2, 7, 5, 1, 8] * 3 + [6, 3, 2]
        out = holt_winters_daily(self._daily(spark, counts)).collect()
        want = _hw_reference(counts)
        got = [(r.day_index, r.n_events, r.level_micro, r.trend_micro,
                r.seasonal_micro, r.onestep_err_micro) for r in out]
        assert got == want

    def test_pure_weekly_signal_small_errors(self, spark):
        counts = [9, 1, 2, 3, 4, 5, 6] * 5
        out = holt_winters_daily(self._daily(spark, counts)).collect()
        # after init, a perfectly periodic signal forecasts itself:
        # one-step errors stay at the truncation-crumb scale
        late = [r for r in out if r.day_index >= 14]
        assert all(abs(r.onestep_err_micro) < (1 << 20) for r in late)

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="full period"):
            holt_winters_daily(self._daily(spark, [1, 1, 1]))
        with pytest.raises(ValueError, match="rationals"):
            holt_winters_daily(self._daily(spark, [1] * 20), alpha=(3, 2))


class TestSimpsonsCheck:
    def test_planted_reversal(self, spark):
        # weekday 0: a >> b;  weekday 1: a >> b ... but aggregate
        # flips because b-heavy mass sits on a high-value stratum.
        rows, eid = [], 0
        # stratum 0 (Monday): a=10, b=1 -> within-stratum gap positive
        for _ in range(10):
            rows.append((eid, TS, 1, "click", 10.0)); eid += 1
        rows.append((eid, TS, 1, "purchase", 9.0)); eid += 1
        # stratum 1: a=1 low value, b=10 high value; within-stratum
        # gap also positive (a=101 > b=100) but b mass dominates agg
        d1 = TS + dt.timedelta(days=1)
        rows.append((eid, d1, 1, "click", 101.0)); eid += 1
        for _ in range(10):
            rows.append((eid, d1, 1, "purchase", 100.0)); eid += 1
        out = simpsons_check(_ev(spark, rows)).collect()
        by = {r.stratum: r for r in out}
        assert by[0].gap_u > 0 and by[1].gap_u > 0
        # aggregate: mean_a = (100+101)/11 ~ 18.3; mean_b = 1009/11 ~ 91.7
        assert by[0].agg_gap_u < 0
        assert by[0].reversed == 1 and by[1].reversed == 1
        assert all(r.n_reversed == 2 for r in out)

    def test_consistent_data_no_reversal(self, spark):
        rows, eid = [], 0
        for day in range(3):
            d = TS + dt.timedelta(days=day)
            for _ in range(5):
                rows.append((eid, d, 1, "click", 10.0)); eid += 1
                rows.append((eid, d, 1, "purchase", 5.0)); eid += 1
        out = simpsons_check(_ev(spark, rows)).collect()
        assert all(r.reversed == 0 and r.n_reversed == 0 for r in out)
        assert all(r.gap_u == 5 * 1048576 for r in out)

    def test_empty_arm_stratum_null(self, spark):
        rows = [(0, TS, 1, "click", 3.0),
                (1, TS, 1, "purchase", 1.0),
                (2, TS + dt.timedelta(days=1), 1, "click", 4.0)]
        out = {r.stratum: r for r in simpsons_check(_ev(spark, rows)).collect()}
        assert out[1].gap_u is None and out[1].reversed == 0
