"""Round-10 operators: ANN recall audit, BPE merge learning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.similarity import (
    ann_recall_audit,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs, start=1)],
        "vec_id long, embedding array<double>",
    )


class TestAnnRecallAudit:
    def test_guards(self, spark):
        df = _emb(spark, [[0.0, 1.0]])
        with pytest.raises(ValueError, match="non-empty"):
            ann_recall_audit(df, [], centroids=[[0.0, 1.0]])
        with pytest.raises(ValueError, match="bounded-dial"):
            ann_recall_audit(
                df,
                [(i, [0.0, 1.0]) for i in range(65)],
                centroids=[[0.0, 1.0]],
            )
        with pytest.raises(ValueError, match="centroids"):
            ann_recall_audit(df, [(0, [0.0, 1.0])])

    def test_separable_corpus_full_recall(self, spark):
        # two tight 4-d clusters far apart: every strategy should
        # retrieve the query's own cluster perfectly at k = cluster
        # size, so all recalls are 1.0 — the audit's sanity fixed point
        a = [[1.0 + 0.01 * i, 0.0, 0.0, 0.0] for i in range(4)]
        b = [[0.0, 0.0, 0.0, 9.0 + 0.01 * i] for i in range(4)]
        corpus = _emb(spark, a + b)
        out = {
            r["strategy"]: r
            for r in ann_recall_audit(
                corpus,
                [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 0.0, 0.0, 9.0])],
                k=4,
                n_planes=4,
                probe_radius=1,
                centroids=[a[0], b[0]],
                n_probe=1,
            ).collect()
        }
        assert set(out) == {"lsh", "ivf", "sq8"}
        for name, r in out.items():
            assert r["n_queries"] == 2
            assert r["n_exact"] == 8
            assert r["n_hit"] == 8, name
            assert r["recall"] == 1.0, name

    def test_zero_probe_overlap_zero_recall(self, spark):
        # centroids chosen so the probed cell never holds the exact
        # neighbors -> ivf recall must be 0, not NULL/absent
        # every corpus point assigns to cell 1 (centroid [0.9, 0]),
        # but the query's nearest centroid is cell 0 — probing an
        # EMPTY cell must yield n_hit 0 / recall 0.0, not NULL/absent
        a = [[1.0, 0.0], [1.1, 0.0]]
        b = [[0.0, 9.0], [0.0, 9.1]]
        out = {
            r["strategy"]: r
            for r in ann_recall_audit(
                _emb(spark, a + b),
                [(7, [2.0, 0.0])],
                k=2,
                n_planes=2,
                probe_radius=0,
                centroids=[[2.1, 0.0], [0.9, 0.0]],
                n_probe=1,
            ).collect()
        }
        assert out["ivf"]["n_hit"] == 0
        assert out["ivf"]["recall"] == 0.0


class TestBpeLearnMerges:
    def test_run_parity_and_early_break(self, spark):
        # one word "aaaa" (freq 2): round 1 must count the (a,a) run
        # as 3 pairs/word and merge greedily at offsets 0 and 2
        # ("aa aa </w>", never "aa a a </w>"); round 4 has no pairs
        # left and the loop must stop at 3 rows
        from inception_eventstore_spark.operators.lm import (
            bpe_learn_merges,
        )

        docs = spark.createDataFrame(
            [(1, "aaaa aaaa")], "doc_id long, text string"
        )
        got = [
            (r["merge_rank"], r["sym_a"], r["sym_b"], r["pair_count"])
            for r in bpe_learn_merges(docs, n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == [
            (1, "a", "a", 6),
            (2, "aa", "</w>", 2),  # '</w>' < 'aa' in binary order
            (3, "aa", "aa</w>", 2),
        ]

    def test_guard(self, spark):
        from inception_eventstore_spark.operators.lm import (
            bpe_learn_merges,
        )

        docs = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            bpe_learn_merges(docs, n_merges=0)


class TestWilcoxonSignedRank:
    def test_hand_values(self, spark):
        import datetime as dt
        import math

        from inception_eventstore_spark.operators.profile import (
            wilcoxon_signed_rank,
        )

        t_pre = dt.datetime(2024, 1, 1, 0, 0, 0)
        t_post = dt.datetime(2024, 1, 2, 0, 0, 0)
        rows = [
            (1, t_pre, 1, "view", 1.0), (2, t_post, 1, "view", 3.0),
            (3, t_pre, 2, "view", 5.0), (4, t_post, 2, "view", 1.0),
            (5, t_pre, 3, "view", 1.0), (6, t_post, 3, "view", 7.0),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = wilcoxon_signed_rank(df).collect()[0]
        # |d| in 2^20 units: 2 (+), 4 (-), 6 (+): doubled avg ranks
        # 2/4/6, S2 = 2 + 6 = 8, no ties
        assert out.n_pairs == 3
        assert out.s2_pos == 8
        assert out.tie_cube == 0
        assert out.z_ppm == math.floor(4.0 / math.sqrt(56.0) * 1e6)

    def test_all_zero_diffs(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            wilcoxon_signed_rank,
        )

        t_pre = dt.datetime(2024, 1, 1, 0, 0, 0)
        t_post = dt.datetime(2024, 1, 2, 0, 0, 0)
        rows = [
            (1, t_pre, 1, "view", 2.0), (2, t_post, 1, "view", 2.0),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = wilcoxon_signed_rank(df).collect()[0]
        assert (out.n_pairs, out.z_ppm) == (0, None)


class TestNgramNovelty:
    def test_hand_counts(self, spark):
        from inception_eventstore_spark.operators.decontaminate import (
            ngram_novelty,
        )

        train = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        test = spark.createDataFrame(
            [(2, "b c d e")], "doc_id long, text string"
        )
        out = ngram_novelty(train, test, n=3).collect()[0]
        # train grams {abc, bcd}; test grams {bcd, cde}: one novel
        assert (
            out.n_train_grams,
            out.n_test_grams,
            out.n_novel,
            out.novelty,
        ) == (2, 2, 1, 0.5)

    def test_guard(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.decontaminate import (
            ngram_novelty,
        )

        d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            ngram_novelty(d, d, n=0)


class TestReadability:
    def test_hand_flesch(self, spark):
        import math

        from inception_eventstore_spark.operators.text import (
            readability_scores,
        )

        docs = spark.createDataFrame(
            [(1, "Hello world."), (2, "   ")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r for r in readability_scores(docs).collect()
        }
        r1 = rows[1]
        assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (2, 1, 3)
        f = 206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (3.0 / 2.0)
        assert r1.flesch_milli == math.floor(f * 1000.0)
        # whitespace-only doc: zero words -> NULL score
        r2 = rows[2]
        assert (r2.n_words, r2.flesch_milli) == (0, None)

    def test_vowelless_word_floor(self, spark):
        from inception_eventstore_spark.operators.text import (
            readability_scores,
        )

        docs = spark.createDataFrame(
            [(1, "psst 7th")], "doc_id long, text string"
        )
        r = readability_scores(docs).collect()[0]
        # 'psst' has no vowel group (floor 1), '7th' has none either
        assert r.n_syllables == 2


class TestHillTailIndex:
    def test_hand_fold(self, spark):
        import math

        from inception_eventstore_spark.operators.profile import (
            hill_tail_index,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate([8, 4, 2, 1, 1])],
            "id long, n long",
        )
        out = hill_tail_index(df, "n", k=2).collect()[0]
        hm = (math.log(8.0 / 2.0) + math.log(4.0 / 2.0)) / 2.0
        assert out.k == 2 and out.x_tail == 2
        assert out.hill_ppm == math.floor(hm * 1e6)
        assert out.alpha_ppm == math.floor(1e6 / hm)

    def test_too_few(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.profile import (
            hill_tail_index,
        )

        df = spark.createDataFrame([(1, 5)], "id long, n long")
        with _pytest.raises(ValueError, match="positive values"):
            hill_tail_index(df, "n", k=3)


class TestHhiConcentration:
    def test_hand_values(self, spark):
        from inception_eventstore_spark.operators.profile import (
            hhi_concentration,
        )

        rows = [("g", "m1")] * 3 + [("g", "m2")]
        df = spark.createDataFrame(rows, "grp string, member string")
        out = hhi_concentration(df, "grp", "member").collect()[0]
        assert (out.n_members, out.total) == (2, 4)
        assert out.hhi_ppm == 625000  # (9 + 1) / 16
        assert out.cr1_ppm == 750000

    def test_monopoly(self, spark):
        from inception_eventstore_spark.operators.profile import (
            hhi_concentration,
        )

        df = spark.createDataFrame(
            [("g", "m1")] * 5, "grp string, member string"
        )
        out = hhi_concentration(df, "grp", "member").collect()[0]
        assert out.hhi_ppm == 1000000 and out.cr1_ppm == 1000000


class TestPersonalizedPagerank:
    def test_two_cycle_from_seed(self, spark):
        from inception_eventstore_spark.operators.graph import (
            personalized_pagerank,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 1)], "src long, dst long"
        )
        r = {
            row["node"]: row["rank"]
            for row in personalized_pagerank(
                edges, seeds=[1], iterations=3
            ).collect()
        }
        assert abs(r[1] - 0.258375) < 1e-12
        assert abs(r[2] - 0.741625) < 1e-12

    def test_missing_seed_raises(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.graph import (
            personalized_pagerank,
        )

        edges = spark.createDataFrame(
            [(1, 2)], "src long, dst long"
        )
        with _pytest.raises(ValueError, match="absent"):
            personalized_pagerank(edges, seeds=[99])


class TestAalenJohansen:
    def test_hand_cif(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            aalen_johansen_cif,
        )

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        day = dt.timedelta(days=1)
        rows = [
            (1, t0, 1, "signup", 1.0), (2, t0 + day, 1, "purchase", 1.0),
            (3, t0, 2, "signup", 1.0), (4, t0 + day, 2, "error", 1.0),
            (5, t0, 3, "signup", 1.0), (6, t0 + 2 * day, 3, "click", 1.0),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = aalen_johansen_cif(
            df, start_type="signup", cause_a="purchase", cause_b="error"
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.t_days, r.n_risk, r.d_cause_a, r.d_cause_b) == (
            1, 3, 1, 1,
        )
        assert r.cif_a_ppb == 10**9 // 3
        assert r.cif_b_ppb == 10**9 // 3


class TestQuantilePinball:
    def test_hand_loss(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            quantile_forecast_eval,
        )

        # three Mondays with daily counts 1, 2, 10: the low 0.9-
        # quantile picks rank ceil(0.9*3)=3 -> forecast 10
        rows, eid = [], 0
        for day, cnt in ((1, 1), (8, 2), (15, 10)):
            for _ in range(cnt):
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 9), 1, "view", 1.0)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = quantile_forecast_eval(df).collect()[0]
        # losses vs f=10: (10-1)*1, (10-2)*1, 0 -> total 17
        assert (out.n_days, out.q_ppm) == (3, 900000)
        assert out.total_loss_x_den == 17
        assert out.mean_loss_x_den == 5

    def test_guard(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.timeseries import (
            quantile_forecast_eval,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
        )
        with _pytest.raises(ValueError):
            quantile_forecast_eval(df, q_num=10, q_den=10)


class TestSprtDaily:
    def test_hand_llr(self, spark):
        import datetime as dt
        import math

        from inception_eventstore_spark.operators.profile import sprt_daily

        rows, eid = [], 0
        for day, n, x in ((1, 10, 2), (2, 10, 8)):
            for i in range(n):
                t = "purchase" if i < x else "view"
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 9), 1, t, 1.0)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        out = {
            r["day"].isoformat(): r
            for r in sprt_daily(df, p0=0.2, p1=0.8).collect()
        }
        # mirror the operator's constants EXACTLY: 1.0 - 0.8 is not
        # the double 0.2, so log((1-p1)/(1-p0)) != log(p0/p1) here
        a = math.log(0.8 / 0.2)
        b = math.log((1.0 - 0.8) / (1.0 - 0.2))
        d1 = out["2024-01-01"]
        assert (d1.n_cum, d1.x_cum) == (10, 2)
        assert d1.llr_ppm == math.floor((2.0 * a + 8.0 * b) * 1e6)
        assert d1.decision == "h0"
        d2 = out["2024-01-02"]
        assert (d2.n_cum, d2.x_cum) == (20, 10)
        assert d2.llr_ppm == math.floor((10.0 * a + 10.0 * b) * 1e6)

    def test_guard(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.profile import sprt_daily

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
                "event_type string, value double",
        )
        with _pytest.raises(ValueError):
            sprt_daily(df, p0=0.3, p1=0.3)


class TestCaptureRecapture:
    def test_chapman_hand(self, spark):
        from inception_eventstore_spark.operators.profile import (
            capture_recapture,
        )

        a = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
        b = spark.createDataFrame([(2,), (3,), (4,)], "doc_id long")
        out = capture_recapture(a, b).collect()[0]
        assert (out.n_a, out.n_b, out.n_both) == (3, 3, 2)
        assert out.n_hat == (4 * 4) // 3 - 1  # = 4

    def test_disjoint_defined(self, spark):
        from inception_eventstore_spark.operators.profile import (
            capture_recapture,
        )

        a = spark.createDataFrame([(1,)], "doc_id long")
        b = spark.createDataFrame([(2,)], "doc_id long")
        out = capture_recapture(a, b).collect()[0]
        assert out.n_both == 0 and out.n_hat == 3


class TestGoodTuring:
    def test_hand_table(self, spark):
        from inception_eventstore_spark.operators.lm import (
            good_turing_counts,
        )

        docs = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        rows = {
            r["r"]: r for r in good_turing_counts(docs).collect()
        }
        assert set(rows) == {1, 2, 3}
        assert rows[1].r_star_u == 2 * 1048576      # (1+1)*N2/N1
        assert rows[2].r_star_u == 3 * 1048576      # (2+1)*N3/N2
        assert rows[3].r_star_u is None              # N4 = 0 tail
        assert rows[1].p0_ppm == 10**6 // 6


class TestIntervalJoin:
    def test_overlap_pairs(self, spark):
        from inception_eventstore_spark.operators.joins import (
            interval_join,
        )

        left = spark.createDataFrame(
            [(1, 0, 10), (2, 20, 30), (3, 50, 60)],
            "lid long, lo long, hi long",
        )
        right = spark.createDataFrame(
            [(7, 5, 25), (8, 100, 110)],
            "rid long, rlo long, rhi long",
        )
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, "lid", "rid",
                "lo", "hi", "rlo", "rhi", bucket_width=8,
            ).collect()
        )
        assert got == [(1, 7), (2, 7)]

    def test_touching_endpoints_closed(self, spark):
        from inception_eventstore_spark.operators.joins import (
            interval_join,
        )

        left = spark.createDataFrame([(1, 0, 10)], "lid long, lo long, hi long")
        right = spark.createDataFrame([(9, 10, 20)], "rid long, rlo long, rhi long")
        assert interval_join(
            left, right, "lid", "rid", "lo", "hi", "rlo", "rhi",
            bucket_width=4,
        ).count() == 1  # closed intervals: touching at 10 overlaps

    def test_fanout_guard(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.joins import (
            interval_join,
        )

        left = spark.createDataFrame(
            [(1, 0, 1000)], "lid long, lo long, hi long"
        )
        right = spark.createDataFrame(
            [(9, 1, 2)], "rid long, rlo long, rhi long"
        )
        with _pytest.raises(Exception, match="buckets"):
            interval_join(
                left, right, "lid", "rid", "lo", "hi", "rlo", "rhi",
                bucket_width=1, max_buckets=10,
            ).count()

    def test_inverted_interval_raises(self, spark):
        # ADVICE r10: lo > hi used to make F.sequence step downward
        # and silently emit pairs for a logically empty interval
        import pytest as _pytest

        from inception_eventstore_spark.operators.joins import (
            interval_join,
        )

        left = spark.createDataFrame(
            [(1, 10, 0)], "lid long, lo long, hi long"
        )
        right = spark.createDataFrame(
            [(9, 1, 2)], "rid long, rlo long, rhi long"
        )
        with _pytest.raises(Exception, match="inverted"):
            interval_join(
                left, right, "lid", "rid", "lo", "hi", "rlo", "rhi",
                bucket_width=4,
            ).count()
