"""Tests for funnel / cohort-retention analytics (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from inception_eventstore_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
)


def _events(spark, rows):
    """rows: (user_id, event_type, day_offset)"""
    base = dt.datetime(2024, 1, 1)  # a Monday
    return spark.createDataFrame(
        [
            (u, t, base + dt.timedelta(days=d))
            for u, t, d in rows
        ],
        "user_id long, event_type string, ts timestamp",
    )


class TestFunnelSteps:
    def test_order_matters(self, spark):
        e = _events(spark, [
            (1, "signup", 0), (1, "click", 1), (1, "purchase", 2),
            (2, "signup", 0), (2, "purchase", 1), (2, "click", 2),  # buys early
            (3, "click", 0), (3, "purchase", 1),                    # no signup
        ])
        out = {
            r.step: r.users
            for r in funnel_steps(e, ["signup", "click", "purchase"]).collect()
        }
        # user 2 clicked after signup but never purchased after that click
        assert out == {"signup": 2, "click": 2, "purchase": 1}

    def test_same_timestamp_counts(self, spark):
        e = _events(spark, [(1, "signup", 0), (1, "click", 0)])
        out = {r.step: r.users for r in funnel_steps(e, ["signup", "click"]).collect()}
        assert out == {"signup": 1, "click": 1}  # >= is inclusive

    def test_empty_steps_rejected(self, spark):
        with pytest.raises(ValueError):
            funnel_steps(_events(spark, []), [])

    def test_repeated_step_needs_a_later_event(self, spark):
        e = _events(spark, [
            (1, "click", 0),                    # one click only
            (2, "click", 0), (2, "click", 3),   # two distinct clicks
        ])
        out = {(r.step_idx, r.users)
               for r in funnel_steps(e, ["click", "click"]).collect()}
        # user 1's single click must NOT satisfy both occurrences
        assert out == {(1, 2), (2, 1)}

    def test_no_cached_state_left_behind(self, spark):
        def n_cached() -> int:
            return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

        e = _events(spark, [(1, "signup", 0), (1, "click", 1)])
        before = n_cached()
        funnel_steps(e, ["signup", "click"]).collect()
        assert n_cached() == before

    def test_conversion_horizon(self, spark):
        e = _events(spark, [
            (1, "signup", 0), (1, "click", 2),    # converts within 3 days
            (2, "signup", 0), (2, "click", 10),   # too late for horizon
        ])
        tight = {r.step: r.users
                 for r in funnel_steps(e, ["signup", "click"],
                                       within="3 days").collect()}
        loose = {r.step: r.users
                 for r in funnel_steps(e, ["signup", "click"]).collect()}
        assert tight == {"signup": 2, "click": 1}
        assert loose == {"signup": 2, "click": 2}


class TestCohortRetention:
    def test_matrix(self, spark):
        e = _events(spark, [
            (1, "view", 0), (1, "view", 8),    # cohort W0, active W0+W1
            (2, "view", 7), (2, "view", 21),   # cohort W1, active W1+W3→offset 0,2
            (3, "view", 0),                    # cohort W0, only W0
        ])
        got = {
            (r.cohort_week.isoformat(), r.week_offset): r.users
            for r in cohort_retention(e).collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,  # users 1, 3
            ("2024-01-01", 1): 1,  # user 1
            ("2024-01-08", 0): 1,  # user 2
            ("2024-01-08", 2): 1,  # user 2 three weeks in
        }


class TestAbandonedAfter:
    def test_absence_semantics(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            abandoned_after,
        )

        t0 = dt.datetime(2024, 1, 1)

        def r(eid, minutes, user, et):
            return (eid, t0 + dt.timedelta(minutes=minutes), user, et)

        rows = [
            r(1, 0, 1, "view"),      # purchased at +30 → converted
            r(2, 30, 1, "purchase"),
            r(3, 100, 1, "view"),    # next purchase +300 > 1h → abandoned
            r(4, 300, 1, "purchase"),
            r(5, 0, 2, "view"),      # user 2 never purchases → abandoned
            r(6, 10, 3, "purchase"), # purchase BEFORE the view must not count
            r(7, 20, 3, "view"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        got = {(r["user_id"], r["event_id"]): r["next_then_ts"]
               for r in abandoned_after(df, "view", "purchase",
                                        within="1 hour").collect()}
        assert set(got) == {(1, 3), (2, 5), (3, 7)}
        assert got[(2, 5)] is None          # never followed up
        assert got[(1, 3)] is not None      # followed up, too late

    def test_same_instant_counts_as_followed(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            abandoned_after,
        )

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, t0, 1, "view"), (2, t0, 1, "purchase")],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        assert abandoned_after(df, "view", "purchase").count() == 0


class TestFunnelLatencyPercentiles:
    def _ev(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(i, u, t, t0 + dt.timedelta(seconds=s))
             for i, (u, t, s) in enumerate(rows)],
            "event_id long, user_id long, event_type string, ts timestamp",
        )

    def test_hand_computed_percentiles(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            funnel_latency_percentiles,
        )

        rows = []
        # 10 users: signup at 0, click at u+1 seconds (latencies 1..10)
        for u in range(10):
            rows.append((u, "a", 0))
            rows.append((u, "b", u + 1))
        out = funnel_latency_percentiles(
            self._ev(spark, rows), ["a", "b"]
        ).collect()
        assert len(out) == 1
        r = out[0]
        # p50 = 5th order statistic (rank ceil(10/2)=5) -> 5s;
        # p90 = rank 9 -> 9s
        assert r["n_users"] == 10
        assert r["p50_s"] == 5.0 and r["p90_s"] == 9.0

    def test_earliest_qualifying_times_used(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            funnel_latency_percentiles,
        )

        # user converts via the EARLIEST signup (t=0) and the earliest
        # click at-or-after it (t=2), not the later signup at t=5
        rows = [(1, "a", 0), (1, "a", 5), (1, "b", 2), (1, "b", 9)]
        r = funnel_latency_percentiles(
            self._ev(spark, rows), ["a", "b"]
        ).first()
        assert r["n_users"] == 1 and r["p50_s"] == 2.0

    def test_non_converters_absent(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            funnel_latency_percentiles,
        )

        # user 2 clicks BEFORE signing up -> no conversion row
        rows = [(1, "a", 0), (1, "b", 3), (2, "b", 0), (2, "a", 4)]
        out = funnel_latency_percentiles(
            self._ev(spark, rows), ["a", "b"]
        ).collect()
        assert out[0]["n_users"] == 1

    def test_step_guard(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            funnel_latency_percentiles,
        )

        with pytest.raises(ValueError):
            funnel_latency_percentiles(
                self._ev(spark, [(1, "a", 0)]), ["a"]
            )


class TestAttributionCredit:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )

    def test_linear_split_with_remainder_to_first(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            attribution_credit,
        )

        d = dt.datetime
        # user 1: view, click, view then purchase → n=3 touches
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 1, 10), 1, "view"),
                (2, d(2024, 1, 1, 11), 1, "click"),
                (3, d(2024, 1, 1, 12), 1, "view"),
                (4, d(2024, 1, 1, 13), 1, "purchase"),
            ],
        )
        out = {
            r["channel"]: r
            for r in attribution_credit(ev, "purchase").collect()
        }
        # 1000000 div 3 = 333333, remainder 1 → first touch (a view)
        assert out["view"]["linear_credit_ppm"] == 333333 * 2 + 1
        assert out["click"]["linear_credit_ppm"] == 333333
        assert out["view"]["first_touch"] == 1
        assert out["view"]["last_touch"] == 1
        assert out["click"]["first_touch"] == 0
        total = sum(r["linear_credit_ppm"] for r in out.values())
        assert total == 1000000

    def test_lookback_excludes_old_touches(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            attribution_credit,
        )

        d = dt.datetime
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 1), 1, "view"),      # 9 days before
                (2, d(2024, 1, 9), 1, "click"),     # 1 day before
                (3, d(2024, 1, 10), 1, "purchase"),
            ],
        )
        out = {
            r["channel"]: r
            for r in attribution_credit(
                ev, "purchase", lookback_days=7
            ).collect()
        }
        assert "view" not in out
        assert out["click"]["linear_credit_ppm"] == 1000000

    def test_touch_at_conversion_instant_excluded(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            attribution_credit,
        )

        d = dt.datetime
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 1, 12), 1, "view"),
                (2, d(2024, 1, 1, 12), 1, "purchase"),
            ],
        )
        assert attribution_credit(ev, "purchase").count() == 0

    def test_two_conversions_credit_independently(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            attribution_credit,
        )

        d = dt.datetime
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 1, 9), 1, "view"),
                (2, d(2024, 1, 1, 10), 1, "purchase"),
                (3, d(2024, 1, 1, 11), 1, "click"),
                (4, d(2024, 1, 1, 12), 1, "purchase"),
            ],
        )
        out = {
            r["channel"]: r
            for r in attribution_credit(ev, "purchase").collect()
        }
        # conv 2 sees [view]; conv 4 sees [view, click]
        assert out["view"]["linear_credit_ppm"] == 1000000 + 500000
        assert out["click"]["linear_credit_ppm"] == 500000
        assert out["view"]["first_touch"] == 2
        assert out["click"]["last_touch"] == 1

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.funnel import (
            attribution_credit,
        )

        ev = self._events(spark, [])
        with pytest.raises(ValueError):
            attribution_credit(ev, "purchase", lookback_days=0)


class TestKmSurvival:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )

    def test_textbook_km_with_censoring(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            km_survival,
        )

        d0 = dt.datetime(2024, 1, 1)

        def day(n, h=0):
            return d0 + dt.timedelta(days=n, hours=h)

        rows = []
        for u in range(1, 6):
            rows.append((u * 10, day(0), u, "signup"))
        rows += [
            (101, day(1), 1, "purchase"),
            (102, day(2), 2, "purchase"),
            (103, day(2), 3, "click"),      # u3 censored at day 2
            (104, day(4), 4, "purchase"),
            (105, day(5), 5, "click"),      # u5 censored at day 5
        ]
        out = km_survival(
            self._events(spark, rows), "signup", "purchase"
        ).collect()
        got = [
            (r["t_days"], r["n_risk"], r["n_events"], r["survival_ppb"])
            for r in sorted(out, key=lambda r: r["t_days"])
        ]
        # day 1: 5 at risk, 1 event → 4/5; day 2: 4 at risk (censored
        # u3 still at risk AT its censor day), 1 event → ×3/4; day 4:
        # 2 at risk, 1 event → ×1/2. Censor-only day 5 emits no row.
        assert got == [
            (1, 5, 1, 800000000),
            (2, 4, 1, 600000000),
            (4, 2, 1, 300000000),
        ]

    def test_event_before_signup_ignored(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            km_survival,
        )

        d = dt.datetime
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 5), 1, "signup"),
                (2, d(2024, 1, 2), 1, "purchase"),  # before signup
                (3, d(2024, 1, 8), 1, "click"),
            ],
        )
        out = km_survival(ev, "signup", "purchase").collect()
        assert out == []  # censored at day 3, no event day rows

    def test_user_without_start_excluded(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            km_survival,
        )

        d = dt.datetime
        ev = self._events(
            spark,
            [
                (1, d(2024, 1, 1), 1, "signup"),
                (2, d(2024, 1, 2), 1, "purchase"),
                (3, d(2024, 1, 1), 2, "purchase"),  # no signup: out
            ],
        )
        out = km_survival(ev, "signup", "purchase").collect()
        assert [(r["t_days"], r["n_risk"], r["survival_ppb"]) for r in out] == [
            (1, 1, 0)
        ]


class TestConversionWilsonCi:
    def test_known_interval(self, spark):
        import datetime as dt
        import math

        from inception_eventstore_spark.operators.funnel import (
            conversion_wilson_ci,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        # bucket 0 (single bucket): 4 users sign up, 1 converts
        for u in range(1, 5):
            eid += 1
            rows.append((eid, d0, u, "signup"))
        rows.append((99, d0 + dt.timedelta(hours=1), 1, "purchase"))
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        (r,) = conversion_wilson_ci(
            ev, "signup", "purchase", n_buckets=1
        ).collect()
        assert (r["n_users"], r["n_converted"]) == (4, 1)
        assert r["rate_ppm"] == 250000
        z = 1.959963984540054
        n, p, zz = 4.0, 0.25, z * z
        center = p + zz / (2 * n)
        margin = z * math.sqrt((p * (1 - p) + zz / (4 * n)) / n)
        denom = 1 + zz / n
        assert abs(r["wilson_lo"] - round((center - margin) / denom, 6)) < 1e-9
        assert abs(r["wilson_hi"] - round((center + margin) / denom, 6)) < 1e-9
        assert 0.0 <= r["wilson_lo"] <= 0.25 <= r["wilson_hi"] <= 1.0

    def test_zero_and_full_conversion_stay_in_bounds(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            conversion_wilson_ci,
        )

        d0 = dt.datetime(2024, 1, 1)
        # bucket 0: user 2 (no conversion); bucket 1: user 1 converts
        rows = [
            (1, d0, 1, "signup"),
            (2, d0, 2, "signup"),
            (3, d0 + dt.timedelta(hours=1), 1, "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        out = {
            r["bucket"]: r
            for r in conversion_wilson_ci(
                ev, "signup", "purchase", n_buckets=2
            ).collect()
        }
        assert out[0]["n_converted"] == 0
        assert out[0]["wilson_lo"] == 0.0 and out[0]["wilson_hi"] < 1.0
        assert out[1]["n_converted"] == 1
        assert out[1]["wilson_lo"] > 0.0 and out[1]["wilson_hi"] == 1.0

    def test_purchase_before_signup_not_converted(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            conversion_wilson_ci,
        )

        d0 = dt.datetime(2024, 1, 5)
        rows = [
            (1, d0, 1, "signup"),
            (2, d0 - dt.timedelta(days=1), 1, "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        (r,) = conversion_wilson_ci(
            ev, "signup", "purchase", n_buckets=1
        ).collect()
        assert r["n_converted"] == 0

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.funnel import (
            conversion_wilson_ci,
        )

        ev = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        with pytest.raises(ValueError):
            conversion_wilson_ci(ev, "a", "b", n_buckets=0)


class TestFrequentPaths:
    def test_sliding_paths_counted(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            frequent_paths,
        )

        d0 = dt.datetime(2024, 1, 1)

        def ev(i, u, t):
            return (i, d0 + dt.timedelta(minutes=i), u, t)

        rows = [
            ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "c"), ev(4, 1, "b"),
            ev(5, 2, "a"), ev(6, 2, "b"), ev(7, 2, "c"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        got = {
            r["path"]: r["n"]
            for r in frequent_paths(df, length=3, top_n=10).collect()
        }
        # user 1: a>b>c, b>c>b; user 2: a>b>c
        assert got == {"a>b>c": 2, "b>c>b": 1}

    def test_paths_never_cross_users(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            frequent_paths,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, d0, 1, "a"),
            (2, d0 + dt.timedelta(minutes=1), 2, "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        assert frequent_paths(df, length=2).count() == 0

    def test_tie_order_and_limit(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.funnel import (
            frequent_paths,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, d0, 1, "b"), (2, d0 + dt.timedelta(minutes=1), 1, "a"),
            (3, d0 + dt.timedelta(minutes=2), 1, "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        out = frequent_paths(df, length=2, top_n=1).collect()
        # a>b and b>a both count 1 → path asc picks a>b
        assert [(r["path"], r["n"]) for r in out] == [("a>b", 1)]

    def test_guards(self, spark):
        import pytest

        from inception_eventstore_spark.operators.funnel import (
            frequent_paths,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        with pytest.raises(ValueError):
            frequent_paths(df, length=1)
        with pytest.raises(ValueError):
            frequent_paths(df, top_n=0)


class TestMarkovStationary:
    def _events(self, spark, seq_per_user):
        import datetime as dt

        rows = []
        eid = 0
        d0 = dt.datetime(2024, 1, 1)
        for u, seq in seq_per_user.items():
            for i, t in enumerate(seq):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(minutes=i), u, t)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )

    def test_two_state_symmetric_chain(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            markov_stationary,
        )

        # a→b→a→b…: P = [[0,1],[1,0]]; uniform start stays (0.5, 0.5);
        # deterministic rows → row entropy 0
        ev = self._events(spark, {1: ["a", "b"] * 6})
        out = {
            r["state"]: r
            for r in markov_stationary(ev, iterations=10).collect()
        }
        assert out["a"]["stationary_p"] == 0.5
        assert out["b"]["stationary_p"] == 0.5
        assert out["a"]["row_entropy_nats"] == 0.0

    def test_absorbing_state_takes_all_mass(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            markov_stationary,
        )

        # a→a…→b, b→b…: b absorbs; after 20 iters π(b) ≈ 1
        ev = self._events(
            spark, {1: ["a"] * 3 + ["b"] * 20}
        )
        out = {
            r["state"]: r
            for r in markov_stationary(ev, iterations=20).collect()
        }
        assert out["b"]["stationary_p"] > 0.99
        assert out["a"]["stationary_p"] < 0.01

    def test_uniform_row_entropy(self, spark):
        import math

        from inception_eventstore_spark.operators.funnel import (
            markov_stationary,
        )

        # from a: equally to b or c (each twice) → H(a) = ln 2
        ev = self._events(
            spark, {1: ["a", "b", "a", "c"], 2: ["a", "b", "a", "c"]}
        )
        out = {
            r["state"]: r
            for r in markov_stationary(ev, iterations=5).collect()
        }
        assert out["a"]["row_entropy_nats"] == round(math.log(2), 6)

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.funnel import (
            markov_stationary,
        )

        ev = self._events(spark, {})
        with pytest.raises(ValueError):
            markov_stationary(ev, iterations=0)


class TestLogrankTest:
    def _fix(self, spark, shift_days):
        import datetime as dt

        rows = []
        for u in range(1, 41):
            t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
            rows.append((u, "signup", t0))
            d = 3 + (u % 5) + (shift_days if u % 2 == 1 else 0)
            rows.append(
                (u, "purchase", t0 + dt.timedelta(days=d))
            )
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    def test_identical_arms_near_zero(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            logrank_test,
        )

        r = logrank_test(self._fix(spark, 0), "signup", "purchase").first()
        assert r["n_arm1"] == 20 and r["n_arm0"] == 20
        assert r["o1"] == 20
        # arms share the exact event-time distribution → O ≈ E, |z| small
        assert abs(r["z_logrank"]) < 1.0

    def test_delayed_arm_negative_z(self, spark):
        from inception_eventstore_spark.operators.funnel import (
            logrank_test,
        )

        r = logrank_test(self._fix(spark, 30), "signup",
                         "purchase").first()
        # arm 1 purchases 30 days later: fewer observed arm-1 events
        # early while its at-risk share is high → O1 < E1, z < 0
        assert r["o1"] * (1 << 20) < r["e1_micro"]
        assert r["z_logrank"] < -3
