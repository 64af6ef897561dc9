"""Tests for the portable HLL / Count-Min sketches (operators/sketches.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import sketches as SK


class TestHLL:
    def test_raw_branch_accuracy_100k(self, spark):
        """100k distinct keys with m=512 registers leaves zero empty
        registers, so the RAW alpha*m^2/denom branch (not linear
        counting) produces the estimate. Theoretical RSD is
        1.04/sqrt(512) ~= 4.6%; the md5 hash is fixed, so the observed
        error is a constant — pin a 2-sigma envelope."""
        n = 100_000
        df = spark.range(n).select(F.col("id").alias("k"))
        row = SK.hll_distinct(df, "k", p=9).first()
        assert row["hll_zeros"] == 0  # raw branch, not linear counting
        assert 0.90 * n < row["hll_est"] < 1.10 * n

    def test_linear_counting_small(self, spark):
        """15 distinct keys in 512 registers: the small-range branch
        (m * ln(m / zeros)) engages and lands near the exact count."""
        df = spark.range(15).select(F.col("id").alias("k"))
        row = SK.hll_distinct(df, "k", p=9).first()
        assert row["hll_zeros"] == 512 - 15  # no register collisions here
        assert 13.0 < row["hll_est"] < 17.0

    def test_duplicates_do_not_move_registers(self, spark):
        """The sketch depends only on the distinct set: 10 copies of
        each key give byte-identical register state."""
        once = spark.range(1000).select(F.col("id").alias("k"))
        many = once.crossJoin(spark.range(10)).select("k")
        r1 = SK.hll_distinct(once, "k").first()
        r2 = SK.hll_distinct(many, "k").first()
        assert r1["hll_denom"] == r2["hll_denom"]
        assert r1["hll_est"] == r2["hll_est"]

    def test_oracle_parity_grouped(self, spark):
        """The DuckDB twin reproduces the register certificate and the
        estimate bit-for-bit on a grouped input."""
        rows = [(f"g{i % 3}", i % 37) for i in range(500)]
        df = spark.createDataFrame(rows, ["g", "k"])
        got = {
            r["g"]: (r["hll_denom"], r["hll_zeros"], r["hll_est"])
            for r in SK.hll_distinct(df, "k", ["g"]).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"('g{i % 3}', {i % 37})" for i in range(500))
            + ") v(g, k)"
        )
        sql = SK.hll_oracle_sql("SELECT g, k FROM t", "k", ["g"])
        want = {g: (d, z, e) for g, d, z, e in con.sql(sql).fetchall()}
        assert got == want

    def test_p_bounds(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            SK.hll_registers(df, "k", p=3)
        with pytest.raises(ValueError):
            SK.hll_registers(df, "k", p=13)


class TestCMS:
    def test_never_undercounts(self, spark):
        """CMS point estimates are >= the true count for EVERY key —
        the sketch's defining guarantee. A tiny 4x16 sketch over 200
        keys forces heavy collisions, so the property is non-vacuous."""
        df = spark.range(2000).select((F.col("id") % 200).alias("k"))
        exact = df.groupBy("k").agg(F.count("*").alias("n"))
        sk = SK.cms_sketch(df, "k", depth=4, width=16)
        est = SK.cms_estimate(sk, exact.select("k"), "k", depth=4, width=16)
        bad = (
            exact.join(est, "k")
            .where(F.col("cms_est") < F.col("n"))
            .count()
        )
        assert bad == 0
        # and with heavy collisions at least one key IS overcounted
        over = (
            exact.join(est, "k")
            .where(F.col("cms_est") > F.col("n"))
            .count()
        )
        assert over > 0

    def test_isolated_key_exact(self, spark):
        """With width >> keys, no collisions: estimates equal counts."""
        df = spark.range(300).select((F.col("id") % 3).alias("k"))
        sk = SK.cms_sketch(df, "k", depth=4, width=512)
        est = SK.cms_estimate(
            sk, df.select("k").distinct(), "k", depth=4, width=512
        )
        assert {r["cms_est"] for r in est.collect()} == {100}

    def test_absent_key_estimates_from_collisions_only(self, spark):
        """A key never inserted gets min-over-rows of whatever collided
        into its buckets — with a wide sketch that is 0."""
        df = spark.range(100).select(F.col("id").alias("k"))
        sk = SK.cms_sketch(df, "k", depth=4, width=4096)
        keys = spark.createDataFrame([(10_000_000,)], ["k"])
        est = SK.cms_estimate(sk, keys, "k", depth=4, width=4096)
        assert est.first()["cms_est"] == 0

    def test_oracle_parity(self, spark):
        df = spark.range(1000).select((F.col("id") % 50).alias("k"))
        sk = SK.cms_sketch(df, "k", depth=4, width=32)
        keys = df.select("k").distinct()
        got = {
            r["k"]: r["cms_est"]
            for r in SK.cms_estimate(sk, keys, "k", depth=4, width=32)
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT range % 50 AS k FROM range(0, 1000)"
        )
        sql = SK.cms_oracle_sql(
            "SELECT k FROM t", "k", "SELECT DISTINCT k FROM t", "k",
            depth=4, width=32,
        )
        want = dict(con.sql(sql).fetchall())
        assert got == want

    def test_param_bounds(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            SK.cms_sketch(df, "k", depth=0)
        with pytest.raises(ValueError):
            SK.cms_sketch(df, "k", width=1)


class TestSketchMerge:
    def test_hll_merge_equals_rebuild(self, spark):
        """Register-wise max over per-partition sketches == the sketch
        of the concatenated input, bit-for-bit — the matview property."""
        a = spark.range(0, 3000).select(F.col("id").alias("k"))
        b = spark.range(2000, 5000).select(F.col("id").alias("k"))  # overlap
        ra = SK.hll_registers(a, "k")
        rb = SK.hll_registers(b, "k")
        merged = SK.hll_estimate_from_registers(
            SK.hll_merge([ra, rb])
        ).first()
        rebuilt = SK.hll_distinct(a.union(b), "k").first()
        assert merged["hll_denom"] == rebuilt["hll_denom"]
        assert merged["hll_est"] == rebuilt["hll_est"]

    def test_hll_merge_idempotent(self, spark):
        df = spark.range(100).select(F.col("id").alias("k"))
        r = SK.hll_registers(df, "k")
        twice = SK.hll_estimate_from_registers(SK.hll_merge([r, r])).first()
        once = SK.hll_distinct(df, "k").first()
        assert twice["hll_denom"] == once["hll_denom"]

    def test_cms_merge_equals_rebuild(self, spark):
        a = spark.range(0, 500).select((F.col("id") % 40).alias("k"))
        b = spark.range(0, 700).select((F.col("id") % 55).alias("k"))
        merged = SK.cms_merge(
            [SK.cms_sketch(a, "k", width=32), SK.cms_sketch(b, "k", width=32)]
        )
        rebuilt = SK.cms_sketch(a.union(b), "k", width=32)
        got = {
            (r["row_id"], r["bucket"]): r["n"] for r in merged.collect()
        }
        want = {
            (r["row_id"], r["bucket"]): r["n"] for r in rebuilt.collect()
        }
        assert got == want

    def test_merge_guards(self, spark):
        import pytest

        with pytest.raises(ValueError):
            SK.hll_merge([])
        with pytest.raises(ValueError):
            SK.cms_merge([])


class TestBinnedQuantiles:
    def test_within_one_bin_width(self, spark):
        """Estimates land within one bin width of the exact quantile
        on a uniform grid."""
        n, bins = 10_000, 512
        df = spark.range(n).select((F.col("id") / 10.0).alias("v"))
        lo, hi = 0.0, (n - 1) / 10.0
        hist = SK.binned_histogram(df, "v", lo, hi, bins=bins)
        est = {
            r["q"]: r["est"]
            for r in SK.quantiles_from_histogram(
                hist, lo, hi, bins, [0.5, 0.9, 0.99]
            ).collect()
        }
        width = (hi - lo) / bins
        for q, e in est.items():
            exact = q * (n - 1) / 10.0
            assert abs(e - exact) <= width + 1e-9, (q, e, exact)

    def test_histograms_merge_by_counter_sum(self, spark):
        a = spark.range(0, 500).select((F.col("id") % 97).alias("v"))
        b = spark.range(0, 700).select((F.col("id") % 89).alias("v"))
        ha = SK.binned_histogram(a, "v", 0.0, 100.0, bins=64)
        hb = SK.binned_histogram(b, "v", 0.0, 100.0, bins=64)
        merged = (
            ha.unionByName(hb)
            .groupBy("bin")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )
        rebuilt = SK.binned_histogram(a.union(b), "v", 0.0, 100.0, bins=64)
        got = {r["bin"]: r["n"] for r in merged.collect()}
        want = {r["bin"]: r["n"] for r in rebuilt.collect()}
        assert got == want

    def test_out_of_range_values_clamp(self, spark):
        df = spark.createDataFrame(
            [(-5.0,), (0.5,), (99.0,)], ["v"]
        )
        rows = {
            r["bin"]: r["n"]
            for r in SK.binned_histogram(df, "v", 0.0, 10.0, bins=10)
            .collect()
        }
        assert rows[0] == 2 and rows[9] == 1  # -5 clamps low, 99 high

    def test_grouped_and_guards(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 9.0), ("b", 5.0)], ["g", "v"]
        )
        hist = SK.binned_histogram(
            df, "v", 0.0, 10.0, bins=10, group_cols=["g"]
        )
        out = SK.quantiles_from_histogram(
            hist, 0.0, 10.0, 10, [1.0], group_cols=["g"]
        )
        got = {(r["g"], r["q"]): r["n"] for r in out.collect()}
        assert got == {("a", 1.0): 2, ("b", 1.0): 1}
        with pytest.raises(ValueError):
            SK.binned_histogram(df, "v", 5.0, 5.0)
        with pytest.raises(ValueError):
            SK.quantiles_from_histogram(hist, 0, 10, 10, [])
        with pytest.raises(ValueError):
            SK.quantiles_from_histogram(hist, 0, 10, 10, [1.5])


class TestHllOverlap:
    def _sets(self, spark, a_vals, b_vals):
        a = spark.createDataFrame([(v,) for v in a_vals], ["v"])
        b = spark.createDataFrame([(v,) for v in b_vals], ["v"])
        return a, b

    def test_identical_sides(self, spark):
        from inception_eventstore_spark.operators import sketches as SK

        vals = [f"x{i}" for i in range(300)]
        a, b = self._sets(spark, vals, vals)
        r = SK.hll_overlap(a, b, "v", p=9).first()
        # union of identical registers IS each side's register table
        assert r["denom_union"] == r["denom_a"] == r["denom_b"]
        assert r["est_union"] == r["est_a"]
        assert r["est_intersection"] == r["est_a"]
        assert r["jaccard"] == 1.0

    def test_disjoint_and_half_overlap(self, spark):
        from inception_eventstore_spark.operators import sketches as SK

        a_vals = [f"a{i}" for i in range(400)]
        b_half = [f"a{i}" for i in range(200)] + [
            f"b{i}" for i in range(200)
        ]
        a, b = self._sets(spark, a_vals, b_half)
        r = SK.hll_overlap(a, b, "v", p=9).first()
        # true: |A|=400 |B|=400 |A∩B|=200 |A∪B|=600, J=1/3
        assert abs(r["est_intersection"] - 200) < 60
        assert abs(r["jaccard"] - 1 / 3) < 0.1
        d1, d2 = self._sets(
            spark, [f"l{i}" for i in range(250)],
            [f"r{i}" for i in range(250)],
        )
        r2 = SK.hll_overlap(d1, d2, "v", p=9).first()
        # disjoint: intersection estimate is noise, clamped at >= 0
        assert r2["est_intersection"] >= 0.0
        assert r2["est_intersection"] < 80
        assert abs(r2["est_union"] - 500) < 60

    def test_oracle_twin_matches(self, spark, tmp_path):
        import duckdb

        from inception_eventstore_spark.operators import sketches as SK

        a_vals = [f"u{i}" for i in range(150)]
        b_vals = [f"u{i}" for i in range(100, 260)]
        a, b = self._sets(spark, a_vals, b_vals)
        got = SK.hll_overlap(a, b, "v", p=8).first().asDict()
        sql = SK.hll_overlap_oracle_sql(
            "SELECT unnest(range(0, 150)) AS i",
            "SELECT unnest(range(100, 260)) AS i",
            "concat('u', CAST(i AS VARCHAR))",
            p=8,
        )
        want = duckdb.connect().execute(sql).fetchone()
        cols = [
            "denom_a", "denom_b", "denom_union", "est_a", "est_b",
            "est_union", "est_intersection", "jaccard",
        ]
        for c, w in zip(cols, want):
            assert got[c] == w, (c, got[c], w)


class TestKMV:
    def test_exact_when_below_k(self, spark):
        """Fewer than k distinct values: the sketch IS the value set
        and the estimate is the exact distinct count."""
        df = spark.range(40).select((F.col("id") % 17).alias("k"))
        row = SK.kmv_estimate(SK.kmv_sketch(df, "k", k=64), k=64).first()
        assert row["n_kept"] == 17
        assert row["kmv_est"] == 17

    def test_estimate_accuracy_20k(self, spark):
        """20k distinct keys, k=256: theoretical RSD ~1/sqrt(k-2)
        ~6.3%; the hash is fixed so the error is a constant — pin a
        ~2-sigma envelope."""
        n = 20_000
        df = spark.range(n).select(F.col("id").alias("k"))
        row = SK.kmv_estimate(
            SK.kmv_sketch(df, "k", k=256), k=256
        ).first()
        assert row["n_kept"] == 256
        assert 0.87 * n < row["kmv_est"] < 1.13 * n

    def test_duplicates_do_not_move_sketch(self, spark):
        once = spark.range(1000).select(F.col("id").alias("k"))
        many = once.crossJoin(spark.range(7)).select("k")
        r1 = SK.kmv_estimate(SK.kmv_sketch(once, "k")).first()
        r2 = SK.kmv_estimate(SK.kmv_sketch(many, "k")).first()
        assert r1["kth_hash"] == r2["kth_hash"]
        assert r1["kmv_est"] == r2["kmv_est"]

    def test_merge_equals_sketch_of_union(self, spark):
        """kmv_merge of two disjoint halves is bit-identical to the
        sketch of the union — the exactness property that makes the
        sketch shard-parallel at any scale."""
        a = spark.range(0, 5000).select(F.col("id").alias("k"))
        b = spark.range(5000, 10000).select(F.col("id").alias("k"))
        merged = SK.kmv_merge(
            [SK.kmv_sketch(a, "k", k=128), SK.kmv_sketch(b, "k", k=128)],
            k=128,
        )
        whole = SK.kmv_sketch(a.unionByName(b), "k", k=128)
        got = sorted(r["h"] for r in merged.collect())
        want = sorted(r["h"] for r in whole.collect())
        assert got == want

    def test_oracle_parity_grouped(self, spark):
        """DuckDB twin reproduces per-group estimates AND the merged
        __ALL__ row bit-for-bit."""
        rows = [(f"g{i % 3}", i % 97) for i in range(600)]
        df = spark.createDataFrame(rows, ["g", "k"])
        sk = SK.kmv_sketch(df, "k", ["g"], k=32)
        per = SK.kmv_estimate(sk, ["g"], k=32)
        got = {
            r["g"]: (r["n_kept"], r["kth_hash"], r["kmv_est"])
            for r in per.collect()
        }
        allrow = SK.kmv_estimate(SK.kmv_merge([sk], k=32), k=32).first()
        got["__ALL__"] = (
            allrow["n_kept"],
            allrow["kth_hash"],
            allrow["kmv_est"],
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"('g{i % 3}', {i % 97})" for i in range(600))
            + ") v(g, k)"
        )
        sql = SK.kmv_oracle_sql("SELECT g, k FROM t", "k", "g", k=32)
        want = {g: (n, kh, e) for g, n, kh, e in con.sql(sql).fetchall()}
        assert got == want

    def test_k_bound(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            SK.kmv_sketch(df, "k", k=1)


class TestHllSlidingDistinct:
    def _mk(self, spark, day_users):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, users in enumerate(day_users):
            for u in users:
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), u, "e", 1.0)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_window_merge_equals_rebuild(self, spark):
        """Each day's trailing-3-day sliding sketch is bit-identical to
        an HLL built from scratch on that window's raw rows — the
        merge==rebuild certificate, per window."""
        import datetime as dt

        day_users = [
            list(range(0, 40)),
            list(range(20, 70)),
            [],
            list(range(60, 90)),
            list(range(0, 10)),
        ]
        df = self._mk(spark, day_users)
        got = {
            r["day"]: (r["hll_denom"], r["hll_zeros"], r["hll_est"])
            for r in SK.hll_sliding_distinct(
                df, window_days=3
            ).collect()
        }
        d0 = dt.date(2024, 3, 1)
        for day_idx in (0, 1, 3, 4):
            window_users = set()
            for j in range(max(0, day_idx - 2), day_idx + 1):
                window_users |= set(day_users[j])
            raw = spark.createDataFrame(
                [(u,) for u in window_users], ["user_id"]
            )
            want = SK.hll_distinct(raw, "user_id").first()
            assert got[d0 + dt.timedelta(days=day_idx)] == (
                want["hll_denom"],
                want["hll_zeros"],
                want["hll_est"],
            )
        # day 2 (no own events) is not reported
        assert d0 + dt.timedelta(days=2) not in got

    def test_window_guard(self, spark):
        with pytest.raises(ValueError):
            SK.hll_sliding_distinct(self._mk(spark, [[1]]), window_days=0)
