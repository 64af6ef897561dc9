"""Deterministic sampling / splitting (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
    mix_corpora,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i}") for i in range(500)],
        "doc_id long, text string",
    )


class TestHashSplit:
    def test_total_and_disjoint(self, docs):
        s = hash_split(docs)
        counts = {r["split"]: r["n"] for r in
                  s.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 500
        assert set(counts) == {"train", "val", "test"}

    def test_proportions_in_binomial_range(self, docs):
        s = hash_split(docs)
        counts = {r["split"]: r["n"] for r in
                  s.groupBy("split").agg(F.count("*").alias("n")).collect()}
        # 500 draws at 0.8 / 0.1 / 0.1: ±5σ bounds
        assert 355 <= counts["train"] <= 445
        assert 20 <= counts["val"] <= 85
        assert 20 <= counts["test"] <= 85

    def test_deterministic_under_repartition(self, docs):
        a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs.repartition(7)).collect()
        }
        assert a == b

    def test_stable_under_corpus_growth(self, spark, docs):
        """Adding documents never reassigns an existing one."""
        bigger = docs.union(
            spark.createDataFrame(
                [(i, f"extra {i}") for i in range(10_000, 10_200)],
                "doc_id long, text string",
            )
        )
        a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(bigger).collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_weights_validated(self, docs):
        with pytest.raises(ValueError):
            hash_split(docs, weights={"a": 0.9, "b": 0.2})


class TestDeterministicSample:
    def test_nested_fractions(self, docs):
        small = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
        big = {r["doc_id"] for r in deterministic_sample(docs, 0.7).collect()}
        assert small <= big
        assert len(small) < len(big) < 500

    def test_boundary_fractions(self, docs):
        assert deterministic_sample(docs, 0.0).count() == 0
        assert deterministic_sample(docs, 1.0).count() == 500

    def test_bucket_range(self, docs):
        mx = docs.select(
            F.max(hash_bucket("doc_id")).alias("m"),
            F.min(hash_bucket("doc_id")).alias("n"),
        ).first()
        assert 0 <= mx["n"] and mx["m"] < 1_000_000


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def langs(self, spark):
        rows = [(i, f"doc {i}", ["en", "fr", "de", "es"][i % 4])
                for i in range(800)]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_per_stratum_rates(self, langs):
        out = stratified_hash_sample(
            langs, {"en": 1.0, "fr": 0.5, "de": 0.0}, default_rate=0.25
        )
        n = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert n["en"] == 200          # keep all
        assert "de" not in n           # drop all
        assert 60 <= n.get("fr", 0) <= 140   # ~100 of 200
        assert 20 <= n.get("es", 0) <= 80    # default 0.25 → ~50

    def test_nested_under_rate_increase(self, langs):
        lo = {r["doc_id"] for r in
              stratified_hash_sample(langs, {"en": 0.3}).collect()}
        hi = {r["doc_id"] for r in
              stratified_hash_sample(langs, {"en": 0.8}).collect()}
        assert lo <= hi

    def test_agrees_with_flat_sample_per_stratum(self, langs):
        """A stratum sampled at rate r contains exactly the ids
        deterministic_sample(r) keeps — same hash, same threshold."""
        strat = {r["doc_id"] for r in
                 stratified_hash_sample(langs, {"en": 0.4}).collect()}
        flat = {r["doc_id"] for r in
                deterministic_sample(
                    langs.where(F.col("lang") == "en"), 0.4
                ).collect()}
        assert strat == flat

    def test_rejects_bad_rates(self, langs):
        with pytest.raises(ValueError):
            stratified_hash_sample(langs, {"en": 1.5})
        with pytest.raises(ValueError):
            stratified_hash_sample(langs, {}, default_rate=-0.1)


class TestMixCorpora:
    def test_weighted_union_with_source_tags(self, spark, docs):
        other = spark.createDataFrame(
            [(i, f"web page {i}") for i in range(1000, 1500)],
            "doc_id long, text string",
        )
        mixed = mix_corpora([(docs, 1.0), (other, 0.2)])
        counts = {r["source"]: r["n"] for r in
                  mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts[0] == 500
        assert 50 <= counts[1] <= 160  # 500 draws at 0.2, ±5σ

    def test_growing_weight_only_adds(self, spark, docs):
        a = {r["doc_id"] for r in mix_corpora([(docs, 0.3)]).collect()}
        b = {r["doc_id"] for r in mix_corpora([(docs, 0.6)]).collect()}
        assert a <= b


class TestEpochShuffle:
    def test_reproducible_and_epoch_varying(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            epoch_shuffle_rank,
        )

        df = spark.createDataFrame(
            [(i,) for i in range(100)], "doc_id long"
        )
        e0a = {
            r["doc_id"]: r["shuffle_rank"]
            for r in epoch_shuffle_rank(df, epoch=0).collect()
        }
        e0b = {
            r["doc_id"]: r["shuffle_rank"]
            for r in epoch_shuffle_rank(df, epoch=0).collect()
        }
        e1 = {
            r["doc_id"]: r["shuffle_rank"]
            for r in epoch_shuffle_rank(df, epoch=1).collect()
        }
        assert e0a == e0b  # resumable: identical re-run
        assert e0a != e1   # different epoch → different permutation
        assert sorted(e0a.values()) == list(range(1, 101))
        # actually shuffled, not identity order
        assert [e0a[i] for i in range(100)] != list(range(1, 101))


class TestLengthBucketedBatches:
    def test_batches_are_homogeneous_and_full(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            length_bucketed_batches,
        )

        rows = [(i, 30 + (i % 3) * 300) for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        out = length_bucketed_batches(
            df, "n_tok", batch_size=8, bucket_edges=(64, 256, 512)
        ).collect()
        by_batch: dict = {}
        for r in out:
            by_batch.setdefault(r["batch_idx"], []).append(r)
        # every batch holds rows of ONE length bucket
        for rows_ in by_batch.values():
            assert len({r["len_bucket"] for r in rows_}) == 1
            assert len(rows_) <= 8
            assert sorted(r["pos_in_batch"] for r in rows_) == list(
                range(len(rows_))
            )
        # batch ids are globally dense 0..n-1
        assert sorted(by_batch) == list(range(len(by_batch)))
        # 3 buckets × 30 rows → 3 × ceil(30/8)=4 batches
        assert len(by_batch) == 12

    def test_overflow_bucket(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            length_bucketed_batches,
        )

        df = spark.createDataFrame(
            [(1, 50), (2, 5000)], "doc_id long, n_tok long"
        )
        got = {
            r["doc_id"]: r["len_bucket"]
            for r in length_bucketed_batches(
                df, "n_tok", 4, bucket_edges=(64, 128)
            ).collect()
        }
        assert got[1] == 0 and got[2] == 2  # beyond last edge → overflow


class TestWeightedSamplePerGroup:
    def test_k_per_group_and_flat_consistency(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.sampling import (
            weighted_sample,
            weighted_sample_per_group,
        )

        df = spark.range(300).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("grp"),
            (F.col("id") % 5 + 1).alias("w"),
        )
        out = weighted_sample_per_group(df, "w", k=10, group_col="grp")
        counts = {r["grp"]: r["n"] for r in
                  out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        assert counts == {"0": 10, "1": 10, "2": 10}
        # a group's sample equals the flat sample of that group alone
        only0 = df.where(F.col("grp") == "0")
        flat = {r["doc_id"] for r in
                weighted_sample(only0, "w", k=10, id_col="doc_id").collect()}
        grp0 = {r["doc_id"] for r in out.where(F.col("grp") == "0").collect()}
        assert grp0 == flat

    def test_guard(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.sampling import (
            weighted_sample_per_group,
        )

        df = spark.range(3).select(
            F.col("id").alias("doc_id"), F.lit("a").alias("g"),
            F.lit(1).alias("w")
        )
        with pytest.raises(ValueError):
            weighted_sample_per_group(df, "w", k=0, group_col="g")


class TestNegativeSampling:
    def test_distribution_and_determinism(self, spark):
        from collections import Counter

        from inception_eventstore_spark.operators.sampling import (
            negative_sampling_intervals,
            sample_negatives,
        )

        # 'common' 80x, 'rare' 20x → p ∝ 80^.75 : 20^.75 ≈ 2.83 : 1
        texts = [("common " * 4 + "rare").strip() for _ in range(20)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        iv = {r["token"]: (r["t_lo"], r["t_hi"])
              for r in negative_sampling_intervals(df).collect()}
        assert set(iv) == {"common", "rare"}
        # intervals tile [0, 2^60) exactly
        spans = sorted(iv.values())
        assert spans[0][0] == 0 and spans[-1][1] == 1 << 60
        assert spans[0][1] == spans[1][0]
        got = [r["token"] for r in sample_negatives(df, n=2000).collect()]
        c = Counter(got)
        assert len(got) == 2000
        ratio = c["common"] / c["rare"]
        assert 2.2 < ratio < 3.6  # ≈ (80/20)^0.75 = 2.83
        again = [r["token"] for r in sample_negatives(df, n=2000).collect()]
        assert got == again

    def test_every_sample_matched_once(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            sample_negatives,
        )

        df = spark.createDataFrame(
            [(0, "a b c d e f g")], ["doc_id", "text"]
        )
        rows = sample_negatives(df, n=500).collect()
        ids = [r["sample_id"] for r in rows]
        assert sorted(ids) == list(range(500))  # exactly one token each

    def test_guard(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            sample_negatives,
        )

        df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            sample_negatives(df, n=0)


class TestQualityDomainWeights:
    def _docs_scores(self, spark):
        docs = spark.createDataFrame(
            [(i, "good" if i < 4 else "bad") for i in range(10)],
            "doc_id long, lang string",
        )
        scores = spark.createDataFrame(
            [(i, -1.0 if i < 4 else -5.0) for i in range(10)],
            "doc_id long, lm_score double",
        )
        return docs, scores

    def test_weights_normalize_and_favor_quality(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            quality_domain_weights,
        )

        docs, scores = self._docs_scores(spark)
        rows = {r["lang"]: r for r in quality_domain_weights(
            docs, scores, eta=0.5).collect()}
        assert set(rows) == {"good", "bad"}
        total = rows["good"]["weight"] + rows["bad"]["weight"]
        assert total == pytest.approx(1.0, abs=2e-6)
        # natural shares are 0.4 / 0.6; quality tilt must push the
        # higher-scoring domain ABOVE its natural share
        assert rows["good"]["weight"] > 0.4
        assert rows["bad"]["weight"] < 0.6
        assert rows["good"]["n_docs"] == 4
        assert rows["good"]["mean_score"] == pytest.approx(-1.0)

    def test_eta_zero_gives_natural_shares(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            quality_domain_weights,
        )

        docs, scores = self._docs_scores(spark)
        rows = {r["lang"]: r["weight"] for r in quality_domain_weights(
            docs, scores, eta=0.0).collect()}
        assert rows["good"] == pytest.approx(0.4, abs=1e-6)
        assert rows["bad"] == pytest.approx(0.6, abs=1e-6)

    def test_unscored_docs_excluded(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            quality_domain_weights,
        )

        docs = spark.createDataFrame(
            [(0, "en"), (1, "en"), (2, "de")], "doc_id long, lang string"
        )
        scores = spark.createDataFrame(
            [(0, -2.0), (1, -3.0)], "doc_id long, lm_score double"
        )
        rows = {r["lang"]: r for r in quality_domain_weights(
            docs, scores).collect()}
        assert set(rows) == {"en"}  # de has no scored docs
        assert rows["en"]["weight"] == pytest.approx(1.0)


class TestTokenBudgetAllocation:
    def test_allocation_arithmetic(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            token_budget_allocation,
        )

        docs = spark.createDataFrame(
            [(0, "en", 100), (1, "en", 200), (2, "de", 50)],
            "doc_id long, lang string, n_tok long",
        )
        weights = spark.createDataFrame(
            [("en", 0.25), ("de", 0.75)], "lang string, weight double"
        )
        rows = {r["lang"]: r for r in token_budget_allocation(
            docs, weights, budget=100).collect()}
        # en: tot 300, target floor(0.25*100)=25 -> alloc 25, rate 25/300
        assert rows["en"]["tot_tok"] == 300
        assert rows["en"]["target_tok"] == 25
        assert rows["en"]["alloc_tok"] == 25
        assert rows["en"]["sample_rate"] == pytest.approx(25 / 300, abs=1e-6)
        # de: tot 50, target 75 -> UNDERSUPPLIED, alloc caps at 50, rate 1
        assert rows["de"]["target_tok"] == 75
        assert rows["de"]["alloc_tok"] == 50
        assert rows["de"]["sample_rate"] == 1.0

    def test_rejects_negative_budget(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            token_budget_allocation,
        )

        docs = spark.createDataFrame(
            [(0, "en", 1)], "doc_id long, lang string, n_tok long"
        )
        w = spark.createDataFrame([("en", 1.0)], "lang string, weight double")
        with pytest.raises(ValueError):
            token_budget_allocation(docs, w, budget=-1)


class TestGroupedKfold:
    def test_group_never_straddles_folds(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            grouped_kfold,
        )

        rows = [(i, i % 17) for i in range(500)]
        df = spark.createDataFrame(rows, ["row_id", "grp"])
        out = grouped_kfold(df, k=4, group_col="grp").collect()
        folds_per_group = {}
        for r in out:
            folds_per_group.setdefault(r["grp"], set()).add(r["fold"])
        assert all(len(s) == 1 for s in folds_per_group.values())
        assert {r["fold"] for r in out} <= {0, 1, 2, 3}

    def test_assignment_is_partitioning_independent(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            grouped_kfold,
        )

        rows = [(i, f"g{i % 23}") for i in range(200)]
        df = spark.createDataFrame(rows, ["row_id", "grp"])
        a = {r["row_id"]: r["fold"]
             for r in grouped_kfold(df, 5, "grp").collect()}
        b = {r["row_id"]: r["fold"]
             for r in grouped_kfold(df.repartition(7), 5, "grp").collect()}
        assert a == b

    def test_leakage_report_totals(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            kfold_leakage_report,
        )

        rows = [(i, i % 29) for i in range(300)]
        df = spark.createDataFrame(rows, ["row_id", "grp"])
        rep = kfold_leakage_report(df, k=3, group_col="grp").collect()
        assert sum(r["n_rows"] for r in rep) == 300
        assert sum(r["n_groups"] for r in rep) == 29
        assert all(r["leaked_groups"] == 0 for r in rep)

    def test_k_guard(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            grouped_kfold,
        )

        df = spark.createDataFrame([(1, 1)], ["row_id", "grp"])
        with pytest.raises(ValueError):
            grouped_kfold(df, k=1, group_col="grp")


class TestPoissonBootstrapCI:
    def _fixture(self, spark, n=2000):
        return spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).cast("double").alias("x"),
        )

    def test_ci_brackets_mean(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            poisson_bootstrap_ci,
        )

        row = poisson_bootstrap_ci(
            self._fixture(spark), "k", "x", b=64
        ).first()
        # true mean of id%100 over 2000 rows is 49.5; sd ~28.9, so the
        # 95% CI half-width ~ 1.96*28.9/sqrt(2000) ~ 1.27
        assert row["n_rows"] == 2000
        assert row["mean_full"] == 49.5  # integer inputs: micros exact
        assert row["ci_lo"] < row["mean_full"] < row["ci_hi"]
        assert row["ci_lo"] > 47.0 and row["ci_hi"] < 52.0
        assert abs(row["boot_median"] - row["mean_full"]) < 1.0

    def test_deterministic(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            poisson_bootstrap_ci,
        )

        df = self._fixture(spark, 500)
        a = poisson_bootstrap_ci(df, "k", "x", b=32).first()
        b = poisson_bootstrap_ci(
            df.repartition(7), "k", "x", b=32
        ).first()
        assert a.asDict() == b.asDict()

    def test_oracle_parity(self, spark):
        import duckdb

        from inception_eventstore_spark.operators.sampling import (
            poisson_bootstrap_ci,
            poisson_bootstrap_oracle_sql,
        )

        rows = [(i, float((i * 37) % 250) / 4.0) for i in range(300)]
        df = spark.createDataFrame(rows, ["k", "x"])
        got = poisson_bootstrap_ci(df, "k", "x", b=48).first().asDict()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({k}, {x})" for k, x in rows)
            + ") v(k, x)"
        )
        sql = poisson_bootstrap_oracle_sql(
            "SELECT k, x FROM t", "k", "x", b=48
        )
        cols = ["n_rows", "b", "mean_full", "boot_median", "ci_lo", "ci_hi"]
        want = dict(zip(cols, con.sql(sql).fetchone()))
        assert got == want

    def test_b_guard(self, spark):
        from inception_eventstore_spark.operators.sampling import (
            poisson_bootstrap_ci,
        )

        with pytest.raises(ValueError):
            poisson_bootstrap_ci(self._fixture(spark, 10), "k", "x", b=4)


class TestQuantileNormalize:
    def _run(self, spark, rows):
        from inception_eventstore_spark.operators.scoring import (
            quantile_normalize,
        )

        df = spark.createDataFrame(rows, "id long, g string, v long")
        return quantile_normalize(df, "v", "g", "id").collect()

    def test_groups_get_identical_distributions(self, spark):
        """Group a (values 0..9) and group b (100..109, shifted +100):
        after normalization both carry the SAME multiset — the even-
        rank global values (ceil(r·20/10) = 2r)."""
        rows = [(i, "a", i) for i in range(10)] + [
            (100 + i, "b", 100 + i) for i in range(10)
        ]
        out = self._run(spark, rows)
        glob = sorted([r[2] for r in rows])
        expect = sorted(glob[2 * r - 1] for r in range(1, 11))
        by_g: dict[str, list[int]] = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["v_qnorm"])
        assert sorted(by_g["a"]) == expect
        assert sorted(by_g["b"]) == expect

    def test_extremes_map_to_extremes(self, spark):
        rows = [(1, "a", 5), (2, "a", 50), (3, "b", 7), (4, "b", 9)]
        out = {r["id"]: r["v_qnorm"] for r in self._run(spark, rows)}
        # both group maxima map to the global max (rank N)
        assert out[2] == 50 and out[4] == 50

    def test_partitioning_invariant(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            quantile_normalize,
        )

        rows = [(i, f"g{i % 3}", (i * 37) % 101) for i in range(60)]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        a = sorted(
            tuple(r)
            for r in quantile_normalize(df, "v", "g", "id").collect()
        )
        b = sorted(
            tuple(r)
            for r in quantile_normalize(
                df.repartition(13), "v", "g", "id"
            ).collect()
        )
        assert a == b
