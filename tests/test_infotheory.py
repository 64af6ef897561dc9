"""Tests for mutual information / entropies (operators/infotheory.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.infotheory import (
    contingency_table,
    mutual_information,
)


def _mi(spark, rows):
    df = spark.createDataFrame(rows, ["x", "y"])
    return mutual_information(df, "x", "y").first()


class TestMutualInformation:
    def test_independent_is_zero(self, spark):
        rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
        r = _mi(spark, rows)
        assert abs(r["mi"]) < 1e-12
        assert abs(r["h_x"] - math.log(2)) < 1e-12
        assert abs(r["h_xy"] - math.log(4)) < 1e-12

    def test_deterministic_dependence_equals_entropy(self, spark):
        rows = [("a", "c")] * 50 + [("b", "d")] * 50
        r = _mi(spark, rows)
        assert abs(r["mi"] - math.log(2)) < 1e-12
        assert abs(r["h_xy"] - r["h_x"]) < 1e-12  # Y determined by X

    def test_identity_h_sum(self, spark):
        """I(X;Y) = H(X) + H(Y) − H(X,Y) — not assumed by the
        implementation (mi has its own direct sum), so it's a real
        cross-check of all four aggregates."""
        rows = (
            [("a", "c")] * 30
            + [("a", "d")] * 10
            + [("b", "c")] * 5
            + [("b", "d")] * 55
        )
        r = _mi(spark, rows)
        assert abs(r["mi"] - (r["h_x"] + r["h_y"] - r["h_xy"])) < 1e-12
        assert r["mi"] > 0

    def test_nulls_form_their_own_category(self, spark):
        rows = [("a", "c"), ("a", None), (None, "c"), (None, None)]
        r = _mi(spark, rows)
        assert r["n"] == 4 and r["n_x_values"] == 2 and r["n_y_values"] == 2

    def test_contingency_marginals(self, spark):
        df = spark.createDataFrame(
            [("a", "c"), ("a", "d"), ("b", "c")], ["x", "y"]
        )
        rows = {
            (r["x"], r["y"]): (r["n_xy"], r["n_x"], r["n_y"], r["n"])
            for r in contingency_table(df, "x", "y").collect()
        }
        assert rows[("a", "c")] == (1, 2, 2, 3)
        assert rows[("b", "c")] == (1, 1, 2, 3)


class TestCohensKappa:
    def test_textbook_2x2(self, spark):
        from inception_eventstore_spark.operators.infotheory import (
            cohens_kappa,
        )

        # [[20, 5], [10, 15]]: po = 0.7, pe = 0.5, kappa = 0.4
        rows = (
            [("a", "a")] * 20 + [("a", "b")] * 5
            + [("b", "a")] * 10 + [("b", "b")] * 15
        )
        df = spark.createDataFrame(rows, ["truth", "pred"])
        r = cohens_kappa(df, "truth", "pred").first()
        assert r["n"] == 50
        assert r["observed_agreement"] == 0.7
        assert r["expected_agreement"] == 0.5
        assert r["kappa"] == 0.4

    def test_perfect_and_degenerate(self, spark):
        from inception_eventstore_spark.operators.infotheory import (
            cohens_kappa,
        )

        df = spark.createDataFrame(
            [("a", "a"), ("b", "b"), ("c", "c")], ["t", "p"]
        )
        r = cohens_kappa(df, "t", "p").first()
        assert r["observed_agreement"] == 1.0 and r["kappa"] == 1.0
        # one label on both sides: pe = 1 -> kappa undefined (NULL)
        d2 = spark.createDataFrame([("a", "a")] * 4, ["t", "p"])
        r2 = cohens_kappa(d2, "t", "p").first()
        assert r2["expected_agreement"] == 1.0 and r2["kappa"] is None

    def test_disjoint_labels_zero_pe(self, spark):
        from inception_eventstore_spark.operators.infotheory import (
            cohens_kappa,
        )

        # prediction never emits a truth label: pe = 0, kappa = po = 0
        df = spark.createDataFrame(
            [("a", "x"), ("b", "y")], ["t", "p"]
        )
        r = cohens_kappa(df, "t", "p").first()
        assert r["expected_agreement"] == 0.0
        assert r["kappa"] == 0.0

    def test_null_category_agreement(self, spark):
        from inception_eventstore_spark.operators.infotheory import (
            cohens_kappa,
        )

        df = spark.createDataFrame(
            [(None, None), ("a", "a"), ("a", None), (None, "a")],
            ["t", "p"],
        )
        r = cohens_kappa(df, "t", "p").first()
        # NULL == NULL counts as agreement (eqNullSafe), po = 2/4
        assert r["observed_agreement"] == 0.5


class TestSourceTokenJs:
    def _run(self, spark, rows, **kw):
        from inception_eventstore_spark.operators.infotheory import (
            source_token_js,
        )

        df = spark.createDataFrame(rows, "source string, text string")
        return {
            (r["src_a"], r["src_b"]): r
            for r in source_token_js(df, "text", "source", **kw).collect()
        }

    def test_identical_sources_near_zero(self, spark):
        rows = [("a", "x y z x"), ("b", "x y z x")]
        got = self._run(spark, rows)
        assert got[("a", "b")]["js"] == 0.0

    def test_disjoint_sources_near_ln2(self, spark):
        """Disjoint vocabularies approach ln 2 from below (smoothing
        keeps the floor probability shared)."""
        rows = [("a", " ".join(["x"] * 100)), ("b", " ".join(["y"] * 100))]
        got = self._run(spark, rows)
        assert 0.6 < got[("a", "b")]["js"] < 0.693148

    def test_symmetry_and_pair_ordering(self, spark):
        rows = [("b", "x y"), ("a", "x z"), ("c", "y z")]
        got = self._run(spark, rows)
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert all(r["n_tokens"] == 3 for r in got.values())

    def test_smoothing_guard(self, spark):
        import pytest as _pt

        with _pt.raises(ValueError):
            self._run(spark, [("a", "x")], smoothing=0.0)
