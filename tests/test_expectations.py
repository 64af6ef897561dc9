"""Tests for declarative data-quality expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from inception_eventstore_spark.operators import expectations as X


class TestExpectations:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                Row(id=1, kind="a", v=5.0, tag="x1"),
                Row(id=2, kind="b", v=-3.0, tag="x2"),
                Row(id=2, kind="zz", v=None, tag="y9"),
                Row(id=None, kind="a", v=120.0, tag=None),
            ],
            "id long, kind string, v double, tag string",
        )

    def test_local_rules_counts(self, spark):
        got = {
            r.rule: r.n_violations
            for r in X.check(self._df(spark), [
                X.not_null("id"),
                X.accepted_values("kind", ["a", "b"]),
                X.in_range("v", 0, 100),
                X.matches("tag", "^x[0-9]$"),
            ]).collect()
        }
        assert got == {
            "not_null(id)": 1,
            "accepted_values(kind,[a,b])": 1,
            "in_range(v,0,100)": 2,   # -3 and 120; null exempt
            "matches(tag,^x[0-9]$)": 1,  # y9; null exempt
        }

    def test_unique_counts_extra_rows_only(self, spark):
        got = X.check(self._df(spark), [X.unique(["id"])]).collect()[0]
        assert got.n_violations == 1  # id=2 twice → one extra row

    def test_references_with_null_exemption(self, spark):
        dim = spark.createDataFrame([(1,), (2,)], "ref_id long")
        extra = spark.createDataFrame(
            [(9, "orphan")], "id long, kind string"
        )
        df = self._df(spark).select("id", "kind").unionByName(extra)
        got = X.check(df, [X.references(["id"], dim, ["ref_id"])]).collect()[0]
        assert got.n_violations == 1  # only id=9; null id exempt

    def test_all_green_and_order(self, spark):
        rules = [X.not_null("kind"), X.unique(["tag", "id"])]
        out = X.check(self._df(spark), rules).collect()
        assert [r.rule for r in out] == [r.label for r in rules]
        assert all(r.n_violations == 0 for r in out)

    def test_empty_rules_rejected(self, spark):
        with pytest.raises(ValueError):
            X.check(self._df(spark), [])
