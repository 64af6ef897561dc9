from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import filtering as FL


def _df(spark):
    rows = [Row(g="a", v=float(i)) for i in range(1, 11)] + [
        Row(g="b", v=float(10 * i)) for i in range(1, 5)
    ]
    return spark.createDataFrame(rows, "g string, v double")


class TestQuantileFilter:
    def test_thresholds_are_exact_interpolated(self, spark):
        thr = {
            r.g: r.threshold
            for r in FL.group_quantiles(_df(spark), "v", "g", 0.5).collect()
        }
        # a: 1..10 → median 5.5; b: 10,20,30,40 → median 25
        assert thr == {"a": 5.5, "b": 25.0}

    def test_keep_above(self, spark):
        kept = FL.quantile_threshold_filter(_df(spark), "v", "g", 0.5)
        got = sorted((r.g, r.v) for r in kept.collect())
        assert got == [("a", 6.0), ("a", 7.0), ("a", 8.0), ("a", 9.0),
                       ("a", 10.0), ("b", 30.0), ("b", 40.0)]

    def test_keep_below(self, spark):
        kept = FL.quantile_threshold_filter(
            _df(spark), "v", "g", 0.5, keep="below"
        )
        assert kept.where(F.col("g") == "b").count() == 2

    def test_bad_keep_raises(self, spark):
        with pytest.raises(ValueError):
            FL.quantile_threshold_filter(_df(spark), "v", "g", 0.5, keep="x")

    def test_broadcast_plan(self, spark):
        plan = (
            FL.quantile_threshold_filter(_df(spark), "v", "g", 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestLinearQualityScore:
    def test_python_parity_seeded(self, spark):
        import hashlib
        import math

        from inception_eventstore_spark.operators.scoring import (
            linear_quality_score,
        )

        texts = ["alpha beta beta gamma", "delta epsilon", "alpha"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = {r["doc_id"]: (r["n_tokens"], r["quality_logit"],
                             r["quality_prob"])
               for r in linear_quality_score(df, dim=64).collect()}

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        def w(b):
            return (h60(f"qw:v1:{b}") - (1 << 59)) / float(1 << 59)

        for i, t in enumerate(texts):
            toks = t.split()
            z = sum(w(h60(f"bow-v1:{tok}") % 64) for tok in toks) / len(toks)
            assert got[i][0] == len(toks)
            assert got[i][1] == pytest.approx(round(z, 6), abs=1e-9)
            assert got[i][2] == pytest.approx(
                round(1 / (1 + math.exp(-z)), 6), abs=1e-9
            )

    def test_trained_weights_injectable(self, spark):
        import hashlib

        from inception_eventstore_spark.operators.scoring import (
            linear_quality_score,
        )

        def bucket(tok):
            return int(hashlib.md5(f"bow-v1:{tok}".encode())
                       .hexdigest()[:15], 16) % 8

        # +5 on 'good' tokens, -5 on 'bad' → probs saturate by content
        wrows = [(b, 0.0) for b in range(8)]
        wrows[bucket("good")] = (bucket("good"), 5.0)
        wrows[bucket("bad")] = (bucket("bad"), -5.0)
        assert bucket("good") != bucket("bad")
        wtab = spark.createDataFrame(wrows, "bucket long, w double")
        df = spark.createDataFrame(
            [(0, "good good good"), (1, "bad bad bad")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["quality_prob"]
               for r in linear_quality_score(
                   df, dim=8, weights=wtab
               ).collect()}
        assert got[0] > 0.99 and got[1] < 0.01

    def test_empty_docs_absent_and_gate_integration(self, spark):
        from inception_eventstore_spark.operators.filtering import (
            quantile_threshold_filter,
        )
        from inception_eventstore_spark.operators.scoring import (
            linear_quality_score,
        )

        df = spark.createDataFrame(
            [(0, ""), (1, "alpha beta"), (2, "gamma delta epsilon"),
             (3, "zeta eta")],
            ["doc_id", "text"],
        )
        scored = linear_quality_score(df, dim=16).withColumn(
            "grp", F.lit("all")
        )
        assert {r["doc_id"] for r in scored.collect()} == {1, 2, 3}
        kept = quantile_threshold_filter(
            scored, value_col="quality_prob", group_col="grp", p=0.5
        )
        assert 0 < kept.count() <= 3
