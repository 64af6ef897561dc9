"""Tests for the streaming/incremental portable-HLL register view
(streaming/sketch_view.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import sketches as SK
from inception_eventstore_spark.streaming.sketch_view import (
    HllRegisterView,
    hll_project,
    stream_hll_into_view,
)


def _batch(spark, lo, hi, g=None):
    df = spark.range(lo, hi).select(F.col("id").alias("k"))
    if g is not None:
        df = df.withColumn("g", F.lit(g))
    return df


class TestHllRegisterView:
    def test_folds_equal_full_rebuild(self, spark, tmp_path):
        """Three delta folds == hll_distinct over the concatenated
        input, bit-for-bit (max-partial algebra)."""
        v = HllRegisterView(spark, str(tmp_path / "hv"), "k")
        for lo, hi in [(0, 1000), (500, 2000), (1500, 2500)]:
            v.fold(_batch(spark, lo, hi))
        got = v.estimate().first()
        want = SK.hll_distinct(_batch(spark, 0, 2500), "k").first()
        assert got["hll_denom"] == want["hll_denom"]
        assert got["hll_est"] == want["hll_est"]

    def test_committed_redelivery_noop(self, spark, tmp_path):
        v = HllRegisterView(spark, str(tmp_path / "hv2"), "k")
        b = _batch(spark, 0, 500)
        assert v.fold_committed(b, "epoch-0") is True
        d1 = v.estimate().first()["hll_denom"]
        assert v.fold_committed(b, "epoch-0") is False  # ledgered skip
        assert v.estimate().first()["hll_denom"] == d1

    def test_uncommitted_refold_idempotent_by_max(self, spark, tmp_path):
        """Even WITHOUT the token ledger, re-folding the same rows
        cannot move a register — max-merge is idempotent."""
        v = HllRegisterView(spark, str(tmp_path / "hv3"), "k")
        b = _batch(spark, 0, 800)
        v.fold(b)
        d1 = v.estimate().first()["hll_denom"]
        v.fold(b)
        assert v.estimate().first()["hll_denom"] == d1

    def test_grouped_view(self, spark, tmp_path):
        v = HllRegisterView(
            spark, str(tmp_path / "hv4"), "k", group_cols=["g"]
        )
        v.fold(_batch(spark, 0, 300, g="a"))
        v.fold(_batch(spark, 0, 900, g="b"))
        got = {r["g"]: r["hll_denom"] for r in v.estimate().collect()}
        wa = SK.hll_distinct(_batch(spark, 0, 300), "k").first()["hll_denom"]
        wb = SK.hll_distinct(_batch(spark, 0, 900), "k").first()["hll_denom"]
        assert got == {"a": wa, "b": wb}

    def test_p_guard(self, spark, tmp_path):
        with pytest.raises(ValueError):
            HllRegisterView(spark, str(tmp_path / "hv5"), "k", p=3)
        df = _batch(spark, 0, 5)
        with pytest.raises(ValueError):
            hll_project(df, "k", p=13)


class TestStreamHll:
    def test_stream_maintains_register_view(self, spark, tmp_path):
        src = str(tmp_path / "src")
        df = _batch(spark, 0, 1500)
        df.write.parquet(src)
        v = HllRegisterView(spark, str(tmp_path / "shv"), "k")
        stream = spark.readStream.schema("k long").parquet(src)
        q = stream_hll_into_view(
            stream, v, str(tmp_path / "ckpt"), trigger_once=True
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        got = v.estimate().first()
        want = SK.hll_distinct(df, "k").first()
        assert got["hll_denom"] == want["hll_denom"]
        assert got["hll_est"] == want["hll_est"]


class TestCmsCounterView:
    def test_project_matches_sketch(self, spark):
        """cms_project → count-groupBy must equal cms_sketch exactly —
        the salt-drift guard between the two modules."""
        from inception_eventstore_spark.streaming.sketch_view import (
            cms_project,
        )

        df = spark.range(500).select((F.col("id") % 60).alias("k"))
        via_project = {
            (r["row_id"], r["bucket"]): r["n"]
            for r in cms_project(df, "k", depth=4, width=32)
            .groupBy("row_id", "bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        via_sketch = {
            (r["row_id"], r["bucket"]): r["n"]
            for r in SK.cms_sketch(df, "k", depth=4, width=32).collect()
        }
        assert via_project == via_sketch

    def test_folds_equal_rebuild_and_estimates_serve(self, spark, tmp_path):
        from inception_eventstore_spark.streaming.sketch_view import (
            CmsCounterView,
        )

        v = CmsCounterView(spark, str(tmp_path / "cv"), "k", width=32)
        a = spark.range(0, 400).select((F.col("id") % 37).alias("k"))
        b = spark.range(0, 300).select((F.col("id") % 23).alias("k"))
        v.fold(a)
        v.fold(b)
        got = {
            (r["row_id"], r["bucket"]): r["n"] for r in v.sketch().collect()
        }
        want = {
            (r["row_id"], r["bucket"]): r["n"]
            for r in SK.cms_sketch(a.union(b), "k", width=32).collect()
        }
        assert got == want
        # the served sketch feeds the standard estimator: never under
        exact = a.union(b).groupBy("k").agg(F.count("*").alias("x"))
        est = SK.cms_estimate(
            v.sketch(), exact.select("k"), "k", width=32
        )
        bad = (
            exact.join(est, "k").where(F.col("cms_est") < F.col("x")).count()
        )
        assert bad == 0

    def test_token_ledger_prevents_double_count(self, spark, tmp_path):
        from inception_eventstore_spark.streaming.sketch_view import (
            CmsCounterView,
        )

        v = CmsCounterView(spark, str(tmp_path / "cv2"), "k", width=32)
        b = spark.range(100).select(F.col("id").alias("k"))
        assert v.fold_committed(b, "e0") is True
        n1 = v.sketch().agg(F.sum("n")).first()[0]
        assert v.fold_committed(b, "e0") is False
        assert v.sketch().agg(F.sum("n")).first()[0] == n1

    def test_stream_maintains_counter_view(self, spark, tmp_path):
        from inception_eventstore_spark.streaming.sketch_view import (
            CmsCounterView,
            stream_cms_into_view,
        )

        src = str(tmp_path / "csrc")
        df = spark.range(0, 900).select((F.col("id") % 50).alias("k"))
        df.write.parquet(src)
        v = CmsCounterView(spark, str(tmp_path / "scv"), "k", width=32)
        stream = spark.readStream.schema("k long").parquet(src)
        q = stream_cms_into_view(
            stream, v, str(tmp_path / "cckpt"), trigger_once=True
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        got = {
            (r["row_id"], r["bucket"]): r["n"] for r in v.sketch().collect()
        }
        want = {
            (r["row_id"], r["bucket"]): r["n"]
            for r in SK.cms_sketch(df, "k", width=32).collect()
        }
        assert got == want
