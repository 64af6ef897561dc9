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
