"""Two-phase shard rank (functions/ranking.grouped_row_number): exact
equality with the single-window form it replaces, under group skew,
tiny shards, and the no-group (global rank) case."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.ranking import grouped_row_number


def _fixture(spark):
    # skewed groups: 'en' holds 80% of rows; scores collide on purpose
    rows = []
    for i in range(400):
        rows.append(("en", i % 37 / 10.0, f"id{i:04d}"))
    for i in range(400, 480):
        rows.append(("de", i % 11 / 10.0, f"id{i:04d}"))
    for i in range(480, 500):
        rows.append(("fr", 1.0, f"id{i:04d}"))
    return spark.createDataFrame(rows, ["lang", "score", "doc_id"])


class TestGroupedRowNumber:
    def test_equals_single_window_grouped(self, spark):
        df = _fixture(spark)
        w = Window.partitionBy("lang").orderBy(
            F.col("score").desc(), F.col("doc_id")
        )
        want = {
            (r["lang"], r["doc_id"]): r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        got = {
            (r["lang"], r["doc_id"]): r["rank"]
            for r in grouped_row_number(
                df,
                order_cols=[F.col("score").desc(), F.col("doc_id")],
                group_cols=["lang"],
                num_shards=7,
            ).collect()
        }
        assert got == want

    def test_equals_single_window_global(self, spark):
        df = _fixture(spark)
        w = Window.partitionBy(F.lit(1)).orderBy(
            F.col("score"), F.col("doc_id")
        )
        want = {
            r["doc_id"]: r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        got = {
            r["doc_id"]: r["rank"]
            for r in grouped_row_number(
                df,
                order_cols=[F.col("score"), F.col("doc_id")],
                num_shards=5,
            ).collect()
        }
        assert got == want

    def test_group_count_column(self, spark):
        df = _fixture(spark)
        out = grouped_row_number(
            df,
            order_cols=[F.col("doc_id")],
            group_cols=["lang"],
            with_group_count="n",
            num_shards=3,
        )
        counts = {
            r["lang"]: r["n"] for r in out.select("lang", "n").distinct().collect()
        }
        assert counts == {"en": 400, "de": 80, "fr": 20}
        # ranks are a permutation of 1..n within each group
        for lang, n in counts.items():
            ranks = sorted(
                r["rank"] for r in out.where(F.col("lang") == lang).collect()
            )
            assert ranks == list(range(1, n + 1))

    def test_single_shard_degenerate(self, spark):
        df = _fixture(spark).limit(10)
        out = grouped_row_number(
            df, order_cols=[F.col("doc_id")], num_shards=1
        )
        assert sorted(r["rank"] for r in out.collect()) == list(range(1, 11))

    def test_empty_input(self, spark):
        df = _fixture(spark).where(F.lit(False))
        assert grouped_row_number(df, order_cols=[F.col("doc_id")]).count() == 0


class TestShardedRunningMax:
    def test_equals_sequential_window(self, spark):
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.ranking import (
            sharded_running_max,
        )

        rng = random.Random(7)
        rows = [(i, rng.randrange(0, 1000)) for i in range(500)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["m"]
            for r in sharded_running_max(
                df, [F.col("k").desc()], "v", "m", num_shards=8
            ).collect()
        }
        w = (
            Window.orderBy(F.col("k").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        want = {
            r["k"]: r["m"]
            for r in df.withColumn("m", F.max("v").over(w)).collect()
        }
        assert got == want
        assert got[499] is None  # global first row: empty prefix

    def test_inclusive_frame(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.ranking import (
            sharded_running_max,
        )

        df = spark.createDataFrame(
            [(1, 5), (2, 3), (3, 9)], "k long, v long"
        )
        got = {
            r["k"]: r["m"]
            for r in sharded_running_max(
                df, [F.col("k")], "v", "m", num_shards=2,
                exclusive=False,
            ).collect()
        }
        assert got == {1: 5, 2: 5, 3: 9}

    def test_integer_guard(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.ranking import (
            sharded_running_max,
        )

        df = spark.createDataFrame([(1, 1.5)], "k long, v double")
        with pytest.raises(TypeError):
            sharded_running_max(df, [F.col("k")], "v", "m")
