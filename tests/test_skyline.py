"""Pareto frontier (skyline) operator tests."""

import pytest

from inception_eventstore_spark.operators.skyline import pareto_frontier


def _frontier_ids(spark, rows):
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = pareto_frontier(df, "x", "y")
    assert set(out.columns) == {"id", "x", "y"}
    return sorted(r["id"] for r in out.collect())


class TestParetoFrontier:
    def test_basic_dominance(self, spark):
        # (3,1) and (1,3) are the frontier; (2,2) is NOT dominated
        # either (nobody beats it on both axes); (1,1) is dominated.
        ids = _frontier_ids(
            spark, [(1, 3, 1), (2, 1, 3), (3, 2, 2), (4, 1, 1)]
        )
        assert ids == [1, 2, 3]

    def test_equal_points_both_survive(self, spark):
        ids = _frontier_ids(spark, [(1, 5, 5), (2, 5, 5), (3, 4, 6)])
        assert ids == [1, 2, 3]

    def test_same_x_lower_y_dominated(self, spark):
        # (5,2) shares x with (5,7): dominated. (5,7) survives.
        ids = _frontier_ids(spark, [(1, 5, 7), (2, 5, 2), (3, 6, 1)])
        assert ids == [1, 3]

    def test_anti_correlated_all_survive(self, spark):
        rows = [(i, i, 100 - i) for i in range(1, 21)]
        assert _frontier_ids(spark, rows) == list(range(1, 21))

    def test_single_dominator(self, spark):
        rows = [(i, i, i) for i in range(1, 11)]
        assert _frontier_ids(spark, rows) == [10]

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 2), (2, None, 9), (3, 9, None)],
            "id long, x long, y long",
        )
        out = pareto_frontier(df, "x", "y").collect()
        assert [r["id"] for r in out] == [1]

    def test_matches_brute_force(self, spark):
        import random

        rng = random.Random(42)
        rows = [
            (i, rng.randrange(0, 30), rng.randrange(0, 30))
            for i in range(200)
        ]
        expect = sorted(
            i
            for i, x, y in rows
            if not any(
                (px > x and py >= y) or (px >= x and py > y)
                for _, px, py in rows
            )
        )
        assert _frontier_ids(spark, rows) == expect

    def test_integer_axis_guard(self, spark):
        df = spark.createDataFrame([(1, 1.5, 2)], "id long, x double, y long")
        with pytest.raises(TypeError):
            pareto_frontier(df, "x", "y")
