from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import decontaminate as DC
from inception_eventstore_spark.operators import merge as MG


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


class TestDecontaminate:
    def test_overlapping_doc_flagged(self, spark):
        bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
        docs = _docs(
            spark,
            [
                # carries the benchmark 5-gram "quick brown fox jumps over"
                (1, "intro words then quick brown fox jumps over and more"),
                (2, "totally unrelated sentence about spark physical plans"),
            ],
        )
        bad = DC.contaminated_ids(docs, bench, n=5).collect()
        assert [r.doc_id for r in bad] == [1]

        clean = DC.decontaminate(docs, bench, n=5)
        assert [r.doc_id for r in clean.collect()] == [2]

    def test_case_and_whitespace_normalized(self, spark):
        bench = _docs(spark, [(100, "Alpha Beta\tGamma  Delta Epsilon")])
        docs = _docs(spark, [(1, "x alpha beta gamma delta epsilon y")])
        assert DC.contaminated_ids(docs, bench, n=5).count() == 1

    def test_short_docs_cannot_match(self, spark):
        bench = _docs(spark, [(100, "one two three four five")])
        # fewer than n tokens -> no n-gram -> never contaminated
        docs = _docs(spark, [(1, "one two three four")])
        assert DC.contaminated_ids(docs, bench, n=5).count() == 0

    def test_flag_mode_keeps_all_rows(self, spark):
        bench = _docs(spark, [(100, "a b c d e")])
        docs = _docs(spark, [(1, "z a b c d e z"), (2, "nothing shared here at all")])
        flagged = {r.doc_id: r.contaminated
                   for r in DC.flag_contamination(docs, bench, n=5).collect()}
        assert flagged == {1: True, 2: False}

    def test_benchmark_members_remove_themselves(self, spark):
        text = "alpha beta gamma delta epsilon zeta"
        bench = _docs(spark, [(0, text)])
        docs = _docs(spark, [(7, text), (8, "disjoint words entirely different")])
        assert [r.doc_id for r in DC.decontaminate(docs, bench, n=5).collect()] == [8]


class TestMergeChangelog:
    def _base(self, spark):
        return spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")],
            "k long, v string",
        )

    def _changes(self, spark, rows):
        return spark.createDataFrame(
            [Row(k=k, v=v, seq=s, op=o) for k, v, s, o in rows],
            "k long, v string, seq long, op string",
        )

    def test_upsert_insert_delete(self, spark):
        changes = self._changes(
            spark,
            [
                (2, "b2", 10, "U"),   # update existing
                (4, "d", 11, "U"),    # insert new key
                (3, None, 12, "D"),   # delete existing
            ],
        )
        out = MG.merge_changelog(self._base(spark), changes, ["k"])
        got = {r.k: r.v for r in out.collect()}
        assert got == {1: "a", 2: "b2", 4: "d"}

    def test_latest_change_wins(self, spark):
        changes = self._changes(
            spark, [(1, "x1", 5, "U"), (1, "x2", 9, "U"), (1, "x0", 7, "U")]
        )
        out = MG.merge_changelog(self._base(spark), changes, ["k"])
        assert {r.k: r.v for r in out.collect()}[1] == "x2"

    def test_delete_then_reinsert(self, spark):
        changes = self._changes(
            spark, [(1, None, 5, "D"), (1, "re", 6, "U")]
        )
        out = MG.merge_changelog(self._base(spark), changes, ["k"])
        assert {r.k: r.v for r in out.collect()}[1] == "re"

    def test_merge_is_idempotent_on_reapply(self, spark):
        """Re-applying the same changelog to the merged snapshot is a
        no-op — the reference's PK-upsert redelivery semantics."""
        changes = self._changes(
            spark, [(2, "b2", 10, "U"), (3, None, 12, "D")]
        )
        once = MG.merge_changelog(self._base(spark), changes, ["k"])
        twice = MG.merge_changelog(once, changes, ["k"])
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )

    def test_latest_by_key_compacts(self, spark):
        changes = self._changes(
            spark,
            [(1, "x1", 5, "U"), (1, "x2", 9, "U"), (2, None, 4, "D")],
        )
        out = MG.latest_by_key(changes, ["k"]).collect()
        got = {(r.k): (r.v, r.seq, r.op) for r in out}
        assert got == {1: ("x2", 9, "U"), 2: (None, 4, "D")}

    def test_single_shuffle_plan(self, spark):
        """The merge is one union + one window: exactly one Exchange."""
        changes = self._changes(spark, [(2, "b2", 10, "U")])
        plan = (
            MG.merge_changelog(self._base(spark), changes, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestContaminationFraction:
    def test_graded_overlap(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.decontaminate import (
            contamination_fraction,
        )

        bench = spark.createDataFrame(
            [(100, "a b c d e f g h")], ["doc_id", "text"]
        )
        docs = spark.createDataFrame(
            [
                (0, "a b c d e x y z w q"),   # shares gram 'a b c d e' only
                (1, "a b c d e f g h"),        # full copy
                (2, "p q r s t u v w"),        # disjoint
                (3, "a b c"),                  # < n tokens -> absent
            ],
            ["doc_id", "text"],
        )
        import pytest

        rows = {r["doc_id"]: r for r in contamination_fraction(
            docs, bench, n=5).collect()}
        assert set(rows) == {0, 1, 2}
        # doc 0: 6 distinct 5-grams, 1 contaminated
        assert rows[0]["n_grams"] == 6 and rows[0]["n_contaminated"] == 1
        assert rows[0]["overlap_frac"] == pytest.approx(1 / 6, abs=1e-6)
        assert rows[1]["overlap_frac"] == 1.0
        assert rows[2]["overlap_frac"] == 0.0


class TestSnapshotDiff:
    def _pair(self, spark):
        old = spark.createDataFrame(
            [
                (1, "a", 10.0),
                (2, "b", 20.0),
                (3, "c", None),
                (4, "d", 40.0),
            ],
            "k long, s string, v double",
        )
        new = spark.createDataFrame(
            [
                (1, "a", 10.0),      # unchanged
                (2, "B", 21.0),      # both cols changed
                (3, "c", None),      # unchanged (NULL == NULL)
                (5, "e", 50.0),      # added (4 removed)
            ],
            "k long, s string, v double",
        )
        return old, new

    def test_metric_counts(self, spark):
        from inception_eventstore_spark.operators.merge import (
            snapshot_diff,
        )

        old, new = self._pair(spark)
        got = {
            r["metric"]: r["n"]
            for r in snapshot_diff(old, new, ["k"]).collect()
        }
        assert got == {
            "added": 1,
            "removed": 1,
            "changed": 1,
            "unchanged": 2,
            "col_changed:s": 1,
            "col_changed:v": 1,
        }

    def test_null_vs_value_is_change(self, spark):
        from inception_eventstore_spark.operators.merge import (
            snapshot_diff,
        )

        old = spark.createDataFrame([(1, None)], "k long, v double")
        new = spark.createDataFrame([(1, 7.0)], "k long, v double")
        got = {
            r["metric"]: r["n"]
            for r in snapshot_diff(old, new, ["k"]).collect()
        }
        assert got["changed"] == 1 and got["col_changed:v"] == 1

    def test_explicit_compare_cols_ignore_rest(self, spark):
        from inception_eventstore_spark.operators.merge import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "x", 1.0)], "k long, s string, v double"
        )
        new = spark.createDataFrame(
            [(1, "x", 2.0)], "k long, s string, v double"
        )
        got = {
            r["metric"]: r["n"]
            for r in snapshot_diff(
                old, new, ["k"], compare_cols=["s"]
            ).collect()
        }
        assert got["unchanged"] == 1 and got["changed"] == 0
        assert "col_changed:v" not in got

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.merge import (
            snapshot_diff,
        )

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            snapshot_diff(df, df, [])
