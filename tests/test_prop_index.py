"""PropertyIndex: generalized secondary index on payload properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.prop_index import PropertyIndex


@pytest.fixture()
def events(spark):
    rows = [
        (i, i % 7, f'{{"k": {i % 13}}}') for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, props string"
    )


def _kcol():
    return F.get_json_object("props", "$.k").cast("long")


class TestPropertyIndex:
    def test_probe_equals_scan(self, spark, events, tmp_path):
        idx = PropertyIndex.build(
            spark, events, _kcol(), ["event_id"], str(tmp_path / "ix")
        )
        got = sorted(
            r["event_id"] for r in idx.probe(events, 5).collect()
        )
        want = sorted(
            r["event_id"]
            for r in events.where(_kcol() == 5).collect()
        )
        assert got == want and len(got) > 0

    def test_lookup_misses_return_empty(self, spark, events, tmp_path):
        idx = PropertyIndex.build(
            spark, events, _kcol(), ["event_id"], str(tmp_path / "ix2")
        )
        assert idx.lookup(9999).count() == 0

    def test_append_visibility(self, spark, events, tmp_path):
        idx = PropertyIndex.build(
            spark, events, _kcol(), ["event_id"], str(tmp_path / "ix3")
        )
        delta = spark.createDataFrame(
            [(1000, 1, '{"k": 5}')],
            "event_id long, user_id long, props string",
        )
        idx.append(delta, _kcol())
        assert 1000 in {
            r["event_id"] for r in idx.lookup(5).collect()
        }

    def test_lookup_is_bucket_pruned(self, spark, events, tmp_path):
        idx = PropertyIndex.build(
            spark, events, _kcol(), ["event_id"], str(tmp_path / "ix4"),
            n_buckets=16,
        )
        # the lookup reads exactly one _vb directory
        files = idx.lookup(5).inputFiles()
        assert files
        b = idx._bucket_of(5)
        assert all(f"_vb={b}/" in f for f in files)

    def test_driver_bucket_matches_jvm(self, spark, tmp_path):
        # the driver-side XXH64 twin must land every value in the same
        # bucket the JVM expression writes it to (else lookups go blind)
        vals = spark.createDataFrame(
            [(v,) for v in ("5", "hello", "café", "-12")], "v string"
        ).select(
            "v",
            F.pmod(
                F.xxhash64(F.encode(F.col("v"), "UTF-8")), F.lit(256)
            ).alias("jvm_b"),
        )
        idx = PropertyIndex(spark, str(tmp_path / "x"), ["v"], 256)
        for r in vals.collect():
            assert idx._bucket_of(r["v"]) == r["jvm_b"], r["v"]

    def test_null_values_not_indexed(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, '{"k": 3}'), (2, "{}")],
            "event_id long, props string",
        )
        idx = PropertyIndex.build(
            spark, df, _kcol(), ["event_id"], str(tmp_path / "ix5")
        )
        rows = spark.read.parquet(str(tmp_path / "ix5"))
        assert rows.count() == 1

    def test_empty_keys_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            PropertyIndex(spark, str(tmp_path), [])


class TestLookupContract:
    def test_renderings(self, spark, tmp_path):
        from decimal import Decimal

        idx = PropertyIndex(spark, str(tmp_path / "x"), ["event_id"])
        with pytest.raises(TypeError):
            idx._render(None)
        with pytest.raises(TypeError):
            idx._render([1])
        assert idx._render(42) == "42"
        assert idx._render("x") == "x"
        assert idx._render(True) == "true"
        assert idx._render(False) == "false"
        assert idx._render(2.0) == "4611686018427387904"
        assert idx._render(float("nan")) == "9221120237041090560"
        assert idx._render(Decimal("1.50")) == "1.50"
        with pytest.raises(ValueError):
            idx._render(Decimal("1.5E+25"))


class TestTypedValues:
    """probe ≡ scan bucket-parity for bool / float / decimal columns
    (VERDICT r3 next-round #7) — proves the driver-side canonical
    rendering hashes to the same bucket the JVM wrote."""

    def _check(self, spark, tmp_path, name, schema_val, rows, col,
               lookups):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)],
            f"event_id long, v {schema_val}",
        )
        idx = PropertyIndex.build(
            spark, df, F.col(col), ["event_id"],
            str(tmp_path / name), n_buckets=8,
        )
        for val in lookups:
            got = sorted(
                r["event_id"] for r in idx.probe(df, val).collect()
            )
            want = sorted(
                r["event_id"]
                for r in df.where(F.col(col).eqNullSafe(F.lit(val))).collect()
            )
            assert got == want, (val, got, want)
            assert len(got) > 0, val

    def test_bool_column(self, spark, tmp_path):
        self._check(
            spark, tmp_path, "ixb", "boolean",
            [i % 3 == 0 for i in range(40)], "v", [True, False],
        )

    def test_double_column(self, spark, tmp_path):
        vals = [0.1, 2.0, -0.0, 1e300, 2.0, 0.1, -7.25]
        self._check(
            spark, tmp_path, "ixd", "double", vals, "v",
            [0.1, 2.0, 1e300, -7.25],
        )
        # -0.0 keys its own bucket (distinct bits from 0.0) but still
        # probes exactly
        self._check(
            spark, tmp_path, "ixdz", "double", [-0.0, 1.0], "v", [-0.0]
        )

    def test_float_column_widens(self, spark, tmp_path):
        # FloatType values widen to exact doubles on both sides
        self._check(
            spark, tmp_path, "ixf", "float",
            [1.5, -2.25, 1.5, 8.0], "v", [1.5, -2.25, 8.0],
        )

    def test_decimal_column(self, spark, tmp_path):
        from decimal import Decimal

        self._check(
            spark, tmp_path, "ixdec", "decimal(10,2)",
            [Decimal("1.50"), Decimal("-3.07"), Decimal("1.50"),
             Decimal("0.00")],
            "v",
            [Decimal("1.50"), Decimal("-3.07"), Decimal("0.00")],
        )

    def test_dataless_index_raises_clearly(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "{}")], "event_id long, props string"
        )
        # every extracted value is null → no data files written
        idx = PropertyIndex.build(
            spark, df, _kcol(), ["event_id"], str(tmp_path / "ix9")
        )
        with pytest.raises(FileNotFoundError):
            idx.lookup(5)


class TestIngestMaintainedPropIndex:
    def _store(self, spark, tmp_path):
        from inception_eventstore_spark.operators.eventstore import (
            AggregateCommit,
            EventStore,
        )
        from inception_eventstore_spark.sources import layout as L

        lay = L.for_tenant(
            str(tmp_path), tenant="t1", base_keyspace="eventstore"
        )
        return EventStore(spark, lay), AggregateCommit

    def _payload(self, color):
        return f'{{"color": "{color}"}}'.encode()

    def _vexpr(self, data_col):
        return F.get_json_object(data_col.cast("string"), "$.color")

    def test_backfill_and_ingest_maintenance(self, spark, tmp_path):
        store, AC = self._store(spark, tmp_path)
        store.append_commits(
            [AC(b"a1", 1, 1000, [self._payload("red")], [])]
        )
        # registration over the existing store backfills
        idx = store.register_property_index("color", self._vexpr)
        assert {bytes(r["id"]) for r in idx.lookup("red").collect()} == {
            b"a1"
        }
        # subsequent appends maintain the index in the same ingest
        store.append_commits(
            [
                AC(b"a2", 1, 2000, [self._payload("red")], []),
                AC(b"a3", 1, 3000, [self._payload("blue")], []),
            ]
        )
        assert {bytes(r["id"]) for r in idx.lookup("red").collect()} == {
            b"a1",
            b"a2",
        }
        assert {bytes(r["id"]) for r in idx.lookup("blue").collect()} == {
            b"a3"
        }
        # probe joins back to full event rows
        hits = idx.probe(store.events_df(), "red").collect()
        assert {bytes(r["id"]) for r in hits} == {b"a1", b"a2"}

    def test_reregistration_reuses_state(self, spark, tmp_path):
        store, AC = self._store(spark, tmp_path)
        store.append_commits(
            [AC(b"z1", 1, 1000, [self._payload("green")], [])]
        )
        store.register_property_index("color", self._vexpr)
        store2, _ = self._store(spark, tmp_path)
        idx2 = store2.register_property_index("color", self._vexpr)
        assert idx2.lookup("green").count() == 1


class TestThirdReviewFixes:
    def test_registration_catches_up_missed_events(self, spark, tmp_path):
        from inception_eventstore_spark.operators.eventstore import (
            AggregateCommit,
            EventStore,
        )
        from inception_eventstore_spark.sources import layout as L

        lay = L.for_tenant(
            str(tmp_path), tenant="t2", base_keyspace="eventstore"
        )
        vexpr = lambda d: F.get_json_object(  # noqa: E731
            d.cast("string"), "$.color"
        )
        s1 = EventStore(spark, lay)
        s1.append_commits(
            [AggregateCommit(b"a1", 1, 1000, [b'{"color": "red"}'], [])]
        )
        s1.register_property_index("color", vexpr)
        # a FRESH store (index unregistered) appends more events...
        s2 = EventStore(spark, lay)
        s2.append_commits(
            [AggregateCommit(b"a2", 1, 2000, [b'{"color": "red"}'], [])]
        )
        # ...and late registration must heal the hole
        idx = s2.register_property_index("color", vexpr)
        assert {bytes(r["id"]) for r in idx.lookup("red").collect()} == {
            b"a1",
            b"a2",
        }

    def test_probe_dedups_redelivered_rows(self, spark, tmp_path):
        from inception_eventstore_spark.operators.eventstore import (
            AggregateCommit,
            EventStore,
        )
        from inception_eventstore_spark.sources import layout as L

        lay = L.for_tenant(
            str(tmp_path), tenant="t3", base_keyspace="eventstore"
        )
        vexpr = lambda d: F.get_json_object(  # noqa: E731
            d.cast("string"), "$.color"
        )
        store = EventStore(spark, lay)
        store.append_commits(
            [AggregateCommit(b"b1", 1, 1000, [b'{"color": "red"}'], [])]
        )
        idx = store.register_property_index("color", vexpr)
        # simulate the streaming retry: the SAME envelope redelivered
        # through the anti-join path — events dedup to one copy, the
        # prop index may hold duplicates, probe() must still dedup
        rows = store.events_df()
        store._append_rows(rows, maintain_index=False,
                           anti_join_existing=True)
        assert store.events_df().count() == 1
        hits = idx.probe(store.events_df(), "red").collect()
        assert len(hits) == 1

    def test_empty_export_and_verify(self, spark, tmp_path):
        from inception_eventstore_spark.sources.training_export import (
            export_shards,
            verify_shards,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        path = str(tmp_path / "empty_shards")
        m = export_shards(empty, path, n_shards=4)
        assert m["total_rows"] == 0 and m["shards"] == {}
        assert verify_shards(spark, path)
