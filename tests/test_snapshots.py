from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.filetime import datetime_to_filetime
from inception_eventstore_spark.operators.eventstore import (
    AggregateCommit,
    EventStore,
)
from inception_eventstore_spark.sources import layout as L
from inception_eventstore_spark.sources.snapshots import SnapshotLog


def _ts(day):
    return datetime_to_filetime(
        dt.datetime(2024, 1, day, tzinfo=dt.timezone.utc)
    )


@pytest.fixture()
def store(spark, warehouse):
    layout = L.for_tenant(warehouse, tenant="snap", base_keyspace="es")
    return EventStore(spark, layout)


def _commit(aid, rev, day):
    return AggregateCommit(aid, rev, _ts(day), [b'{"et":"t1"}'], [])


class TestSnapshotLog:
    def test_versions_and_diff(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        spark.range(5).write.mode("append").parquet(p)
        log = SnapshotLog(spark, p)
        v1 = log.create()
        spark.range(5, 9).write.mode("append").parquet(p)
        v2 = log.create()
        assert log.versions() == [v1, v2] == [1, 2]
        assert log.read(v1).count() == 5
        assert log.read(v2).count() == 9
        d = log.diff_files(v1, v2)
        assert len(d["added"]) >= 1 and d["removed"] == []

    def test_snapshot_isolated_from_later_writes(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        spark.range(3).write.mode("append").parquet(p)
        log = SnapshotLog(spark, p)
        v = log.create()
        spark.range(100, 200).write.mode("append").parquet(p)
        assert log.read(v).count() == 3       # frozen
        assert spark.read.parquet(p).count() == 103  # live moved on

    def test_manifest_dir_invisible_to_reads(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        spark.range(4).write.mode("append").parquet(p)
        SnapshotLog(spark, p).create()
        assert spark.read.parquet(p).count() == 4

    def test_prune_keeps_latest(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        spark.range(2).write.mode("append").parquet(p)
        log = SnapshotLog(spark, p)
        for _ in range(3):
            log.create()
        dropped = log.prune(keep_latest=1)
        assert dropped == [1, 2] and log.versions() == [3]
        with pytest.raises(ValueError):
            log.manifest(1)


class TestEventStoreTimeTravel:
    def test_snapshot_freezes_appends_and_deletes(self, store):
        store.append_commits([_commit(b"a1", 1, 1)])
        v1 = store.create_snapshot()
        store.append_commits([_commit(b"a1", 2, 2)])
        v2 = store.create_snapshot()
        # merge-on-read delete AFTER v2: tombstone set was frozen per
        # version, so v2 still sees the row
        row = store.events_df().where(F.col("rev") == 2).first()
        store.delete(b"a1", row["rev"], row["pos"])
        v3 = store.create_snapshot()

        assert store.snapshot_versions() == [v1, v2, v3]
        assert store.events_snapshot(v1).count() == 1
        assert store.events_snapshot(v2).count() == 2
        assert store.events_snapshot(v3).count() == 1
        assert store.events_df().count() == 1

    def test_replay_against_frozen_snapshot(self, store):
        store.append_commits([_commit(b"a1", 1, 1), _commit(b"a2", 1, 1)])
        v = store.create_snapshot()
        store.append_commits([_commit(b"a3", 1, 3)])
        frozen_ids = {
            bytes(r.id) for r in store.events_snapshot(v).collect()
        }
        assert frozen_ids == {b"a1", b"a2"}
