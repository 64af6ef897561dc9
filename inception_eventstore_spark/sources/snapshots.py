"""Snapshot versioning (time travel) for append-mostly parquet tables.

The reference replays against whatever Cassandra currently holds — a
moving target while writers are active. A snapshot log gives replay
(R9-R12) a FROZEN, consistent file set to scan while ingest continues,
and lets an operator pin, diff, or roll back table states — the
lakehouse pattern (Delta/Iceberg keep exactly this: a manifest of data
files per version) built from primitives this engine already has.

Design:
- ``create()`` lists the table's current data files (Hadoop FS, any
  scheme) and writes ``_snapshots/v{N}.json``. Underscore-prefixed
  directories are invisible to Spark's parquet discovery, so manifests
  never pollute reads.
- ``read(version)`` hands Spark exactly the manifest's files with
  ``basePath`` set, so partition-directory columns still materialize
  and files compacted/deleted AFTER the snapshot keep serving the old
  version for as long as they exist (compaction must retire files
  lazily if snapshots are to stay readable — ``compact`` rewrites are
  therefore snapshot-breaking unless retained versions are pruned
  first; ``prune(keep_latest)`` drops manifests, not data).
- Manifests record the full file list. At 100 TB a version's listing is
  O(files) — the same order as Delta's checkpoint parquet; an
  incremental add/remove log is the obvious upgrade and the write path
  already knows its appended files.

Concurrency: one writer (the ingest job) creates snapshots; readers
only get versions whose manifest write completed (JSON write is a
single create — readers never see a torn manifest on HDFS/local;
S3A readers inherit the store's read-after-write consistency).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from inception_eventstore_spark.sources import fsutil


class SnapshotLog:
    """Versioned file-manifest log next to one parquet table."""

    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.table_path = table_path.rstrip("/")
        self.snap_dir = self.table_path + "/_snapshots"

    def _manifest_path(self, version: int) -> str:
        return f"{self.snap_dir}/v{version:09d}.json"

    def versions(self) -> list[int]:
        files = fsutil.list_data_files(self.spark, self.snap_dir)
        out = []
        for f in files:
            name = f.rsplit("/", 1)[-1]
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def create(self, extra: dict | None = None) -> int:
        """Freeze the table's current data files as the next version.
        ``extra`` lets the caller pin sidecar state in the same manifest
        (e.g. the event store records its tombstone files, so a
        version's logical content is frozen even though deletes are
        merge-on-read)."""
        files = sorted(
            fsutil.list_data_files(self.spark, self.table_path,
                                   recursive=True)
        )
        version = (self.latest_version() or 0) + 1
        fsutil.mkdirs(self.spark, self.snap_dir)
        fsutil.write_text(
            self.spark,
            self._manifest_path(version),
            json.dumps(
                {"version": version, "files": files, **(extra or {})}
            ),
        )
        return version

    def manifest(self, version: int) -> dict:
        text = fsutil.read_text(self.spark, self._manifest_path(version))
        if text is None:
            raise ValueError(
                f"snapshot v{version} does not exist under {self.snap_dir}"
            )
        return json.loads(text)

    def read(self, version: int, schema=None) -> DataFrame:
        """The table AS OF ``version``: exactly the manifest's files.
        ``basePath`` keeps partition-directory columns materializing."""
        files = self.manifest(version)["files"]
        reader = self.spark.read.option("basePath", self.table_path)
        if schema is not None:
            reader = reader.schema(schema)
        if not files:
            if schema is None:
                raise ValueError(
                    f"snapshot v{version} is empty and no schema was given"
                )
            return self.spark.createDataFrame([], schema=schema)
        return reader.parquet(*files)

    def diff_files(self, from_version: int, to_version: int) -> dict:
        """Added/removed data files between two versions."""
        a = set(self.manifest(from_version)["files"])
        b = set(self.manifest(to_version)["files"])
        return {"added": sorted(b - a), "removed": sorted(a - b)}

    def prune(self, keep_latest: int = 1) -> list[int]:
        """Drop all but the newest ``keep_latest`` manifests (data files
        are never touched — compaction owns physical retirement)."""
        vs = self.versions()
        to_drop = vs[:-keep_latest] if keep_latest > 0 else vs
        for v in to_drop:
            fsutil.delete_path(self.spark, self._manifest_path(v))
        return to_drop
