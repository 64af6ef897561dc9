"""End-to-end ingest→index→counter→replay consistency smoke: ONE
Structured Streaming job (VERDICT r10 next #7).

The reference's raison d'être is dual-write consistency between the
event log, the (event-type, day) index, and the per-type counters —
three Cassandra tables written by separate handlers. This repo folds
all three writes into one ``foreachBatch`` job (`EventStore.
_append_rows` → `_append_index`), and this smoke pins the SINGLE-JOB
invariant at scale, which until r11 was only unit-tested: after a
~1M-event streaming run with duplicate redeliveries, every pair of the
three tables must agree EXACTLY, and an index-driven replay (R11) must
return exactly the events the log says carry that type.

Asserts (all exact, no tolerances):
  1. events rows        == distinct delivered keys (idempotent ingest)
  2. index rows         == events rows (every event indexed once)
  3. Σ counter cv       == events rows
  4. per-type counts    : events ⟷ index ⟷ counters full-outer join
                          has ZERO mismatching rows
  5. min ts             : index X5 min_ts == events MIN(ts)
  6. R11 replay         : replay_by_event_type(et) row count ==
                          events rows whose payload derives et

Usage: python tools/scale_smoke_ingest.py [sf_dir] [waves] [rows_per_wave]
Defaults: sf0.1, 10 waves x 100k rows (~1M distinct events + 10%
redelivered duplicates). Prints one JSON line; exit 0 iff all asserts
hold.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.filetime import (
    timestamp_to_filetime_col,
)
from inception_eventstore_spark.operators.counters import MessageCounter
from inception_eventstore_spark.operators.eventstore import (
    EventStore,
    PlayerOptions,
)
from inception_eventstore_spark.operators.index import IndexByEventTypeStore
from inception_eventstore_spark.session import get_spark
from inception_eventstore_spark.sources import layout as L
from inception_eventstore_spark.sources.tables import load_table


def _event_type_expr(data):
    """Deterministic JVM-side payload → type resolver (the ISerializer
    seam): 8 synthetic types derived from the payload hash — stays in
    codegen, no Python worker on the ingest hot path."""
    return F.concat(
        F.lit("et-"), F.pmod(F.xxhash64(data), F.lit(8)).cast("string")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rows_per_wave = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = get_spark(
        "scale-smoke-ingest",
        extra_configs={
            "spark.driver.memory": "16g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="es-ingest-smoke-")
    source = os.path.join(root, "incoming")
    layout = L.for_tenant(root, tenant="smoke", base_keyspace="eventstore")
    store = EventStore(spark, layout, event_type_expr=_event_type_expr)

    # ---- synthesize waves: disjoint rev ranges + 10% redelivery tail
    # of the previous wave (exact duplicate rows — producer retries) ----
    events = load_table(spark, sf_dir, "events")
    envelope = events.select(
        F.col("user_id").cast("string").cast("binary").alias("id"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rev"),
        F.lit(0).alias("pos"),
        timestamp_to_filetime_col("ts").alias("ts"),
        F.col("props").cast("binary").alias("data"),
    )
    base = envelope.limit(rows_per_wave).persist()
    n_avail = base.count()
    t_gen = time.time()
    delivered = 0
    prev_tail = None
    for w in range(waves):
        wave = base.select(
            "id", (F.col("rev") + F.lit(w * 10_000_000)).alias("rev"),
            "pos", "ts", "data",
        )
        batch = wave if prev_tail is None else wave.unionByName(prev_tail)
        batch.write.mode("append").parquet(source)
        delivered += n_avail + (0 if prev_tail is None else n_avail // 10)
        prev_tail = wave.limit(n_avail // 10)
    gen_sec = round(time.time() - t_gen, 2)
    expected = waves * n_avail

    # ---- the ONE streaming job: events + index + counters per epoch ----
    from inception_eventstore_spark.streaming.ingest import stream_ingest

    t0 = time.time()
    q = stream_ingest(
        spark, source, store, os.path.join(root, "ckpt"),
        max_files_per_trigger=64,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ingest_sec = round(time.time() - t0, 2)

    # ---- cross-table asserts ----
    t0 = time.time()
    ev = store.events_df().persist()
    n_events = ev.count()

    index = IndexByEventTypeStore(spark, layout)
    idx = index.index_df().persist()
    n_index = idx.count()

    counters = MessageCounter(spark, layout).counters_df()
    n_counted = counters.agg(F.sum("cv")).first()[0] or 0

    ev_types = (
        ev.select(_event_type_expr(F.col("data")).alias("et"))
        .groupBy("et").agg(F.count("*").alias("n_ev"))
    )
    idx_types = idx.groupBy("et").agg(F.count("*").alias("n_idx"))
    per_type_mismatch = (
        ev_types.join(idx_types, "et", "full_outer")
        .join(counters.withColumnRenamed("msgid", "et"), "et", "full_outer")
        .where(
            ~(F.col("n_ev").eqNullSafe(F.col("n_idx")))
            | ~(F.col("n_ev").eqNullSafe(F.col("cv")))
        )
        .count()
    )

    ev_min_ts = ev.agg(F.min("ts")).first()[0]
    idx_min_ts = index.min_ts()

    # R11: index-driven replay of one type must return exactly the
    # events whose payload derives that type
    probe_et = ev_types.orderBy("et").first()["et"]
    n_replay = store.replay_by_event_type(
        index, PlayerOptions(event_type_id=probe_et)
    ).count()
    n_et_events = (
        ev.where(_event_type_expr(F.col("data")) == probe_et).count()
    )
    verify_sec = round(time.time() - t0, 2)
    ev.unpersist()
    idx.unpersist()

    checks = {
        "events_eq_expected": n_events == expected,
        "index_eq_events": n_index == n_events,
        "counters_eq_events": int(n_counted) == n_events,
        "per_type_zero_mismatch": per_type_mismatch == 0,
        "min_ts_eq": ev_min_ts == idx_min_ts,
        "replay_eq_events_of_type": n_replay == n_et_events and n_replay > 0,
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "sf_dir": sf_dir,
        "waves": waves,
        "rows_per_wave": n_avail,
        "delivered_rows": delivered,
        "expected_rows": expected,
        "events_rows": n_events,
        "index_rows": n_index,
        "counter_sum": int(n_counted),
        "per_type_mismatch_rows": per_type_mismatch,
        "probe_event_type": probe_et,
        "replay_rows": n_replay,
        "gen_sec": gen_sec,
        "ingest_sec": ingest_sec,
        "verify_sec": verify_sec,
        "rows_per_sec": round(delivered / ingest_sec, 1),
        "checks": checks,
        "ok": all(checks.values()),
    }))
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
