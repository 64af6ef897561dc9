"""Streaming-ingest scale smoke: envelope micro-batches through the
full Structured Streaming path — watermark dedup of in-flight duplicate
deliveries, then the idempotent foreachBatch ingest (events + index +
counter deltas in one job per epoch).

Synthesizes N waves of envelope rows into a source directory (each wave
re-delivers a slice of the previous wave, simulating producer retries),
runs ``stream_ingest`` over them, and reports rows/sec plus the final
store consistency (row count must equal the number of DISTINCT keys
delivered — duplicates dropped by both guards).

Usage: python tools/scale_smoke_stream.py [sf_dir] [waves] [rows_per_wave]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from inception_eventstore_spark.functions.filetime import (
    timestamp_to_filetime_col,
)
from inception_eventstore_spark.operators.eventstore import EventStore
from inception_eventstore_spark.session import get_spark
from inception_eventstore_spark.sources import layout as L
from inception_eventstore_spark.sources.tables import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rows_per_wave = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = get_spark(
        "scale-smoke-stream",
        extra_configs={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="es-stream-smoke-")
    source = os.path.join(root, "incoming")
    layout = L.for_tenant(root, tenant="smoke", base_keyspace="eventstore")
    store = EventStore(spark, layout)

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

    # waves: disjoint rev ranges per wave + a 10% redelivery tail of the
    # previous wave (exact duplicate rows — the retry scenario)
    total_rows = 0
    n_wave = envelope.limit(rows_per_wave).persist()
    n_avail = n_wave.count()
    t_gen = time.time()
    prev_tail = None
    for w in range(waves):
        wave = n_wave.select(
            "id", (F.col("rev") + F.lit(w * 10_000_000)).alias("rev"),
            "pos", "ts", "data",
        )
        batch = wave if prev_tail is None else wave.unionByName(prev_tail)
        batch.write.mode("append").parquet(source)
        total_rows += n_avail + (prev_tail.count() if prev_tail is not None else 0)
        prev_tail = wave.limit(n_avail // 10)
    gen_sec = round(time.time() - t_gen, 2)

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

    stored = store.events_df().count()
    expected = waves * n_avail  # every redelivered row deduped

    # streaming stateful z-score over the raw event stream (state must
    # persist across every micro-batch of the run) + foreachBatch
    # materialized-view maintenance — the two round-3 streaming adds
    from inception_eventstore_spark.sources.matview import (
        IncrementalAggView,
        Measure,
    )
    from inception_eventstore_spark.streaming.ingest import stream_into_view
    from inception_eventstore_spark.streaming.state import (
        streaming_zscore_anomalies,
    )

    t0 = time.time()
    # stream the RAW fixture parquet (its stored ts dtype, not the
    # loader-normalized one — readStream schemas must match the files);
    # file streaming sources need a DIRECTORY, the fixture is one file
    import shutil as _sh

    ev_src = os.path.join(root, "evsrc")
    os.makedirs(ev_src, exist_ok=True)
    _sh.copy(sf_dir + "/events.parquet", ev_src)
    raw_schema = spark.read.parquet(ev_src).schema
    ev_stream = spark.readStream.schema(raw_schema).parquet(ev_src)
    zq = (
        streaming_zscore_anomalies(ev_stream, window=20)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, "zckpt"))
        .outputMode("append")
        .start()
    )
    try:
        zq.processAllAvailable()
    finally:
        zq.stop()
    zscore_sec = round(time.time() - t0, 2)

    mv = IncrementalAggView(
        spark,
        os.path.join(root, "mv"),
        ["event_type"],
        [
            Measure("n", "count"),
            Measure("total", "sum", "value"),
            Measure("users", "approx_distinct", "user_id"),
        ],
    )
    t0 = time.time()
    vq = stream_into_view(
        spark.readStream.schema(raw_schema).parquet(ev_src),
        mv,
        os.path.join(root, "vckpt"),
        trigger_once=True,
    )
    try:
        mv_done = vq.awaitTermination(600)
    finally:
        vq.stop()
    mv_rows = mv.read().count() if mv_done else None
    mv_sec = round(time.time() - t0, 2)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "sf_dir": sf_dir,
        "waves": waves,
        "rows_per_wave": n_avail,
        "delivered_rows": total_rows,
        "stored_rows": stored,
        "expected_rows": expected,
        "idempotent": stored == expected,
        "gen_sec": gen_sec,
        "ingest_sec": ingest_sec,
        "rows_per_sec": round(total_rows / ingest_sec, 1),
        "zscore_stream_sec": zscore_sec,
        "matview_stream_sec": mv_sec,
        "matview_completed": bool(mv_done),
        "matview_groups": mv_rows,
    }))
    return 0 if (stored == expected and mv_done) else 1


if __name__ == "__main__":
    raise SystemExit(main())
