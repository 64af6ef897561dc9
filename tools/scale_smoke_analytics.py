"""r6 analytics-operator scale smoke: the event-sequence / experiment /
concentration family at ~100× the sf0.1 event volume (10M events,
1.5M users at reps=100).

Replication offsets USER ids per copy, so the corpus grows in KEYS —
100× distinct users, the dimension every shuffle in this family is
keyed on — while per-user sequence length (the bounded-window side)
stays constant: exactly the shape a 100 TB event log has. The day
axis deliberately stays fixed: CUSUM/ACF/KM state is bounded by the
calendar, not the data, and this smoke proves the driver-side folds
stay flat while the distributed passes scale.

Usage: python tools/scale_smoke_analytics.py [sf_dir] [reps]
Prints one JSON line with row volumes + timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from inception_eventstore_spark.operators import funnel as FU
    from inception_eventstore_spark.operators import timeseries as TS
    from inception_eventstore_spark.operators.merge import snapshot_diff
    from inception_eventstore_spark.operators.profile import (
        did_estimate,
        gini_concentration,
    )
    from inception_eventstore_spark.operators.sessions import session_flow
    from inception_eventstore_spark.operators.skyline import pareto_frontier
    from inception_eventstore_spark.session import get_spark
    from inception_eventstore_spark.sources.tables import load_table

    spark = get_spark(
        "scale-smoke-analytics",
        extra_configs={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    volumes: dict[str, int] = {}

    e0 = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ub = int(e0.agg(F.max("user_id")).first()[0]) + 1
    eb = int(e0.agg(F.max("event_id")).first()[0]) + 1
    copies = spark.range(reps).select(F.col("id").alias("_rep"))
    ev = (
        e0.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_rep") * eb).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * ub).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(64)
        .persist()
    )
    volumes["events"] = ev.count()

    t0 = time.time()
    att = FU.attribution_credit(ev, "purchase", lookback_days=7)
    volumes["attribution_channels"] = att.count()
    timings["attribution_credit"] = round(time.time() - t0, 3)

    t0 = time.time()
    km = FU.km_survival(ev, "signup", "purchase")
    volumes["km_event_days"] = km.count()
    timings["km_survival"] = round(time.time() - t0, 3)

    t0 = time.time()
    ci = FU.conversion_wilson_ci(ev, "signup", "purchase", n_buckets=3)
    volumes["ci_buckets"] = ci.count()
    timings["conversion_ci"] = round(time.time() - t0, 3)

    t0 = time.time()
    fp = FU.frequent_paths(ev, length=3, top_n=20)
    volumes["frequent_paths"] = fp.count()
    timings["frequent_paths"] = round(time.time() - t0, 3)

    t0 = time.time()
    mk = FU.markov_stationary(ev, iterations=20)
    volumes["markov_states"] = mk.count()
    timings["markov_stationary"] = round(time.time() - t0, 3)

    t0 = time.time()
    sf = session_flow(ev, gap="1 hour")
    volumes["session_flow_cells"] = sf.count()
    timings["session_flow"] = round(time.time() - t0, 3)

    t0 = time.time()
    dc = TS.decayed_counts(ev, halflife_days=7, bits=30)
    volumes["decayed_keys"] = dc.count()
    timings["decayed_counts"] = round(time.time() - t0, 3)

    t0 = time.time()
    cu = TS.cusum_changepoints(ev)
    volumes["cusum_rows"] = cu.count()
    timings["cusum_changepoints"] = round(time.time() - t0, 3)

    t0 = time.time()
    ac = TS.acf_daily(ev, max_lag=14)
    volumes["acf_rows"] = ac.count()
    timings["acf_daily"] = round(time.time() - t0, 3)

    t0 = time.time()
    dd = did_estimate(ev)
    volumes["did_rows"] = dd.count()
    timings["did_estimate"] = round(time.time() - t0, 3)

    # per-user points: 1.5M-point skyline + global two-phase-rank Gini
    pts = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * F.lit(1048576.0)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("vsum_micro"),
        )
        .persist()
    )
    volumes["user_points"] = pts.count()
    t0 = time.time()
    sky = pareto_frontier(pts, "n_events", "vsum_micro")
    volumes["skyline_size"] = sky.count()
    timings["pareto_frontier"] = round(time.time() - t0, 3)

    t0 = time.time()
    gi = gini_concentration(pts, "vsum_micro", "user_id")
    volumes["gini_rows"] = gi.count()
    timings["gini_global_rank"] = round(time.time() - t0, 3)
    pts.unpersist()

    # keyed reconciliation at 10× orders
    o0 = load_table(spark, sf_dir, "orders")
    okb = int(o0.agg(F.max("o_orderkey")).first()[0]) + 1
    o10 = (
        o0.crossJoin(spark.range(10).select(F.col("id").alias("_r")))
        .select(
            (F.col("o_orderkey") + F.col("_r") * okb).alias(
                "o_orderkey"
            ),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .persist()
    )
    volumes["orders10x"] = o10.count()
    new = o10.where(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.col("o_totalprice") + F.lit(1.0),
        ).otherwise(F.col("o_totalprice")),
    )
    t0 = time.time()
    sd = snapshot_diff(o10, new, ["o_orderkey"])
    volumes["diff_metrics"] = sd.count()
    timings["snapshot_diff"] = round(time.time() - t0, 3)
    o10.unpersist()
    ev.unpersist()

    print(
        json.dumps(
            {
                "smoke": "analytics_r6",
                "reps": reps,
                "volumes": volumes,
                "timings_sec": timings,
                "total_sec": round(sum(timings.values()), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
