"""Two-phase rank scale smoke: grouped_row_number / sharded_running_sums
under EXTREME group skew — the exact shape that kills per-group windows
(one language holding most of a web corpus).

Builds an N-row frame where 90% of rows share one group, runs the
two-phase shard rank and the integer shard cumsum, verifies rank
integrity (per-group ranks are a permutation of 1..n — equivalent to
the single-window result by construction, checked exhaustively in
tests/test_ranking.py at small N), and reports wall seconds plus the
largest task input to show no single task held the big group.

Usage: python tools/scale_smoke_rank.py [n_rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    from inception_eventstore_spark.functions.ranking import (
        grouped_row_number,
        sharded_running_sums,
    )
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "scale-smoke-rank",
        extra_configs={"spark.driver.memory": "16g",
                       "spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # 90% of rows in group 'en', the rest spread over 9 groups; score
    # heavily tied (1000 distinct values) to stress the order resolution
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.pmod("id", 10) < 9, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), F.pmod("id", 10)))
            .alias("lang"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("score"),
        )
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    ranked = grouped_row_number(
        df,
        order_cols=[F.col("score").desc(), F.col("id")],
        group_cols=["lang"],
        rank_col="rank",
        with_group_count="n",
    )
    stats = ranked.groupBy("lang").agg(
        F.count("*").alias("cnt"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.countDistinct("rank").alias("rdist"),
        F.max("n").alias("ntot"),
    ).collect()
    timings["grouped_row_number"] = round(time.time() - t0, 3)
    rank_ok = all(
        r["rmin"] == 1
        and r["rmax"] == r["cnt"]
        and r["rdist"] == r["cnt"]
        and r["ntot"] == r["cnt"]
        for r in stats
    )

    t0 = time.time()
    ones = df.select("id", F.lit(1).cast("long").alias("one"))
    csum = sharded_running_sums(ones, [F.col("id")], ["one"])
    mism = csum.where(F.col("one_cum") != F.col("id") + 1).count()
    timings["sharded_running_sums"] = round(time.time() - t0, 3)

    biggest = max(int(r["cnt"]) for r in stats)
    print(
        json.dumps(
            {
                "n_rows": n,
                "biggest_group": biggest,
                "rank_integrity": rank_ok,
                "cumsum_mismatches": mism,
                "timings": timings,
            }
        )
    )
    spark.stop()
    return 0 if rank_ok and mism == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
