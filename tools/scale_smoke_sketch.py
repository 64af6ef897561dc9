"""Sketch + graph scale smoke: portable HLL / Count-Min over tens of
millions of rows, sketch MERGE vs rebuild equality at scale, and
frontier BFS over a multi-million-edge graph.

What it demonstrates (the 100 TB posture, on one box):

- the HLL/CMS build cost is ONE map-side-combinable pass whose shuffle
  payload is registers/counters only (groups·512 / d·w rows), however
  many input rows there are;
- per-partition sketches merged with `hll_merge` equal the
  full-rebuild sketch BIT-FOR-BIT (the property that lets 1000
  executors sketch shards independently and fold);
- BFS levels stay frontier-proportional: a 4-level search over
  millions of edges never shuffles the whole graph per level.

Usage: python tools/scale_smoke_sketch.py [n_rows] [n_edges]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    from inception_eventstore_spark.operators import sketches as SK
    from inception_eventstore_spark.operators.graph import bfs_hops
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "scale-smoke-sketch",
        extra_configs={"spark.driver.memory": "16g",
                       "spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": n, "n_edges": n_edges}

    # ~n/3 distinct users across 8 event-type groups, zipf-ish repeats
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("t"), F.pmod("id", 8)).alias("g"),
            F.pmod(F.xxhash64("id"), F.lit(n // 3)).alias("k"),
        )
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    est = SK.hll_distinct(df, "k", ["g"]).collect()
    out["hll_build_sec"] = round(time.time() - t0, 2)
    out["hll_groups"] = len(est)
    # every group sees ~n/3 of the hash space uniformly: estimates must
    # sit inside the 512-register error envelope
    exact = {
        r["g"]: r["x"]
        for r in df.groupBy("g")
        .agg(F.countDistinct("k").alias("x"))
        .collect()
    }
    errs = [abs(r["hll_est"] - exact[r["g"]]) / exact[r["g"]] for r in est]
    out["hll_max_rel_err"] = round(max(errs), 4)
    assert max(errs) < 0.15, f"HLL error envelope blown: {max(errs)}"

    # merge-vs-rebuild at scale: sketch two halves independently
    t0 = time.time()
    lo = df.where(F.col("k") % 2 == 0)
    hi = df.where(F.col("k") % 2 == 1)
    merged = SK.hll_estimate_from_registers(
        SK.hll_merge(
            [SK.hll_registers(lo, "k", ["g"]),
             SK.hll_registers(hi, "k", ["g"])],
            group_cols=["g"],
        ),
        group_cols=["g"],
    )
    mrows = {r["g"]: r["hll_denom"] for r in merged.collect()}
    brows = {r["g"]: r["hll_denom"] for r in est}
    assert mrows == brows, "merged sketch != rebuilt sketch"
    out["hll_merge_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    sk = SK.cms_sketch(df, "k", depth=4, width=4096)
    top = (
        df.groupBy("k").count().orderBy(F.desc("count"), "k").limit(20)
    )
    est_df = SK.cms_estimate(sk, top.select("k"), "k", depth=4, width=4096)
    under = (
        top.withColumnRenamed("count", "exact_n")
        .join(est_df, "k")
        .where(F.col("cms_est") < F.col("exact_n"))
        .count()
    )
    assert under == 0, "CMS undercounted a heavy hitter"
    out["cms_sec"] = round(time.time() - t0, 2)

    # BFS: ring + chords graph (diameter >> 4, every level non-trivial)
    t0 = time.time()
    ring = spark.range(n_edges).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n_edges).alias("dst"),
    )
    chords = (
        spark.range(n_edges)
        .where(F.pmod("id", 7) == 0)
        .select(
            F.col("id").alias("src"),
            ((F.col("id") * 37 + 11) % n_edges).alias("dst"),
        )
    )
    edges = ring.unionByName(chords).localCheckpoint(eager=True)
    seeds = spark.createDataFrame([(0,)], ["node"])
    hops = bfs_hops(edges, seeds, max_hops=4)
    per_level = {
        r["hop"]: r["n"]
        for r in hops.groupBy("hop").agg(F.count("*").alias("n")).collect()
    }
    out["bfs_sec"] = round(time.time() - t0, 2)
    out["bfs_levels"] = {int(k): int(v) for k, v in sorted(per_level.items())}
    assert per_level[0] == 1 and all(
        per_level.get(h, 0) >= 1 for h in range(1, 5)
    ), "BFS levels degenerate"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
