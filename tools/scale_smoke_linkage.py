"""Linkage scale smoke: 5M-name fuzzy join + entity_clusters
end-to-end (VERDICT r8 next #3; default trimmed 10M -> 5M per VERDICT
r9 next #9 so the full smoke suite stays runnable in one sitting —
every bound below is an exact function of n, and the planted pair
graph stays far above connected_components' 1M-edge driver-finish
dial, so the DISTRIBUTED star loop is what this smoke exercises;
pass 10000000 to reproduce the r9 record).

What it demonstrates (the 100 TB posture, on one box):

- the FastSS deletion-neighborhood candidate generation is LINEAR:
  each side emits exactly Σ (len+1) blocking-key rows — asserted
  EXACTLY below — never |L|·|R| pairs;
- the equi-join on those keys yields exactly the planted candidate
  pairs (names are 16 random hex chars, so accidental edit-distance-1
  neighbors are ~2e-3 expected over 10M rows — the assert is exact),
  i.e. ~1.2e7 candidates where a cross join would build 1.2e14;
- `entity_clusters` (fuzzy join → alternating-star connected
  components → full labeling) converges and labels every node, with
  the planted cluster-size histogram reproduced exactly:
  every left i clusters with its 1-deletion corruption, every 5th
  additionally with a second corruption (size-3 star).

Usage: python tools/scale_smoke_linkage.py [n_names]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _name16() -> "F.Column":
    """16 random-looking hex chars, deterministic in the row id."""
    return F.concat(
        F.format_string("%08x", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << 32))),
        F.format_string("%08x", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << 32))),
    )


def _delete_at(name, pos):
    """name with the character at 1-based position ``pos`` removed."""
    return F.concat(
        name.substr(F.lit(1), pos - 1),
        name.substr(pos + 1, F.length(name)),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000

    from inception_eventstore_spark.operators.linkage import (
        deletion_keys,
        entity_clusters,
    )
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "scale-smoke-linkage",
        extra_configs={"spark.driver.memory": "16g",
                       "spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_names": n}
    n_b = (n + 4) // 5  # every 5th left row gets a second corruption

    left = (
        spark.range(n)
        .select(F.col("id").alias("lid"), _name16().alias("lname"))
        .repartition(64)
        .persist()
    )
    # corruption A: delete at position (i % 16) + 1 — every row;
    # corruption B: delete at position (i*7 % 16) + 1 — every 5th row,
    # with ids offset by n so the right side's ids stay unique
    pos_a = (F.col("id") % 16 + 1).cast("int")
    pos_b = ((F.col("id") * 7) % 16 + 1).cast("int")
    right = (
        spark.range(n)
        .select(F.col("id").alias("rid"),
                _delete_at(_name16(), pos_a).alias("rname"))
        .unionByName(
            spark.range(n)
            .where(F.col("id") % 5 == 0)
            .select((F.col("id") + n).alias("rid"),
                    _delete_at(_name16(), pos_b).alias("rname"))
        )
        .repartition(64)
        .persist()
    )
    out["left_rows"] = left.count()
    out["right_rows"] = right.count()
    assert out["right_rows"] == n + n_b

    # --- the linear candidate bound, proven exactly -----------------
    # each row emits exactly (1 + #distinct deletions) blocking keys —
    # at most len+1 (17 per 16-char name): deleting any position of an
    # equal-adjacent-char run yields the same string, so #distinct
    # deletions = len − #(adjacent equal pairs). Both sides of the
    # identity are computed independently and asserted EQUAL, proving
    # the Σ (len+1) linear bound row-exactly — NEVER an |L|·|R| surface.
    def _adj_pairs(df, col):
        dup = F.expr(
            f"size(filter(sequence(1, length({col}) - 1), "
            f"i -> substring({col}, i, 1) = substring({col}, i + 1, 1)))"
        )
        return int(df.agg(F.sum(dup)).first()[0])

    t0 = time.time()
    lk = left.select(F.explode(deletion_keys("lname")).alias("k"))
    rk = right.select(F.explode(deletion_keys("rname")).alias("k"))
    n_lk, n_rk = lk.count(), rk.count()
    adj_l, adj_r = _adj_pairs(left, "lname"), _adj_pairs(right, "rname")
    out["key_rows_sec"] = round(time.time() - t0, 2)
    out["left_key_rows"] = n_lk
    out["right_key_rows"] = n_rk
    assert n_lk == 17 * n - adj_l, (
        f"left key rows {n_lk} != 17n - {adj_l}"
    )
    assert n_rk == 16 * (n + n_b) - adj_r, (
        f"right key rows {n_rk} != 16*(n+n_b) - {adj_r}"
    )

    # join candidates == planted pairs exactly: each corruption shares
    # exactly ONE key with its source (its identity == the source's
    # deletion at the corrupted position), and 16-hex-char random
    # names have no accidental dist-1 neighbors at this scale
    t0 = time.time()
    candidates = int(
        lk.withColumnRenamed("k", "_k").join(
            rk.withColumnRenamed("k", "_k"), "_k"
        ).count()
    )
    out["candidate_join_sec"] = round(time.time() - t0, 2)
    out["candidate_pairs"] = candidates
    assert candidates == n + n_b, (
        f"candidate bound violated: {candidates} != planted {n + n_b} "
        f"(a cross join would be {n * (n + n_b)})"
    )

    # --- entity_clusters end-to-end ---------------------------------
    t0 = time.time()
    labeled = entity_clusters(
        left, right, "lname", "rname", "lid", "rid", right_id_offset=n
    ).persist()
    total = labeled.count()
    out["entity_clusters_sec"] = round(time.time() - t0, 2)
    out["labeled_nodes"] = total
    assert total == 2 * n + n_b, f"labeled {total} != {2 * n + n_b}"

    sizes = (
        labeled.groupBy("component").count()
        .groupBy("count").agg(F.count("*").alias("n_clusters"))
        .collect()
    )
    hist = {int(r["count"]): int(r["n_clusters"]) for r in sizes}
    out["cluster_size_histogram"] = hist
    assert hist == {2: n - n_b, 3: n_b}, (
        f"cluster histogram {hist} != {{2: {n - n_b}, 3: {n_b}}}"
    )
    labeled.unpersist()
    left.unpersist()
    right.unpersist()

    out["total_sec"] = round(
        out["key_rows_sec"] + out["candidate_join_sec"]
        + out["entity_clusters_sec"], 2
    )
    print(json.dumps({"smoke": "linkage_r9", **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
