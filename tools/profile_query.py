"""Per-query drill-down profiler for optimization work.

Usage: python tools/profile_query.py name1[,name2,...] [sf_dir] [reps]

For each query, in ONE fresh JVM per invocation (run one name at a time
for ground truth), reports per rep:
  - build_sec: time spent in the query builder (driver-side actions —
    eager checkpoints, collects — run here)
  - write_sec: time of the noop sink write (the distributed compute)
  - jobs: Spark jobs launched in each phase (statusTracker delta)
  - exchanges / aqe shuffle reads / python eval nodes in the executed plan

Same session settings as bench.py so numbers are comparable.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [n for n in sys.argv[1].replace(",", " ").split() if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from inception_eventstore_spark.plans.queries import spark_queries
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        extra_configs={
            "spark.driver.memory": "16g",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    st = spark.sparkContext.statusTracker()

    # same warmup as bench.py
    qs["x5_min_ts"](spark, sf_dir).collect()

    def _gc() -> None:
        # cache honesty (VERDICT r11 #1): persist() pins plans in the
        # session CacheManager across reps — rep1+ would read rep0's
        # columnar cache and report near-zero recompute. Same
        # discipline as bench.py's timing loop.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def njobs() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    for name in names:
        for rep in range(reps):
            j0 = njobs()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = njobs()
            if rep == reps - 1:
                qe = df._jdf.queryExecution()
                plan = qe.executedPlan().toString()
                n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
                n_rng = len(re.findall(r"Exchange rangepartitioning", plan))
                n_sp = len(re.findall(r"Exchange SinglePartition", plan))
                n_py = len(
                    re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|"
                               r"MapInPandas|FlatMapGroupsInPandas", plan)
                )
                n_smj = len(re.findall(r"SortMergeJoin", plan))
                n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
                n_shj = len(re.findall(r"ShuffledHashJoin", plan))
                n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
                extra = (f" exch(hash={n_ex},range={n_rng},single={n_sp})"
                         f" join(smj={n_smj},bhj={n_bhj},shj={n_shj},"
                         f"bnl={n_bnl}) py={n_py}")
            else:
                extra = ""
            print(
                f"{name} rep{rep}: build={t1 - t0:.3f}s ({j1 - j0} jobs) "
                f"write={t2 - t1:.3f}s ({j2 - j1} jobs) "
                f"total={t2 - t0:.3f}s{extra}",
                flush=True,
            )
            del df
            _gc()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
