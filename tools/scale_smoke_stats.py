"""Session-4 r6 stats/ML-operator scale smoke: resampling, A/B,
robust-trend, sketch-window, density-clustering and item-CF families
at ~100× the sf0.1 key volume.

Shapes proven here (the 100 TB argument for each):
- poisson_bootstrap_ci: 1.5M orders × 64 replicates — the explode is
  map-side and partial-aggregates to exactly 64 integer rows; time
  should scale with rows·b, memory with b.
- cuped/srm: 10M events, 1.5M users — one user-keyed partial-agg
  shuffle then scalar folds.
- theil_sen / ccf / holt: 10M events but a FIXED day axis — the pair
  grids and recurrences are calendar-bounded, so their cost must stay
  flat as keys grow (the km_survival property).
- kmv / hll_sliding: sketch state is k·|groups| / days·2^p rows no
  matter the input.
- dbscan_2d: 1M synthetic uniform points, eps sized for ~3 expected
  neighbors — cell-stencil candidate volume ~9·n, never n².
- item_item_topk: 10× lineitem baskets (basket count grows, basket
  SIZE fixed) — pair volume grows linearly with baskets.
- r7 family (mann_kendall / mann_whitney_u / logrank / eb_shrunk /
  propensity_strata / dp_noisy_counts): calendar-bounded pair grids,
  distinct-value-axis rank state, user-keyed partial-agg rollups and
  |groups|-sized releases — every one must stay near-flat as events
  grow 100×.
- r8 family (chi_square / kruskal_wallis / spearman / ipw_ate /
  seasonal_decompose / permutation_pvalue / v_optimal_histogram /
  cochran_armitage): bounded R×C grids, distinct-value rank axes,
  user-keyed rollups, calendar-bounded moving windows, a b-way
  map-side explode, and 32-bin DP pre-aggregations — the same
  flat-cost shapes, proven at 10M events.

Usage: python tools/scale_smoke_stats.py [sf_dir] [reps]
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

    from inception_eventstore_spark.operators import sketches as SK
    from inception_eventstore_spark.operators.basket import item_item_topk
    from inception_eventstore_spark.operators.clustering import dbscan_2d
    from inception_eventstore_spark.operators.profile import (
        cuped_adjustment,
        srm_check,
    )
    from inception_eventstore_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )
    from inception_eventstore_spark.operators.timeseries import (
        cross_correlation_daily,
        holt_linear_daily,
        theil_sen_daily_trend,
    )
    from inception_eventstore_spark.session import get_spark
    from inception_eventstore_spark.sources.tables import load_table

    spark = get_spark(
        "scale-smoke-stats",
        extra_configs={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _gc() -> None:
        # bench.py's r5 lesson: localCheckpoint blocks are reaped only
        # when a JVM GC runs, and a 16g heap may never GC on its own —
        # without this, later queries in the single-JVM smoke pay
        # accumulated storage/old-gen pressure (observed 2.5 s -> 35 s
        # on haar purely by position)
        spark.sparkContext._jvm.System.gc()

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
    (r,) = cuped_adjustment(ev).collect()
    volumes["cuped_users"] = int(r["n_users"])
    timings["cuped_adjustment"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = srm_check(ev, n_buckets=3).collect()
    volumes["srm_users"] = int(r["n_users"])
    timings["srm_check"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["ccf_lags"] = cross_correlation_daily(
        ev, "error", "purchase", max_lag=7
    ).count()
    timings["ccf_leadlag"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["theil_sen_keys"] = theil_sen_daily_trend(ev).count()
    timings["theil_sen_trend"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["holt_days"] = holt_linear_daily(ev).count()
    timings["holt_linear"] = round(time.time() - t0, 3)
    _gc()

    # ---- r7 family: same calendar-bounded / partial-agg shapes ----
    from inception_eventstore_spark.operators.funnel import logrank_test
    from inception_eventstore_spark.operators.pii import dp_noisy_counts
    from inception_eventstore_spark.operators.profile import (
        mann_whitney_u,
        propensity_strata,
    )
    from inception_eventstore_spark.operators.scoring import (
        eb_shrunk_rates,
    )
    from inception_eventstore_spark.operators.timeseries import (
        mann_kendall_daily,
    )

    t0 = time.time()
    volumes["mann_kendall_keys"] = mann_kendall_daily(ev).count()
    timings["mann_kendall"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = mann_whitney_u(ev, "click", "purchase").collect()
    volumes["mwu_n"] = int(r["n_a"] + r["n_b"])
    timings["mann_whitney_u"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = logrank_test(ev, "signup", "purchase").collect()
    volumes["logrank_users"] = int(r["n_arm1"] + r["n_arm0"])
    timings["logrank_test"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["eb_keys"] = eb_shrunk_rates(ev).count()
    timings["eb_shrunk_rates"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["propensity_strata_rows"] = propensity_strata(ev).count()
    timings["propensity_strata"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["dp_groups"] = dp_noisy_counts(ev).count()
    timings["dp_noisy_counts"] = round(time.time() - t0, 3)
    _gc()

    # brier at the full event volume: with the pre-r8 unscaled
    # accumulators this crashed under ANSI past ~2^23 rows (ADVICE r7
    # medium) — the 2^14-quantum rescale must survive 10M+ rows
    from inception_eventstore_spark.operators.scoring import (
        brier_decomposition,
    )

    scored = ev.select(
        (
            F.pmod(F.xxhash64("user_id", "ts"), F.lit(1 << 30))
            / F.lit(float(1 << 30))
        ).alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    t0 = time.time()
    (r,) = brier_decomposition(scored, "p", "y", bins=10).collect()
    volumes["brier_rows"] = int(r["n"])
    timings["brier_decomposition"] = round(time.time() - t0, 3)
    _gc()

    # ---- r8 family: chi2 / KW / Spearman / IPW / seasonal / perm ----
    from inception_eventstore_spark.operators.profile import (
        chi_square_independence,
        ipw_ate,
        kruskal_wallis,
        spearman_user_corr,
    )
    from inception_eventstore_spark.operators.sampling import (
        permutation_pvalue,
    )
    from inception_eventstore_spark.operators.timeseries import (
        seasonal_decompose_daily,
    )

    t0 = time.time()
    (r,) = chi_square_independence(ev).collect()
    volumes["chi_square_n"] = int(r["n"])
    timings["chi_square_independence"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    rows = kruskal_wallis(ev).collect()
    volumes["kruskal_groups"] = len(rows)
    timings["kruskal_wallis"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = spearman_user_corr(ev).collect()
    volumes["spearman_n"] = int(r["n"])
    timings["spearman_corr"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = ipw_ate(ev).collect()
    volumes["ipw_users"] = int(r["n_users"])
    timings["ipw_ate"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["seasonal_days"] = seasonal_decompose_daily(ev).count()
    timings["seasonal_decompose"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = permutation_pvalue(ev, b=64).collect()
    volumes["perm_n"] = int(r["n_a"] + r["n_b"])
    timings["permutation_pvalue"] = round(time.time() - t0, 3)
    _gc()

    from inception_eventstore_spark.operators.timeseries import (
        haar_energy_daily,
    )

    t0 = time.time()
    volumes["haar_levels"] = haar_energy_daily(ev).count()
    timings["haar_energy_daily"] = round(time.time() - t0, 3)
    _gc()

    from inception_eventstore_spark.operators.histogram import (
        v_optimal_histogram,
    )
    from inception_eventstore_spark.operators.profile import (
        cochran_armitage,
    )

    t0 = time.time()
    rows = v_optimal_histogram(ev, "value", n_bins=32, k=8).collect()
    volumes["vopt_rows"] = sum(int(r["n_rows"]) for r in rows)
    timings["v_optimal_histogram"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = cochran_armitage(ev).collect()
    volumes["cochran_users"] = int(r["n_users"])
    timings["cochran_armitage"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    sk = SK.kmv_sketch(ev, "user_id", ["event_type"], k=64)
    volumes["kmv_rows"] = sk.count()
    timings["kmv_sketch"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["hll_sliding_days"] = SK.hll_sliding_distinct(
        ev, window_days=7
    ).count()
    timings["hll_sliding"] = round(time.time() - t0, 3)
    _gc()

    # 1.5M orders × 64 deterministic replicates
    o0 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    okb = int(o0.agg(F.max("o_orderkey")).first()[0]) + 1
    orders = (
        o0.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("_rep") * okb).alias(
                "o_orderkey"
            ),
            "o_totalprice",
        )
        .repartition(64)
        .persist()
    )
    volumes["orders"] = orders.count()
    t0 = time.time()
    (r,) = poisson_bootstrap_ci(
        orders, "o_orderkey", "o_totalprice", b=64
    ).collect()
    volumes["bootstrap_n"] = int(r["n_rows"])
    timings["poisson_bootstrap"] = round(time.time() - t0, 3)
    _gc()
    orders.unpersist()

    # 1M synthetic uniform 2-d points, eps for ~3 expected neighbors
    n_pts = 1_000_000
    pts = spark.range(n_pts).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1 << 30))
         / F.lit(float(1 << 30))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1 << 30))
         / F.lit(float(1 << 30))).alias("y"),
    )
    t0 = time.time()
    roles = dbscan_2d(pts, "id", "x", "y", eps=0.001, min_pts=3)
    rc = roles.groupBy("role").count().collect()
    volumes.update(
        {f"dbscan_{r['role']}": int(r["count"]) for r in rc}
    )
    timings["dbscan_1m"] = round(time.time() - t0, 3)
    _gc()

    # 10× lineitem baskets for item-item CF
    li0 = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    lkb = int(li0.agg(F.max("l_orderkey")).first()[0]) + 1
    li = (
        li0.crossJoin(spark.range(10).select(F.col("id").alias("_r")))
        .select(
            (F.col("l_orderkey") + F.col("_r") * lkb).alias(
                "l_orderkey"
            ),
            "l_partkey",
        )
        .repartition(64)
        .persist()
    )
    volumes["lineitems10x"] = li.count()
    t0 = time.time()
    cf = item_item_topk(
        li, basket_col="l_orderkey", item_col="l_partkey", k=5
    )
    volumes["item_cf_rows"] = cf.count()
    timings["item_item_cf"] = round(time.time() - t0, 3)
    _gc()
    li.unpersist()

    # ---- r9 family: ANOVA / Welch / BF / McNemar / Kendall /
    # forecast accuracy / Nelson-Aalen — user-keyed or group-moment
    # rollups plus calendar-bounded driver folds, all flat-cost ------
    from inception_eventstore_spark.operators.funnel import (
        nelson_aalen_hazard,
    )
    from inception_eventstore_spark.operators.profile import (
        anova_oneway,
        brown_forsythe,
        kendall_tau_daily,
        mcnemar_paired,
        welch_ttest,
    )
    from inception_eventstore_spark.operators.timeseries import (
        forecast_accuracy,
    )

    t0 = time.time()
    (r,) = anova_oneway(ev).collect()
    volumes["anova_n"] = int(r["n_rows"])
    assert r["f_stat"] is not None
    timings["anova_oneway"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = welch_ttest(ev).collect()
    volumes["welch_n"] = int(r["n_a"] + r["n_b"])
    assert r["t_welch"] is not None
    timings["welch_ttest"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = brown_forsythe(ev).collect()
    volumes["bf_n"] = int(r["n_rows"])
    assert r["f_bf"] is not None
    timings["brown_forsythe"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = mcnemar_paired(ev).collect()
    volumes["mcnemar_users"] = int(r["n_users"])
    timings["mcnemar_paired"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = kendall_tau_daily(ev).collect()
    volumes["kendall_days"] = int(r["n_days"])
    assert r["tau_ppm"] is not None
    timings["kendall_tau_daily"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    (r,) = forecast_accuracy(ev).collect()
    volumes["forecast_days"] = int(r["n_days"])
    timings["forecast_accuracy"] = round(time.time() - t0, 3)
    _gc()

    t0 = time.time()
    volumes["nelson_aalen_days"] = nelson_aalen_hazard(
        ev, start_type="signup", event_type="purchase"
    ).count()
    timings["nelson_aalen"] = round(time.time() - t0, 3)
    _gc()

    ev.unpersist()

    print(
        json.dumps(
            {
                "smoke": "stats_r6s4",
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
