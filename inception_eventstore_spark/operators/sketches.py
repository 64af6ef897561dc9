"""Portable cardinality / frequency sketches (HyperLogLog, Count-Min).

Spark ships ``approx_count_distinct`` (HLL++) and DuckDB ships
``approx_count_distinct`` (its own HLL), but their register layouts and
hash functions differ, so the estimates are engine-specific — the
repo's ``approx_stats`` query is rows-only for exactly that reason.
These operators instead build the sketches from the PORTABLE 60-bit md5
hash (`sampling.md5_prefix60`) with pure integer register arithmetic,
so the full sketch state replays bit-for-bit in any engine with ``md5``
— the estimate becomes a value-oracled query instead of a trust-me
number.

Scale story (100 TB): both sketches are classic one-pass, map-side
combinable aggregations. HLL shuffles at most ``groups x m`` register
rows (m = 2^p, default 512) regardless of input size; Count-Min
shuffles ``d x w`` counters. Neither ever materializes the distinct
set. The only driver-side state is the final per-group estimate row.

Register encoding (HLL, p register bits over the 60-bit hash):
    idx = h mod 2^p              (low p bits)
    w   = h div 2^p              (the remaining 60-p bits)
    rho = (60 - p + 1) - bitlen(w)   [w = 0 -> 60 - p + 1]
where ``bitlen`` is ``length(bin(w))`` — both Spark and DuckDB print
minimal binary digits, so the leading-zero count is exact integer
arithmetic, never a floating log2. The harmonic denominator is kept as
the exact BIGINT ``sum(2^(Q - M_j))`` with Q = 60 - p + 1 <= 52 (p >=
9), so register state hash-compares exactly across engines; only the
final alpha * m^2 * 2^Q / denom estimate touches doubles.

References: Flajolet et al. 2007 (HyperLogLog), Heule et al. 2013
(HLL++ small-range linear counting), Cormode & Muthukrishnan 2005
(Count-Min). Reference parity: the event-store reference exposes only
exact COUNT counters (MessageCounter.cs) — these sketches are the
100-TB-scale generalization the driver's pipeline mandate asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.sampling import md5_prefix60

__all__ = [
    "hll_alpha",
    "hll_registers",
    "hll_distinct",
    "hll_merge",
    "hll_estimate_from_registers",
    "cms_sketch",
    "cms_estimate",
    "cms_merge",
    "binned_histogram",
    "quantiles_from_histogram",
]


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_raw_constant(m: int, q: int) -> float:
    """alpha_m * m^2 * 2^Q as one python float — the shared numerator."""
    return hll_alpha(m) * m * m * float(1 << q)


def _hll_rho(value: Column, p: int) -> tuple[Column, Column]:
    """(register index, rho) for one value under the portable hash."""
    q = 60 - p  # bits left in w
    h = md5_prefix60(F.concat(F.lit("hll:"), value.cast("string")))
    idx = F.pmod(h, F.lit(1 << p))
    w = (h / F.lit(1 << p)).cast("bigint")  # h >= 0: div == shiftright
    rho = F.when(w > 0, F.lit(q + 1) - F.length(F.bin(w))).otherwise(
        F.lit(q + 1)
    )
    return idx, rho


def hll_registers(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 9,
) -> DataFrame:
    """Per-(group, register) max-rho table — the whole sketch state.

    One map-side-combinable aggregation; output is at most
    ``|groups| * 2^p`` rows no matter how large the input.
    """
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    groups = group_cols or []
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    idx, rho = _hll_rho(value, p)
    return (
        df.select(*groups, idx.alias("reg_idx"), rho.alias("rho"))
        .groupBy(*groups, "reg_idx")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    p: int = 9,
) -> DataFrame:
    """HLL distinct-count estimate per group from the portable sketch.

    Output per group: ``hll_denom`` (exact BIGINT register certificate
    ``sum 2^(Q - M_j)`` incl. ``2^Q`` per empty register), ``hll_zeros``
    (empty-register count), ``hll_est`` (double; linear counting when
    the raw estimate is <= 2.5 m and zeros remain — Flajolet's
    small-range correction).
    """
    groups = group_cols or []
    regs = hll_registers(df, value_col, groups, p)
    return hll_estimate_from_registers(regs, p=p, group_cols=groups)


def hll_oracle_sql(
    source_sql: str,
    value_expr: str,
    group_cols: list[str] | None = None,
    p: int = 9,
) -> str:
    """DuckDB twin of ``hll_distinct`` over ``source_sql`` (a relation
    exposing ``value_expr`` and the group columns). Same integer
    register arithmetic; kept next to the operator so the two can never
    drift."""
    groups = group_cols or []
    m = 1 << p
    q = 60 - p + 1
    c = _hll_raw_constant(m, q)
    gsel = "".join(f"{g}, " for g in groups)
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    gby_reg = "GROUP BY " + ", ".join([*groups, "reg_idx"])
    return f"""
WITH src AS ({source_sql}),
h AS (SELECT {gsel}
  CAST(concat('0x', substr(md5(concat('hll:', CAST({value_expr} AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM src),
r AS (SELECT {gsel} h % {m} AS reg_idx,
  CASE WHEN h // {m} > 0 THEN {q} - length(bin(h // {m}))
       ELSE {q} END AS rho
  FROM h),
regs AS (SELECT {gsel} reg_idx, max(rho) AS m_j FROM r {gby_reg}),
agg AS (SELECT {gsel}
  CAST(sum(1::BIGINT << ({q} - m_j)) AS BIGINT) AS present_denom,
  CAST(count(*) AS BIGINT) AS n_regs FROM regs {gby}),
fin AS (SELECT {gsel}
  CAST(present_denom + ({m} - n_regs) * (1::BIGINT << {q}) AS BIGINT) AS hll_denom,
  CAST({m} - n_regs AS BIGINT) AS hll_zeros FROM agg)
SELECT {gsel} hll_denom, hll_zeros,
  CASE WHEN hll_zeros > 0 AND {c!r} / hll_denom <= {2.5 * m!r}
       THEN {float(m)!r} * ln({float(m)!r} / hll_zeros)
       ELSE {c!r} / hll_denom
  END AS hll_est
FROM fin
"""


def cms_sketch(
    df: DataFrame,
    value_col: str | Column,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Count-Min sketch: ``depth`` independent md5-salted hash rows of
    ``width`` counters. One explode + one aggregation; the sketch is
    ``depth * width`` rows regardless of input size."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row_id"),
                F.pmod(
                    md5_prefix60(
                        F.concat(F.lit(f"cms{r}:"), value.cast("string"))
                    ),
                    F.lit(width),
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row_id").alias("row_id"),
                 F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for ``keys[key_col]``: min over the sketch rows
    of the key's bucket counter. The sketch is tiny — broadcast it and
    keep the key side map-side."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        F.pmod(
                            md5_prefix60(
                                F.concat(F.lit(f"cms{r}:"), key.cast("string"))
                            ),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row_id", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .fillna({"n": 0})
        .groupBy(key_col)
        .agg(F.min("n").cast("bigint").alias("cms_est"))
    )


def cms_oracle_sql(
    source_sql: str,
    value_expr: str,
    keys_sql: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB twin of ``cms_sketch`` + ``cms_estimate``."""
    def bucket(expr: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('cms', r.r, ':', "
            f"CAST({expr} AS VARCHAR))), 1, 15)) AS BIGINT) % {width}"
        )

    return f"""
WITH src AS ({source_sql}),
rows_ AS (SELECT range AS r FROM range(0, {depth})),
sk AS (SELECT r.r AS row_id, {bucket(value_expr)} AS bucket,
  CAST(count(*) AS BIGINT) AS n
  FROM src, rows_ r GROUP BY 1, 2),
keys_ AS ({keys_sql}),
probes AS (SELECT k.{key_col}, r.r AS row_id, {bucket(f'k.{key_col}')} AS bucket
  FROM keys_ k, rows_ r)
SELECT p.{key_col},
  CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS cms_est
FROM probes p LEFT JOIN sk ON p.row_id = sk.row_id AND p.bucket = sk.bucket
GROUP BY p.{key_col}
"""


def hll_merge(
    register_tables: list[DataFrame],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge HLL sketches: register-wise MAX over any number of
    ``hll_registers`` outputs — the property that makes HLL a
    maintainable materialized aggregate (per-day/per-partition register
    tables merge in ≤ groups·m rows of work, no raw-data re-scan;
    union-distinct cardinality for free). Exact: max is associative,
    commutative and idempotent, so merged state == the sketch built
    from the concatenated raw inputs, bit-for-bit."""
    if not register_tables:
        raise ValueError("register_tables must be non-empty")
    from functools import reduce

    groups = group_cols or []
    u = reduce(DataFrame.unionByName, register_tables)
    return u.groupBy(*groups, "reg_idx").agg(F.max("m_j").alias("m_j"))


def hll_estimate_from_registers(regs: DataFrame, p: int = 9,
                                group_cols: list[str] | None = None,
                                ) -> DataFrame:
    """Estimate from a (merged) register table — the read half of
    ``hll_distinct``, split out so materialized register state can be
    queried without rebuilding."""
    groups = group_cols or []
    m = 1 << p
    q = 60 - p + 1
    agg = regs.groupBy(*groups).agg(
        F.sum(F.expr(f"shiftleft(1L, {q} - m_j)"))
        .cast("bigint")
        .alias("_present_denom"),
        F.count("*").cast("bigint").alias("_n_regs"),
    )
    zeros = F.lit(m) - F.col("_n_regs")
    denom = (
        F.col("_present_denom")
        + zeros * F.shiftleft(F.lit(1).cast("bigint"), q)
    ).cast("bigint")
    raw = F.lit(_hll_raw_constant(m, q)) / F.col("hll_denom")
    est = F.when(
        (F.col("hll_zeros") > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("hll_zeros")),
    ).otherwise(raw)
    return (
        agg.withColumn("hll_denom", denom)
        .withColumn("hll_zeros", zeros.cast("bigint"))
        .withColumn("hll_est", est)
        .drop("_present_denom", "_n_regs")
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge Count-Min sketches built with the SAME depth/width/salts:
    counter-wise SUM — linear, so merged == rebuilt exactly, and
    per-partition sketches fold into a stream-long frequency table
    without re-reading history."""
    if not sketches:
        raise ValueError("sketches must be non-empty")
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches)
    return u.groupBy("row_id", "bucket").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def binned_histogram(
    df: DataFrame,
    value_col: str | Column,
    lo: float,
    hi: float,
    bins: int = 4096,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-grid histogram sketch: (group..., bin, n) with bin =
    floor((x − lo)/(hi − lo)·bins), clamped to [0, bins−1]. The
    quantile-sketch companion to the HLL/CMS pair: one map-side-
    combinable pass, ≤ groups·bins counter rows however large the
    input, MERGEABLE by counter addition (``cms_merge`` shape), and —
    because bin assignment is floor() of an identically-computed
    double (the sq8_encode rule) — bit-identical on any engine given
    the same (lo, hi) contract. Callers obtain lo/hi from a scalar
    min/max aggregate and ROUND THEM AT 6 DP before passing (the
    cross-engine edge contract used by psi/profile)."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    groups = group_cols or []
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    raw = F.floor(
        (value.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(bins))
    ).cast("bigint")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (
        df.where(value.isNotNull())
        .select(*groups, b.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def quantiles_from_histogram(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (merged) `binned_histogram`: for each
    requested q, the value at the left edge of the first bin whose
    cumulative count reaches ceil(q·N), linearly interpolated inside
    the bin — error ≤ one bin width (the fixed-grid analog of t-digest
    accuracy, with none of its merge nondeterminism).

    Engine-portable by construction: the target rank is exact integer
    arithmetic, the cumulative scan runs over ≤ bins rows per group
    (collected driver-side — bounded sketch state, same class as the
    HLL register collect), and the interpolation is a deterministic
    double expression of integers and the (lo, hi) contract."""
    groups = group_cols or []
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    width = (float(hi) - float(lo)) / bins
    rows = hist.select(*groups, "bin", "n").collect()
    from collections import defaultdict

    per: dict = defaultdict(dict)
    for r in rows:
        key = tuple(r[g] for g in groups)
        per[key][int(r["bin"])] = int(r["n"])
    out = []
    for key, cnts in sorted(per.items()):
        total = sum(cnts.values())
        for q in qs:
            target = max(1, -(-int(q * total * 1_000_000) // 1_000_000))
            cum = 0
            est = float(hi)
            for b in sorted(cnts):
                nxt = cum + cnts[b]
                if nxt >= target:
                    frac = (target - cum) / cnts[b]
                    est = float(lo) + (b + frac) * width
                    break
                cum = nxt
            out.append((*key, float(q), est, total))
    spark = hist.sparkSession
    gschema = "".join(f"{g} string, " for g in groups)
    return spark.createDataFrame(
        out, f"{gschema}q double, est double, n bigint"
    )


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str | Column,
    p: int = 9,
) -> DataFrame:
    """Set-overlap estimates between two relations from HLL register
    state alone — the sketch-algebra payoff: |A∪B| comes from the
    register-wise MAX merge (exact sketch union), and |A∩B| by
    inclusion-exclusion, so two 100 TB sides compare in ≤ 2^p register
    rows each with no join of the raw values. The standard audit for
    'how much does this crawl snapshot overlap the last one' before
    paying for a real dedup pass.

    Both registers tables are eagerly checkpointed (≤ 2^p rows each) so
    each raw side is scanned ONCE, feeding both its own estimate and
    the union merge. Error: ±~1.04/√m per estimate; the intersection
    inherits the sum of errors (clamped at 0) — small-overlap readings
    are noise-dominated, which is inherent to HLL inclusion-exclusion
    (Flajolet 2007); use MinHash when you need calibrated small
    Jaccards.

    Output one row: (denom_a, denom_b, denom_union — exact BIGINT
    certificates; est_a, est_b, est_union, est_intersection, jaccard —
    4-dp doubles, jaccard NULL on an empty union).
    """
    ra = hll_registers(df_a, value_col, None, p).localCheckpoint(
        eager=True
    )
    rb = hll_registers(df_b, value_col, None, p).localCheckpoint(
        eager=True
    )
    ru = hll_merge([ra, rb])

    def _est(regs: DataFrame, tag: str) -> DataFrame:
        return hll_estimate_from_registers(regs, p=p).select(
            F.col("hll_denom").alias(f"denom_{tag}"),
            F.col("hll_est").alias(f"_e_{tag}"),
        )

    one = (
        _est(ra, "a")
        .crossJoin(F.broadcast(_est(rb, "b")))
        .crossJoin(F.broadcast(_est(ru, "union")))
    )
    inter = F.greatest(
        F.col("_e_a") + F.col("_e_b") - F.col("_e_union"), F.lit(0.0)
    )
    return one.select(
        "denom_a",
        "denom_b",
        F.col("denom_union"),
        F.round("_e_a", 4).alias("est_a"),
        F.round("_e_b", 4).alias("est_b"),
        F.round("_e_union", 4).alias("est_union"),
        F.round(inter, 4).alias("est_intersection"),
        F.round(
            F.when(F.col("_e_union") > 0.0, inter / F.col("_e_union")),
            4,
        ).alias("jaccard"),
    )


def hll_overlap_oracle_sql(
    source_a: str, source_b: str, value_expr: str, p: int = 9
) -> str:
    """DuckDB twin of ``hll_overlap`` — registers for each side, MAX
    merge for the union, identical integer certificates and estimate
    arithmetic. Kept beside the operator so they cannot drift."""
    m = 1 << p
    q = 60 - p + 1
    c = _hll_raw_constant(m, q)

    def regs(src: str, name: str) -> str:
        return f"""{name} AS (
  SELECT h % {m} AS reg_idx,
    max(CASE WHEN h // {m} > 0 THEN {q} - length(bin(h // {m}))
        ELSE {q} END) AS m_j
  FROM (SELECT CAST(concat('0x', substr(md5(concat('hll:',
      CAST({value_expr} AS VARCHAR))), 1, 15)) AS BIGINT) AS h
    FROM ({src}) s_{name})
  GROUP BY 1)"""

    def est(regs_name: str, tag: str) -> str:
        return f"""e_{tag} AS (
  SELECT denom, zeros,
    CASE WHEN zeros > 0 AND {c!r} / denom <= {2.5 * m!r}
         THEN {float(m)!r} * ln({float(m)!r} / zeros)
         ELSE {c!r} / denom END AS est
  FROM (SELECT
    CAST(CAST(sum(1::BIGINT << ({q} - m_j)) AS BIGINT)
      + ({m} - count(*)) * (1::BIGINT << {q}) AS BIGINT) AS denom,
    CAST({m} - count(*) AS BIGINT) AS zeros
    FROM {regs_name}))"""

    return f"""
WITH {regs(source_a, 'ra')},
{regs(source_b, 'rb')},
ru AS (SELECT reg_idx, max(m_j) AS m_j
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
{est('ra', 'a')},
{est('rb', 'b')},
{est('ru', 'u')}
SELECT e_a.denom AS denom_a, e_b.denom AS denom_b,
  e_u.denom AS denom_union,
  round(e_a.est, 4) AS est_a, round(e_b.est, 4) AS est_b,
  round(e_u.est, 4) AS est_union,
  round(greatest(e_a.est + e_b.est - e_u.est, 0.0), 4)
    AS est_intersection,
  round(CASE WHEN e_u.est > 0.0
    THEN greatest(e_a.est + e_b.est - e_u.est, 0.0) / e_u.est END, 4)
    AS jaccard
FROM e_a, e_b, e_u
"""


def kmv_sketch(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    k: int = 64,
    shards: int = 64,
) -> DataFrame:
    """K-Minimum-Values (theta) sketch state: per group, the ``k``
    smallest DISTINCT portable 60-bit hashes of the value, ranked
    ``r`` in [1, k] (Bar-Yossef 2002; the Apache DataSketches theta
    family's core). The sketch is a fixed k-row certificate per group
    no matter how large the input, and two sketches merge by taking
    the k smallest of their union — see ``kmv_merge``.

    Scale shape: one distinct shuffle on (group, hash), then a
    TWO-PHASE top-k — phase 1 ranks within (group, hash mod
    ``shards``) so no task ever sees more than ~1/shards of a group's
    distinct values, phase 2 re-ranks the surviving ≤ k·shards
    candidates per group (bounded, so the per-group window is safe —
    never a full-group single task; CLAUDE.md rank-window rule).
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols or [])
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_prefix60(F.concat(F.lit("kmv:"), value.cast("string")))
    hashed = (
        df.where(value.isNotNull())
        .select(*groups, h.alias("h"))
        .distinct()
        .withColumn("_shard", F.pmod(F.col("h"), F.lit(shards)))
    )
    w1 = Window.partitionBy(*groups, "_shard").orderBy("h")
    cand = (
        hashed.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_shard", "_r1")
    )
    if groups:
        w2 = Window.partitionBy(*groups).orderBy("h")
        ranked = cand.withColumn(
            "r", F.row_number().over(w2).cast("bigint")
        )
        return ranked.where(F.col("r") <= k)
    # no group key → a plain window would be a SinglePartition funnel,
    # and the two-phase shard rank (used through r10) costs a range
    # shuffle + checkpoint + collect for a relation that phase 1 has
    # already bounded to ≤ k·shards rows AT ANY INPUT SCALE. Finish
    # driver-side instead (the km_survival bounded-axis pattern):
    # TakeOrdered pulls the k smallest candidates (per-partition top-k
    # + driver merge, no full sort), ranks are assigned in python, and
    # the k-row certificate returns via a 1-slice local frame.
    return _kmv_rank_bounded(df.sparkSession, cand, k)


def _kmv_rank_bounded(spark, cand: DataFrame, k: int) -> DataFrame:
    """(h, r) = the k smallest hashes of a BOUNDED candidate relation,
    ranked 1..k — the driver finish shared by the ungrouped
    ``kmv_sketch`` path and ``kmv_merge``. ``cand`` must be bounded by
    construction (≤ k·shards rows / ≤ Σ k_i rows), so the k-row collect
    is driver-safe at any corpus size; orderBy().limit() executes as
    TakeOrdered (per-partition top-k + driver merge, never a global
    sort)."""
    rows = cand.select("h").orderBy("h").limit(int(k)).collect()
    out = [(int(r["h"]), i + 1) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), "h bigint, r bigint"
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimate from KMV sketch state. When the group
    holds fewer than k distinct values the sketch IS the value set and
    the count is exact; otherwise the standard unbiased estimator
    (k-1)/theta with theta = h_k / 2^60, evaluated in pure integer
    fixed-point — ``(k-1)·2^40 div (h_k div 2^20)`` — so the result is
    a BIGINT that cannot drift between engines (the div-by-2^20
    pre-shift keeps the numerator under 2^63; it costs at most ~2^-40
    relative granularity against the sketch's own ~1/sqrt(k) error).
    """
    groups = list(group_cols or [])
    agg = sketch.groupBy(*groups).agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    num = (k - 1) << 40
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"div({num}, greatest(div(kth_hash, 1048576), 1))")
    )
    return agg.select(
        *groups,
        "n_kept",
        "kth_hash",
        est.cast("bigint").alias("kmv_est"),
    )


def kmv_merge(
    sketches: list[DataFrame], k: int = 64
) -> DataFrame:
    """Merge KMV sketches (columns ``h``, ``r``; any groups already
    projected away): k smallest distinct hashes of the union — the
    sketch-algebra property that lets 1000 executors each sketch a
    shard and a final k·n_shards-row pass produce the global sketch.
    Input is bounded (k rows per sketch); the global rank still runs
    through the two-phase shard rank so no SinglePartition window
    exists anywhere in the family.
    """
    from functools import reduce

    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    u = reduce(
        lambda a, b: a.unionByName(b),
        [s.select("h") for s in sketches],
    ).distinct()
    # input is ≤ Σ k_i rows by the sketch contract — driver finish
    # (same bounded-axis rationale as the ungrouped kmv_sketch path)
    return _kmv_rank_bounded(sketches[0].sparkSession, u, k)


def kmv_oracle_sql(
    source_sql: str,
    value_expr: str,
    group_expr: str,
    k: int = 64,
) -> str:
    """DuckDB twin of ``kmv_sketch`` → ``kmv_estimate`` per group plus
    the ``kmv_merge`` ALL row — identical hash, identical integer
    fixed-point, so the estimates are bit-equal. Kept beside the
    operator so the arithmetic can never drift."""
    num = (k - 1) << 40
    return f"""
WITH src AS ({source_sql}),
h AS (SELECT DISTINCT {group_expr} AS grp,
  CAST(concat('0x', substr(md5(concat('kmv:',
    CAST({value_expr} AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM src WHERE {value_expr} IS NOT NULL),
kept AS (SELECT grp, h,
    row_number() OVER (PARTITION BY grp ORDER BY h) AS r
  FROM h QUALIFY r <= {k}),
per_grp AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
    max(h) AS kth_hash
  FROM kept GROUP BY grp),
all_kept AS (SELECT DISTINCT h FROM kept),
all_rank AS (SELECT h, row_number() OVER (ORDER BY h) AS r
  FROM all_kept QUALIFY r <= {k}),
all_row AS (SELECT '__ALL__' AS grp,
    CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth_hash
  FROM all_rank),
u AS (SELECT * FROM per_grp UNION ALL SELECT * FROM all_row)
SELECT grp, n_kept, kth_hash,
  CAST(CASE WHEN n_kept < {k} THEN n_kept
    ELSE {num} // greatest(kth_hash // 1048576, 1)
  END AS BIGINT) AS kmv_est
FROM u
"""


def hll_sliding_distinct(
    events: DataFrame,
    window_days: int = 7,
    value_col: str = "user_id",
    ts_col: str = "ts",
    p: int = 9,
) -> DataFrame:
    """Trailing-``window_days`` distinct-value estimate per day from
    MERGED daily HLL register state — the sketch twin of the exact
    ``timeseries.sliding_distinct_users``, and the reason sketches
    matter for windows: per-day registers are built ONCE (≤ days·2^p
    rows however large the log), and every trailing window is a
    register-MAX merge of ≤ ``window_days`` day sketches — the log is
    scanned once regardless of window count, where the exact operator
    re-shuffles user-day contributions per window width.

    Same output certificate as ``hll_distinct`` per day: hll_denom
    (exact BIGINT), hll_zeros, hll_est. Days reported are those with
    ≥ 1 own event (the sliding_distinct_users convention).

    Scale: one partial-aggregated register rollup over the log, then a
    window_days-way explode of the tiny register table; everything
    after is bounded by days·2^p.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    daily = hll_registers(
        events.select(
            F.to_date(F.col(ts_col)).alias("_d"), F.col(value_col)
        ),
        value_col,
        ["_d"],
        p,
    )
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), int(window_days) - 1),
            )
        ).alias("day"),
        "reg_idx",
        "m_j",
    )
    wreg = contrib.groupBy("day", "reg_idx").agg(
        F.max("m_j").alias("m_j")
    )
    est = hll_estimate_from_registers(wreg, p=p, group_cols=["day"])
    observed = events.select(
        F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    return est.join(observed, "day").orderBy("day")


def hll_sliding_oracle_sql(
    window_days: int = 7,
    value_expr: str = "user_id",
    p: int = 9,
) -> str:
    """DuckDB twin of ``hll_sliding_distinct`` over the ``events``
    view — identical hash, register, merge, and estimate arithmetic."""
    m = 1 << p
    q = 60 - p + 1
    c = _hll_raw_constant(m, q)
    return f"""
WITH h AS (SELECT CAST(ts AS DATE) AS d,
  CAST(concat('0x', substr(md5(concat('hll:',
    CAST({value_expr} AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM events),
r AS (SELECT d, h % {m} AS reg_idx,
  CASE WHEN h // {m} > 0 THEN {q} - length(bin(h // {m}))
       ELSE {q} END AS rho
  FROM h),
regs AS (SELECT d, reg_idx, max(rho) AS m_j FROM r GROUP BY 1, 2),
contrib AS (SELECT d + o.i::INT AS day, reg_idx, m_j
  FROM regs, range(0, {window_days}) o(i)),
wreg AS (SELECT day, reg_idx, max(m_j) AS m_j FROM contrib
  GROUP BY 1, 2),
agg AS (SELECT day,
  CAST(sum(1::BIGINT << ({q} - m_j)) AS BIGINT) AS present_denom,
  CAST(count(*) AS BIGINT) AS n_regs FROM wreg GROUP BY day),
fin AS (SELECT day,
  CAST(present_denom + ({m} - n_regs) * (1::BIGINT << {q}) AS BIGINT)
    AS hll_denom,
  CAST({m} - n_regs AS BIGINT) AS hll_zeros FROM agg),
obs AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT fin.day, hll_denom, hll_zeros,
  CASE WHEN hll_zeros > 0 AND {c!r} / hll_denom <= {2.5 * m!r}
       THEN {float(m)!r} * ln({float(m)!r} / hll_zeros)
       ELSE {c!r} / hll_denom
  END AS hll_est
FROM fin JOIN obs ON fin.day = obs.day
ORDER BY fin.day
"""


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str | Column,
    k: int = 64,
) -> DataFrame:
    """Theta-sketch set operations (the Apache DataSketches theta
    algebra over this module's KMV state): distinct-count estimates
    for two sets, their UNION, their INTERSECTION, and a Jaccard
    estimate — from two fixed k-row certificates, never from the raw
    sets. The 1000-executor story: each source sketches independently
    (k rows each), and every set-expression a dashboard asks for is
    answered from bounded sketch rows.

        union     : k smallest of the merged hash sets (`kmv_merge`)
        ρ         : |union-sketch hashes present in BOTH sides| /
                    |union-sketch rows|
        intersect : ρ · est_union   (the standard theta estimator)

    All arithmetic is the integer fixed-point of `kmv_estimate` plus
    two integer divs — every output column is an exact BIGINT that
    replays bit-for-bit in SQL. Exact-regime guarantee: when both
    sides hold < k distinct values the sketches ARE the sets and
    every estimate (including the intersection) is exact.

    One row: (n_a, est_a, n_b, est_b, n_union, est_union, n_common,
    est_intersection, jaccard_ppm)."""
    sa = kmv_sketch(df_a, value_col, k=k).localCheckpoint(eager=False)
    sb = kmv_sketch(df_b, value_col, k=k).localCheckpoint(eager=False)
    ea = kmv_estimate(sa, k=k).select(
        F.col("n_kept").alias("n_a"), F.col("kmv_est").alias("est_a")
    )
    eb = kmv_estimate(sb, k=k).select(
        F.col("n_kept").alias("n_b"), F.col("kmv_est").alias("est_b")
    )
    u = kmv_merge([sa, sb], k=k).localCheckpoint(eager=False)
    eu = kmv_estimate(u, k=k).select(
        F.col("n_kept").alias("n_union"),
        F.col("kmv_est").alias("est_union"),
    )
    common = (
        u.join(sa.select("h"), "h", "leftsemi")
        .join(sb.select("h"), "h", "leftsemi")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(common))
        .select(
            "n_a", "est_a", "n_b", "est_b", "n_union", "est_union",
            "n_common",
            F.expr(
                "cast(div(n_common * est_union, n_union) as bigint)"
            ).alias("est_intersection"),
            F.expr(
                "cast(div(n_common * 1000000, n_union) as bigint)"
            ).alias("jaccard_ppm"),
        )
    )
