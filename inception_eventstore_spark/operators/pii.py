"""PII detection and redaction for training-data pipelines.

Emails, IPv4 addresses, URLs and phone numbers found and masked with
``regexp_count`` / ``regexp_replace`` — pure JVM column expressions, so
a redaction pass over 100 TB is one codegen'd projection with zero
Python. (The reference engine treats payloads as opaque blobs and has
no analog; this is part of the mandated LLM-pipeline extension
surface.)

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle): no lookarounds (RE2 has none),
no ``\\s`` (Java's includes \\x0B, RE2's does not), explicit character
classes only, and no ambiguous alternation (Java is leftmost-first,
RE2 leftmost-longest — patterns where those differ would silently
diverge between engine and oracle). The phone pattern requires a
leading ``+`` or ``(`` so that IPv4 addresses and URL path digits do
not double-match.

Redaction applies patterns in a fixed order (email → url → ipv4 →
phone); each replacement's token contains no digits, so later patterns
cannot re-match inside an earlier mask.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("url", r"https?://[^ \t\n]+", "[URL]"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone", r"[+(][0-9()., -]{7,}[0-9]", "[PHONE]"),
)


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one BIGINT ``n_<kind>`` column per PII pattern."""
    c = F.col(text_col)
    return docs.withColumns(
        {
            f"n_{kind}": F.regexp_count(c, F.lit(pat)).cast("bigint")
            for kind, pat, _ in PII_PATTERNS
        }
    )


def redact_pii(col: Column | str) -> Column:
    """The text with every PII match masked, patterns applied in the
    canonical order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts + redacted text in one projection — the per-kind counts
    let a pipeline report how much PII mass was scrubbed per shard."""
    return pii_counts(docs, text_col).withColumn(
        "redacted", redact_pii(text_col)
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row privacy audit over a quasi-identifier combination:
    (k_anonymity, n_groups, n_violating_groups, rows_at_risk, n_rows).

    k-anonymity (Sweeney 2002) of a relation w.r.t. quasi-identifier
    columns = the smallest equivalence-class size: every row is
    indistinguishable from at least k−1 others on those columns.
    Training-data releases audit this before publishing per-group
    statistics or joining external data. ``rows_at_risk`` counts rows
    in classes smaller than ``k`` — the rows `suppress_to_k` would
    drop. One partial-aggregated groupBy + a tiny second aggregate;
    NULL quasi values form their own class (standard treatment —
    NULL-grouped rows are still linkable as 'the rows with missing
    X')."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("_gs"))
    return groups.agg(
        F.min("_gs").cast("bigint").alias("k_anonymity"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_gs") < int(k), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("_gs") < int(k), F.col("_gs")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum("_gs").cast("bigint").alias("n_rows"),
    )


def suppress_to_k(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Enforce k-anonymity by SUPPRESSION: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members —
    the conservative release transform (generalization hierarchies are
    domain-specific; suppression is universal). Broadcast-joins the
    violating-class keys when small; Spark's AQE picks the join side.
    Deterministic: the surviving set depends only on class sizes."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    ok = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("_gs"))
        .where(F.col("_gs") >= int(k))
        .select(*quasi_cols)
    )
    return df.join(ok, quasi_cols, "left_semi")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """One-row l-diversity audit: k-anonymity's companion check
    (Machanavajjhala 2007). A release is l-diverse w.r.t. a sensitive
    attribute when every quasi-identifier equivalence class contains at
    least ``l`` DISTINCT sensitive values — k-anonymity alone permits a
    class of 50 rows that all share one diagnosis, and membership then
    leaks the secret. Output: (l_diversity = min distinct sensitive per
    class, n_groups, n_violating_groups, rows_at_risk, n_rows).

    One exact two-measure aggregation per class (count + distinct
    count, partial-aggregated) and a scalar fold — the class table is
    the only shuffle, same scale shape as `k_anonymity_report`."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1:
        raise ValueError("l must be >= 1")
    groups = df.groupBy(*quasi_cols).agg(
        F.count("*").alias("_gs"),
        F.countDistinct(sensitive_col).alias("_dv"),
    )
    return groups.agg(
        F.min("_dv").cast("bigint").alias("l_diversity"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_dv") < int(l), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("_dv") < int(l), F.col("_gs")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum("_gs").cast("bigint").alias("n_rows"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_num: int = 3,
    t_den: int = 10,
) -> DataFrame:
    """One-row t-closeness audit — the third leg of the release-audit
    trio (Li 2007, after `k_anonymity_report` / `l_diversity_report`).
    A class of 50 rows with 5 distinct diagnoses still leaks if 48 of
    them share one: l-diversity counts values, t-closeness bounds the
    DISTANCE between the class's sensitive-value distribution and the
    global one. For categorical attributes the distance is total
    variation, TVD = ½ Σ_v |c_v/n − g_v/N|.

    Exact-integer form (the cross-engine contract): per class,
    ``tvd_num = Σ_v |c_v·N − g_v·n|`` with absent values contributing
    ``g_v·n``, so only the PRESENT (class, value) cells are ever
    materialized: tvd_num = Σ_present (|c·N − g·n| − g·n) + n·N.
    TVD = tvd_num / (2·n·N). The threshold test cross-multiplies —
    ``t_den·tvd_num > 2·t_num·n·N`` — so violation counts are
    integer-exact on both engines. Overflow bound: requires
    ``t_den·max(n)·N < 2^63`` (ANSI mode raises, never wraps); beyond
    ~10^9-row strata run the audit per stratum, which is how release
    audits shard anyway.

    Shape: one (quasi × sensitive) cell aggregate (partial-first), the
    |sensitive-domain|-row global table broadcast back, one class
    aggregate, one scalar fold. No windows, no all-pairs — the only
    corpus-sized shuffle is the cell groupBy.

    Output: (max_tvd 6-dp, n_groups, n_violating_groups, rows_at_risk,
    n_rows). ``max_tvd`` is the max over per-class quotients of exact
    integers (deterministic scalar division, so the 6-dp round cannot
    straddle a decimal half-boundary — quotient doubles are binary
    rationals).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if t_num <= 0 or t_den <= 0:
        raise ValueError("t must be a positive rational t_num/t_den")
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count("*").cast("bigint").alias("_c"))
    gv = df.groupBy(F.col(sensitive_col).alias("_sv")).agg(
        F.count("*").cast("bigint").alias("_g")
    )
    total = df.agg(F.count("*").cast("bigint").alias("_tot"))
    # the cell-term sum needs n (the class total) per term, so two
    # passes over the CELL table (already tiny relative to df): class
    # sizes first, then the term sum with n joined back in.
    sizes = cells.groupBy(*quasi_cols).agg(
        F.sum("_c").alias("_n")
    )
    terms = (
        cells.join(F.broadcast(gv), "_sv")
        .join(sizes, quasi_cols)
        .crossJoin(F.broadcast(total))
        .groupBy(*quasi_cols)
        .agg(
            F.first("_n").alias("_n"),
            F.first("_tot").alias("_tot"),
            F.sum(
                F.abs(F.col("_c") * F.col("_tot") - F.col("_g") * F.col("_n"))
                - F.col("_g") * F.col("_n")
            ).alias("_part"),
        )
        .select(
            *quasi_cols,
            "_n",
            "_tot",
            (F.col("_part") + F.col("_n") * F.col("_tot")).alias("_num"),
        )
    )
    return terms.agg(
        F.round(
            F.max(
                F.col("_num").cast("double")
                / (F.lit(2.0) * F.col("_n") * F.col("_tot"))
            ),
            6,
        ).alias("max_tvd"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(
            F.when(
                F.lit(int(t_den)) * F.col("_num")
                > F.lit(2 * int(t_num)) * F.col("_n") * F.col("_tot"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(
            F.when(
                F.lit(int(t_den)) * F.col("_num")
                > F.lit(2 * int(t_num)) * F.col("_n") * F.col("_tot"),
                F.col("_n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_at_risk"),
        F.sum("_n").cast("bigint").alias("n_rows"),
    )


def discrete_laplace_thresholds(
    epsilon: float = 0.5, bound: int = 24, lane_bits: int = 20
) -> list[int]:
    """Inverse-CDF thresholds for the two-sided geometric (discrete
    Laplace) mechanism P(k) ∝ α^|k|, α = e^(−ε), truncated at ±bound
    (residual mass < α^bound — below one lane unit at the defaults).
    Scaled by 2^lane_bits and floored: exact integer LITERALS shared
    by the Spark plan and the DuckDB oracle, the POISSON1_THRESHOLDS
    pattern (operators/sampling.py) — a lane draw u maps to the first
    k in [−bound..bound] with u < threshold[k + bound]."""
    import math

    a = math.exp(-float(epsilon))
    weights = [a ** abs(k) for k in range(-bound, bound + 1)]
    norm = sum(weights)
    cum = 0.0
    out = []
    for w in weights:
        cum += w / norm
        out.append(int(cum * float(1 << lane_bits)))
    out[-1] = 1 << lane_bits  # close the top bin against float slack
    return out


def dp_noisy_counts(
    events: DataFrame,
    group_col: str = "event_type",
    epsilon: float = 0.5,
    release_id: str = "release-1",
    bound: int = 24,
) -> DataFrame:
    """ε-differential-privacy RELEASE MECHANICS for per-group counts:
    true count + discrete-Laplace noise calibrated to sensitivity 1
    (one row changes one group count by 1), the geometric mechanism of
    Ghosh-Roughgarden-Sundararajan 2009. Output (group, noisy_count,
    noise) — noise surfaced because this demonstration draw is
    DETERMINISTIC: u is a 20-bit md5 lane of (release_id, group), so
    the whole release replays in the DuckDB oracle. A production
    release gets its privacy from an unpredictable seed — swap the
    lane source for a CSPRNG draw per release; calibration, truncation
    and the inverse-CDF mapping are exactly what ships.

    Scale: one partial-aggregated count per group + a broadcast-free
    literal CASE ladder over 2·bound+1 thresholds — noise addition is
    O(|groups|).
    """
    from inception_eventstore_spark.operators.sampling import (
        md5_prefix60,
    )

    th = discrete_laplace_thresholds(epsilon, bound)
    counts = events.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("bigint").alias("_n")
    )
    u = F.pmod(
        md5_prefix60(
            F.concat(F.lit(f"dp:{release_id}:"), F.col("grp"))
        ),
        F.lit(1 << 20),
    )
    noise = F.lit(bound)  # fallthrough == top bin
    for i in range(len(th) - 1, -1, -1):
        noise = F.when(u < th[i], F.lit(i - bound)).otherwise(noise)
    return counts.select(
        "grp",
        noise.cast("bigint").alias("noise"),
        (F.col("_n") + noise).cast("bigint").alias("noisy_count"),
    )
