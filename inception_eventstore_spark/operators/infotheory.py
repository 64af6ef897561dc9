"""Information-theoretic profiling over categorical columns.

Mutual information answers the curation question "does this metadata
column actually carry signal about that one?" — e.g. how much knowing
the source domain tells you about language (leakage/stratification
checks before splitting), or whether a quality label is independent of
the shard key. Everything reduces to the (x, y) contingency table:

    I(X;Y) = Σ_xy p(x,y) · ln( p(x,y) / (p(x)·p(y)) )
    H(X)   = −Σ_x p(x) ln p(x)

Scale shape: ONE partial-aggregated groupBy builds the contingency
table (|X|·|Y| rows regardless of input size); the marginals are
window-free sums over that tiny table re-joined broadcast; the final
fold is a scalar aggregate. Nothing but the first groupBy ever touches
the full relation.

Cross-engine: all probabilities are exact integer-count ratios; only
ln() differs by ulps (far inside the 6-dp round the declared query
applies) — the same contract psi_drift / dsir_importance certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contingency_table", "mutual_information", "cohens_kappa"]


def contingency_table(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """(x, y, n_xy, n_x, n_y, n) — the joint counts with both marginals
    and the grand total attached. NULLs form their own category
    (consistent with the k-anonymity treatment of missing values)."""
    joint = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count("*").alias("n_xy"))
    mx = joint.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    return (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )


def mutual_information(
    df: DataFrame, x_col: str, y_col: str, checkpoint: bool = True
) -> DataFrame:
    """One row: (n, n_x_values, n_y_values, h_x, h_y, h_xy, mi) in
    nats, unrounded (callers round — the declared query uses 6 dp).

    Identities used: H(X) and H(Y) fold over the same contingency table
    (Σ n_xy per marginal bucket), and I = H(X) + H(Y) − H(X,Y) is NOT
    assumed — I is computed directly from its own sum so floating error
    does not cascade through three entropies; the identity instead
    makes a good property test."""
    joint = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count("*").alias("n_xy"))
    joint = joint.persist()
    mx = joint.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").cast("bigint").alias("n"))

    nd = F.col("n").cast("double")

    def _h(marg: DataFrame, cnt_col: str, out: str) -> DataFrame:
        c = F.col(cnt_col)
        return marg.crossJoin(F.broadcast(tot)).agg(
            F.sum((c / nd) * F.log(nd / c)).alias(out),
            F.count("*").cast("bigint").alias(f"_k_{out}"),
        )

    hx = _h(mx, "n_x", "h_x")
    hy = _h(my, "n_y", "h_y")
    joint_stats = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum((F.col("n_xy") / nd) * F.log(nd / F.col("n_xy")))
            .alias("h_xy"),
            F.sum(
                (F.col("n_xy") / nd)
                * F.log(
                    (F.col("n_xy") * nd)
                    / (F.col("n_x").cast("double") * F.col("n_y"))
                )
            ).alias("mi"),
        )
    )
    out = (
        joint_stats.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.col("_k_h_x").alias("n_x_values"),
            F.col("_k_h_y").alias("n_y_values"),
            "h_x",
            "h_y",
            "h_xy",
            "mi",
        )
    )
    # eager-checkpoint the 1-row result, then release the cached
    # contingency table — no state outlives the call (checkpoint=False
    # keeps the lazy DAG for plan inspection; the cache then outlives
    # the call, dump_plans-only)
    if not checkpoint:
        return out
    out = out.localCheckpoint(eager=True)
    joint.unpersist()
    return out


def cohens_kappa(
    df: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """One-row chance-corrected agreement between two categorical
    columns (Cohen 1960): κ = (p_o − p_e)/(1 − p_e), the standard
    gate on a heuristic classifier (lang-ID, quality labels) before
    trusting it to stratify a corpus — raw accuracy rewards majority
    guessing; κ subtracts the agreement a marginal-preserving random
    assignment would get.

    Exact-integer numerators (the cross-engine contract):
    ``po_num = Σ_{k} n_kk`` (diagonal) and ``pe_num = Σ_k n_x(k)·n_y(k)``
    over labels present in BOTH marginals (absent labels contribute 0
    products). p_o = po_num/n and p_e = pe_num/n² are quotients of
    exactly-representable integers, so the 6-dp rounds cannot straddle
    a decimal half-boundary (binary-rational rule). Requires n < 2^26.5
    … n² < 2^53 for exactness — i.e. n ≤ ~9·10^7 rows; sample first
    beyond that (agreement estimates converge long before).

    Shape: ONE partial-aggregated (truth, pred) groupBy — |labels|²
    rows regardless of input size — then label-keyed folds over that
    tiny table. NULL categories group as themselves, matching
    `contingency_table`.

    Output: (n, observed_agreement, expected_agreement, kappa), the
    rates 6-dp doubles; kappa NULL when p_e = 1 (degenerate one-label
    marginals — undefined by construction).
    """
    joint = df.groupBy(
        F.col(truth_col).alias("x"), F.col(pred_col).alias("y")
    ).agg(F.count("*").cast("bigint").alias("n_xy"))
    mx = joint.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    stats = joint.agg(
        F.sum("n_xy").cast("bigint").alias("n"),
        F.sum(F.when(F.col("x").eqNullSafe(F.col("y")), F.col("n_xy"))
              .otherwise(F.lit(0)))
        .cast("bigint")
        .alias("po_num"),
    )
    pe = (
        mx.join(my, F.col("x").eqNullSafe(F.col("y")))
        .agg(
            F.coalesce(F.sum(F.col("n_x") * F.col("n_y")), F.lit(0))
            .cast("bigint")
            .alias("pe_num")
        )
    )
    out = stats.crossJoin(F.broadcast(pe)).select(
        "n",
        (F.col("po_num").cast("double") / F.col("n").cast("double"))
        .alias("_po"),
        (
            F.col("pe_num").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("_pe"),
    )
    return out.select(
        "n",
        F.round("_po", 6).alias("observed_agreement"),
        F.round("_pe", 6).alias("expected_agreement"),
        F.round(
            F.when(
                F.col("_pe") < 1.0,
                (F.col("_po") - F.col("_pe")) / (F.lit(1.0) - F.col("_pe")),
            ),
            6,
        ).alias("kappa"),
    )


def source_token_js(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    smoothing: float = 0.5,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two groups'
    token distributions — the corpus-similarity matrix a mixture
    designer reads before merging sources (Lin 1991; the symmetric,
    bounded-by-ln2 alternative to KL). Each group's distribution is
    add-k smoothed over the GLOBAL vocabulary, so absent tokens carry
    the floor probability rather than breaking the log.

    Shape: one partial-aggregated (group, token) count, a vocab×groups
    zero-filled grid (vocab-keyed — the grid is |V|·|S| rows however
    large the corpus), one token-keyed self-join producing
    |V|·C(|S|,2) term rows, and a per-pair rollup. Probabilities are
    ratios of exact integers; the per-pair Σ term is a double
    summation whose order jitter sits far inside the 6-dp round (the
    adamic_adar/dsir acceptance).

    Output per unordered pair (src_a < src_b): n_tokens (union vocab
    size = global |V|), js (6-dp; 0 ≡ identical, ln 2 ≈ 0.693147 ≡
    disjoint).
    """
    from inception_eventstore_spark.operators.dedup import tokens

    k = float(smoothing)
    if k <= 0:
        raise ValueError("smoothing must be > 0")
    tc = (
        docs.select(
            F.col(group_col).alias("_s"),
            F.explode(tokens(text_col)).alias("_tok"),
        )
        .groupBy("_s", "_tok")
        .agg(F.count("*").cast("bigint").alias("_c"))
    )
    vocab = tc.select("_tok").distinct()
    totals = tc.groupBy("_s").agg(F.sum("_c").cast("bigint").alias("_tot"))
    n_vocab = int(vocab.count())
    grid = (
        totals.select("_s", "_tot")
        .crossJoin(vocab)
        .join(tc, ["_s", "_tok"], "left")
        .select(
            "_s",
            "_tok",
            (
                (F.coalesce("_c", F.lit(0)).cast("double") + F.lit(k))
                / (F.col("_tot").cast("double") + F.lit(k * n_vocab))
            ).alias("_p"),
        )
        .localCheckpoint(eager=False)
    )
    b = grid.select(
        F.col("_s").alias("_sb"),
        F.col("_tok"),
        F.col("_p").alias("_q"),
    )
    pairs = grid.join(b, "_tok").where(F.col("_s") < F.col("_sb"))
    m = (F.col("_p") + F.col("_q")) / 2
    term = (
        F.col("_p") * F.log(F.col("_p") / m)
        + F.col("_q") * F.log(F.col("_q") / m)
    ) / 2
    return (
        pairs.groupBy(
            F.col("_s").alias("src_a"), F.col("_sb").alias("src_b")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("js"),
        )
        .orderBy("src_a", "src_b")
    )
