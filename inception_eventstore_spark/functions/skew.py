"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handles most runtime skew (enabled in session.py); the
salted join is the explicit tool for *known* pathological keys — e.g. a
celebrity aggregate id holding 100M events — where even AQE's split
leaves one reducer hot. Standard recipe: replicate the small side
``salt_factor`` times, scatter the big side uniformly across the salt
space, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered over
    ``salt_factor`` buckets.

    The big side gets a uniform pseudo-random salt derived from its own
    row content (deterministic, JVM-side); the small side is exploded
    ×salt_factor so every (key, salt) pair exists. Output columns =
    big's ∪ small's (like ``big.join(small, on, how)``).

    Only ``inner`` and ``left`` (outer on the big side) are supported:
    the small side is replicated ×salt_factor, so a right/full outer
    join would emit each unmatched small-side row once per salt.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the small side is replicated per salt, so right/full outer "
            "would duplicate unmatched small-side rows"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor)).cast(
            "int"
        ),
    )
    salted_small = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def cap_hot_buckets(
    banded: DataFrame,
    bucket_cols: list[str],
    max_bucket: int | None,
    label: str,
) -> DataFrame:
    """Bound banded pair-join fan-out: drop every bucket whose member
    count exceeds ``max_bucket`` BEFORE the self-join, and log what was
    dropped. The self-join on (bucket) materializes ~df²/2 candidates
    per bucket, so one boilerplate flood (m near-identical docs landing
    in one LSH band bucket / simhash block bucket) turns a linear scan
    into an m² blow-up at corpus scale — the same fan-out class as
    winnow max_df / basket max_basket_items (CLAUDE.md invariant), so
    the same dial: bound each bucket by min(df, cap), here by dropping
    over-cap buckets outright (a flood that size is exact-duplicate or
    boilerplate mass that `dedup.exact_duplicate_groups` should collapse
    first; pair enumeration over it is quadratic BY CONTRACT and never
    what the caller wants).

    Mechanics: one same-key groupBy count over the narrow banded
    relation (its input is persisted at every call site, so this is one
    cheap extra job), then — only when hot buckets exist — a broadcast
    anti-join against the (tiny) hot-bucket list. With zero hot buckets
    the input plan is returned UNCHANGED, so fixture-scale runs keep
    byte-identical plans and oracle hashes; capped runs log bucket
    count, largest bucket, and dropped-row total at WARNING.

    ``max_bucket=None`` disables the cap (index/probe paths that never
    self-join).

    Recall-loss visibility (ADVICE r7): every call records a report —
    ``{"n_hot", "largest", "dropped_rows", "max_bucket"}`` — readable
    via :func:`last_cap_report`, so callers can detect that true pairs
    were sacrificed without scraping WARNING logs. A report with
    ``n_hot == 0`` means the plan was returned unchanged (lossless).
    """
    if max_bucket is None:
        _CAP_REPORTS[label] = {
            "n_hot": 0, "largest": 0, "dropped_rows": 0,
            "max_bucket": None,
        }
        return banded
    counts = banded.groupBy(*bucket_cols).agg(
        F.count("*").alias("_bucket_df")
    )
    hot = counts.where(F.col("_bucket_df") > int(max_bucket))
    stats = hot.agg(
        F.count("*").alias("n"),
        F.max("_bucket_df").alias("mx"),
        F.sum("_bucket_df").alias("rows"),
    ).first()
    _CAP_REPORTS[label] = {
        "n_hot": int(stats["n"] or 0),
        "largest": int(stats["mx"] or 0),
        "dropped_rows": int(stats["rows"] or 0),
        "max_bucket": int(max_bucket),
    }
    if not stats["n"]:
        return banded
    import logging

    logging.getLogger(__name__).warning(
        "%s: dropping %d hot buckets (> %d members; largest %d, "
        "%d banded rows) before the pair self-join — run "
        "exact-duplicate collapse first to keep their recall",
        label, stats["n"], int(max_bucket), stats["mx"], stats["rows"],
    )
    return banded.join(
        F.broadcast(hot.select(*bucket_cols)), bucket_cols, "left_anti"
    )


# label → most recent cap report for that call site (driver-local; the
# banded pair operators run their cap at call time, so the report is
# complete as soon as the operator returns)
_CAP_REPORTS: dict[str, dict] = {}


def last_cap_report(label: str) -> dict | None:
    """The most recent :func:`cap_hot_buckets` report for ``label``
    (``minhash_lsh_pairs`` / ``simhash_near_duplicates`` /
    ``hamming63_pairs``), or None if that call site has not run in
    this driver. ``n_hot > 0`` means true pairs inside the dropped
    buckets were sacrificed for bounded fan-out — collapse exact
    duplicates first and re-run to recover them."""
    return _CAP_REPORTS.get(label)
