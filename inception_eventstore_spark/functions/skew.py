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
