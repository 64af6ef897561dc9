"""Declarative data-quality expectations over any DataFrame.

The dbt-test / Great-Expectations surface a pipeline runs before
trusting a table: each rule compiles to a COUNT of violating rows, and
all row-local rules fold into ONE aggregation pass over the table —
the corpus is scanned once however many rules are declared. Set rules
(uniqueness, referential integrity) need their own shuffle by nature
and run as separate small jobs.

Rules:
- ``not_null(col)`` — null rows
- ``in_range(col, lo, hi)`` — non-null rows outside [lo, hi]
- ``accepted_values(col, values)`` — non-null rows outside the set
- ``matches(col, regex)`` — non-null rows not fully matching
- ``unique(cols)`` — rows beyond the first of each duplicated key
- ``references(cols, other, other_cols)`` — rows whose key is absent
  from ``other`` (left-anti count; broadcast when the dimension is
  small)

``check(df, rules)`` returns (rule, n_violations) — one row per rule;
``passed = n_violations == 0`` everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: a stable label + how to count violations."""

    label: str
    #: row-local violation predicate (folds into the single agg pass)
    predicate: Column | None = None
    #: set-level counter: DataFrame -> violation count column source
    kind: str = "local"
    cols: tuple = ()
    other: DataFrame | None = field(default=None, compare=False)
    other_cols: tuple = ()


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: Sequence) -> Rule:
    c = F.col(col)
    label_vals = ",".join(str(v) for v in values)
    return Rule(
        f"accepted_values({col},[{label_vals}])",
        c.isNotNull() & ~c.isin(list(values)),
    )


def matches(col: str, regex: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"matches({col},{regex})",
        c.isNotNull() & ~c.rlike(regex),
    )


def unique(cols: Sequence[str]) -> Rule:
    return Rule(f"unique({','.join(cols)})", None, kind="unique",
                cols=tuple(cols))


def references(cols: Sequence[str], other: DataFrame,
               other_cols: Sequence[str]) -> Rule:
    return Rule(
        f"references({','.join(cols)})", None, kind="references",
        cols=tuple(cols), other=other, other_cols=tuple(other_cols),
    )


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """(rule, n_violations) per declared rule. Row-local rules share
    one aggregation scan; each set rule adds one bounded job."""
    if not rules:
        raise ValueError("rules must be non-empty")
    spark = df.sparkSession
    local = [r for r in rules if r.kind == "local"]
    results: list[tuple[str, int]] = []
    if local:
        aggs = [
            F.sum(r.predicate.cast("long")).alias(f"_v{i}")
            for i, r in enumerate(local)
        ]
        row = df.agg(*aggs).collect()[0]
        results += [
            (r.label, int(row[f"_v{i}"] or 0)) for i, r in enumerate(local)
        ]
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.cols)
                .agg(F.count("*").alias("_n"))
                .where(F.col("_n") > 1)
                .agg(F.sum(F.col("_n") - 1).alias("_v"))
                .collect()[0]["_v"]
            )
            results.append((r.label, int(dup or 0)))
        elif r.kind == "references":
            # SQL FK semantics (MATCH SIMPLE): any-null key rows are
            # exempt — only fully-non-null keys must resolve
            nn = F.lit(True)
            for o in r.other_cols:
                nn = nn & F.col(o).isNotNull()
            keyed = df.select(
                *[F.col(c).alias(o) for c, o in zip(r.cols, r.other_cols)]
            ).where(nn)
            missing = keyed.join(
                r.other.select(*r.other_cols).dropDuplicates(list(r.other_cols)),
                list(r.other_cols),
                "left_anti",
            ).count()
            results.append((r.label, int(missing)))
    order = {r.label: i for i, r in enumerate(rules)}
    results.sort(key=lambda kv: order[kv[0]])
    return spark.createDataFrame(
        results, "rule string, n_violations bigint"
    )
