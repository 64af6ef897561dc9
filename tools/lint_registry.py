"""Registry lint: catch oracle-portability defects BEFORE the driver does.

The external correctness harness canonicalizes both result sets through a
pandas sort + value hash. Two whole classes of declared-query bugs survive
the repo's own checker but break there (CORRECTNESS_r04):

1. array/map/struct-typed output columns — pandas ``sort_values`` raises
   ``TypeError: unhashable type: 'list'`` (sq8_codes, random_projection);
2. DuckDB oracles whose column types widen past the portable contract —
   window sums over BIGINT become HUGEINT, which pandas renders float64
   and the int64-vs-float64 hash diverges (pack_sequences).

This lint builds every declared Spark plan (schema only, nothing is
collected by the lint itself) and DESCRIBEs every oracle in DuckDB, and
fails on: nested Spark output types, HUGEINT/UHUGEINT/LIST/STRUCT/MAP/
DECIMAL oracle columns, and Spark-vs-oracle column-name mismatches.

Usage: python tools/lint_registry.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Oracle column types pandas/the-driver cannot canonicalize portably.
# DECIMAL is included: the driver compares against Spark doubles, and
# decimal→float64 conversion reintroduces the half-boundary problem the
# CLAUDE.md rounding invariants exist to avoid.
BAD_DUCK = ("HUGEINT", "UHUGEINT", "STRUCT", "MAP", "DECIMAL")


def spark_nested_cols(schema) -> list[str]:
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def main() -> int:
    import time

    t_start = time.time()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from inception_eventstore_spark.plans.queries import (
        prebuild_ann_indexes,
        prebuild_phash_index,
        prebuild_prop_index,
    )
    from inception_eventstore_spark.session import get_spark

    spark = get_spark(
        "registry-lint",
        extra_configs={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems: list[str] = []

    # The wall-time problem (VERDICT r7 wrong #2: 15-25 min): many
    # queries execute driver actions at BUILD time (km-pattern folds,
    # eager checkpoints), each a few seconds of scheduler latency on
    # tiny sf0.001 jobs — serially that's the whole runtime. Spark's
    # driver accepts concurrent job submission, so build the plans
    # from a thread pool; the only cross-query shared state is the
    # persisted ANN/prop/phash index builds, which are prebuilt
    # serially here first (bench.py's prebuild discipline) so the
    # probe queries only ever READ them.
    prebuild_ann_indexes(spark, sf_dir, kinds=("ivf_pinned", "ivfpq_pinned"))
    prebuild_prop_index(spark, sf_dir)
    prebuild_phash_index(spark, sf_dir)

    def _build(item):
        name, fn = item
        try:
            sdf = fn(spark, sf_dir)
            return name, list(sdf.columns), spark_nested_cols(sdf.schema), None
        except Exception as e:  # noqa: BLE001 - lint must report, not die
            return name, None, None, repr(e)

    from concurrent.futures import ThreadPoolExecutor

    workers = int(os.environ.get("SPARK_GRAFT_LINT_WORKERS", "8"))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        built = list(pool.map(_build, qs.items()))

    for name, cols, nested, err in built:
        if err is not None:
            problems.append(f"{name}: spark plan failed to build: {err}")
            continue
        if nested:
            problems.append(
                f"{name}: array/map/struct output columns {nested} "
                "(driver canonicalizer cannot sort them)"
            )
        if name not in oracles:
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: oracle DESCRIBE failed: {e!r}")
            continue
        ocols = [d[0] for d in desc]
        for cname, ctype in ((d[0], d[1]) for d in desc):
            up = ctype.upper()
            if any(b in up for b in BAD_DUCK) or up.endswith("[]"):
                problems.append(
                    f"{name}: oracle column {cname} has non-portable "
                    f"type {ctype}"
                )
        if sorted(cols) != sorted(ocols):
            problems.append(
                f"{name}: column-name mismatch spark={sorted(cols)} "
                f"oracle={sorted(ocols)}"
            )

    spark.stop()
    wall = round(time.time() - t_start, 1)
    if problems:
        print(f"LINT FAILURES ({len(problems)}):")
        for p in problems:
            print(" -", p)
        return 1
    print(
        f"registry lint clean: {len(qs)} queries, {len(oracles)} oracles "
        f"({wall}s wall, {workers} plan-build threads)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
