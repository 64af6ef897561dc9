"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from __spark_entry__ on Spark and, where
an ``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet tables; compares row count, schema width, and an
order-insensitive value hash computed over columns sorted by name.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept space- AND comma-separated name lists; an unknown name is
    # an ERROR, not a silent no-op — a typo'd (or comma-joined, r9)
    # filter used to match nothing and report a VACUOUS "all declared
    # queries match"
    only = {n for arg in sys.argv[2:] for n in arg.split(",") if n}

    import __spark_entry__ as entrymod
    from inception_eventstore_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]",
                      extra_configs={"spark.sql.shuffle.partitions": "8",
                                     # 250+ queries in one JVM: the UI
                                     # listener throttles (CLAUDE.md)
                                     "spark.ui.enabled": "false"})

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — "
            "nothing would be checked"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows):6d} rows "
                  f"({spark_s:.1f}s)")
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001 — record + keep checking
            # an oracle that ERRORS must fail THIS query, not abort the
            # whole gate with 250 queries unchecked (r9: the anova
            # oracle's BIGINT overflow hid every later result)
            print(f"  {name:28s} FAIL oracle error: {e}")
            failures.append(name)
            continue
        duck_s = time.time() - t0
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:28s} {status} rows {len(srows)}/{len(orows)} "
            f"cols {scols if not ok_cols else 'match'} "
            f"hash {'match' if ok_hash else f'{sh} != {oh}'} "
            f"({spark_s:.1f}s spark, {duck_s:.1f}s duck)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and srows:
                # show first differing row for debugging
                sset = {
                    "|".join(_norm_cell(c) for c in r) for r in srows
                }
                oset = {
                    "|".join(_norm_cell(c) for c in r) for r in orows
                }
                print("    spark-only:", sorted(sset - oset)[:2])
                print("    duck-only :", sorted(oset - sset)[:2])
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all declared queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
