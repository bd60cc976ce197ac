"""Mimic the driver's verify loop: entry() smoke + queries() vs oracle_sql().

Usage: python scripts/selfcheck.py [sf_dir] [--only name1,name2]
(sf_dir defaults to /root/testdata/sf0.01; --only restricts to the named
queries and skips the entry() smoke — fast iteration on one oracle)

For each query: run the Spark DataFrame, run the DuckDB oracle on the same
parquet tables, compare row count, sorted-column schema, and an
order-insensitive value multiset (stringified, column-name-sorted) — the
same shape of check the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from openue_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=16)

    if only is None:
        t0 = time.time()
        res = e.entry(spark)
        n = res.count()
        print(f"[entry] rows={n} schema={[f.name for f in res.schema.fields]} "
              f"({time.time() - t0:.1f}s)")
        assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"[{name}] SPARK ERROR: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(srows)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            print(f"[{name}] ORACLE ERROR: {ex}")
            failed.append(name)
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = ok_schema and multiset(srows, scols) == multiset(orows, ocols)
        status = "OK" if (ok_schema and ok_count and ok_vals) else "MISMATCH"
        print(f"[{name}] {status} rows={len(srows)}/{len(orows)} "
              f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
              f"values={'ok' if ok_vals else 'DIFF'} ({time.time() - t0:.1f}s)")
        if status != "OK":
            if ok_schema and not ok_vals:
                s, o = multiset(srows, scols), multiset(orows, ocols)
                print("   spark-only:", list((s - o).items())[:3])
                print("   oracle-only:", list((o - s).items())[:3])
            failed.append(name)

    spark.stop()
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
