"""Local replica of the driver's correctness gate.

Runs every declared query through Spark AND its oracle SQL through
DuckDB on the same parquet tables, then compares: row count, sorted
column names, and an order-insensitive multiset of normalized row
values. Stricter than any reasonable hash, so passing here should
imply passing the driver's CORRECTNESS check.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from collections import Counter
from decimal import Decimal

import duckdb


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(normalize(r[i]) for i in order) for r in rows)


def run_check(spark, con, name, fn, sql, sf_dir, verbose=False):
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    t0 = time.time()
    res = con.sql(sql)
    ocols = res.columns
    orows = res.fetchall()
    t_duck = time.time() - t0

    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns: spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        ms, mo = multiset(srows, scols), multiset(orows, ocols)
        if ms != mo:
            diff_s = list((ms - mo).items())[:3]
            diff_o = list((mo - ms).items())[:3]
            problems.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
    status = "OK  " if not problems else "FAIL"
    print(f"{status} {name:28s} rows={len(srows):6d} "
          f"spark={t_spark:5.1f}s duck={t_duck:4.1f}s", flush=True)
    for p in problems:
        print(f"     {p}", flush=True)
    return not problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from duckdb_robust_predicate_transfer_spark.session import get_spark
    from duckdb_robust_predicate_transfer_spark.workload import ORACLE, QUERIES

    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    ok = fail = skip = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLE:
            try:
                n = fn(spark, sf_dir).count()
                print(f"ROWS {name:28s} rows={n:6d} (no oracle)", flush=True)
                skip += 1
            except Exception as exc:
                print(f"FAIL {name:28s} exception: {exc}", flush=True)
                fail += 1
            continue
        try:
            if run_check(spark, con, name, fn, ORACLE[name], sf_dir):
                ok += 1
            else:
                fail += 1
        except Exception as exc:
            print(f"FAIL {name:28s} exception: {str(exc)[:400]}", flush=True)
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only", flush=True)
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
