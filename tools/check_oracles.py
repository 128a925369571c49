"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count + sorted column names + an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from debezium_connector_spanner_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x00".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only  rows={len(rows):7d}  spark={t_spark:6.1f}s")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(cols) == sorted(ocols)
        ok_rows = len(rows) == len(orows)
        ok_hash = ok_cols and value_hash(cols, rows) == value_hash(ocols, orows)
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(rows):7d}/{len(orows):7d} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
            f"spark={t_spark:6.1f}s duck={t_duck:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print("   spark cols:", sorted(cols))
                print("   duck  cols:", sorted(ocols))
            elif not ok_hash:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_set = {tuple(norm(r[i]) for i in order) for r in rows}
                o_set = {tuple(norm(r[i]) for i in oorder) for r in orows}
                print("   only-spark:", list(s_set - o_set)[:3])
                print("   only-duck :", list(o_set - s_set)[:3])
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
