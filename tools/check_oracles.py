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


# Spark dtype / DuckDB type -> canonical physical type. Driver's hash is
# dtype-aware (round-1 lesson: DuckDB sum() -> HUGEINT hashed differently
# than int64 even when values match), so a canonical-type mismatch on any
# column is reported as a failure here.
_SPARK_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "binary": "bytes", "date": "date",
}
_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "DOUBLE": "f64", "FLOAT": "f32",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes", "DATE": "date",
}


def _canon_spark(dt: str) -> str:
    return _SPARK_CANON.get(dt, dt)


def _canon_duck(dt: str) -> str:
    return _DUCK_CANON.get(dt.upper(), dt.lower())


def dtype_mismatches(spark_dtypes, con, sql) -> list[str]:
    """Columns whose canonical physical type differs between engines."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    duck = {r[0]: _canon_duck(r[1]) for r in desc}
    bad = []
    for col, dt in spark_dtypes:
        if col in duck and _canon_spark(dt) != duck[col]:
            bad.append(f"{col}: spark={_canon_spark(dt)} duck={duck[col]}")
    return bad


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report = {}
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
        vh = value_hash(cols, rows)
        ok_hash = ok_cols and vh == value_hash(ocols, orows)
        dt_bad = dtype_mismatches(df.dtypes, con, oracles[name])
        status = "OK " if (ok_cols and ok_rows and ok_hash and not dt_bad) else "FAIL"
        report[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "dtypes_match": not dt_bad,
            "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "value_hash": vh,
            "spark_wall_s": round(t_spark, 2),
            "duck_wall_s": round(t_duck, 2),
        }
        print(
            f"{name:28s} {status} rows={len(rows):7d}/{len(orows):7d} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
            f"dtypes={'=' if not dt_bad else 'DIFF'} "
            f"spark={t_spark:6.1f}s duck={t_duck:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if dt_bad:
                print("   dtype mismatches:", dt_bad)
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
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
