"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB against
the same parquet tables, then compares row count, column names, and an
order-insensitive exact value comparison (floats must match bit-for-bit —
see functions/exact.py for why that is achievable).

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + v.hex()
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, (int,)):
        return "i:" + str(v)
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "s:" + str(v)


def canon(rows, colnames):
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


_SPARK2ARROW = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "bool",
    "date": "date32[day]",
    "timestamp_ntz": "timestamp[us]",
    "binary": "binary",
}


def _dtype_mismatches(sdf, arrow_schema):
    """Compare Spark output types with the oracle's Arrow types by name."""
    duck = {f.name: str(f.type) for f in arrow_schema}
    bad = []
    for f in sdf.schema:
        want = _SPARK2ARROW.get(f.dataType.simpleString(), f.dataType.simpleString())
        got = duck.get(f.name)
        if got is None:
            continue  # name mismatch reported separately
        if got == "large_string":
            got = "string"
        if want != got:
            bad.append(f"{f.name}: spark={f.dataType.simpleString()} duck-arrow={got}")
    return bad


def compare_one(spark, con, spec, sf_dir: str, verbose: bool = True):
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    t_spark = time.time() - t0

    t0 = time.time()
    arrow = con.execute(spec.oracle).arrow()
    cur = con.execute(spec.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    t_duck = time.time() - t0

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    problems += [f"dtype: {m}" for m in _dtype_mismatches(sdf, arrow.schema)]
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        a = canon(spark_rows, spark_cols)
        b = canon(duck_rows, duck_cols)
        if a != b:
            n_bad = sum(1 for x, y in zip(a, b) if x != y)
            problems.append(f"values differ in {n_bad}/{len(a)} canon rows")
            for x, y in list(zip(a, b))[:2000]:
                if x != y:
                    problems.append(f"  spark: {x}\n   duck: {y}")
                    break
    ok = not problems
    if verbose:
        status = "OK " if ok else "FAIL"
        print(
            f"[{status}] {spec.name}: {len(spark_rows)} rows "
            f"(spark {t_spark:.1f}s, duck {t_duck:.2f}s)"
        )
        for p in problems:
            print("      " + p)
    return ok, problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from emr_apache_iceberg_workshop_spark.plans import registry
    from emr_apache_iceberg_workshop_spark.session import build_session

    specs = registry()
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = build_session("oracle-check")
    con = duck_con(sf_dir)
    n_ok = n_fail = n_rowsonly = 0
    for name in sorted(specs):
        spec = specs[name]
        if spec.oracle is None:
            cnt = spec.fn(spark, sf_dir).count()
            print(f"[ROWS] {name}: {cnt} rows (no oracle — rows-only check)")
            n_rowsonly += 1
            continue
        try:
            ok, _ = compare_one(spark, con, spec, sf_dir)
        except Exception as e:
            ok = False
            print(f"[ERR ] {name}: {type(e).__name__}: {str(e)[:300]}")
        n_ok += ok
        n_fail += not ok
    print(f"\n{n_ok} ok, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
