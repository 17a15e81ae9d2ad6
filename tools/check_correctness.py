"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names/order
(sorted), and values (rows sorted, floats compared bit-exactly after the
query's own rounding).  Strictly harsher than a value-hash: prints the first
differing rows on mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "timestamp"):  # datetime
        return str(v)
    return v


def compare(name, spark_df, con, sql):
    srows = [tuple(norm_val(v) for v in r) for r in spark_df.collect()]
    scols = sorted(spark_df.columns)
    col_idx = [spark_df.columns.index(c) for c in scols]
    srows = sorted(tuple(r[i] for i in col_idx) for r in srows)

    res = con.sql(sql)
    dcols_raw = [d[0] for d in res.description]
    drows_raw = res.fetchall()
    dcols = sorted(dcols_raw)
    didx = [dcols_raw.index(c) for c in dcols]
    drows = sorted(tuple(norm_val(r[i]) for i in didx) for r in drows_raw)

    if scols != dcols:
        return f"SCHEMA  spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return f"ROWS    spark={len(srows)} duck={len(drows)}"
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return f"VALUES  row {i}: spark={a} duck={b}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from iscc_search_spark.session import get_spark

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark = get_spark(cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                print(f"  WEAK  {name}: rows={cnt} ({time.time()-t0:.1f}s, no oracle)")
                n_weak += 1
                continue
            diff = compare(name, df, con, oracles[name])
        except Exception as e:
            import traceback
            traceback.print_exc()
            diff = f"ERROR   {type(e).__name__}: {str(e)[:300]}"
        if diff:
            print(f"  FAIL  {name}: {diff}")
            n_fail += 1
        else:
            print(f"  PASS  {name} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
