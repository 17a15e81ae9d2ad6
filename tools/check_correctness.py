"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names/order
(sorted), and values (rows sorted, floats compared bit-exactly after the
query's own rounding).  Strictly harsher than a value-hash: prints the first
differing rows on mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
       python tools/check_correctness.py --json OUT.json [sf_dir]

``--json`` writes the per-query verdicts to a driver-shaped artifact —
the committed full-registry evidence for gates the driver's 50-entry
file rotates out (VERDICT r4 "what's wrong" #1).
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
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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
    rows: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                print(f"  WEAK  {name}: rows={cnt} ({time.time()-t0:.1f}s, no oracle)")
                rows[name] = {
                    "status": "rows_only", "spark_rows": cnt,
                    "secs": round(time.time() - t0, 1), "err": "no_oracle",
                }
                n_weak += 1
                continue
            diff = compare(name, df, con, oracles[name])
        except Exception as e:
            import traceback
            traceback.print_exc()
            diff = f"ERROR   {type(e).__name__}: {str(e)[:300]}"
        if diff:
            print(f"  FAIL  {name}: {diff}")
            rows[name] = {
                "status": "fail", "detail": diff,
                "secs": round(time.time() - t0, 1),
            }
            n_fail += 1
        else:
            print(f"  PASS  {name} ({time.time()-t0:.1f}s)")
            rows[name] = {
                "status": "pass", "rows_match": True, "schema_match": True,
                "values_match": True, "secs": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir, "n_pass": n_pass, "n_weak": n_weak,
                    "n_fail": n_fail, "note": (
                        "full-registry local run via tools/check_correctness.py"
                        " — strict sorted-row value compare (harsher than the"
                        " driver's hash); covers gates rotated out of the"
                        " driver's 50-entry file"
                    ),
                    "queries": rows,
                },
                f, indent=1, sort_keys=False,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
