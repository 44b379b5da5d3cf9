#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the Spark result parquet written
by graft.Verify, sort columns by name and rows by value, and compare.

Usage: python3 tools/compare_local.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            scols = tbl.column_names
            srows = [tuple(r) for r in zip(*[tbl.column(c).to_pylist()
                     for c in scols])] if tbl.num_rows else []
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:150]}")
            n_bad += 1
            continue
        oc, orows_c = canon(ocols, orows)
        sc, srows_c = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            n_bad += 1
            continue
        if orows_c != srows_c:
            diff_o = [r for r in orows_c if r not in set(srows_c)][:3]
            diff_s = [r for r in srows_c if r not in set(orows_c)][:3]
            print(f"FAIL {name}: rows spark={len(srows_c)} oracle={len(orows_c)}")
            print(f"  only-oracle: {diff_o}")
            print(f"  only-spark : {diff_s}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(srows_c)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
