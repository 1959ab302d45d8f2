#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
registers the sf parquet tables as DuckDB views, runs each oracle SQL, and
compares against the Spark result: sort columns by name, sort rows, compare
cell values (exact; floats compared both exactly and with 1e-9 tolerance so
we can tell "real mismatch" from "last-ulp drift").

Usage: check_oracle.py <sfdir> <verify_out>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None and b is None:
        return True, True
    if (a is None) != (b is None):
        return False, False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b, a == b
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, close
    return a == b, a == b


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # run the shared CC closure once per sweep instead of once per consumer
    import cc_cache
    oracle, n_cc = cc_cache.materialize_cc(con, oracle)
    if n_cc:
        print(f"[cc_cache] closure materialized once, reused by {n_cc} queries")
    results = {}
    import os
    qdirs = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for q in qdirs:
        try:
            sp = con.execute(f"SELECT * FROM '{outdir}/{q}/*.parquet'")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            results[q] = f"SPARK-READ-FAIL {e}"
            continue
        if q not in oracle:
            results[q] = f"rows-only ({len(sp_rows)} rows)" + (" EMPTY!" if not sp_rows else "")
            continue
        try:
            du = con.execute(oracle[q])
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            results[q] = f"ORACLE-SQL-FAIL {e}"
            continue
        sc, srows = canon(sp_rows, sp_cols)
        dc, drows = canon(du_rows, du_cols)
        if sc != dc:
            results[q] = f"COLS-MISMATCH spark={sc} duck={dc}"
            continue
        if len(srows) != len(drows):
            results[q] = f"ROWCOUNT spark={len(srows)} duck={len(drows)}"
            continue
        n_exact_bad = n_close_bad = 0
        example = None
        for rs, rd in zip(srows, drows):
            for cs, cd in zip(rs, rd):
                exact, close = cells_equal(cs, cd)
                if not exact:
                    n_exact_bad += 1
                    if example is None:
                        example = (cs, cd)
                if not close:
                    n_close_bad += 1
        if n_close_bad:
            results[q] = f"VALUES-MISMATCH {n_close_bad} cells off, e.g. {example}"
        elif n_exact_bad:
            results[q] = f"ULP-DRIFT {n_exact_bad} cells, e.g. {example}"
        else:
            results[q] = f"OK ({len(srows)} rows)"
    for name in oracle:
        if name not in results:
            results[name] = "NO-SPARK-OUTPUT"
    width = max(len(k) for k in results)
    n_ok = 0
    for k in sorted(results):
        v = results[k]
        ok = v.startswith("OK") or v.startswith("rows-only (") and "EMPTY" not in v
        n_ok += ok
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
