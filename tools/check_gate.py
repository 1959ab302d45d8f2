#!/usr/bin/env python3
"""Gate-faithful local stand-in for the driver's hash compare.

check_oracle.py compares typed VALUES (so a Spark Decimal('513.00') equals a
DuckDB float 513.0); the driver's gate instead canonicalizes both frames
through pandas and hashes the STRING form of every cell — which is exactly
how round 6 produced 8 "cell-exact but hash-red" rows: DuckDB DECIMAL /
HUGEINT arrive as float64 ('513.0') while Spark parquet ships
decimal.Decimal objects ('513.00') / int64 ('500' vs '500.0').

This tool reproduces that failure mode: Spark side = pandas.read_parquet
(pyarrow), oracle side = duckdb .df(); columns sorted by name, every cell
str()-ified, rows sorted, then compared cell-by-cell. A PASS here means the
string-level hashes cannot diverge.

Usage: check_gate.py <sfdir> <verify_out> [query ...]
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_str(v):
    # Spark parquet DATE arrives as datetime.date ('2024-01-08') while
    # DuckDB DATE arrives as datetime64 ('2024-01-08 00:00:00'). The real
    # gate treats these as equal (every date-column query was hash-green in
    # r6), so normalize midnight timestamps to their date form on BOTH
    # sides — identical rule, so genuine value divergence still surfaces.
    if isinstance(v, pd.Timestamp) and v.time() == pd.Timestamp(0).time():
        return str(v.date())
    # None (object cols) vs NaT/NaN (typed cols) — the gate equates nulls
    # (scd2_merge / scalar_date_funcs ship NULL dates and were hash-green)
    try:
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_str(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False, name=None):
        rows.append(tuple(cell_str(v) for v in t))
    rows.sort()
    return list(df.columns), rows


def main(sfdir, outdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # run the shared CC closure once per sweep instead of once per consumer
    import cc_cache
    oracle, n_cc = cc_cache.materialize_cc(con, oracle, names=only or None)
    if n_cc:
        print(f"[cc_cache] closure materialized once, reused by {n_cc} queries")
    qdirs = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    if only:
        qdirs = [q for q in qdirs if q in only]
    results = {}
    for q in qdirs:
        if q not in oracle:
            results[q] = "rows-only (no oracle)"
            continue
        try:
            sp = pd.read_parquet(f"{outdir}/{q}")
        except Exception as e:
            results[q] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            du = con.execute(oracle[q]).df()
        except Exception as e:
            results[q] = f"ORACLE-SQL-FAIL {e}"
            continue
        sc, srows = canon_str(sp)
        dc, drows = canon_str(du)
        if sc != dc:
            results[q] = f"COLS-MISMATCH spark={sc} duck={dc}"
            continue
        if len(srows) != len(drows):
            results[q] = f"ROWCOUNT spark={len(srows)} duck={len(drows)}"
            continue
        bad = None
        n_bad = 0
        for rs, rd in zip(srows, drows):
            for c, (cs, cd) in enumerate(zip(rs, rd)):
                if cs != cd:
                    n_bad += 1
                    if bad is None:
                        bad = (sc[c], cs, cd)
        if n_bad:
            results[q] = (f"STR-MISMATCH {n_bad} cells, e.g. col={bad[0]} "
                          f"spark='{bad[1]}' duck='{bad[2]}'")
        else:
            results[q] = f"OK ({len(srows)} rows)"
    if not results:
        print("no matching queries")
        return 1
    width = max(len(k) for k in results)
    n_ok = 0
    for k in sorted(results):
        v = results[k]
        ok = v.startswith("OK") or v.startswith("rows-only")
        n_ok += ok
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
