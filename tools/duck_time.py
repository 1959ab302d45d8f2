#!/usr/bin/env python3
"""Per-oracle DuckDB timing sweep — the baseline side of the bench ratio.

Times every oracle SQL from a Verify dump against the sf dir's parquet
tables (DuckDB, all cores), with the shared CC closure materialized ONCE
via cc_cache (its cost reported separately, exactly how the per-round
ratio is computed). Prints one JSON line:

  {"cc_closure_sec": s, "total_sec": s, "queries": {name: sec, ...}}

Usage: duck_time.py <sfdir> <verify_out> [query ...]

Pair with a Bench run on the same sf dir to get per-query Spark/DuckDB
ratios:

  python3 tools/duck_time.py /root/testdata/sf0.1 /tmp/verify_out > /tmp/duck.json
  # then join "queries" against the bench JSON's "queries"/"steady"
"""
import json
import os
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_isolated(sfdir, outdir, sel, budget, oracle):
    """Subprocess-isolated sweep (budgeted runs' default).

    con.interrupt() is COOPERATIVE and some operator shapes never check it
    (observed: the j2_pip_join scalar point-in-polygon evaluation at sf1
    ran >50 min past a 60 s budget) — in-process, one such query wedges
    the whole sweep. Here each child measures its own elapsed (spawn and
    view setup excluded from the reported time) and the parent enforces a
    HARD kill at (2*budget+30) per query, recording -2.0. The cooperative
    interrupt still handles the normal case inside the child; the hard
    kill is the backstop.

    The CC-closure consumers run together in ONE child: per-query
    children would make cc_cache.materialize_cc skip (it needs >=2
    selected consumers), silently folding the 60-75 s closure into every
    consumer's reported time while cc_closure_sec read 0.0 — baselines
    incomparable with every in-process sweep. The group gets a
    proportionally larger hard-kill window; a wedge inside it marks the
    whole family budget-exceeded, the honest verdict for rows that share
    one materialization. cc closure cost is that child's
    cc_closure_sec."""
    import cc_cache
    times = {}
    cc_sec = 0.0
    cc = [q for q in sel if cc_cache._CC_MARK in oracle[q]]
    rest = [q for q in sel if q not in cc]
    groups = ([cc] if len(cc) >= 2 else [[q] for q in cc]) + [[q] for q in rest]
    for group in groups:
        label = group[0] if len(group) == 1 else f"cc-group({len(group)})"
        kill_at = (2 * budget + 30) * len(group)
        try:
            env = dict(os.environ)
            env["DUCK_ISOLATE"] = "0"
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sfdir, outdir]
                + group,
                capture_output=True, text=True, timeout=kill_at, env=env)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            d = json.loads(line)
            cc_sec = max(cc_sec, d.get("cc_closure_sec", 0.0))
            for q in group:
                times[q] = d["queries"].get(q, -1.0)
                if times[q] == -2.0:
                    print(f"[duck_time] {q} BUDGET-EXCEEDED (> {budget}s)",
                          file=sys.stderr)
                elif times[q] == -1.0:
                    tail = (r.stderr or "").strip().splitlines()
                    print(f"[duck_time] {q} FAILED: "
                          f"{tail[-1] if tail else '?'}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            for q in group:
                times[q] = -2.0
            print(f"[duck_time] {label} BUDGET-EXCEEDED (hard kill at "
                  f"{kill_at:.0f}s; interrupt not honored)", file=sys.stderr)
        except Exception as e:
            for q in group:
                times[q] = -1.0
            print(f"[duck_time] {label} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({
        "cc_closure_sec": round(cc_sec, 2),
        "budget_sec": budget,
        "isolated": True,
        "total_sec": round(sum(v for v in times.values() if v > 0), 2),
        "queries": times}))


def main(sfdir, outdir, names):
    budget0 = float(os.environ.get("DUCK_BUDGET_SEC", "0") or 0)
    # Budgeted sweeps isolate BY DEFAULT (round-17: j2_pip_join's scalar
    # PIP ignored con.interrupt() for >50 min at sf1 and wedged the whole
    # in-process sweep — the hard-kill backstop only exists per-child).
    # DUCK_ISOLATE=0 opts back into the in-process path; unbudgeted runs
    # stay in-process (nothing to kill against).
    if os.environ.get("DUCK_ISOLATE", "1") != "0" and budget0 > 0:
        oracle = json.load(open(f"{outdir}/oracle_sql.json"))
        sel = sorted(n for n in oracle if not names or n in names)
        return run_isolated(sfdir, outdir, sel, budget0, oracle)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        # a table may be a single parquet file (driver testdata) or a
        # directory of part files (the ScaleGen sf1 slice) — glob the latter
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # DUCK_BUDGET_SEC: per-statement wall budget (0 = unbounded, the
    # default). Above-sf0.1 sweeps need it — several oracle SQL shapes
    # (the recursive-CTE CC closure, the pair-join dedup mirrors) are
    # super-linear in DuckDB and can run for hours at 10x; a budgeted run
    # records -2.0 ("budget exceeded at >= budget seconds") instead of
    # hanging, which IS the baseline datapoint. Interrupt arrives via
    # con.interrupt() from a timer thread.
    budget = float(os.environ.get("DUCK_BUDGET_SEC", "0") or 0)
    import threading

    def timed(sql):
        t0 = time.time()
        timer = None
        # explicit state, not a wall-clock heuristic: a genuine failure
        # arriving after the budget elapses must still record FAILED. The
        # lock makes done-check + interrupt atomic against fetchall()
        # returning: without it a timer firing in that gap would leave a
        # stray interrupt that aborts the NEXT statement as a spurious
        # -1.0 FAILED.
        state = {"fired": False, "done": False}
        lock = threading.Lock()
        if budget > 0:
            def fire():
                with lock:
                    if not state["done"]:
                        state["fired"] = True
                        con.interrupt()
            timer = threading.Timer(budget, fire)
            timer.start()
        try:
            con.execute(sql).fetchall()
            with lock:
                state["done"] = True
                fired = state["fired"]
            # the lock serializes the FLAGS, but the timer can still win it
            # in the gap between fetchall() returning and done=True — the
            # interrupt then lands on an idle connection and would abort
            # the NEXT statement. Detect that exact case (success + fired)
            # and absorb the pending interrupt with a throwaway statement.
            if fired:
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            return round(time.time() - t0, 4)
        except Exception as e:
            with lock:
                state["done"] = True
            if state["fired"]:
                # the exception may be a GENUINE error that raced the
                # timer: the interrupt could still be pending and would
                # abort the NEXT statement — absorb it either way
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
                return -2.0  # budget exceeded (interrupted by the timer)
            raise e
        finally:
            if timer is not None:
                timer.cancel()

    import cc_cache
    t0 = time.time()
    oracle, n_cc = cc_cache.materialize_cc(con, oracle,
                                           set(names) if names else None,
                                           runner=timed if budget > 0 else None)
    cc_sec = time.time() - t0 if n_cc else 0.0
    times = {}
    for q in sorted(oracle):
        if names and q not in names:
            continue
        try:
            times[q] = (-2.0 if oracle[q] == cc_cache.BUDGET_MARK
                        else timed(oracle[q]))
            if times[q] == -2.0:
                print(f"[duck_time] {q} BUDGET-EXCEEDED (> {budget}s)",
                      file=sys.stderr)
        except Exception as e:
            print(f"[duck_time] {q} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            times[q] = -1.0
    print(json.dumps({
        "cc_closure_sec": round(cc_sec, 2),
        "budget_sec": budget,
        "total_sec": round(sum(v for v in times.values() if v > 0), 2),
        "queries": times}))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
