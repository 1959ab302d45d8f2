"""Shared CC-closure materialization for the local checker sweeps.

The connected-components oracle family (dedup_clusters / dedup_summary /
dedup_keep_best, plus any future consumer) each embed the SAME unrolled
min-label-propagation closure (`Queries.ccClosureSql`) as a WITH chain and
re-run it from scratch — 60-75 s per consumer at sf0.1, which dominated the
local sweep wall-time. The closure is deterministic in (corpus, rounds), so
a sweep only ever needs to run it ONCE: this helper finds the closure chain
inside the oracle SQL, materializes it into a temp table, and rewrites every
consumer to read `cl` from that table instead. Verdicts are unchanged — the
rewritten SQL computes the identical `cl(doc_id, cluster_id)` relation.

Used by check_oracle.py and check_gate.py; the driver's own gate is NOT
affected (it runs the original oracle_sql.json verbatim).
"""

import sys

# The closure chain always ends with this CTE (rounds baked into the lN
# table name); matching on it keeps the rewrite robust to new consumers.
_CC_MARK = "cl AS (SELECT id AS doc_id, lbl AS cluster_id FROM l"


#: oracle-SQL sentinel a budgeted sweep substitutes for closure consumers
#: whose shared materialization blew the budget — callers record them as
#: budget-exceeded instead of each re-hanging on the same closure
BUDGET_MARK = "__CC_BUDGET_EXCEEDED__"


def materialize_cc(con, oracle, names=None, runner=None):
    """Rewrite CC-closure consumers in `oracle` to read a temp table.

    Returns (rewritten_oracle, n_rewritten). On the first closure found,
    executes it once into temp table __cc_cl; every SQL containing the
    identical chain then gets it replaced by `cl AS (SELECT * FROM __cc_cl)`.
    `names` (optional) limits the scan to the queries a subset sweep will
    actually run — fewer than 2 closure consumers selected means the
    materialization would cost more than it saves, so it is skipped.
    `runner` (optional) executes the materialization statement under the
    caller's wall budget and returns -2.0 on budget exceeded, in which
    case every selected closure consumer's SQL becomes [[BUDGET_MARK]].
    """
    sqls = [s for q, s in oracle.items() if names is None or q in names]
    if sum(_CC_MARK in s for s in sqls) < 2:
        return oracle, 0
    chain = None
    for sql in sqls:
        i = sql.find(_CC_MARK)
        if i < 0:
            continue
        j = sql.find(")", i)
        w = sql.find("WITH ")
        if j < 0 or w < 0 or w > i:
            continue
        # full CTE list from after "WITH " through the closing paren of `cl`
        chain = sql[w + 5:j + 1]
        break
    if chain is None:
        return oracle, 0
    create = f"CREATE TEMP TABLE __cc_cl AS WITH {chain} SELECT * FROM cl"
    if runner is not None:
        if runner(create) == -2.0:
            out = dict(oracle)
            marked = 0
            for q, sql in oracle.items():
                if _CC_MARK in sql and (names is None or q in names):
                    out[q] = BUDGET_MARK
                    marked += 1
            print(f"[cc_cache] closure materialization exceeded the wall "
                  f"budget; marking {marked} consumer(s) budget-exceeded", file=sys.stderr)
            return out, marked
    else:
        con.execute(create)
    # shape check: the materialized closure must be the (doc_id, cluster_id)
    # relation every consumer expects — a chain that captured extra
    # consumer-specific CTEs, or a changed closure output, aborts the
    # rewrite LOUDLY instead of feeding consumers a malformed cl table
    cols = [r[0] for r in con.execute("DESCRIBE __cc_cl").fetchall()]
    if cols != ["doc_id", "cluster_id"]:
        print(f"[cc_cache] materialized closure has unexpected shape {cols}; "
              "skipping the rewrite (all consumers keep their original SQL)", file=sys.stderr)
        con.execute("DROP TABLE __cc_cl")
        return oracle, 0
    out = {}
    n = 0
    for q, sql in oracle.items():
        if chain in sql:
            rewritten = sql.replace(chain, "cl AS (SELECT * FROM __cc_cl)")
            # The wholesale substring swap assumes no consumer references the
            # closure's internal CTEs (w/p/e/lN) after `cl` and defines no CTEs
            # of its own before the closure. Verify the rewrite still PLANS
            # (views are registered before this call); a consumer that breaks
            # the convention falls back to its original, slower-but-correct SQL.
            try:
                con.execute("EXPLAIN " + rewritten)
                out[q] = rewritten
                n += 1
            except Exception as e:
                print(f"[cc_cache] rewrite of {q} does not plan "
                      f"({type(e).__name__}); keeping original SQL", file=sys.stderr)
                out[q] = sql
        else:
            out[q] = sql
    # a consumer that CONTAINS a closure (the marker) but whose chain text
    # diverged from the materialized one silently kept its slow original
    # before — report it so a convention change in a future consumer is
    # visible in the sweep log, not just a mysteriously slower run
    diverged = sorted(q for q, sql in oracle.items()
                      if _CC_MARK in sql and chain not in sql
                      and (names is None or q in names))
    if diverged:
        print(f"[cc_cache] {len(diverged)} closure consumer(s) did not match "
              f"the materialized chain, keeping original SQL: "
              f"{', '.join(diverged)}", file=sys.stderr)
    return out, n
