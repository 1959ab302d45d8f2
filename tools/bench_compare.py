#!/usr/bin/env python3
"""Compare two bench JSON artifacts with host-window normalization.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--steady]

Accepts either a raw `{"metric":...}` line (possibly with a log prefix) or
a driver BENCH_r*.json wrapper (whose `tail` holds a truncated fragment of
the line — only the rows visible in the tail are compared then).

Prints the per-row ratio distribution, the median (= the host-window
factor when code is identical), each row's ratio NORMALIZED by that
median (what actually changed beyond the window), and the probe pair when
both artifacts carry it. Read README "Host-state drift" before trusting
cross-round absolute deltas.
"""
import json, re, statistics, sys


def load(path):
    s = open(path).read()
    try:
        d = json.loads(s[s.index('{'):])
    except ValueError:
        d = None
    if d is not None and 'queries' in d and isinstance(d['queries'], dict):
        return d, d['queries'], d.get('steady', {})
    if d is not None and 'tail' in d:  # driver wrapper with truncated tail
        q = {k: float(v) for k, v in re.findall(r'"([a-z0-9_]+)":([0-9.]+)', d['tail'])}
        q.pop('value', None)
        return d, q, {}
    raise SystemExit(f"unrecognized bench artifact: {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    steady = '--steady' in sys.argv
    if len(args) != 2:
        raise SystemExit(__doc__)
    da, qa, sa = load(args[0])
    db, qb, sb = load(args[1])
    if steady:
        qa, qb = (sa or qa), (sb or qb)
    for d, name in ((da, args[0]), (db, args[1])):
        ps, pp = d.get('host_probe_sec'), d.get('host_probe_par_sec')
        if ps is not None:
            print(f"{name}: host_probe_sec={ps:.3f}"
                  + (f" host_probe_par_sec={pp:.3f}" if pp is not None else ""))
    common = [k for k in qa if k in qb and qa[k] > 0.05]
    if not common:
        raise SystemExit("no comparable rows > 0.05s")
    ratios = {k: qb[k] / qa[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"\n{len(common)} comparable rows; median ratio new/old = {med:.3f} "
          f"(the host-window factor if code is identical)")
    print(f"\n{'row':32s} {'old':>7s} {'new':>7s} {'ratio':>6s} {'norm':>6s}")
    for k in sorted(common, key=lambda k: -abs(ratios[k] / med - 1)):
        print(f"{k:32s} {qa[k]:7.2f} {qb[k]:7.2f} {ratios[k]:6.2f} {ratios[k]/med:6.2f}")


if __name__ == '__main__':
    try:
        main()
    except BrokenPipeError:  # | head
        pass
