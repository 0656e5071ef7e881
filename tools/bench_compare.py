#!/usr/bin/env python3
"""Compare two bench_full.json records (round-over-round perf diff).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.4]

Prints per-query ratios for queries present in both records, flagging
regressions above the threshold (default 1.4x — single-run timings at
sf0.1 carry ~±40% noise, see the bench methodology note in SCALE.md),
plus added/removed queries and totals. Exit code 0 always: the output
is a report, not a gate (the oracle suite is the gate).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.4)
    args = ap.parse_args()

    old_rec = json.load(open(args.old))
    new_rec = json.load(open(args.new))
    old = old_rec["queries"]
    new = new_rec["queries"]

    # co-tenant load evidence (r11 ask #4): the "start" loadavg is
    # sampled BEFORE Spark starts, so >2 there means the bench window
    # itself was loaded — annotate instead of letting a ratio mislead
    for label, rec in (("old", old_rec), ("new", new_rec)):
        la = rec.get("loadavg") or {}
        if la:
            print(f"{label} load: start={la.get('start')} end={la.get('end')} "
                  f"busy_frac={la.get('busy_frac')}")
        start = (la.get("start") or [0])[0]
        if start > 2:
            print(f"  !! {label} record taken under co-tenant load "
                  f"(pre-bench 1-min loadavg {start}) — timings suspect")

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regress, improve = [], []
    for q in shared:
        if old[q] <= 0:
            continue
        r = new[q] / old[q]
        if r >= args.threshold and new[q] - old[q] > 0.5:
            regress.append((r, q))
        elif r <= 1 / args.threshold and old[q] - new[q] > 0.5:
            improve.append((r, q))

    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x)" if tot_old else "no shared queries")
    if regress:
        print(f"\nregressions (>= {args.threshold}x and >0.5s):")
        for r, q in sorted(regress, reverse=True):
            print(f"  {r:5.2f}x  {old[q]:6.2f} -> {new[q]:6.2f}  {q}")
    else:
        print("\nno regressions above threshold")
    if improve:
        print("\nimprovements:")
        for r, q in sorted(improve):
            print(f"  {r:5.2f}x  {old[q]:6.2f} -> {new[q]:6.2f}  {q}")
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    main()
