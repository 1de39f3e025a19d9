#!/usr/bin/env python3
"""Compare two bench records' per-query timings and headline numbers.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [--thresh 1.5]

Accepts either a bench summary line file (one JSON object with a
"queries" dict — e.g. BENCH_r04.json's `parsed`, or a BENCH/*.json
record) or a detail sidecar ({"summary": {...}}). Prints queries whose
wall changed by more than --thresh x in either direction, new/removed
queries, and the headline delta — the 30-second regression triage a
round review starts with.

Host-weather caveat: this box's throughput swings 4-6x on minute
timescales (BENCH/NOTES.md §6), so a single-pair ratio is a LEAD, not a
verdict — confirm a flagged query against a second record or a quiet
window before acting.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_summary(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        # a .out capture of multiple summary lines: last one supersedes
        obj = None
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    obj = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if obj is None:
            raise
    if "summary" in obj:            # detail sidecar
        obj = obj["summary"]
    if "parsed" in obj and isinstance(obj["parsed"], dict):  # BENCH_rN
        obj = obj["parsed"]
    return obj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--thresh", type=float, default=1.5,
                    help="flag ratio above this (and below 1/this)")
    args = ap.parse_args()

    old, new = load_summary(args.old), load_summary(args.new)
    oq = {k: v for k, v in (old.get("queries") or {}).items()
          if isinstance(v, (int, float))}
    nq = {k: v for k, v in (new.get("queries") or {}).items()
          if isinstance(v, (int, float))}

    print(f"headline wall: {old.get('value')} -> {new.get('value')} s"
          f"  | docs/s: {old.get('docs_per_sec')} -> "
          f"{new.get('docs_per_sec')}")
    osc, nsc = old.get("scaling") or {}, new.get("scaling") or {}
    if osc or nsc:
        print(f"scaling eff: {osc.get('efficiency')} -> "
              f"{nsc.get('efficiency')}")

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")

    flagged = []
    for k in sorted(set(oq) & set(nq)):
        if oq[k] <= 0:
            continue
        r = nq[k] / oq[k]
        if r >= args.thresh or r <= 1.0 / args.thresh:
            flagged.append((r, k))
    for r, k in sorted(flagged, reverse=True):
        tag = "SLOWER" if r > 1 else "faster"
        print(f"  {tag} {r:5.2f}x  {k}: {oq[k]:.3f} -> {nq[k]:.3f} s")
    if not flagged:
        print(f"no per-query change beyond {args.thresh}x")
    err_new = [k for k, v in (new.get("queries") or {}).items()
               if isinstance(v, str)]
    if err_new:
        print(f"ERRORED in new ({len(err_new)}): {', '.join(err_new)}")
        return 1
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:     # `| head` closed the pipe — fine
        sys.exit(0)
