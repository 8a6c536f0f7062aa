#!/usr/bin/env python3
"""Compare two Bench artifacts query-by-query.

Usage: python3 tools/bench_ratio.py BASE.json OTHER.json [min_ratio]

Prints OTHER/BASE per-query ratios sorted worst-first (default: only
ratios >= 2.0), plus control-group medians (TPC-H q1-q22 and stream_*,
whose inputs don't change across scale factors of the pipeline tables —
if their medians drift far from 1.0 the run was load-contaminated, not
the code). Used for the r13-style scale audits: run Bench at a scaled
dir with SPARK_GRAFT_BENCH_OUT, then diff against BENCH_FULL.json.
"""
import json
import statistics
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))
    other = json.load(open(sys.argv[2]))
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qb, qo = base["queries"], other["queries"]
    rows = [
        (k, qo[k], qb[k], qo[k] / qb[k])
        for k in qo
        if qb.get(k, 0) > 0 and qo[k] > 0
    ]
    rows.sort(key=lambda r: -r[3])
    print(f"base:  {base.get('sf')} total={base.get('value'):.1f}s "
          f"loadavg={base.get('loadavg', 'n/a')}")
    print(f"other: {other.get('sf')} total={other.get('value'):.1f}s "
          f"loadavg={other.get('loadavg', 'n/a')}")
    failed = set(other.get("failed", [])) | (set(qb) - set(qo))
    if failed:
        print(f"failed/missing in OTHER: {sorted(failed)}")
    print(f"\n{'query':38s} {'other':>8s} {'base':>7s} {'ratio':>7s}")
    for k, a, b, r in rows:
        if r >= min_ratio:
            print(f"{k:38s} {a:8.2f} {b:7.2f} {r:6.1f}x")

    def med(pred):
        vals = [r[3] for r in rows if pred(r[0])]
        return round(statistics.median(vals), 2) if vals else None

    print(f"\ncontrol medians: tpch="
          f"{med(lambda k: k[0] == 'q' and k[1].isdigit())} "
          f"stream={med(lambda k: k.startswith('stream_'))} "
          f"all={med(lambda k: True)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
