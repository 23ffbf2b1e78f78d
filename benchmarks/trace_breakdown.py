"""Offline breakdown of a decode_profile trace: per-category top ops,
decode-loop vs prefill attribution (by event count multiplicity), so the
non-qmm budget (copies, fusions, cache updates) is itemized per token.

Usage: python benchmarks/trace_breakdown.py [--dir /tmp/decode_trace]
       [--steps 64] [--top 25] [--cat copy/transpose]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.decode_profile import device_events, categorize, is_container


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/decode_trace")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    evs = device_events(args.dir)
    by_name = collections.defaultdict(lambda: [0.0, 0, None])
    for name, dur, a in evs:
        agg = by_name[name]
        agg[0] += dur
        agg[1] += 1
        if agg[2] is None and a:
            agg[2] = a
    steps = args.steps

    # decode-loop ops repeat once per scan step; prefill ops appear a few
    # times.  count >= steps is the decode signature.
    dec = {n: v for n, v in by_name.items()
           if not is_container(n) and v[1] >= steps}
    pre = {n: v for n, v in by_name.items()
           if not is_container(n) and v[1] < steps}
    for label, group in (("DECODE-LOOP (count >= steps)", dec),
                         ("PREFILL/ONE-SHOT (count < steps)", pre)):
        total = sum(v[0] for v in group.values())
        print(f"\n== {label}: {total / steps:.1f} us/token total ==")
        cats = collections.defaultdict(float)
        for n, v in group.items():
            cats[categorize(n)] += v[0]
        for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {c:16s} {d / steps:8.1f} us/tok ({100 * d / total:4.1f}%)")
        for c, _ in sorted(cats.items(), key=lambda kv: -kv[1]):
            rows = sorted(((n, v) for n, v in group.items()
                           if categorize(n) == c), key=lambda kv: -kv[1][0])
            print(f"  -- top {c} --")
            for n, (d, cnt, a) in rows[:args.top]:
                extra = ""
                if a:
                    ln = a.get("long_name") or a.get("tf_op") or ""
                    extra = f"  | {str(ln)[:120]}"
                print(f"    {d / steps:8.1f} us/tok x{cnt:<6d} {n[:80]}{extra}")


if __name__ == "__main__":
    main()
