#!/usr/bin/env python3
"""Growth-exponent ledger (VERDICT r13 #3): turn per-scale bench JSONs
into measured time-vs-scale exponents, so "linear by design" scaladoc
claims become data.

Usage:
  python3 tools/growth_ledger.py sf:path [sf:path ...]
e.g.
  python3 tools/growth_ledger.py 0.01:/tmp/b001.json 0.1:/tmp/b01.json 1:/tmp/b1.json

Prints a markdown table of every query present in ALL inputs: the time
at each scale, the last-decade exponent e_last = log(t_n/t_{n-1}) /
log(sf_n/sf_{n-1}) (the number that predicts the NEXT 10x), and the
least-squares slope over all points. Reading guide: fixed per-query
overhead (session, planning, memo probes) floors small-scale times, so
full-fit slopes UNDERSTATE growth when t(small) is overhead-bound —
the last-decade exponent is the honest scale signal. e ~ 1 = linear,
e ~ 2 = quadratic; anything >= 1.5 needs an output-bound or carve-out
justification or it is next round's weak list (VERDICT r13 #3).
"""
import json
import math
import sys


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    scales = []
    for arg in argv[1:]:
        sf, path = arg.split(":", 1)
        with open(path) as f:
            d = json.load(f)
        scales.append((float(sf), {k: v for k, v in d["queries"].items() if v > 0}))
    scales.sort()
    common = set(scales[0][1])
    for _, qs in scales[1:]:
        common &= set(qs)
    header = (
        "| query | "
        + " | ".join(f"t(sf{sf:g}) s" for sf, _ in scales)
        + " | e_last | e_fit |"
    )
    print(header)
    print("|" + "---|" * (len(scales) + 3))
    rows = []
    for q in sorted(common):
        ts = [qs[q] for _, qs in scales]
        lx = [math.log10(sf) for sf, _ in scales]
        ly = [math.log10(t) for t in ts]
        n = len(lx)
        mx, my = sum(lx) / n, sum(ly) / n
        denom = sum((x - mx) ** 2 for x in lx)
        slope = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / denom
        e_last = (ly[-1] - ly[-2]) / (lx[-1] - lx[-2])
        rows.append((e_last, q, ts, slope))
    for e_last, q, ts, slope in sorted(rows, reverse=True):
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {q} | {cells} | {e_last:.2f} | {slope:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
