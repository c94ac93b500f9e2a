#!/usr/bin/env python3
"""Bench variance guard (VERDICT r13 #4).

Compares the two most recent committed sf1 bench artifacts
(BENCH_sf1_r*.json, falling back to BENCH_r*.json when fewer than two
sf1 rounds exist) and reports every query whose median time drifted by
more than DRIFT_RATIO in either direction. The r13 context: the same
code measured 505 -> 636 -> 575 s across consecutive sf1 runs (ambient
box variance, median per-query inter-run ratio 1.16), so a future REAL
1.2x regression was indistinguishable from noise. This guard does not
try to out-smart the noise -- it makes the drift visible and quantified
at commit time, with the suite-median ratio printed so a DIFFUSE shift
(ambient) is distinguishable from a CONCENTRATED one (plan drift).

Exit code is always 0 (ambient variance must not block a commit); the
output is the artifact.
"""
import glob
import json
import re
import sys

DRIFT_RATIO = 1.3
MIN_SECONDS = 0.5  # ignore sub-noise-floor queries


def round_num(path):
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d.get("queries", {}).items() if v >= 0}


def main():
    files = sorted(glob.glob("BENCH_sf1_r*.json"), key=round_num)
    if len(files) < 2:
        files = sorted(glob.glob("BENCH_r*.json"), key=round_num)
    if len(files) < 2:
        print("bench_drift: fewer than two bench artifacts -- nothing to compare")
        return 0
    prev_f, cur_f = files[-2], files[-1]
    prev, cur = load(prev_f), load(cur_f)
    common = sorted(set(prev) & set(cur))
    if not common:
        print(f"bench_drift: no common queries between {prev_f} and {cur_f}")
        return 0
    ratios = sorted(cur[q] / prev[q] for q in common if prev[q] > 0)
    med = ratios[len(ratios) // 2]
    # normalize the ambient suite-wide shift out: a query only counts as
    # drifted when its ratio deviates >DRIFT_RATIO from the suite-median
    # ratio (the r13 runs shifted the WHOLE suite 1.16-1.44x; dividing by
    # the median isolates per-query plan drift from box weather)
    drifted = [
        (q, prev[q], cur[q], cur[q] / prev[q] / med)
        for q in common
        if max(prev[q], cur[q]) >= MIN_SECONDS
        and prev[q] > 0
        and (
            cur[q] / prev[q] / med > DRIFT_RATIO
            or med * prev[q] / cur[q] > DRIFT_RATIO
        )
    ]
    print(
        f"bench_drift: {prev_f} -> {cur_f}: {len(common)} common queries, "
        f"suite-median ratio {med:.2f} (ambient; divided out below)"
    )
    if not drifted:
        print(f"bench_drift: no median-normalized drift beyond {DRIFT_RATIO}x")
        return 0
    print(
        f"bench_drift: {len(drifted)} query(ies) drifted beyond {DRIFT_RATIO}x "
        f"after median normalization (>= {MIN_SECONDS}s); intentional reworks "
        "should appear here, untouched queries should not:"
    )
    for q, p, c, r in sorted(drifted, key=lambda t: -t[3])[:15]:
        print(f"  {q}: {p:.2f}s -> {c:.2f}s ({r:.2f}x normalized)")
    if len(drifted) > 15:
        print(f"  ... and {len(drifted) - 15} more")
    return 0


if __name__ == "__main__":
    sys.exit(main())
