#!/usr/bin/env python3
"""Plan-drift gate: diff per-query physical-plan shape between two
PLANS.md generations (VERDICT r8 #8).

Usage: python3 tools/check_plan_drift.py <old_PLANS.md> <new_PLANS.md>

For every query present in BOTH files, counts the structural nodes that
decide cost at scale — shuffles, sorts, broadcasts, reuse, scans,
codegen fences — and reports any query whose counts changed. A silent
plan regression (the q173 class from r7/r8: a memo rework quietly adding
an Exchange to every fixed-point round) is then caught by a gate instead
of a judge.

Node counting is per plan LINE (each operator renders on its own line in
SimpleMode), anchored to the operator position after the tree-art prefix
— substring counting would double-count ReusedExchange's repetition of
the reused child's description (the q208 trap).

Exit 1 if any common query drifted; added/removed queries are reported
as INFO (new queries have no baseline to drift from).
"""
import re, sys

# Operator-name anchors, matched at the start of an operator token.
NODES = [
    ("exchange", r"Exchange\b"),                 # shuffle
    ("broadcast_exchange", r"BroadcastExchange\b"),
    ("reused_exchange", r"ReusedExchange\b"),
    ("sort", r"Sort\b"),
    ("sort_merge_join", r"SortMergeJoin\b"),
    ("broadcast_hash_join", r"BroadcastHashJoin\b"),
    ("shuffled_hash_join", r"ShuffledHashJoin\b"),
    ("nested_loop_join", r"BroadcastNestedLoopJoin\b|CartesianProduct\b"),
    ("hash_aggregate", r"HashAggregate\b|ObjectHashAggregate\b"),
    ("sort_aggregate", r"SortAggregate\b"),
    ("window", r"Window\b|WindowGroupLimit\b"),
    ("file_scan", r"FileScan\b|BatchScan\b"),
    ("in_memory_scan", r"InMemoryTableScan\b"),
    ("generate", r"Generate\b"),
]
# Tree-art / annotation prefix before the operator name on a plan line.
PREFIX = re.compile(r"^[\s:+\-*()0-9]*")


def parse(path):
    """{query_name: {node_kind: count}} from a PLANS.md file."""
    plans, name, in_code = {}, None, False
    for line in open(path, encoding="utf-8"):
        if line.startswith("## "):
            name, in_code = line[3:].strip(), False
            plans[name] = {k: 0 for k, _ in NODES}
            plans[name]["_failed"] = False
        elif name and line.startswith("PLAN FAILED"):
            plans[name]["_failed"] = True
        elif line.startswith("```"):
            in_code = not in_code
        elif in_code and name:
            body = PREFIX.sub("", line)
            for kind, pat in NODES:
                # First operator token on the line only: one node per
                # line. re.match anchors at the token start, so
                # "Exchange" cannot swallow a "BroadcastExchange" line —
                # the \b-suffixed names are mutually exclusive at pos 0.
                if re.match(pat, body):
                    plans[name][kind] += 1
                    break
    return plans


def main(old_path, new_path):
    old, new = parse(old_path), parse(new_path)
    drifted = []
    for q in sorted(set(old) & set(new)):
        if old[q]["_failed"] or new[q]["_failed"]:
            if old[q]["_failed"] != new[q]["_failed"]:
                drifted.append((q, [("PLAN_FAILED", old[q]["_failed"],
                                     new[q]["_failed"])]))
            continue
        diffs = [(k, old[q][k], new[q][k]) for k, _ in NODES
                 if old[q][k] != new[q][k]]
        if diffs:
            drifted.append((q, diffs))
    for q in sorted(set(new) - set(old)):
        print(f"INFO  new query (no baseline): {q}")
    for q in sorted(set(old) - set(new)):
        print(f"INFO  removed query: {q}")
    for q, diffs in drifted:
        detail = ", ".join(f"{k} {a}->{b}" for k, a, b in diffs)
        print(f"DRIFT {q}: {detail}")
    n = len(set(old) & set(new))
    print(f"[plan-drift] {n} common queries, {len(drifted)} drifted, "
          f"{len(set(new) - set(old))} new, {len(set(old) - set(new))} removed")
    return 1 if drifted else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
