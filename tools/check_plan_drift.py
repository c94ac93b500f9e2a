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


def selftest():
    """Deliberate-regression proof (VERDICT r9 #8): a query whose
    broadcast join silently becomes a shuffle join between generations
    MUST be flagged — the q211-class authoring-time catch. Writes two
    synthetic PLANS.md generations to temp files and asserts the diff.
    """
    import tempfile, os
    old = """## q999_regression_probe
```
*(3) HashAggregate(keys=[k], functions=[sum(v)])
+- *(3) Project [k, v]
   +- *(3) BroadcastHashJoin [k], [k2], Inner, BuildRight
      :- *(3) ColumnarToRow
      :  +- FileScan parquet [k,v]
      +- BroadcastExchange HashedRelationBroadcastMode
         +- FileScan parquet [k2]
```
"""
    new = """## q999_regression_probe
```
*(5) HashAggregate(keys=[k], functions=[sum(v)])
+- *(5) Project [k, v]
   +- *(5) SortMergeJoin [k], [k2], Inner
      :- *(2) Sort [k ASC]
      :  +- Exchange hashpartitioning(k, 32)
      :     +- FileScan parquet [k,v]
      +- *(4) Sort [k2 ASC]
         +- Exchange hashpartitioning(k2, 32)
            +- FileScan parquet [k2]
```
"""
    with tempfile.TemporaryDirectory() as d:
        po, pn = os.path.join(d, "old.md"), os.path.join(d, "new.md")
        open(po, "w").write(old)
        open(pn, "w").write(new)
        o, n = parse(po), parse(pn)
        q = "q999_regression_probe"
        assert o[q]["broadcast_hash_join"] == 1 and o[q]["broadcast_exchange"] == 1, o[q]
        assert n[q]["sort_merge_join"] == 1 and n[q]["exchange"] == 2 and n[q]["sort"] == 2, n[q]
        rc = main(po, pn)
        assert rc == 1, "drift tool failed to flag a broadcast->shuffle join regression"
        # and the no-change direction stays quiet
        assert main(po, po) == 0
    print("[plan-drift] selftest ok: broadcast->shuffle join regression is flagged")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
