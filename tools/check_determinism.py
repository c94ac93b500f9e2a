#!/usr/bin/env python3
"""Determinism proof: compare two graft.Verify output dirs (e.g. runs at
different cpu counts) query by query. Parquet data files are compared by
content hash; a differing query is reported with its first differing row
(rows compared in file order — every query ends in an explicit ORDER BY,
so file order IS semantic order)."""
import sys, glob, hashlib, json
import duckdb

def file_hash(p):
    h = hashlib.sha256()
    with open(p, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()

def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(json.load(open(f"{a_dir}/oracle_sql.json")).keys()
                   | json.load(open(f"{b_dir}/oracle_sql.json")).keys()
                   | {d.split("/")[-1] for d in glob.glob(f"{a_dir}/q*")})
    n_same = n_rowsame = n_diff = 0
    for name in names:
        fa = sorted(glob.glob(f"{a_dir}/{name}/*.parquet"))
        fb = sorted(glob.glob(f"{b_dir}/{name}/*.parquet"))
        if not fa or not fb:
            print(f"MISSING {name}"); n_diff += 1; continue
        if [file_hash(f) for f in fa] == [file_hash(f) for f in fb]:
            n_same += 1; continue
        # bytes differ: fall back to row-level compare
        ra = con.execute(f"SELECT * FROM read_parquet({fa!r})").fetchall()
        rb = con.execute(f"SELECT * FROM read_parquet({fb!r})").fetchall()
        if ra == rb:
            n_rowsame += 1
            print(f"rowsame {name} (parquet bytes differ, rows identical)")
        else:
            n_diff += 1
            bad = next((i for i, (x, y) in enumerate(zip(ra, rb)) if x != y),
                       min(len(ra), len(rb)))
            print(f"DIFF {name}: rows {len(ra)} vs {len(rb)}, first diff at {bad}")
    print(f"== {n_same} byte-identical, {n_rowsame} row-identical, {n_diff} differ ==")
    return 1 if n_diff else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
