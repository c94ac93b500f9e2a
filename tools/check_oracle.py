#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each fixture parquet as a DuckDB view named after the table, runs every
oracle SQL, and compares against the Spark result parquet in
<verifyOutDir>/<name>/. Columns are sorted by name before compare (the
driver hashes that way); rows are compared in order; floats must match
exactly (the driver hash-compares, so 'close' is not good enough — report
max abs diff when not exact).
"""
import json, math, sys, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # optional resource pragmas, e.g. for the 10x bench fixture:
    # GRAFT_DUCKDB_PRAGMAS="SET threads=8;SET memory_limit='24GB';SET temp_directory='/root/repo/target/ducktmp'"
    import os
    for pragma in filter(None, os.environ.get("GRAFT_DUCKDB_PRAGMAS", "").split(";")):
        con.execute(pragma)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        spark = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        duck = duck.reindex(sorted(duck.columns), axis=1)
        spark = spark.reindex(sorted(spark.columns), axis=1)
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: columns duck={list(duck.columns)} spark={list(spark.columns)}")
            n_bad += 1; continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_bad += 1; continue
        bad = None
        for c in duck.columns:
            dv, sv = duck[c].tolist(), spark[c].tolist()
            for i, (a, b) in enumerate(zip(dv, sv)):
                if a is None and b is None: continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b): continue
                    if a != b:
                        bad = f"col {c} row {i}: duck={a!r} spark={b!r} diff={abs(a-b):g}"
                        break
                elif str(a) != str(b):
                    bad = f"col {c} row {i}: duck={a!r} spark={b!r}"
                    break
            if bad: break
        if bad:
            print(f"FAIL {name}: {bad}"); n_bad += 1
        else:
            print(f"ok   {name} ({len(duck)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
