#!/usr/bin/env python3
"""Bench-ONLY 10x fixture generator (VERDICT r9 #5): builds an sf1-scale
copy of the sf0.1 fixture under target/bench_sf1/ so the per-round 2x
gate (judged at sf0.1) gets one 10x datapoint that would surface any
super-linear floor (triangle counting, pair verification, self-join
fan-outs) before it matters.

NOT a correctness fixture — the driver's oracle gate stays on
/root/testdata/sf0.01. Construction: 10 key-shifted copies of every
fact table (copy i shifts each key family by i*stride, strides = max+1
per family, so FK integrity holds within a copy and copies are
key-disjoint); dims region/nation stay single-copy; event timestamps
are NOT shifted (the time axis gets 10x denser, as real growth would);
document text gets a per-copy suffix token (so copies are not exact
dups and near-dup/LSH bucket structure densifies 10x instead of
degenerating to a 100% duplicate corpus); embeddings keep their
vectors (ANN buckets densify 10x).

Usage: python3 tools/make_bench_sf1.py [outDir] [copies]
  (defaults: target/bench_sf1, 10 — pass e.g. target/bench_sf3 30 for
  the 30x dedup-family stress fixture, VERDICT r13 #9)
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/bench_sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
    # key-family strides (max + 1)
    s = {k: con.execute(q).fetchone()[0] + 1 for k, q in {
        "cust": "SELECT MAX(c_custkey) FROM customer",
        "supp": "SELECT MAX(s_suppkey) FROM supplier",
        "part": "SELECT MAX(p_partkey) FROM part",
        "ord":  "SELECT MAX(o_orderkey) FROM orders",
        "ev":   "SELECT MAX(event_id) FROM events",
        "user": "SELECT MAX(user_id) FROM events",
        "doc":  "SELECT MAX(doc_id) FROM documents",
        "vec":  "SELECT MAX(vec_id) FROM embeddings",
    }.items()}
    con.execute(f"CREATE VIEW copies AS SELECT * FROM range(0, {COPIES}) r(i)")

    def emit(name, sql):
        con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit("customer", f"""
        SELECT c_custkey + i * {s['cust']} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM customer CROSS JOIN copies""")
    emit("supplier", f"""
        SELECT s_suppkey + i * {s['supp']} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM supplier CROSS JOIN copies""")
    emit("part", f"""
        SELECT p_partkey + i * {s['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part CROSS JOIN copies""")
    emit("orders", f"""
        SELECT o_orderkey + i * {s['ord']} AS o_orderkey,
               o_custkey + i * {s['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN copies""")
    emit("lineitem", f"""
        SELECT l_orderkey + i * {s['ord']} AS l_orderkey,
               l_partkey + i * {s['part']} AS l_partkey,
               l_suppkey + i * {s['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN copies""")
    emit("events", f"""
        SELECT event_id + i * {s['ev']} AS event_id, ts,
               user_id + i * {s['user']} AS user_id,
               event_type, value, props
        FROM events CROSS JOIN copies""")
    emit("documents", f"""
        SELECT doc_id + i * {s['doc']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' zcopy' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE text || ' zcopy' || CAST(i AS VARCHAR) END) AS BIGINT)
                 AS n_chars
        FROM documents CROSS JOIN copies""")
    emit("embeddings", f"""
        SELECT vec_id + i * {s['vec']} AS vec_id, embedding, label
        FROM embeddings CROSS JOIN copies""")

if __name__ == "__main__":
    main()
