#!/usr/bin/env python3
"""Hostile drill wave 8: mass duplication and ties.

Crawl-shaped pathology: the SAME text/vector/row repeated across the
corpus, and every ranking boundary a tie. Attacks:

- exact-duplicate full rows (events, lineitem)      -> distinct/dedup
  semantics, join multiplication
- one text shared by ~50 docs (6 families total)    -> hot minhash/
  simhash bands, winnow stop-fingerprints, giant CC component,
  repeated-passage explosion, keep-one-representative tiebreaks
- one embedding shared by many vectors              -> cosine ties in
  every ANN top-k (neighbor_id tiebreak is the only order), identical
  centroids, zero-variance PCA directions
- all-equal o_totalprice / constant part brand+type -> boundary ties in
  q3/w1 top-k, one giant range-band group
- same-(user, ts) events en masse                   -> dedup keeper and
  as-of tiebreaks at scale

All tables derive from /root/testdata/sf0.001 (schema-faithful), with
contents rewritten deterministically.

Usage: python3 tools/hostile_dups.py /tmp/dups_sf
Then the normal Verify + oracle_check loop (expect 102 pass, 0 fail).
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"


def load(t):
    return pq.read_table(os.path.join(SRC, f"{t}.parquet"))


def write(out_dir, t, table):
    pq.write_table(table, os.path.join(out_dir, f"{t}.parquet"))
    print(f"wrote {t}.parquet rows={table.num_rows}")


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)

    # --- documents: 6 text families, ~50 docs each --------------------
    docs = load("documents").to_pydict()
    n = len(docs["doc_id"])
    fam = [docs["text"][i] for i in range(6)]
    texts = [fam[i % 6] for i in range(n)]
    docs["text"] = texts
    docs["n_chars"] = [len(t) if t is not None else None for t in texts]
    # sources collapse to 2 so mixture quotas see heavy dup mass
    docs["source"] = [f"src{i % 2}" for i in range(n)]
    write(out_dir, "documents", pa.table(docs, schema=load("documents").schema))

    # --- embeddings: 10 distinct vectors shared across all rows -------
    emb = load("embeddings").to_pydict()
    m = len(emb["vec_id"])
    canon = [emb["embedding"][i] for i in range(10)]
    emb["embedding"] = [canon[i % 10] for i in range(m)]
    emb["label"] = [1] * m  # one label: identical centroid for everyone
    write(out_dir, "embeddings", pa.table(emb, schema=load("embeddings").schema))

    # --- events: exact-duplicate rows + mass (user, ts) collisions ----
    ev = load("events")
    third = ev.slice(0, max(ev.num_rows // 3, 1))
    dup = pa.concat_tables([ev, third, third])  # full rows repeated x3
    d = dup.to_pydict()
    k = len(d["event_id"])
    # every 5th row shares ONE (user, ts): the dedup keeper must pick
    # the same winner on both engines at any multiplicity
    for i in range(0, k, 5):
        d["user_id"][i] = 7
        d["ts"][i] = d["ts"][0]
    write(out_dir, "events", pa.table(d, schema=ev.schema))

    # --- TPC-H: ties at every ranking boundary -------------------------
    region = load("region")
    write(out_dir, "region", region)
    nation = load("nation")
    write(out_dir, "nation", nation)

    cust = load("customer").to_pydict()
    c = len(cust["c_custkey"])
    cust["c_nationkey"] = [3] * c            # one-nation skew
    cust["c_acctbal"] = [1000.0] * c         # all-equal balances
    write(out_dir, "customer", pa.table(cust, schema=load("customer").schema))

    supp = load("supplier").to_pydict()
    s = len(supp["s_suppkey"])
    supp["s_nationkey"] = [3] * s
    write(out_dir, "supplier", pa.table(supp, schema=load("supplier").schema))

    part = load("part").to_pydict()
    p = len(part["p_partkey"])
    part["p_brand"] = ["Brand#11"] * p       # one giant brand group
    part["p_type"] = ["DUP TYPE"] * p
    part["p_retailprice"] = [1500.0] * p     # one point-interval span
    part["p_size"] = [7] * p
    write(out_dir, "part", pa.table(part, schema=load("part").schema))

    orders = load("orders").to_pydict()
    o = len(orders["o_orderkey"])
    orders["o_totalprice"] = [100000.0] * o  # EVERY top-k boundary ties
    orders["o_orderpriority"] = ["1-URGENT"] * o
    write(out_dir, "orders", pa.table(orders, schema=load("orders").schema))

    li = load("lineitem")
    liq = pa.concat_tables([li, li.slice(0, max(li.num_rows // 2, 1))])
    ld = liq.to_pydict()
    lq = len(ld["l_orderkey"])
    ld["l_quantity"] = [25.0] * lq           # constant measures: exact
    ld["l_discount"] = [0.05] * lq           # sums are pure multiples
    write(out_dir, "lineitem", pa.table(ld, schema=li.schema))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dups_sf")
