#!/usr/bin/env python3
"""Hostile TPC-H-ish tables for the relational query surface — the third
leg of the hostile-regeneration drill (events, documents, tpch).

Attacks: NULLs in every column (keys, measures, dates, flags), dangling
foreign keys, duplicate keys, pre-1970 and far-future dates, decimal-half
prices (1.005-style), exact ties on every ORDER BY / row_number sort key,
negative measures, empty-string dimensions.

Usage: python3 tools/hostile_tpch.py /tmp/hostile_sf
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def T(cols):
    return pa.table({k: pa.array(v, t) for k, (t, v) in cols.items()})


def main(out):
    us = 1_000_000
    day = 86_400 * us
    t0 = 900_000_000 * us  # 1998-07-09ish

    # ---- region / nation (tiny dims, nulls + dangling keys)
    region = T({
        "r_regionkey": (pa.int32(), [0, 1, 2, None]),
        "r_name": (pa.string(), ["AMERICA", "ASIA", "", None]),
    })
    nation = T({
        "n_nationkey": (pa.int32(), [0, 1, 2, 3, None]),
        "n_name": (pa.string(), ["BRAZIL", "JAPAN", "PERU", None, "GHOST"]),
        "n_regionkey": (pa.int32(), [0, 1, 0, 9, None]),  # 9 dangles
    })

    # ---- customer: duplicate keys, null segment/key, ties on acctbal
    ck, cn, cnk, cb, cm = [], [], [], [], []
    for i in range(300):
        ck.append(i)
        cn.append(f"cust{i}")
        cnk.append(i % 3 if i % 11 else None)
        cb.append(1.005 if i % 7 == 0 else float(i))
        cm.append(["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3]
                  if i % 13 else None)
    ck += [5, None]          # duplicate custkey + null custkey
    cn += ["dup5", "nullkey"]
    cnk += [0, 1]
    cb += [5.0, None]
    cm += ["BUILDING", "BUILDING"]
    customer = T({
        "c_custkey": (pa.int64(), ck), "c_name": (pa.string(), cn),
        "c_nationkey": (pa.int32(), cnk), "c_acctbal": (pa.float64(), cb),
        "c_mktsegment": (pa.string(), cm),
    })

    # ---- orders: w1 tie bait (same totalprice per cust), null cols
    ok, ocust, ost, opr, od, opri = [], [], [], [], [], []
    for i in range(1500):
        ok.append(i)
        ocust.append(i % 320 if i % 17 else None)  # some dangle past 300
        ost.append("OF"[i % 2] * 1)
        # exact ties within a customer: orders i and i+320 share the price
        opr.append(float("-inf") if i % 101 == 0 else
                   1.005 if i % 9 == 0 else float((i % 320) * 10))
        od.append(t0 - (i % 90) * day if i % 19 else None)
        opri.append(["1-URGENT", "3-MEDIUM", "5-LOW"][i % 3]
                    if i % 23 else None)
    orders = T({
        "o_orderkey": (pa.int64(), ok), "o_custkey": (pa.int64(), ocust),
        "o_orderstatus": (pa.string(), ost),
        "o_totalprice": (pa.float64(), opr),
        "o_orderdate": (pa.timestamp("us"), od),
        "o_orderpriority": (pa.string(), opri),
    })

    # ---- lineitem: q3 revenue ties, nulls, pre-1970 shipdates
    lok, lpk, lsk, lln, lq, lep, ld, lt, lrf, lls, lsd = \
        [], [], [], [], [], [], [], [], [], [], []
    for i in range(4000):
        lok.append(i % 1600 if i % 29 else None)  # some dangle past 1500
        lpk.append(i % 200)
        lsk.append(i % 50)
        lln.append(i % 7)
        lq.append(None if i % 31 == 0 else float(i % 50) + (0.5 if i % 2 else 0.0))
        # identical revenue contributions across different orders → q3 ties
        lep.append(None if i % 37 == 0 else
                   float("nan") if i % 61 == 0 else
                   float("inf") if i % 67 == 0 else
                   (1.005 if i % 11 == 0 else float((i % 40) * 100)))
        ld.append(None if i % 41 == 0 else (i % 10) / 100.0)
        lt.append(0.04)
        lrf.append("ANR"[i % 3] if i % 43 else None)
        lls.append("OF"[i % 2])
        lsd.append(None if i % 47 == 0 else
                   (-30 * day if i % 53 == 0 else t0 - (i % 400) * day))
    lineitem = T({
        "l_orderkey": (pa.int64(), lok), "l_partkey": (pa.int64(), lpk),
        "l_suppkey": (pa.int64(), lsk), "l_linenumber": (pa.int32(), lln),
        "l_quantity": (pa.float64(), lq),
        "l_extendedprice": (pa.float64(), lep),
        "l_discount": (pa.float64(), ld), "l_tax": (pa.float64(), lt),
        "l_returnflag": (pa.string(), lrf), "l_linestatus": (pa.string(), lls),
        "l_shipdate": (pa.timestamp("us"), lsd),
    })

    # ---- part: price spans for range/overlap queries, nulls
    pk, pn, pb, pt, ps, pp = [], [], [], [], [], []
    for i in range(200):
        pk.append(i)
        pn.append(f"part {i}" if i % 13 else None)
        pb.append(f"Brand#{i % 5}")
        pt.append(["SMALL", "MEDIUM", "LARGE"][i % 3])
        ps.append(i % 50 if i % 17 else None)
        pp.append(None if i % 19 == 0 else
                  (2.675 if i % 23 == 0 else float(i * 7 % 4000)))
    part = T({
        "p_partkey": (pa.int64(), pk), "p_name": (pa.string(), pn),
        "p_brand": (pa.string(), pb), "p_type": (pa.string(), pt),
        "p_size": (pa.int32(), ps), "p_retailprice": (pa.float64(), pp),
    })

    supplier = T({
        "s_suppkey": (pa.int64(), list(range(50)) + [None]),
        "s_name": (pa.string(), [f"sup{i}" for i in range(50)] + ["nul"]),
        "s_nationkey": (pa.int32(), [i % 3 if i % 7 else None
                                     for i in range(50)] + [0]),
        "s_acctbal": (pa.float64(), [float(i) if i % 5 else None
                                     for i in range(50)] + [1.015]),
    })

    os.makedirs(out, exist_ok=True)
    for name, t in [("region", region), ("nation", nation),
                    ("customer", customer), ("orders", orders),
                    ("lineitem", lineitem), ("part", part),
                    ("supplier", supplier)]:
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
    print(f"wrote hostile tpch tables to {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf")
