#!/usr/bin/env python3
"""Hostile drill wave 7: degenerate cardinalities.

Emits every driver table (region nation customer supplier part orders
lineitem events documents embeddings) at a degenerate row count, with
the schema copied verbatim from the real driver testdata so the drill
tracks any future schema regeneration automatically:

  mode=empty  -> zero rows          (aggregate-over-nothing, empty
                                     corpus for dedup/ANN training,
                                     empty histograms, BPE with no
                                     pairs, percentiles of nothing)
  mode=one    -> exactly one row    (self-joins with no partner,
                                     windows of size 1, degenerate
                                     variance, dangling FKs everywhere
                                     because each table keeps only its
                                     own first row)

Usage: python3 tools/degenerate_tables.py /tmp/degen_sf [empty|one]
Then the normal loop:
       sbt 'runMain graft.Verify /tmp/degen_sf /tmp/degen_out'
       python3 tools/oracle_check.py /tmp/degen_sf /tmp/degen_out

Any FAIL/crash is a real engine-vs-oracle divergence on data a user
can trivially produce (a fresh project, a single test event).
"""
import os
import sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SRC = "/root/testdata/sf0.001"


def main(out_dir, mode):
    os.makedirs(out_dir, exist_ok=True)
    n = 0 if mode == "empty" else 1
    for t in TABLES:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        out = src.slice(0, n)
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"))
        print(f"wrote {t}.parquet rows={out.num_rows} "
              f"schema={[f.name for f in out.schema]}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degen_sf"
    mode = sys.argv[2] if len(sys.argv) > 2 else "empty"
    assert mode in ("empty", "one"), mode
    main(out, mode)
