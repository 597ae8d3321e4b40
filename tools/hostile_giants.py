#!/usr/bin/env python3
"""Hostile drill wave 9: giant single values.

A handful of pathologically large rows inside an otherwise-normal
corpus — the shape a crawler actually emits (one unbounded page, one
minified JS blob, one log dump):

- a ~512 KB document of one repeated paragraph   -> shingle/winnow/
  passage explosion stays per-doc linear, dedup families must agree
  with DuckDB's list ops at 6-figure list lengths
- a ~200 KB single token (no whitespace at all)  -> tokenizers, BPE
  in-word pairs, n_chars accounting
- a ~100 KB doc of only newlines/punctuation     -> line splitters,
  C4 filters, markup stripping
- one event with ~256 KB of valid props JSON and one with a ~64 KB
  (invalid, >100 char) event_type                -> wire builders,
  routing validity, JSON extraction at size

Everything else copies sf0.001 verbatim, so the whole 102-query
surface still runs.

Usage: python3 tools/hostile_giants.py /tmp/giants_sf
Then the normal Verify + oracle_check loop (expect 102 pass, 0 fail).
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
COPY = ["region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "embeddings"]


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY:
        shutil.copyfile(os.path.join(SRC, f"{t}.parquet"),
                        os.path.join(out_dir, f"{t}.parquet"))
        print(f"copied {t}.parquet")

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pydict()
    n = len(docs["doc_id"])
    # NOTE on sizing: the engine takes a 520 KB x5440-inner-repeat doc in
    # stride (owner-agg span/winnow shapes, verified once), but DuckDB's
    # naive window SELF-JOIN replay is O(dups^2) per window hash and ran
    # >40 CPU-min on it — so the STANDING drill keeps the documents long
    # (64 KB) with the within-doc window duplication bounded (~680 per
    # hash), which the oracle replays in seconds.
    para = ("the quick brown fox jumps over the lazy dog while value "
            "spark row vector stream table column " ) * 8    # ~770 B
    giant_repeat = para * 85                                  # ~64 KB
    giant_token = "x" * 200_000                               # one token
    giant_noise = ("\n.!?," * 20_000)                         # ~100 KB
    big_ids = [max(docs["doc_id"]) + i + 1 for i in range(3)]
    for bid, text in zip(big_ids, [giant_repeat, giant_token, giant_noise]):
        docs["doc_id"].append(bid)
        docs["text"].append(text)
        docs["lang"].append("en")
        docs["source"].append("src0")
        docs["n_chars"].append(len(text))
    schema = pq.read_schema(os.path.join(SRC, "documents.parquet"))
    pq.write_table(pa.table(docs, schema=schema),
                   os.path.join(out_dir, "documents.parquet"))
    print(f"wrote documents.parquet rows={n + 3} (3 giants)")

    ev = pq.read_table(os.path.join(SRC, "events.parquet")).to_pydict()
    m = len(ev["event_id"])
    # ~256 KB of VALID props JSON (many keys, one of them 'k' so the
    # props-extraction oracles still see their field)
    big_props = ("{" + '"k":1.5,' +
                 ",".join(f'"f{i}":"{"v" * 40}"' for i in range(5000)) + "}")
    ev["event_id"].append(max(x for x in ev["event_id"] if x is not None) + 1)
    ev["ts"].append(ev["ts"][0])
    ev["user_id"].append(424242)
    ev["event_type"].append("view")
    ev["value"].append(1.0)
    ev["props"].append(big_props)
    # a ~64 KB event_type: INVALID by the routing rules (>100 chars) —
    # the parse path must drop it without choking on the name's size
    ev["event_id"].append(max(x for x in ev["event_id"] if x is not None) + 1)
    ev["ts"].append(ev["ts"][0])
    ev["user_id"].append(424243)
    ev["event_type"].append("t" * 65_536)
    ev["value"].append(2.0)
    ev["props"].append('{"k":2.5}')
    eschema = pq.read_schema(os.path.join(SRC, "events.parquet"))
    pq.write_table(pa.table(ev, schema=eschema),
                   os.path.join(out_dir, "events.parquet"))
    print(f"wrote events.parquet rows={m + 2} (2 giants)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/giants_sf")
