#!/usr/bin/env python3
"""Hostile drill wave 11: cap-gate CROSSING duplication.

Waves 8/10 mass-duplicate at sizes the hot-key caps absorb (largest
clusters a few hundred members); this corpus puts a single exact-dup
cluster ABOVE every stop rule so the other branch of each gate runs
under the oracle:

- 1500 copies of one text  > maxBandFreq=1000 (minhash stop-band rule:
  every band of the mega text goes hot and is DROPPED on both sides)
  and > the winnow maxDocFreq=1000 stop-fingerprint cap;
- a 600-member near-dup family that stays UNDER the caps (so capped
  and uncapped clusters coexist in one corpus);
- 1200 copies of one embedding vector (mass-dup IVF cells, tie floods
  on every top-k boundary, SemDeDup within-cell pair storms);
- a 900-doc random tail.

TPC-H tables + events are the sf0.001 driver testdata verbatim (this
wave attacks only the dedup/ANN gates).

Usage:  python3 tools/hostile_megadup.py /tmp/megadup
        sbt -batch "runMain graft.Verify /tmp/megadup /tmp/megadup_out"
        python3 tools/oracle_check.py /tmp/megadup /tmp/megadup_out
Expected: `== 102 pass, 0 fail`.
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_MEGADUP_SRC", "/root/testdata/sf0.001")

VOCAB = ("the quick brown fox jumps over lazy dog spark row vector "
         "stream table column value data event user time shard batch").split()


def main(out_dir, seed=99):
    os.makedirs(out_dir, exist_ok=True)
    r = random.Random(seed)
    mega = " ".join(r.choices(VOCAB, k=60))
    fam = " ".join(r.choices(VOCAB, k=60))
    ids, texts, langs, srcs, nch = [], [], [], [], []

    def add(t):
        i = len(ids)
        ids.append(i)
        texts.append(t)
        langs.append(r.choice(["en", "de", "zh", None]))
        srcs.append(r.choice(["src0", "src1", "src2", None]))
        nch.append(None if t is None else len(t))

    for _ in range(1500):
        add(mega)
    for _ in range(600):
        ws = fam.split()
        ws[r.randrange(len(ws))] = r.choice(VOCAB)
        add(" ".join(ws))
    for _ in range(900):
        add(" ".join(r.choices(VOCAB, k=r.randint(3, 120))))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array(nch, pa.int64())}),
        os.path.join(out_dir, "documents.parquet"))

    dim = 64
    canon = [r.uniform(-1, 1) for _ in range(dim)]
    vecs = [canon] * 1200 + [[r.uniform(-1, 1) for _ in range(dim)]
                             for _ in range(800)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(2000), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([r.choice([0, 1, 2]) for _ in range(2000)],
                          pa.int32())}),
        os.path.join(out_dir, "embeddings.parquet"))

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(out_dir, f"{t}.parquet"))
    print(f"staged {out_dir}: 3000 docs (1500-dup cluster > caps), "
          f"2000 vecs (1200-dup)")


if __name__ == "__main__":
    if not os.path.isdir(SRC):
        sys.exit(f"source dir {SRC} missing - set GRAFT_MEGADUP_SRC to a "
                 "testdata sf dir containing the base parquet tables")
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/megadup"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    main(out, seed)
