#!/usr/bin/env python3
"""Hostile documents/embeddings corpus for the LLM-pipeline query surface
(the documents-table sibling of hostile_events.py).

Attacks: NULL/empty/whitespace-only text, NULL lang/source, unicode
(multibyte + astral) text where char/byte counts diverge, exact and
near duplicates across sources, a giant exact-copy family (band-cap
shapes), single-token and repeated-token degenerates, NULL/empty/zero
embeddings, duplicate vectors.

Usage: python3 tools/hostile_documents.py /tmp/hostile_sf
(then run Verify + oracle_check on the doc/embedding queries)
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(out_dir):
    rows = []

    def add(text, lang="en", source=None, did=None):
        i = len(rows) if did is None else did
        rows.append((i, text,
                     lang, source or f"src{i % 20}",
                     None if text is None else len(text)))

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight ")
    # ordinary corpus with mild variety
    for i in range(120):
        add(base + f"variant {i} " + ("data " * (i % 7)), source=f"src{i % 20}")

    # exact duplicates across sources (incremental/exact dedup paths)
    for i in range(6):
        add("identical duplicate content shared by many documents " * 3,
            source=f"src{i % 3}")
    # a LARGE exact-copy family (hot band / cluster shapes)
    for i in range(40):
        add("boilerplate banner text repeated verbatim across the crawl " * 2,
            source=f"src{i % 20}")

    # near duplicates (one token changed)
    add(base + "variant 7 data data near duplicate alpha")
    add(base + "variant 7 data data near duplicate beta")

    # degenerate text shapes
    add(None)                      # NULL text
    add("")                        # empty
    add("   \t  \n ")              # whitespace only
    add("word")                    # single token
    add("repeat " * 200)           # one token repeated (entropy/repetition)
    add("naïve café résumé — über 中文文本 emoji \U0001F600 mixed")  # multibyte
    add("a")                       # single char
    add("<p>html &amp; markup</p><script>x</script>")  # markup

    # NULL lang / NULL source
    add(base + "null lang row", lang=None)
    rows.append((len(rows), base + "null source row", "en", None,
                 len(base) + 15))

    ids = [r[0] for r in rows]
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })

    # embeddings: clusters + duplicates + zero vector + NULL vector/label
    import math
    vecs, labels = [], []
    dim = 64  # matches the real embeddings table (pca query projects to 24)
    for i in range(180):
        c = i % 5
        v = [math.sin(0.7 * c + 0.01 * (i % 11) + 0.3 * j) for j in range(dim)]
        vecs.append([float(x) for x in v])
        labels.append(c)
    vecs.append(vecs[0][:])            # exact duplicate vector
    labels.append(0)
    vecs.append([0.0] * dim)           # zero vector
    labels.append(9)
    vecs.append(None)                  # NULL embedding
    labels.append(9)
    vecs.append(vecs[1][:])
    labels.append(None)                # NULL label
    vecs.append([float("nan")] * dim)  # all-NaN vector
    labels.append(9)
    vecs.append([float("inf")] + [0.1] * (dim - 1))  # Inf component
    labels.append(9)
    # duplicate vec_id with a different vector (key collision)
    vecs.append([0.5] * dim)
    labels.append(1)
    vec_ids = list(range(len(vecs) - 1)) + [3]
    emb = pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(f"wrote {len(rows)} hostile documents, {len(vecs)} embeddings to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf")
