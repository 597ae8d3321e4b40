#!/usr/bin/env python3
"""Hostile drill wave 10: seeded random corpus fuzzing.

The hand-designed waves (1-9) each attack one pathology class; this
generator MIXES them under a seeded RNG, so every run explores a fresh
combination — a null ts on a duplicated row of an astral-named
collection with an Inf measure, a near-dup of a giant doc holding a
half-redactable email, and so on. Any seed that fails becomes a named
regression corpus.

Pathology mix per field (see the `events`/`documents`/`embeddings`/
TPC-H builders): NULLs, exact full-row duplicates, key collisions,
hot keys, pre-1970 / far-future timestamps, NaN/+-Inf doubles,
decimal-half doubles, huge & negative & colliding ids, invalid /
mixed-case / quoted / spaced / >100-char routing names, malformed and
nested props JSON, empty/whitespace/multibyte/astral/giant texts,
embedded PII, exact & near dup texts, zero / non-finite / null / dup
vectors, dangling & null FKs, constant columns, boundary dates.

Usage:  python3 tools/fuzz_tables.py /tmp/fuzz_sf  [seed]
Then the normal loop:
        sbt -batch "runMain graft.Verify /tmp/fuzz_sf /tmp/fuzz_out"
        python3 tools/oracle_check.py /tmp/fuzz_sf /tmp/fuzz_out
Expected: `== 102 pass, 0 fail` for EVERY seed.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
US = 1_000_000
DAY = 86_400 * US

VOCAB = ("the quick brown fox jumps over lazy dog spark row vector "
         "stream table column value data event user time shard batch "
         "merge census ocean éclair straße 世界 "
         "\U0001F600ji данные").split()

TYPE_POOL = [
    "purchase", "view", "click", "Purchase", "VIEW", "_internal",
    "sp ace", "a:b", 'qu"ote', "back\\slash", "t" * 101, "", None,
    "page.view", "-lead", "ok_name", "世界",  # non-ASCII: dropped
]


def rnd_text(r):
    roll = r.random()
    if roll < 0.06:
        return None
    if roll < 0.12:
        return ""
    if roll < 0.16:
        return "   \t  "
    if roll < 0.20:  # giant-ish: repeated phrase, bounded dup factor
        return " ".join(r.choices(VOCAB, k=40)) * r.randint(40, 120)
    if roll < 0.28:  # PII-bearing
        return (" ".join(r.choices(VOCAB, k=10)) +
                f" mail u{r.randint(0,9)}@ex{r.randint(0,9)}.com or "
                f"http://h{r.randint(0,9)}.test/p?q=1 at 10.0.0.{r.randint(1,254)} " +
                " ".join(r.choices(VOCAB, k=10)))
    return " ".join(r.choices(VOCAB, k=r.randint(3, 120)))


def build_documents(r, out_dir, scale=1):
    n = r.randint(150, 500) * scale
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for i in range(n):
        roll = r.random()
        if roll < 0.2 and texts:  # exact duplicate of an earlier doc
            t = r.choice(texts)
        elif roll < 0.28 and texts:  # near duplicate: one word swapped
            base = r.choice([x for x in texts if x] or [""])
            ws = base.split()
            if ws:
                ws[r.randrange(len(ws))] = r.choice(VOCAB)
            t = " ".join(ws)
        else:
            t = rnd_text(r)
        ids.append(i if r.random() > 0.03 else -i)  # rare negative ids
        texts.append(t)
        langs.append(r.choice(["en", "de", "zh", None]))
        sources.append(r.choice(["src0", "src1", "src2", None]))
        nchars.append(None if t is None else len(t))
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64())})
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote documents.parquet rows={n}")


def rnd_props(r):
    roll = r.random()
    if roll < 0.12:
        return None
    if roll < 0.20:
        return '{"k": 1.5, "broken'          # malformed: D3 skip
    if roll < 0.30:
        return f'{{"k": "notnum", "n": {{"x": {r.randint(0,9)}}}}}'
    if roll < 0.35:
        return '{"k": ' + repr(r.choice([1.005, 0.145, 2.675])) + "}"
    return f'{{"k": {r.randint(-5, 50)}.5, "s": "v{r.randint(0,99)}"}}'


def rnd_value(r):
    roll = r.random()
    if roll < 0.08:
        return None
    if roll < 0.12:
        return float("nan")
    if roll < 0.15:
        return float("inf") if r.random() < 0.5 else float("-inf")
    if roll < 0.25:
        return r.choice([1.005, 0.145, 2.675, -1.115])
    return round(r.uniform(-100, 100), 3)


def build_events(r, out_dir, scale=1):
    n = r.randint(300, 1200) * scale
    t0 = 1_700_000_000 * US
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}
    for i in range(n):
        roll = r.random()
        if roll < 0.12 and rows["event_id"]:  # exact full-row duplicate
            j = r.randrange(len(rows["event_id"]))
            for k in rows:
                rows[k].append(rows[k][j])
            continue
        eid = r.choice([i, i, i, None, -i, 2**62 + i])
        ts = r.choice([
            t0 + r.randint(0, 5) * DAY + r.randint(0, DAY - 1),
            t0, None,
            -(10_000 * US + r.randint(0, US - 1)),        # pre-1970
            4_102_444_800 * US + r.randint(0, DAY - 1)])  # year 2100
        uid = r.choice([r.randint(1, 30), 7, 7, 7, None])  # hot key 7
        rows["event_id"].append(eid)
        rows["ts"].append(ts)
        rows["user_id"].append(uid)
        rows["event_type"].append(r.choice(TYPE_POOL))
        rows["value"].append(rnd_value(r))
        rows["props"].append(rnd_props(r))
    tbl = pa.table({
        "event_id": pa.array(rows["event_id"], pa.int64()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
        "props": pa.array(rows["props"], pa.string())})
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))
    print(f"wrote events.parquet rows={len(rows['event_id'])}")


def build_embeddings(r, out_dir, scale=1):
    n = r.randint(120, 400) * scale
    dim = 64
    vecs, ids, labels = [], [], []
    canon = [[r.uniform(-1, 1) for _ in range(dim)] for _ in range(12)]
    for i in range(n):
        roll = r.random()
        if roll < 0.05:
            v = None                               # null vector
        elif roll < 0.10:
            v = [0.0] * dim                        # zero vector
        elif roll < 0.16:
            v = [r.uniform(-1, 1) for _ in range(dim)]
            v[r.randrange(dim)] = r.choice(
                [float("nan"), float("inf"), float("-inf")])
        elif roll < 0.45:
            v = canon[r.randrange(len(canon))]     # mass duplication
        else:
            v = [r.uniform(-1, 1) for _ in range(dim)]
        vecs.append(v)
        ids.append(i)
        labels.append(r.choice([0, 1, 2, None]))
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    print(f"wrote embeddings.parquet rows={n}")


def perturb_tpch(r, out_dir):
    for t in ["region", "nation", "customer", "supplier", "part"]:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{t}.parquet"))
        print(f"copied {t}.parquet")
    # orders: null/dangling custkeys, tied + non-finite totals, boundary dates
    od = pq.read_table(os.path.join(SRC, "orders.parquet")).to_pydict()
    n = len(od["o_orderkey"])
    for i in range(n):
        roll = r.random()
        if roll < 0.05:
            od["o_custkey"][i] = None
        elif roll < 0.12:
            od["o_custkey"][i] = 10_000_000 + i     # dangling FK
        if r.random() < 0.25:
            od["o_totalprice"][i] = 100000.0        # mass ties
        elif r.random() < 0.05:
            od["o_totalprice"][i] = r.choice(
                [float("nan"), float("inf"), -1.0])
        if r.random() < 0.05:
            od["o_orderdate"][i] = r.choice(
                [0, -86_400 * US, 4_102_444_800 * US])
    pq.write_table(pa.table(od, schema=pq.read_schema(
        os.path.join(SRC, "orders.parquet"))),
        os.path.join(out_dir, "orders.parquet"))
    print(f"wrote orders.parquet rows={n}")
    # lineitem: duplicated rows, null keys, non-finite prices, tied qty
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    dup = li.slice(0, li.num_rows // max(1, r.randint(3, 8)))
    ld = pa.concat_tables([li, dup]).to_pydict()
    m = len(ld["l_orderkey"])
    for i in range(m):
        roll = r.random()
        if roll < 0.03:
            ld["l_orderkey"][i] = None
        elif roll < 0.06:
            ld["l_partkey"][i] = None
        if r.random() < 0.04:
            ld["l_extendedprice"][i] = r.choice(
                [float("nan"), float("inf"), float("-inf")])
        if r.random() < 0.30:
            ld["l_quantity"][i] = 25.0
        if r.random() < 0.10:
            ld["l_discount"][i] = r.choice([1.005, 0.145]) / 10
    pq.write_table(pa.table(ld, schema=li.schema),
                   os.path.join(out_dir, "lineitem.parquet"))
    print(f"wrote lineitem.parquet rows={m}")


def main(out_dir, seed, scale=1):
    os.makedirs(out_dir, exist_ok=True)
    r = random.Random(seed)
    print(f"fuzz seed = {seed} scale = {scale}")
    build_documents(r, out_dir, scale)
    build_events(r, out_dir, scale)
    build_embeddings(r, out_dir, scale)
    perturb_tpch(r, out_dir)


if __name__ == "__main__":
    # scale multiplies the row-count ranges: the budget/cap gates in the
    # sampling and dedup surfaces (budgetDocs=400, budgetTokens=20000,
    # k=15/source, maxBandFreq=1000, localMaxEdges...) mostly SATURATE on
    # the default 150-1200-row corpora — every rate caps, every gate takes
    # one branch, and a divergence on the other branch hides (this exact
    # shape masked the sqrt-mixture null-quota bug through four seeds).
    # XL runs (scale 10) put the corpora beyond the budgets so both
    # branches of every gate are exercised under fuzz.
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_sf"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    main(out, seed, scale)
