#!/usr/bin/env python3
"""Hostile-regeneration drill: synthesize an events.parquet designed to
break engine-vs-oracle parity, then let the normal Verify + oracle_check
loop prove the queries still hash-match.

The driver has regenerated testdata before (round 7: ts nanos->us). The
oracle-parity conventions (COVERAGE.md) claim ANY-data equivalence; this
generator attacks every one of them:

- mixed-case and reserved/invalid event types ('_internal', 'Purchase',
  'sp ace', 'a:b', 101-char name, '') -> routing validity + lowercase
- NULLs in every column (ts, user_id, value, props, event_type, event_id)
  -> null-safe wire builders, null-key dedup passthrough
- cross-collection (user_id, ts) collisions -> deterministic dedup keeper
- same-(user, ts) duplicate clicks -> as-of tiebreak
- pre-1970 timestamps with sub-second parts -> div vs // truncation
- decimal-half doubles (1.005, 0.145, 2.675) -> portable rounding
- duplicate full rows -> e2e distinct semantics

Usage: python3 tools/hostile_events.py /tmp/hostile_sf
Then:  sbt 'runMain graft.Verify /tmp/hostile_sf /tmp/hostile_out <qs>'
       python3 tools/oracle_check.py /tmp/hostile_sf /tmp/hostile_out
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def build(rows):
    eids, tss, uids, types, vals, props = [], [], [], [], [], []
    for (eid, ts, uid, typ, val, prop) in rows:
        eids.append(eid)
        tss.append(ts)
        uids.append(uid)
        types.append(typ)
        vals.append(val)
        props.append(prop)
    return pa.table({
        "event_id": pa.array(eids, pa.int64()),
        "ts": pa.array(tss, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def main(out_dir):
    us = 1_000_000
    day = 86_400 * us
    t0 = 1_700_000_000 * us  # 2023-11-14, a fixed "today" anchor

    rows = []
    eid = 0

    def add(ts, uid, typ, val, prop='{"k":1.5}'):
        nonlocal eid
        rows.append((eid, ts, uid, typ, val, prop))
        eid += 1

    # ordinary rows across the realtime window so day-split has both sides
    for i in range(200):
        add(t0 - (i % 4) * day, 1000 + i, ["purchase", "view", "click"][i % 3],
            float(i) / 8, '{"k":%d.25}' % i)

    # mixed-case + invalid routing names
    add(t0, 1, "Purchase", 1.0)          # lowercases into 'purchase'
    add(t0, 2, "PURCHASE", 2.0)          # same
    add(t0, 3, "_internal", 3.0)         # reserved prefix -> dropped
    add(t0, 4, ".hidden", 4.0)           # reserved prefix -> dropped
    add(t0, 5, "a/b", 5.0)               # path separator -> dropped
    add(t0, 6, "a:b", 6.0)               # valid, special char
    add(t0, 7, "x" * 101, 7.0)           # too long -> dropped
    add(t0, 8, "", 8.0)                  # empty -> dropped
    add(t0, 9, "tab\tname", 9.0)         # control char -> dropped

    # JSON-breaking content in STRING values: quotes/backslashes in a
    # (valid) routing name, and malformed props JSON
    add(t0, 20, 'say "hi"', 20.0)        # quote inside event_type
    add(t0, 21, "back\\slash", 21.0)     # backslash inside event_type
    add(t0, 22, "view", 22.0, '{"k":')   # truncated props JSON
    add(t0, 23, "view", 23.0, "not json at all")
    add(t0, 24, "view", 24.0, '{"k": "quoted \\" inner"}')

    # UTF-16 vs codepoint length: 60 astral chars = 60 codepoints but 120
    # Java chars -> the engine's 100-unit limit drops it; 45 astral chars
    # (90 units) passes. CJK name: byte-heavy payload source.
    add(t0, 25, "\U0001F600" * 60, 25.0)   # dropped (120 UTF-16 units)
    add(t0, 26, "\U0001F600" * 45, 26.0)   # kept (90 UTF-16 units)
    add(t0, 27, "中文" * 20, 27.0) # 40 CJK chars = 120 UTF-8 bytes
    # extreme event ids: 19 digits and negative
    rows.append((9_223_372_036_854_775_000, t0, 28, "view", 28.0, '{"k":3.5}'))
    rows.append((-12345, t0, 29, "view", 29.0, '{"k":4.5}'))
    eid += 2

    # non-finite measures: JSON cannot carry NaN/Infinity -> the wire
    # serializes them as null and oracles guard sums with isfinite()
    add(t0, 30, "view", float("nan"))
    add(t0, 31, "purchase", float("inf"))
    add(t0, 32, "click", float("-inf"))

    # NULLs in every column
    add(None, 10, "view", 10.0)          # null ts -> historical split
    add(t0, None, "view", 11.0)          # null user -> dedup passthrough
    add(t0, 12, None, 12.0)              # null type -> dropped by routing
    add(t0, 13, "view", None)            # null value -> JSON null
    add(t0, 14, "view", 14.0, None)      # null props
    rows.append((None, t0, 15, "view", 15.0, '{"k":2.5}'))  # null event_id
    eid += 1

    # cross-collection (user, ts) collisions: deterministic keeper
    t_dup = t0 - day // 2
    add(t_dup, 500, "view", 100.0)
    add(t_dup, 500, "click", 101.0)
    add(t_dup, 500, "purchase", 102.0)
    # in-collection duplicate (user, ts) with different values
    add(t_dup, 501, "view", 103.0)
    add(t_dup, 501, "view", 104.0)

    # as-of tie: two clicks at the same instant before a purchase
    add(t0 - 1000, 600, "click", 1.0)
    add(t0 - 1000, 600, "click", 2.0)
    add(t0, 600, "purchase", 3.0)

    # pre-1970 timestamps with sub-second parts (div vs // truncation)
    add(-1 * us - 200_000, 700, "view", 1.0)   # 1969-12-31 23:59:58.8
    add(-90 * us - 555_000, 701, "click", 2.0)

    # decimal-half doubles that native round() maps differently per engine
    for i, v in enumerate([1.005, 0.145, 2.675, 1.015, 0.125]):
        add(t0 - i * 1000, 800 + i, "purchase", v)

    # exact full-row duplicates
    add(t0 - 7 * 1000, 900, "view", 42.0)
    add(t0 - 7 * 1000, 900, "view", 42.0)

    # boundary dates and ids: exact midnight (day-split boundary), a
    # far-future year, negative user ids
    midnight = (t0 // day) * day
    add(midnight, 950, "view", 1.0)
    add(midnight - 1, 951, "view", 2.0)           # 1us before midnight
    add(7_258_118_400_000_000, 952, "view", 3.0)  # 2200-01-01 (far future
    # but inside pandas datetime64[ns] range, which python comparators use)
    add(t0, -42, "view", 4.0)                     # negative user id

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(build(rows), os.path.join(out_dir, "events.parquet"))
    print(f"wrote {len(rows)} hostile events to {out_dir}/events.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf")
