#!/usr/bin/env python3
"""Checked-in two-row events.parquet fixtures, one per ts encoding.

The driver regenerated the corpus mid-round-7 with a different physical
timestamp encoding (INT64 TIMESTAMP(NANOS) -> timestamp[us]), which is
exactly the class of change Tables.events normalizes over. After that
change the nanos branch was no longer exercised by any corpus on disk
(VERDICT_r07 "What's missing" #2) — these fixtures pin EVERY branch
permanently, independent of what encoding the current corpus uses:

  tsfix_nanos/events.parquet   INT64 TIMESTAMP(NANOS)  (pre-r7 corpora)
  tsfix_micros/events.parquet  timestamp[us], not UTC-adjusted
                               (reads as TIMESTAMP_NTZ; the r7+ corpora)
  tsfix_tz/events.parquet      timestamp[us], UTC-adjusted
                               (reads as TimestampType; the pass-through)
  tsfix_bad/events.parquet     ts stored as INT32 — no valid decode;
                               Tables.events must FAIL FAST on it

All three valid fixtures carry the SAME two logical rows, so the spec
asserts bit-identical normalized values across encodings. Regenerate
with: python3 scripts/make_ts_fixtures.py  (output is deterministic).

This is a fixture GENERATOR run offline by a developer; the engine
itself never depends on pyarrow.
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = pathlib.Path(__file__).resolve().parent.parent / "src/test/resources"

# two rows, values chosen so sub-second precision is visible in both
# encodings (123456 us survives ns->us and us->us exactly)
US = [1735689600123456, 1735776000654321]  # 2025-01-01/02 UTC, µs
ROWS = {
    "event_id": pa.array([1, 2], pa.int64()),
    "user_id": pa.array([10, 20], pa.int64()),
    "event_type": pa.array(["click", "view"], pa.string()),
    "value": pa.array([1.5, 2.5], pa.float64()),
    "props": pa.array(["{}", "{}"], pa.string()),
}


def write(name: str, ts: pa.Array) -> None:
    d = OUT / name
    d.mkdir(parents=True, exist_ok=True)
    cols = {"event_id": ROWS["event_id"], "ts": ts}
    cols.update({k: v for k, v in ROWS.items() if k != "event_id"})
    pq.write_table(pa.table(cols), d / "events.parquet")
    print(f"wrote {d/'events.parquet'}: ts={ts.type}")


write("tsfix_nanos", pa.array([u * 1000 for u in US], pa.timestamp("ns")))
write("tsfix_micros", pa.array(US, pa.timestamp("us")))
write("tsfix_tz", pa.array(US, pa.timestamp("us", tz="UTC")))
write("tsfix_bad", pa.array([1, 2], pa.int32()))
