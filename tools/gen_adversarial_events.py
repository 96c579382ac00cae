#!/usr/bin/env python3
"""Regenerate the adversarial-EVENTS fixture (round 15's off-gate sweep,
committed so every round can re-run it).

Copies every non-events table from sf0.001 verbatim and appends the
degenerate event rows a production stream is guaranteed to contain:
NULL user_id (anonymous hit), NULL value, NULL event_type, NULL props,
SAME-INSTANT events for one user (funnel/sessionize tie-break), an
exact duplicate (event_id aside), value 0 / negative, a midnight-
boundary timestamp (window/day bucketing edges), and a user whose only
activity is one event. Seed-free: all rows are fixed literals.

Usage: python3 tools/gen_adversarial_events.py [out_dir]
       (default /tmp/advevents)
Then:  sbt "runMain graft.Verify /tmp/advevents /tmp/advevents_out" and
       compare with DuckDB over the same dir (tools/compare.py).
"""
import os
import shutil
import sys
from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/advevents")

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

tbl = pq.read_table(f"{SRC}/events.parquet").to_pandas()


def ts(s):
    return datetime.fromisoformat(s)


extra = [
    # NULL user (anonymous), NULL value, NULL type, NULL props
    (90000, ts("2024-01-05T10:00:00.000001"), None, "view", 1.0, "{}"),
    (90001, ts("2024-01-05T10:00:00.000002"), 901, "view", None, "{}"),
    (90002, ts("2024-01-05T10:00:00.000003"), 901, None, 2.0, "{}"),
    (90003, ts("2024-01-05T10:00:00.000004"), 901, "click", 3.0, None),
    # SAME-INSTANT pair for one user: view+click at one microsecond
    (90004, ts("2024-01-06T11:00:00.500000"), 902, "view", 1.0, "{}"),
    (90005, ts("2024-01-06T11:00:00.500000"), 902, "click", 1.0, "{}"),
    # exact duplicate of the same logical event (different event_id)
    (90006, ts("2024-01-06T11:00:00.500000"), 902, "click", 1.0, "{}"),
    # purchase completing 902's same-instant funnel, strictly later
    (90007, ts("2024-01-06T11:00:01.000000"), 902, "purchase", 9.5, "{}"),
    # zero and negative values (refund)
    (90008, ts("2024-01-07T12:00:00.000000"), 903, "purchase", 0.0, "{}"),
    (90009, ts("2024-01-07T12:30:00.000000"), 903, "purchase", -4.5, "{}"),
    # midnight-boundary timestamp (hour/day window edge)
    (90010, ts("2024-01-08T00:00:00.000000"), 904, "view", 1.0, "{}"),
    # single-event user
    (90011, ts("2024-01-09T09:00:00.000000"), 905, "signup", 1.0, "{}"),
]
add = pd.DataFrame(extra, columns=["event_id", "ts", "user_id",
                                   "event_type", "value", "props"])
add["user_id"] = add["user_id"].astype("Int64")
out = pd.concat([tbl, add], ignore_index=True)
schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()), ("event_type", pa.string()),
                    ("value", pa.float64()), ("props", pa.string())])
pq.write_table(
    pa.Table.from_pandas(out, schema=schema, preserve_index=False),
    f"{OUT}/events.parquet")
print(f"wrote {len(out)} events ({len(extra)} adversarial) to {OUT}")
