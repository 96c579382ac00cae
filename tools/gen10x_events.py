#!/usr/bin/env python3
"""Regenerate the 10x events fixture for the SCALING.md §6b sweep.

Driver-side measurement infrastructure. Grows the corpus the way event
logs actually grow — 10x the USERS, same per-user activity profile:
per-user event counts bootstrap from sf0.1's empirical distribution,
event types and values draw iid from the empirical marginals, and
timestamps draw uniformly over the same one-month range (per-user
temporal structure is irrelevant to a throughput sweep; the
windows/sessions/funnel operators shuffle on user or window either
way). Seed 408.

Usage: python3 tools/gen10x_events.py [out_dir]   (default /tmp/sf1.0)
"""
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1/events.parquet"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
U_FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rng = np.random.default_rng(408)
src = pd.read_parquet(SRC)

per_user = src.groupby("user_id").size().to_numpy()
n_users = len(per_user) * U_FACTOR
counts = rng.choice(per_user, size=n_users)
n_out = int(counts.sum())

type_p = src["event_type"].value_counts(normalize=True)
t0 = src["ts"].min().value
t1 = src["ts"].max().value

out = pd.DataFrame({
    "event_id": np.arange(1, n_out + 1, dtype="int64"),
    "ts": pd.to_datetime(
        np.sort(rng.integers(t0, t1, size=n_out))).astype("datetime64[us]"),
    "user_id": rng.permutation(np.repeat(
        np.arange(1, n_users + 1, dtype="int64"), counts)),
    "event_type": rng.choice(type_p.index.to_numpy(), size=n_out,
                             p=type_p.to_numpy()),
    "value": rng.choice(src["value"].to_numpy(), size=n_out),
    "props": rng.choice(src["props"].to_numpy(), size=n_out),
})

import os
# part-file directory — single-file fixtures serialize map stages onto
# one Spark scan task (round-13 lesson, same as the documents generator)
n_files = max(8, min(64, U_FACTOR))
os.makedirs(OUT, exist_ok=True)
d = f"{OUT}/events.parquet"
# rmtree handles stale subdirectories; isfile handles a legacy
# single-file fixture at the same path
import shutil
shutil.rmtree(d, ignore_errors=True)
if os.path.isfile(d):
    os.remove(d)
os.makedirs(d, exist_ok=True)
step = -(-len(out) // n_files)
for i in range(n_files):
    out.iloc[i * step:(i + 1) * step].to_parquet(
        f"{d}/part-{i:05d}.parquet", index=False)
print(f"wrote {len(out)} events / {n_users} users to {d} ({n_files} files)")
