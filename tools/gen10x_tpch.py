#!/usr/bin/env python3
"""Regenerate the 10x TPC-H fact tables for SCALING.md §6b.

Driver-side measurement infrastructure. The FAME-engine queries and the
warehouse joins aggregate orders/lineitem into monthly series; a 10x
sweep needs 10x FACT rows over the SAME months/keys so the plan shape
(monthly aggregation, dim joins) is preserved. Orders replicate 10x
with unique order keys (offset blocks), per-replica price jitter, and
dates resampled from the empirical date distribution per replica (so
no month is a pure copy); lineitems follow their order's block offset
with quantity/price jitter. Dimension tables (customer/nation/region/
supplier/part) stay as-is — they are dims, 10x-ing them would change
the join shape, not the scale story. Seed 410.

Usage: python3 tools/gen10x_tpch.py [out_dir]   (default /tmp/sf1.0)
"""
import shutil
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rng = np.random.default_rng(410)
orders = pd.read_parquet(f"{SRC}/orders.parquet")
li = pd.read_parquet(f"{SRC}/lineitem.parquet")
key_block = int(orders["o_orderkey"].max()) + 1

o_out, l_out = [], []
for k in range(N):
    o = orders.copy()
    o["o_orderkey"] = o["o_orderkey"] + k * key_block
    if k > 0:
        o["o_totalprice"] = (o["o_totalprice"].to_numpy() *
            rng.uniform(0.9, 1.1, len(o))).round(2)
        o["o_orderdate"] = rng.permutation(o["o_orderdate"].to_numpy())
    o_out.append(o)
    l = li.copy()
    l["l_orderkey"] = l["l_orderkey"] + k * key_block
    if k > 0:
        l["l_extendedprice"] = (l["l_extendedprice"].to_numpy() *
            rng.uniform(0.9, 1.1, len(l))).round(2)
        l["l_quantity"] = np.maximum(1.0,
            l["l_quantity"].to_numpy() +
            rng.integers(-2, 3, len(l)).astype(float))
    l_out.append(l)

import os
# part-file directories (round-13 single-file lesson); one part per
# replica block keeps memory flat while writing
def write_parts(frames, d):
    # rmtree handles stale subdirectories; isfile handles a legacy
    # single-file fixture at the same path
    shutil.rmtree(d, ignore_errors=True)
    if os.path.isfile(d):
        os.remove(d)
    os.makedirs(d, exist_ok=True)
    for i, fr in enumerate(frames):
        fr.to_parquet(f"{d}/part-{i:05d}.parquet", index=False)
write_parts(o_out, f"{OUT}/orders.parquet")
write_parts(l_out, f"{OUT}/lineitem.parquet")
for t in ["customer", "nation", "region", "supplier", "part"]:
    dst = f"{OUT}/{t}.parquet"
    if os.path.islink(dst) or os.path.isfile(dst):
        os.remove(dst)
    shutil.copy(f"{SRC}/{t}.parquet", dst)
print(f"wrote {len(orders) * N} orders / {len(li) * N} lineitems to {OUT}")
