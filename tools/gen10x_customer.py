#!/usr/bin/env python3
"""Scale the customer table for the q188/q206 name-linkage sweep.

Driver-side measurement infrastructure. The shared 10x/30x fixtures
deliberately keep dimension tables AS-IS (gen10x_tpch.py — 10x-ing a
dim would change the warehouse joins' plan shape, not their scale
story), which left the name-linkage operators (q188 edit-distance-1
wildcard blocking, q206 Jaro-Winkler) with no scaling evidence. This
writes a SEPARATE fixture dir holding an Nx customer table: replicas
get unique c_custkey offset blocks and names re-rendered from the new
keys with the same fixed-width Customer#%09d format, so the natural
hamming-1 name-pair structure (keys differing in one digit position)
scales with the table instead of duplicating it. Every other table is
copied from sf0.1 unchanged (only customer matters to the linkage
queries; the copies just keep the dir a complete readable fixture).

Usage: python3 tools/gen10x_customer.py [out_dir] [factor]
       (defaults /tmp/cust10x, 10; round-11 also ran /tmp/cust30x 30)
"""
import os
import shutil
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cust10x"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
cust = pd.read_parquet(f"{SRC}/customer.parquet")
block = int(cust["c_custkey"].max()) + 1

reps = []
for r in range(N):
    c = cust.copy()
    c["c_custkey"] = c["c_custkey"] + r * block
    c["c_name"] = c["c_custkey"].map(lambda k: f"Customer#{k:09d}")
    reps.append(c)
out = pd.concat(reps, ignore_index=True)
out.to_parquet(f"{OUT}/customer.parquet", index=False)

for t in ["region", "nation", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        shutil.copyfile(f"{SRC}/{t}.parquet", dst)
print(f"wrote {len(out)} customers to {OUT}/customer.parquet")
