#!/usr/bin/env python3
"""Regenerate the adversarial-EMBEDDINGS fixture (round 15's off-gate
sweep, committed so every round can re-run it).

Copies every non-embeddings table from sf0.001 verbatim and appends the
degenerate vectors a 100-TB embedding pipeline is guaranteed to contain:
the exact ZERO vector (an embedded empty document — this one crashed all
nine cosine-family queries under ANSI division before r15's cosEmbs
contract), a tiny-norm vector (rounds to signed zero — the q79 +0.0
canonicalization), an exact-duplicate pair, a negated copy (cosine −1),
a scaled copy (cosine 1), and a one-hot. Seed 408.

Usage: python3 tools/gen_adversarial_embeddings.py [out_dir]
       (default /tmp/advemb)
Then:  sbt "runMain graft.Verify /tmp/advemb /tmp/advemb_out" and
       compare with DuckDB over the same dir (tools/compare.py).
"""
import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/advemb")

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

tbl = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
rng = np.random.default_rng(408)
dim = len(tbl["embedding"][0])


def vec(v):
    return np.asarray(v, dtype=np.float32)


extra = []
# 9000: exact ZERO vector (an empty doc embedded) — no direction
extra.append((9000, vec(np.zeros(dim)), 0))
# 9001: tiny-norm vector — projections round to signed zero
extra.append((9001, vec(np.full(dim, 1e-30)), 1))
# 9002/9003: exact duplicate pair
d = vec(rng.normal(0, 1, dim))
extra.append((9002, d, 2))
extra.append((9003, d.copy(), 2))
# 9004: negated copy of vector 0 (cosine exactly -1 with it)
base = vec(tbl["embedding"][0])
extra.append((9004, -base, 0))
# 9005: scaled copy of vector 1 (cosine 1 up to fp)
extra.append((9005, vec(np.asarray(tbl["embedding"][1]) * 7.0), 1))
# 9006: one-hot
oh = np.zeros(dim, dtype=np.float32)
oh[3] = 1.0
extra.append((9006, oh, 3))

add = pd.DataFrame({
    "vec_id": [e[0] for e in extra],
    "embedding": [e[1] for e in extra],
    "label": np.array([e[2] for e in extra], dtype=np.int32),
})
out = pd.concat([tbl, add], ignore_index=True)
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
pq.write_table(
    pa.Table.from_pandas(out, schema=schema, preserve_index=False),
    f"{OUT}/embeddings.parquet")
print(f"wrote {len(out)} vectors ({len(extra)} adversarial) to {OUT}")
