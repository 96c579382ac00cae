#!/usr/bin/env python3
"""Regenerate the 10x embeddings fixture for SCALING.md §6b.

Driver-side measurement infrastructure (python/pandas/pyarrow are the
driver's tools, not part of the shipped library). The driver's
embeddings table is fixed-size at every SF (2,000 x dim-64 at sf0.1),
so the embedding-bound operators (ANN, PQ/IVF, SemDeDup, cartography,
PCA, retrieval fusion) had no 10x scaling evidence. This samples a 10x
table from sf0.1's EMPIRICAL per-label distributions: for each output
vector, pick a label by the observed marginal, then draw each
component from a bootstrap of that label's observed component values
plus small uniform jitter — preserving the label-cluster structure the
IVF/k-means/cartography operators key on. Fresh draws, not copies
(duplicated vectors would collapse ANN candidate sets). Seed 409.

Usage: python3 tools/gen10x_embeddings.py [out_dir] [factor]
       (defaults /tmp/sf1.0, 10; the round-11 30x ANN sweep fixture is
        `python3 tools/gen10x_embeddings.py /tmp/sf3.0 30`)
"""
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
N_FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rng = np.random.default_rng(409)
src = pd.read_parquet(SRC)
emb = np.stack(src["embedding"].to_numpy())  # (n, dim) float32
labels = src["label"].to_numpy()
n_out = len(src) * N_FACTOR
dim = emb.shape[1]

label_vals, label_counts = np.unique(labels, return_counts=True)
probs = label_counts / label_counts.sum()
out_labels = rng.choice(label_vals, size=n_out, p=probs)

out = np.empty((n_out, dim), dtype=np.float32)
for lv in label_vals:
    pool = emb[labels == lv]
    idx = np.where(out_labels == lv)[0]
    # bootstrap per component + jitter at 5% of the pool's per-dim std
    picks = rng.integers(0, len(pool), size=(len(idx), dim))
    boot = pool[picks, np.arange(dim)]
    jitter = rng.uniform(-0.05, 0.05, size=boot.shape) * pool.std(axis=0)
    out[idx] = (boot + jitter).astype(np.float32)

df = pd.DataFrame({
    "vec_id": np.arange(n_out, dtype=np.int64),
    "embedding": list(out),
    "label": out_labels.astype(np.int32),
})
# directory of part files — same single-file/one-task lesson as the
# documents generator (round-13 100x sweep)
import os
n_files = max(8, min(64, N_FACTOR))
os.makedirs(OUT, exist_ok=True)
d = f"{OUT}/embeddings.parquet"
# rmtree handles stale subdirectories; isfile handles a legacy
# single-file fixture at the same path
import shutil
shutil.rmtree(d, ignore_errors=True)
if os.path.isfile(d):
    os.remove(d)
os.makedirs(d, exist_ok=True)
step = -(-len(df) // n_files)
for i in range(n_files):
    df.iloc[i * step:(i + 1) * step].to_parquet(
        f"{d}/part-{i:05d}.parquet", index=False)
print(f"wrote {n_out} vectors (dim {dim}, {len(label_vals)} labels) "
      f"to {d} ({n_files} files)")
