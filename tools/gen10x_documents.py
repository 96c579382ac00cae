#!/usr/bin/env python3
"""Regenerate the 10x documents fixture used by SCALING.md §6b.

Driver-side measurement infrastructure (python/pandas/pyarrow are the
driver's tools, not part of the shipped library). Samples a 10x corpus
from sf0.1's EMPIRICAL distributions — bootstrap token-count lengths,
iid draws from the unigram token distribution, lang/source marginals —
with planted structure scaled per-capita to match sf0.1's workload:
per 5,000 docs, 256 one-token-edit near-twin pairs (J >= 0.5 at
3-shingles) and 8 exact-dup pairs. Fresh draws, not resampled copies:
duplicating texts 10x would inflate the near-dup pair graph
quadratically and misrepresent the workload. Seed 408 (round 8's).

Usage: python3 tools/gen10x_documents.py [out_dir] [factor]
       (defaults /tmp/sf1.0, 10; the round-11 30x sweep fixture is
        `python3 tools/gen10x_documents.py /tmp/sf3.0 30`)
"""
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
N_FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
NEAR_PER_5K = 256
EXACT_PER_5K = 8

rng = np.random.default_rng(408)
src = pd.read_parquet(SRC)
n_out = len(src) * N_FACTOR

toks = src["text"].str.split()
lengths = toks.str.len().to_numpy()
unigrams = pd.Series([t for ts in toks for t in ts]).value_counts()
vocab = unigrams.index.to_numpy()
probs = (unigrams / unigrams.sum()).to_numpy()
lang_p = src["lang"].value_counts(normalize=True)
source_p = src["source"].value_counts(normalize=True)

boot_len = rng.choice(lengths, size=n_out)
texts = [" ".join(rng.choice(vocab, size=max(1, L), p=probs))
         for L in boot_len]

# planted structure, per-capita: overwrite tail slots so doc counts stay
n_near = NEAR_PER_5K * n_out // 5000
n_exact = EXACT_PER_5K * n_out // 5000
slot = n_out - 2 * (n_near + n_exact)
assert slot > 0
for _ in range(n_near):
    a = texts[rng.integers(0, slot)].split()
    b = list(a)
    b[rng.integers(0, len(b))] = str(rng.choice(vocab))
    texts[slot] = " ".join(a)
    texts[slot + 1] = " ".join(b)
    slot += 2
for _ in range(n_exact):
    t = texts[rng.integers(0, n_out - 2 * n_exact)]
    texts[slot] = t
    texts[slot + 1] = t
    slot += 2

out = pd.DataFrame({
    "doc_id": np.arange(1, n_out + 1, dtype="int64"),
    "text": texts,
    "lang": rng.choice(lang_p.index.to_numpy(), size=n_out,
                       p=lang_p.to_numpy()),
    "source": rng.choice(source_p.index.to_numpy(), size=n_out,
                         p=source_p.to_numpy()),
})
out["n_chars"] = out["text"].str.len().astype("int64")

import os
# Write a DIRECTORY of part files, not one single-row-group file: Spark
# assigns scan tasks per file, so a one-file fixture serializes every
# map-only stage onto ONE task and fakes superlinear scaling for the
# per-row text operators (found in the round-13 100x sweep). Production
# corpora are many files; the fixture should look like production.
n_files = max(8, min(64, N_FACTOR))
os.makedirs(OUT, exist_ok=True)
d = f"{OUT}/documents.parquet"
# rmtree, not a per-file remove loop: an old fixture dir holding
# SUBDIRECTORIES (e.g. a leftover partitioned y=1995/ layout) made the
# per-file loop raise IsADirectoryError and abort regeneration
import shutil
shutil.rmtree(d, ignore_errors=True)
if os.path.isfile(d):
    os.remove(d)
os.makedirs(d, exist_ok=True)
step = -(-len(out) // n_files)
for i in range(n_files):
    out.iloc[i * step:(i + 1) * step].to_parquet(
        f"{d}/part-{i:05d}.parquet", index=False)
print(f"wrote {len(out)} docs to {d} ({n_files} files)")
