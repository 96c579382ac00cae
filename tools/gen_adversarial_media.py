#!/usr/bin/env python3
"""Regenerate the adversarial-MEDIA fixture (round 16's off-gate sweep,
committed so every round can re-run it).

Copies every non-documents table from sf0.001 verbatim and appends 15
documents whose doc_ids sit in the engine's reserved adversarial-media
band (Multimodal.AdvMediaBase = 9_000_000): for band ids every media
synth (synthWavBytes / synthWavBytesScaled / synthBmpBytes /
synthBmpBytesShifted) emits a deterministic ADVERSARIAL payload keyed by
(id - base) % 5 — truncated header, giant lying chunk size (the 32-bit
overflow crash driver), zero-sample clip, non-PCM / 32bpp format, giant
declared dims, and a structurally-adversarial-but-VALID edge (odd-sized
unknown RIFF chunk; top-down negative-height BMP) that must decode
feature-identically to the normal synth. 15 consecutive ids cover all 5
per-id variants (q97/q98/q143) three times and all 5 base-triple
variants (q117/q120/q148) once, with complete 3k/3k+1/3k+2 triples.

The texts are benign fixed literals so the REST of the suite (text,
dedup, quality, ...) runs green over the same fixture dir.

Usage: python3 tools/gen_adversarial_media.py [out_dir]
       (default /tmp/advmedia)
Then:  sbt "runMain graft.Verify /tmp/advmedia /tmp/advmedia_out" and
       compare with DuckDB over the same dir (tools/compare.py).
"""
import os
import shutil
import sys

import pandas as pd

SRC = "/root/testdata/sf0.001"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/advmedia")
BASE = 9_000_000

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

normal = pd.read_parquet(f"{SRC}/documents.parquet")

n_band = 15  # 5 triples: base variants 0..4, per-id variants 0..4 ×3
adv = pd.DataFrame({
    "doc_id": pd.array(range(BASE, BASE + n_band), dtype="int64"),
    "text": [f"adversarial media band doc {i} carries a malformed or "
             f"edge-case synthetic payload variant {i % 5}"
             for i in range(n_band)],
    "lang": ["en"] * n_band,
    "source": [["web", "books", "code", "wiki"][i % 4]
               for i in range(n_band)],
})
adv["n_chars"] = adv["text"].str.len().astype("int64")

out = pd.concat([normal, adv], ignore_index=True)
out.to_parquet(f"{OUT}/documents.parquet", index=False)
print(f"wrote {len(out)} docs ({n_band} adversarial-media) to "
      f"{OUT}/documents.parquet")
