#!/usr/bin/env python3
"""Regenerate the adversarial-Unicode documents fixture (round 8's
off-gate sweep, now committed so every round can re-run it).

Builds a full fixture directory: every non-documents table is copied
from sf0.001 verbatim, and documents.parquet is replaced by a corpus of
~200 bootstrapped-normal docs plus the degenerate rows that have
historically broken engine-vs-oracle parity: null text, empty text,
whitespace-only, sub-trigram, NFD vs NFC accents, non-BMP code points,
tabs/newlines/CRLF, digits/punct-only, exact and near duplicates, a
10k-token doc, and high-repetition docs. Seed 408.

Usage: python3 tools/gen_adversarial.py [out_dir]  (default /tmp/adv)
Then:  sbt "runMain graft.Verify /tmp/adv /tmp/adv_out" and compare
       with DuckDB over the same dir (see .claude/skills/verify).
"""
import shutil
import sys
import os

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.001"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/adv")

rng = np.random.default_rng(408)
os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

src = pd.read_parquet(f"{SRC}/documents.parquet")
normal = src.sample(n=min(200, len(src)), random_state=408).copy()

# NOTE: no null-text row. The analytics contract starts AFTER ingest —
# Input.quarantine (q80) is the boundary that drops malformed/null rows,
# so corpus queries assume non-null text (empty/whitespace is in
# contract and covered below; unit-level null behavior is pinned in
# NullTextSpec against the oracle twins' NULL semantics).
adv_texts = [
    "",
    " \t\n  ",
    "a",
    "ab",
    "xy z",                                  # one sub-trigram token pair
    "café touché naïve",      # NFC precomposed
    "café touché naïve",   # NFD decomposed, same text
    "\U0001F600 \U0001F680 emoji doc \U0001F4A9 end",
    "你好世界 こんにちは doc",
    "tabs\tbetween\ttokens\tand\r\nCRLF\r\nlines",
    "1234 5678 90 42 7 3.14159 2.71828",
    "!!! ??? ... ;;; ::: --- (((",
    "dup dup dup dup dup dup dup dup dup dup",        # ttf = 1
    "the exact duplicate sentinel text",
    "the exact duplicate sentinel text",              # exact dup pair
    "the exact near duplicate sentinel text body",
    "the exact near duplicate sentinel text bodies",  # near-dup pair
    " ".join(f"tok{i % 97}" for i in range(10000)),   # long doc
    "UPPER lower MiXeD CaSe TeXt",
    "word " * 50,                                     # trailing space run
]
adv = pd.DataFrame({
    "doc_id": np.arange(10_000, 10_000 + len(adv_texts), dtype="int64"),
    "text": adv_texts,
    "lang": [["en", "es", "fr", "de", "und"][i % 5]
             for i in range(len(adv_texts))],
    "source": [["web", "books", "code", "wiki"][i % 4]
               for i in range(len(adv_texts))],
})
adv["n_chars"] = adv["text"].str.len().astype("Int64")

out = pd.concat([normal, adv], ignore_index=True)
out.to_parquet(f"{OUT}/documents.parquet", index=False)
print(f"wrote {len(out)} docs ({len(adv)} adversarial) to {OUT}/documents.parquet")
