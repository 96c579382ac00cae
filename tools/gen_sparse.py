#!/usr/bin/env python3
"""Regenerate the sparse fixture (round 8's off-gate sweep, committed).

Sparsity is where frequency-conversion/fill/recursion bugs live: whole
calendar months vanish from orders/lineitem (one month per year — an
11-month year keeps annual averages off the 1e-8 rounding half-grid
that round 8 diagnosed as the known compare boundary with 10-month
years), events lose two whole days, and documents subset to every
second doc. All other tables copy from sf0.001 verbatim.

Usage: python3 tools/gen_sparse.py [out_dir]   (default /tmp/sparse)
Then run the full Verify + DuckDB compare against this dir.
"""
import shutil
import sys
import os

import pandas as pd

SRC = "/root/testdata/sf0.001"
OUT = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparse")

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

orders = pd.read_parquet(f"{SRC}/orders.parquet")
li = pd.read_parquet(f"{SRC}/lineitem.parquet")
# drop March in every year, from both fact tables
o_keep = orders[orders["o_orderdate"].dt.month != 3]
o_keep.to_parquet(f"{OUT}/orders.parquet", index=False)
li[li["l_shipdate"].dt.month != 3].to_parquet(
    f"{OUT}/lineitem.parquet", index=False)

ev = pd.read_parquet(f"{SRC}/events.parquet")
days = sorted(ev["ts"].dt.date.unique())
gone = set(days[len(days) // 3:len(days) // 3 + 2])  # two missing days
ev[~ev["ts"].dt.date.isin(gone)].to_parquet(
    f"{OUT}/events.parquet", index=False)

docs = pd.read_parquet(f"{SRC}/documents.parquet")
docs[docs["doc_id"] % 2 == 0].to_parquet(
    f"{OUT}/documents.parquet", index=False)
print(f"sparse fixture at {OUT}: orders {len(o_keep)}/{len(orders)}, "
      f"docs {len(docs) // 2 + (1 if len(docs) % 2 else 0)}/{len(docs)}, "
      f"events minus {sorted(gone)}")
