#!/usr/bin/env python
"""Build a multi-row-group copy of the sf0.1 testdata under /tmp
(VERDICT r14 item 5): every shipped sf0.1 parquet is ONE row group,
so Spark scans can never split and 8-vs-32-core ratios read ~1 for
every scan-bound query. This rewrites each table byte-identically in
content with >= 64 row groups (where rows allow), so scan splits —
and therefore core-count scaling — become measurable locally.

Usage: python plans/r15/make_multirowgroup.py [outdir]
"""
from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfmr0.1"
TARGET_GROUPS = 64

os.makedirs(OUT, exist_ok=True)
for name in sorted(os.listdir(SRC)):
    if not name.endswith(".parquet"):
        continue
    t = pq.read_table(os.path.join(SRC, name))
    rows_per_group = max(1, t.num_rows // TARGET_GROUPS)
    pq.write_table(
        t,
        os.path.join(OUT, name),
        row_group_size=rows_per_group,
        compression="snappy",
    )
    meta = pq.ParquetFile(os.path.join(OUT, name)).metadata
    print(f"{name}: {meta.num_rows} rows in {meta.num_row_groups} row groups")
