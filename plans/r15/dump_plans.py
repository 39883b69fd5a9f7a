#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r15/.

Usage: python plans/r15/dump_plans.py q1,q2,... suffix
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.plans import explain_str  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1].split(",")
suffix = sys.argv[2]

spark = get_spark("jaws-dump-plans")
for name in names:
    df = entry_queries.QUERIES[name](spark, SF_DIR)
    out = f"/root/repo/plans/r15/{name}_{suffix}.txt"
    with open(out, "w") as fh:
        fh.write(explain_str(df, "formatted"))
    print(f"wrote {out} ({len(open(out).read().splitlines())} lines)")
spark.stop()
