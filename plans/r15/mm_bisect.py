#!/usr/bin/env python
"""Bisect the multimodal_features r14 regression against the two
session-wide AQE confs (VERDICT r14 item 1). pin_session_conf re-pins
both keys during every query BUILD, so the override is applied AFTER
the build, immediately before each timed force() — AQE reads runtime
conf at execution time, so this isolates the conf's execution effect
with everything else identical.

Usage: python plans/r15/mm_bisect.py <query> N k1=v1,... [label]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1].split(",")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 9
confs = {}
if len(sys.argv) > 3 and sys.argv[3] not in ("", "-"):
    for kv in sys.argv[3].split(","):
        k, v = kv.split("=", 1)
        confs[k] = v
label = sys.argv[4] if len(sys.argv) > 4 else ("B" if confs else "A")


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(f"jaws-mm-bisect-{label}")
for name in names:
    df = entry_queries.QUERIES[name](spark, SF_DIR)  # build re-pins confs
    for k, v in confs.items():
        spark.conf.set(k, v)  # override AFTER the pin, BEFORE execution
    spark.sparkContext.setJobDescription(f"prime {name} [{label}]")
    force(df)
    samples = []
    for i in range(N):
        df = entry_queries.QUERIES[name](spark, SF_DIR)
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.sparkContext.setJobDescription(f"{name} run {i} [{label}]")
        t0 = time.perf_counter()
        force(df)
        samples.append(time.perf_counter() - t0)
    print(
        f"[{label}] {name}: median {statistics.median(samples):.3f}s "
        f"min {min(samples):.3f} all {[round(s, 3) for s in samples]}"
    )
spark.stop()
