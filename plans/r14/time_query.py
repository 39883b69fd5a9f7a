#!/usr/bin/env python
"""Time individual registered queries with the bench's methodology
(noop sink, median of N) in one warm session. Usage:

    python plans/r14/time_query.py q1,q2,... [N]

Primes each query once untimed (artifact/session caches), then times
N repeats and prints per-query min/median. For fast iteration on one
query — the full bench.py stays the number of record.
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("jaws-time-query")
for name in names:
    spark.sparkContext.setJobDescription(f"prime {name}")
    t0 = time.perf_counter()
    force(entry_queries.QUERIES[name](spark, SF_DIR))
    prime = time.perf_counter() - t0
    samples = []
    for i in range(N):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        force(entry_queries.QUERIES[name](spark, SF_DIR))
        samples.append(time.perf_counter() - t0)
    print(
        f"{name}: prime {prime:.3f}s, median {statistics.median(samples):.3f}s,"
        f" min {min(samples):.3f}s, all {[round(s, 3) for s in samples]}"
    )
spark.stop()
