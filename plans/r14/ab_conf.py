#!/usr/bin/env python
"""A/B a set of session confs over a query subset with the bench's
noop-sink methodology. Usage:

    python plans/r14/ab_conf.py q1,q2,... N k1=v1,k2=v2 [label]

Builds get_spark()'s session, then applies the extra confs (runtime-
settable ones only), primes each query once untimed, times N repeats,
prints per-query median and the subset total. Run once without confs
(A), once with (B), ideally A/B/A to control drift.
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
confs = {}
if len(sys.argv) > 3 and sys.argv[3] not in ("", "-"):
    for kv in sys.argv[3].split(","):
        k, v = kv.split("=", 1)
        confs[k] = v
label = sys.argv[4] if len(sys.argv) > 4 else ("B" if confs else "A")


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(f"jaws-ab-{label}")
for k, v in confs.items():
    spark.conf.set(k, v)
meds = {}
for name in names:
    spark.sparkContext.setJobDescription(f"prime {name}")
    force(entry_queries.QUERIES[name](spark, SF_DIR))
    samples = []
    for i in range(N):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        force(entry_queries.QUERIES[name](spark, SF_DIR))
        samples.append(time.perf_counter() - t0)
    meds[name] = statistics.median(samples)
    print(f"[{label}] {name}: median {meds[name]:.3f}s "
          f"all {[round(s, 3) for s in samples]}")
print(f"[{label}] TOTAL {sum(meds.values()):.3f}s over {len(meds)} queries")
spark.stop()
