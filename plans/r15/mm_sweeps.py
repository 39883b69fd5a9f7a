#!/usr/bin/env python
"""Run bench.py's exact session shape (pandas no-op, sf0.001 warm-up
sweep, sf0.1 prime, then N full alphabetical timed sweeps) in the
foreground and print per-sweep samples for a watch list — isolates
whether the multimodal_features inflation needs the full-sweep
execution pattern."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SF_WARM = "/root/testdata/sf0.001"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
WATCH = {
    "multimodal_features", "multimodal_frames", "multimodal_meta",
    "mixture_temperature", "merge_upsert", "segment_custkeys_setops",
}
Q = entry_queries.QUERIES


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("jaws-mm-sweeps")
from pyspark.sql import functions as F  # noqa: E402

_warm = F.pandas_udf(lambda s: s, "long")
spark.range(0, 1000).select(_warm("id")).write.format("noop").mode(
    "overwrite"
).save()
for name in sorted(Q):
    try:
        force(Q[name](spark, SF_WARM))
    except Exception:
        pass
for name in sorted(Q):
    force(Q[name](spark, SF_DIR))

runs = {name: [] for name in WATCH}
for sweep in range(N):
    t_sweep = time.perf_counter()
    for name in sorted(Q):
        t0 = time.perf_counter()
        force(Q[name](spark, SF_DIR))
        dt = time.perf_counter() - t0
        if name in WATCH:
            runs[name].append(round(dt, 3))
    print(
        f"sweep {sweep + 1}: {time.perf_counter() - t_sweep:.1f}s "
        f"load {os.getloadavg()[0]:.1f}",
        file=sys.stderr,
    )
for name in sorted(runs):
    print(f"{name}: {runs[name]}")
spark.stop()
