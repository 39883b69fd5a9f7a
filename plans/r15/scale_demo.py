#!/usr/bin/env python
"""Core-count scaling demo over the multi-row-group sf0.1 copy
(VERDICT r14 item 5). The shipped testdata is one row group per file,
so scans can't split; this runs a query subset against the
make_multirowgroup.py copy with split sizing lowered to the data
(maxPartitionBytes=1m, openCostInBytes=16k — at real scale the
default 128m/4m produce thousands of splits by themselves; lowering
them here recreates that split structure on MB-scale files), at
whatever $SPARK_GRAFT_CPUS says.

Usage:
  SPARK_GRAFT_CPUS=32 python plans/r15/scale_demo.py [datadir] [q1,q2,...]
  SPARK_GRAFT_CPUS=8  python plans/r15/scale_demo.py [datadir] [q1,q2,...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfmr0.1"
DEFAULT_QS = (
    "fuzzy_name_pairs,ngram_lm_bits,exact_substring_cut,"
    "dup_gram_coverage,gopher_quality,contamination,token_entropy,"
    "quality_score,pricing_summary,revenue_by_nation,lineitem_cube,"
    "order_percentiles"
)
names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_QS).split(",")
N = int(os.environ.get("SCALE_DEMO_N", "5"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
spark = get_spark(f"jaws-scale-demo-{cpus}")
spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
spark.conf.set("spark.sql.files.openCostInBytes", "16k")

meds = {}
for name in names:
    spark.sparkContext.setJobDescription(f"prime {name}")
    force(entry_queries.QUERIES[name](spark, DATA))
    samples = []
    for i in range(N):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        force(entry_queries.QUERIES[name](spark, DATA))
        samples.append(time.perf_counter() - t0)
    meds[name] = statistics.median(samples)
    print(
        f"[cpus={cpus}] {name}: median {meds[name]:.3f}s "
        f"all {[round(s, 3) for s in samples]}"
    )
print(f"[cpus={cpus}] TOTAL {sum(meds.values()):.3f}s over {len(meds)}")
spark.stop()
