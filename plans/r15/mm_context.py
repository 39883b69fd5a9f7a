#!/usr/bin/env python
"""Reproduce the bench-context multimodal_features cost: run a block
of JVM-only queries (as the alphabetical sweep does), then time
multimodal_features. Arm 'warm' additionally runs a 1-row pandas-UDF
no-op right before the timed query — if that absorbs the overhead,
the cost is Python-boundary re-warmup after a JVM-only gap.

Usage: python plans/r15/mm_context.py [plain|warm] [rounds]
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
arm = sys.argv[1] if len(sys.argv) > 1 else "plain"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

# a JVM-only block mimicking the sweep stretch before 'multimodal'
BLOCK = [
    "merge_upsert", "minhash_band_stats", "minhash_calibration",
    "mixture_rebalance", "mixture_temperature", "lineitem_cube",
    "revenue_by_nation", "rag_bucket_report", "language_id",
    "gopher_quality", "json_array_functions", "dedup_normalized",
    "block_dedup", "dedup_simhash_pairs", "quality_calibration",
    "source_quality_report", "order_percentiles", "order_priority",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(f"jaws-mm-context-{arm}")

from pyspark.sql import functions as F  # noqa: E402

_noop = F.pandas_udf(lambda s: s, "long")

# prime everything once (bench does the same untimed)
for name in BLOCK + ["multimodal_features", "multimodal_frames"]:
    force(entry_queries.QUERIES[name](spark, SF_DIR))

mm, blocks = [], []
for r in range(ROUNDS):
    t0 = time.perf_counter()
    for name in BLOCK:
        force(entry_queries.QUERIES[name](spark, SF_DIR))
    blocks.append(time.perf_counter() - t0)
    if arm == "warm":
        spark.range(0, 10).select(_noop("id")).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.sparkContext.setJobDescription(f"multimodal_features round {r}")
    t0 = time.perf_counter()
    force(entry_queries.QUERIES["multimodal_features"](spark, SF_DIR))
    mm.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

print(
    f"[{arm}] multimodal_features: median {statistics.median(mm):.3f}s "
    f"all {[round(s, 3) for s in mm]} (block medians "
    f"{statistics.median(blocks):.1f}s)"
)
spark.stop()
