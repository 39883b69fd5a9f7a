#!/usr/bin/env python
"""Full bench-context repro for multimodal_features: prime the whole
166-query registry at SF_DIR (same session state as bench.py sweeps),
then time multimodal_features (a) back-to-back x7, (b) after a ~20 s
JVM-only query gap x5 — separates session-state cost (cached
artifacts, heap pressure) from gap/ordering cost."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
Q = entry_queries.QUERIES


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("jaws-mm-fullctx")
t0 = time.perf_counter()
for name in sorted(Q):
    try:
        force(Q[name](spark, SF_DIR))
    except Exception as e:
        print(f"prime fail {name}: {e!r}", file=sys.stderr)
print(f"prime done in {time.perf_counter() - t0:.1f}s")

b2b = []
for i in range(7):
    t0 = time.perf_counter()
    force(Q["multimodal_features"](spark, SF_DIR))
    b2b.append(time.perf_counter() - t0)
print(f"back-to-back: median {statistics.median(b2b):.3f} "
      f"all {[round(s, 3) for s in b2b]}")

GAP = [
    "merge_upsert", "minhash_band_stats", "minhash_calibration",
    "mixture_rebalance", "mixture_temperature", "lineitem_cube",
    "revenue_by_nation", "rag_bucket_report", "order_percentiles",
    "pricing_summary", "top_orders_per_customer", "user_retention_cohorts",
    "quality_calibration", "source_quality_report", "dedup_normalized",
    "block_dedup", "dedup_simhash_pairs", "minhash_band_stats",
    "override_set", "parts_without_orders", "segment_custkeys_setops",
    "order_priority", "customer_order_windows", "language_id",
    "gopher_quality", "json_array_functions", "token_counts",
    "token_entropy", "unigram_surprisal", "vocab_coverage",
]
gapped = []
for i in range(5):
    for name in GAP:
        force(Q[name](spark, SF_DIR))
    t0 = time.perf_counter()
    force(Q["multimodal_features"](spark, SF_DIR))
    gapped.append(time.perf_counter() - t0)
print(f"after gap: median {statistics.median(gapped):.3f} "
      f"all {[round(s, 3) for s in gapped]}")
spark.stop()
