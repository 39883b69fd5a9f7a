#!/usr/bin/env python
"""Test whether bench.py's dual-SF session shape (warm-up sweep at
sf0.001 THEN prime at sf0.1, like bench.py) is what inflates
multimodal_features: reproduce exactly that sequence, then time
multimodal_features back-to-back and inside an alphabetical sweep
stretch. Arm 'single' skips the sf0.001 warm-up for contrast."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SF_WARM = "/root/testdata/sf0.001"
arm = sys.argv[1] if len(sys.argv) > 1 else "dual"
Q = entry_queries.QUERIES


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(f"jaws-mm-dualsf-{arm}")

from pyspark.sql import functions as F  # noqa: E402

_warm = F.pandas_udf(lambda s: s, "long")
spark.range(0, 1000).select(_warm("id")).write.format("noop").mode(
    "overwrite"
).save()

if arm == "dual":
    for name in sorted(Q):
        try:
            force(Q[name](spark, SF_WARM))
        except Exception:
            pass
for name in sorted(Q):
    try:
        force(Q[name](spark, SF_DIR))
    except Exception as e:
        print(f"prime fail {name}: {e!r}", file=sys.stderr)

b2b = []
for i in range(7):
    t0 = time.perf_counter()
    force(Q["multimodal_features"](spark, SF_DIR))
    b2b.append(time.perf_counter() - t0)
print(f"[{arm}] back-to-back: median {statistics.median(b2b):.3f} "
      f"all {[round(s, 3) for s in b2b]}")

# one alphabetical stretch ending at multimodal_features, like a sweep
stretch = [n for n in sorted(Q) if n < "multimodal_features"][-30:]
tm = []
for i in range(3):
    for name in stretch:
        force(Q[name](spark, SF_DIR))
    t0 = time.perf_counter()
    force(Q["multimodal_features"](spark, SF_DIR))
    tm.append(time.perf_counter() - t0)
print(f"[{arm}] after stretch: {[round(s, 3) for s in tm]}")
spark.stop()
