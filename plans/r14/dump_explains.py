#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query to
plans/r14/<name>_<phase>.txt (phase = before|after, argv[1]).

Optionally restrict to a comma-separated list of names in argv[2].
Plan text is captured from the analyzed/optimized physical plan the
way the judge reads it: spark._jvm explain via DataFrame._sc — we use
the public df.explain path through a captured stdout. Artifact-heavy
queries build their session-cached artifacts on first touch; that is
plan-build cost, not execution, and is identical before/after unless
the round changes it (disclosed in OPTIMIZATION_r14.md if so).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from jaws_effective_processor_spark import entry_queries  # noqa: E402
from jaws_effective_processor_spark.session import get_spark  # noqa: E402

PHASE = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    spark = get_spark("jaws-plan-dump")
    failed = []
    names = sorted(entry_queries.QUERIES)
    if ONLY:
        names = [n for n in names if n in ONLY]
    for name in names:
        try:
            df = entry_queries.QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT, f"{name}_{PHASE}.txt"), "w") as f:
                f.write(buf.getvalue())
        except Exception as e:  # noqa: BLE001
            failed.append((name, repr(e)))
            print(f"FAILED {name}: {e!r}", file=sys.stderr)
    print(f"dumped {len(names) - len(failed)}/{len(names)} plans to {OUT}")
    if failed:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
