"""Driver-parity smoke: every queries() entry must BUILD and EXECUTE
in a fresh process with a plain SparkSession (zero custom conf).

This is exactly what the round driver does — it hands the engine a
session it did not build, over whatever physical parquet encoding the
testdata currently uses. Round 2 went red because the engine assumed
an encoding the conftest session papered over; this gate runs in a
subprocess so no test-session conf can mask that class of break.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
from pyspark.sql import SparkSession

# Deliberately minimal: the driver does not apply our session tuning.
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod

sf = "/root/testdata/sf0.001"
failures = []
for name, fn in entry_mod.queries().items():
    try:
        fn(spark, sf).limit(1).collect()
    except Exception as e:  # noqa: BLE001 - report-all gate
        failures.append((name, str(e).splitlines()[0][:200]))

# entry() itself must smoke too.
try:
    entry_mod.entry(spark).limit(1).collect()
except Exception as e:  # noqa: BLE001
    failures.append(("entry", str(e).splitlines()[0][:200]))

for name, err in failures:
    print(f"FAIL {name}: {err}")
print(f"CHECKED {len(entry_mod.queries()) + 1} FAILED {len(failures)}")
sys.exit(1 if failures else 0)
"""


def test_every_query_runs_on_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"plain-session smoke failed:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert "FAILED 0" in proc.stdout, tail
