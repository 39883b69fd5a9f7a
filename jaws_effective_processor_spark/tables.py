"""Loaders for the driver's star-schema parquet tables.

Scale note: ``spark.read.parquet`` gives Catalyst the native
vectorized parquet scan — predicate pushdown + column pruning reach
the file level, and `spark.sql.files.maxPartitionBytes` governs split
sizing on a real cluster. We never cache these eagerly; each query
declares its own projection so only needed columns are read.
"""

from __future__ import annotations

import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Plan-only memo (no data pinned): repeated spark.read.parquet of the
# same immutable table re-lists files and re-reads footers per call —
# ~0.1 s of driver work each, which across a 124-query sweep was ~40%
# of total engine time at sf0.1. See cache.SessionPlanCache.
from .cache import SessionPlanCache

_TABLE_PLANS = SessionPlanCache()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return _TABLE_PLANS.get_or_build(
        spark, (sf_dir, name), lambda: spark.read.parquet(path)
    )


# Spark byte-size conf values may carry a unit suffix ("128m",
# "134217728b"); treating the digits alone as bytes mis-sizes the
# estimate by up to 2^30.
_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    m = re.fullmatch(r"([0-9]+)\s*([a-z]*)", raw)
    if not m or m.group(2) not in _SIZE_SUFFIX:
        return default
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2)]


def spread_if_undersplit(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when the scan arrived
    in fewer splits than cores.

    For CPU-heavy per-row work (hashing, shingling, regex) a small-SF
    parquet lands as ONE input split and the whole scan serializes on
    one core. At real scale the scan has thousands of splits and this
    branch (and its exchange) disappears — the condition is evaluated
    at plan-build time from file-listing metadata only (inputFiles +
    on-disk sizes vs the scan's split sizing), never via `df.rdd`,
    which would force a full RDD conversion per query build.

    The estimate models Spark's actual FilePartition packing: files
    are padded by openCostInBytes and packed into splits of
    min(maxPartitionBytes, max(openCostInBytes, paddedTotal/cores)) —
    many small files therefore land in FEW partitions, not
    one-per-file (len(files) alone would overestimate and skip the
    needed repartition).
    """
    par = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    total = 0
    for uri in files:
        path = urllib.parse.urlparse(uri).path
        try:
            total += os.path.getsize(path)
        except OSError:
            return df  # non-local FS: trust the scan's own splitting
    max_bytes = _conf_bytes(
        spark, "spark.sql.files.maxPartitionBytes", 128 << 20
    )
    open_cost = _conf_bytes(
        spark, "spark.sql.files.openCostInBytes", 4 << 20
    )
    padded = total + len(files) * open_cost
    max_split = min(max_bytes, max(open_cost, -(-padded // par)))
    est_splits = -(-padded // max_split)
    if est_splits < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so the SQL surface works."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
