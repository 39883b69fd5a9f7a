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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_if_undersplit(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when the scan arrived
    in fewer splits than cores.

    For CPU-heavy per-row work (hashing, shingling, regex) a small-SF
    parquet lands as ONE input split and the whole scan serializes on
    one core. At real scale the scan has thousands of splits and this
    branch (and its exchange) disappears — the condition is evaluated
    at plan-build time from file-listing metadata only (inputFiles +
    on-disk sizes vs maxPartitionBytes), never via `df.rdd`, which
    would force a full RDD conversion per query build.
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
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    max_bytes = int(re.sub(r"[^0-9]", "", raw) or "134217728")
    est_splits = max(len(files), -(-total // max_bytes))
    if est_splits < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so the SQL surface works."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
