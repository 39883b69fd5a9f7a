"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship settled effective-alarm snapshot on
sf0.001. `queries()` exposes every implemented operator from
SURVEY.md §2 as (spark, sf_dir) -> DataFrame; `oracle_sql()` holds
the DuckDB twin for each. Column names/aliases match pairwise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jaws_effective_processor_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from jaws_effective_processor_spark.pipeline import effective_alarms

    return effective_alarms(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    return entry_queries.ORACLE_SQL
