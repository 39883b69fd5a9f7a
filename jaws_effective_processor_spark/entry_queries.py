"""Registry wiring queries() <-> oracle_sql() for the driver contract.

Each entry pairs a Spark callable (spark, sf_dir) -> DataFrame with
its DuckDB oracle SQL. Keys without oracle SQL get the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible
operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import oracle
from .pipeline import effective_alarms
from .session import pin_session_conf

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _wrap(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Pin oracle-critical session confs before running any query —
    the driver hands us a session we didn't build."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        pin_session_conf(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    return run


def register(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    sql: str | None = None,
) -> None:
    QUERIES[name] = _wrap(fn)
    if sql is not None:
        ORACLE_SQL[name] = sql


register("effective_alarms", effective_alarms, oracle.EFFECTIVE_ALARMS_SQL)
