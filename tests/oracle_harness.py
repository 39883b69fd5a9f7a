"""Local mimic of the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL on the same sf_dir and compares
row count, column names, and order-insensitive normalized values —
a stricter local stand-in for the driver's value-hash so mismatches
are caught (with diffs) before the round gate runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

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


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            # partial fixture dirs (edge-case suites) only ship the
            # tables their queries touch
            pass
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return v
    return str(v)


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr)


def compare(spark_df, sql: str, sf_dir: str) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    con = duckdb_connect(sf_dir)
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch:\n spark={sorted(spark_cols)}\n duck ={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s, d = _rowset(spark_cols, spark_rows), _rowset(duck_cols, duck_rows)
    if s != d:
        only_s = [r for r in s if r not in set(map(tuple, d))][:5]
        only_d = [r for r in d if r not in set(map(tuple, s))][:5]
        cols = sorted(spark_cols)
        raise AssertionError(
            f"value mismatch (cols sorted: {cols})\n"
            f" only in spark: {only_s}\n only in duckdb: {only_d}"
        )
