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


# Canonical scalar-type mapping. The driver's value-hash is
# type-sensitive (round 5: DuckDB HUGEINT vs Spark BIGINT hash-
# mismatched at equal values), so local green must also mean the two
# engines emit the SAME canonical type per column. Anything not in
# these maps (HUGEINT above all) is an immediate failure.
_DUCK_CANON = {
    "BIGINT": "i64",
    "INTEGER": "i32",
    "SMALLINT": "i16",
    "TINYINT": "i8",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "BOOLEAN": "bool",
    "VARCHAR": "str",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "BLOB": "bin",
}
_SPARK_CANON = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "boolean": "bool",
    "string": "str",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
}


def _canon_duck(t: str) -> str | None:
    """Canonical form, or None for complex types (STRUCT/MAP) whose
    textual shapes differ too much across engines to compare — the
    value compare still covers those."""
    t = str(t).strip()
    if t.endswith("[]"):
        inner = _canon_duck(t[:-2])
        return None if inner is None else f"array<{inner}>"
    if t.upper().startswith("DECIMAL"):
        return "dec" + t[t.index("(") :].replace(" ", "")
    return _DUCK_CANON.get(t.upper())


def _canon_spark(t: str) -> str | None:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        inner = _canon_spark(t[6:-1])
        return None if inner is None else f"array<{inner}>"
    if t.startswith("decimal"):
        return "dec" + t[t.index("(") :].replace(" ", "")
    return _SPARK_CANON.get(t)


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
    duck_typestrs = [str(t) for t in rel.types]
    duck_rows = rel.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch:\n spark={sorted(spark_cols)}\n duck ={sorted(duck_cols)}"
    )
    # Type parity gate (round 5: the driver's value-hash distinguishes
    # DuckDB HUGEINT from Spark BIGINT even at equal values — uncast
    # integer sum() is the classic source). HUGEINT anywhere is an
    # immediate fail; where both canonical forms parse they must agree.
    duck_types = dict(zip(duck_cols, duck_typestrs))
    spark_types = dict(spark_df.dtypes)
    for col in duck_cols:
        dt = duck_types[col]
        assert "HUGEINT" not in dt.upper(), (
            f"column {col!r}: oracle emits {dt} — CAST the expression "
            f"to BIGINT (driver hash is type-sensitive)"
        )
        cd, cs = _canon_duck(dt), _canon_spark(spark_types[col])
        if cd is not None and cs is not None:
            assert cd == cs, (
                f"column {col!r} type mismatch: spark "
                f"{spark_types[col]!r} vs duckdb {dt!r} "
                f"(canon {cs} vs {cd})"
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
