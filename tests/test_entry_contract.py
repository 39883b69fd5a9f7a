"""The driver-contract gate, run locally: every queries() entry with
an oracle must match DuckDB at sf0.01; entry() must smoke on sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def _query_names():
    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_oracle_parity(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_ORACLE)
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert df.count() >= 0  # rows-only check for non-SQL ops
    else:
        compare(df, sql, SF_ORACLE)
