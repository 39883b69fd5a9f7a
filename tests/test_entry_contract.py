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


def test_fuzzy_pairs_parity_without_broadcast(spark):
    """edit_distance_pairs carries no broadcast hint, so on a corpus
    too large to broadcast the name re-attach degrades to shuffle
    joins instead of OOMing the driver. Prove the degraded plan is
    result-identical: run the fuzzy query with every broadcast path
    disabled and compare against its DuckDB oracle (which the hinted
    plan matched in round 5).

    Builds the plan from the RAW query function, not queries():
    the registry's prepared-plan cache would hand back the DataFrame
    the parametrized oracle test already executed, whose AQE final
    plan was decided while broadcast was still enabled — the plan
    assert below would then inspect that stale (finalized) plan
    instead of one planned under the disabled thresholds."""
    from jaws_effective_processor_spark import relational
    from jaws_effective_processor_spark.session import pin_session_conf

    q = relational.q_fuzzy_name_pairs
    sql = entry_mod.oracle_sql()["fuzzy_name_pairs"]
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = q(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, (
            "broadcast joins survived disabled thresholds — a hint is "
            "overriding the planner again"
        )
        compare(df, sql, SF_ORACLE)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
        pin_session_conf(spark)


def test_fuzzy_threshold_levenshtein_semantics(spark):
    """The r14 verify-stage rewrite leans on two properties of
    Spark's bounded levenshtein(a, b, threshold=1): it returns the
    EXACT distance whenever that distance is <= threshold, and -1
    otherwise — so `d1 >= 0` keeps precisely the rows the unbounded
    `levenshtein(a, b) <= 1` filter kept, with identical distance
    values. Pin that equivalence on every edit class (equal,
    substitution, deletion, insertion, far) so a future Spark
    changing the sentinel or the boundary fails here, not in the
    oracle hash."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("abc", "abc"),  # distance 0
            ("abc", "abd"),  # substitution, 1
            ("abc", "ab"),  # deletion, 1
            ("abc", "abcd"),  # insertion, 1
            ("abc", "adc"),  # substitution mid, 1
            ("abc", "xyz"),  # 3 — must drop
            ("abc", "acb"),  # transposition = 2 — must drop
        ],
        "a string, b string",
    )
    rows = df.select(
        "a",
        "b",
        F.levenshtein("a", "b").alias("d"),
        F.levenshtein("a", "b", 1).alias("d1"),
    ).collect()
    for r in rows:
        if r.d <= 1:
            assert r.d1 == r.d, (r.a, r.b, r.d, r.d1)
        else:
            assert r.d1 == -1, (r.a, r.b, r.d, r.d1)


def test_shed_sql_ui_listener_detaches_on_ui_disabled(spark):
    """Foreign-session heap hygiene (r11): on a UI-disabled context
    the SQL status-store listener is removed — its retained
    plan-description/metric heap (~310 MB over a 151-query sweep,
    jmap-measured) OOMed the registry tail on a default-1g driver.
    The shared test context runs with spark.ui.enabled=false, so
    calling the shed directly must leave no SQLAppStatusListener on
    the bus; nothing in the engine reads the SQL status store, so
    the shared session is unaffected. Idempotent by construction
    (second call finds nothing)."""
    from jaws_effective_processor_spark.session import (
        _shed_sql_ui_listener,
    )

    jsc = spark.sparkContext._jsc.sc()
    assert jsc.conf().get("spark.ui.enabled", "true") == "false"
    spark.sql("select 1").collect()  # force SharedState/listener init
    _shed_sql_ui_listener(spark)
    _shed_sql_ui_listener(spark)  # idempotent
    names = [
        listener.getClass().getName()
        for listener in jsc.listenerBus().listeners().toArray()
    ]
    assert not any(n.endswith(".SQLAppStatusListener") for n in names), (
        names
    )
