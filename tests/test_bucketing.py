"""Bucketing co-location: a large-large equi-join over pre-bucketed
tables must plan with ZERO exchanges (the 100 TB join lever)."""

from __future__ import annotations

import uuid

import pytest

from jaws_effective_processor_spark.plans import shuffle_count
from jaws_effective_processor_spark.sources import write_bucketed
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    sfx = uuid.uuid4().hex[:8]
    t_o, t_l = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    try:
        write_bucketed(orders, t_o, "o_orderkey", buckets=8)
        write_bucketed(lineitem, t_l, "l_orderkey", buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table(t_o), spark.table(t_l)
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        assert shuffle_count(joined) == 0
        # and the co-located join returns exactly the shuffled result
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")
