"""J1 — effective registration: instances FK-left-join classes.

The reference joins the instances KTable to the classes KTable on the
foreign key instance.action == class.key and fills class defaults
into the monolog (RegistrationRule.java:91-97, AlarmClassJoiner
:135-161). The left-join null side (unknown class) survives —
RegistrationRuleTest.java:119-134.

Scale: the class dimension is tiny (dozens of alarm classes for
hundreds of thousands of alarms) — always broadcast; the join then
costs zero shuffle on the instances side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compaction import compact_table


def effective_registrations(
    instances_log: DataFrame, actions_dim: DataFrame
) -> DataFrame:
    instances = compact_table(instances_log, ["name"], tombstone_col="action")
    actions = actions_dim.select(
        F.col("name").alias("action_name"),
        "latchable",
        "filterable",
        "ondelayseconds",
        "offdelayseconds",
        "priority",
    )
    return instances.join(
        F.broadcast(actions),
        instances["action"] == actions["action_name"],
        "left",
    ).select("name", "action", "latchable", "filterable", "ondelayseconds",
             "offdelayseconds", "priority")
