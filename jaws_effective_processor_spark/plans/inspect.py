"""Extract assertable facts from a DataFrame's physical plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what `.explain(mode)` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _strip_cached_subtrees(plan: str) -> str:
    """Drop everything under InMemoryRelation nodes: a cached frame's
    build plan executes ONCE per session (the state-store
    materialization), so its exchanges are not per-query cost. Without
    this, the same query counts different shuffle totals depending on
    whether the cache was materialized before or after `.explain`."""
    lines = plan.splitlines()
    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in lines:
        depth = len(line) - len(line.lstrip(" :+-"))
        if skip_deeper_than is not None:
            if line.strip() and depth <= skip_deeper_than:
                skip_deeper_than = None
            else:
                continue
        if "InMemoryRelation" in line:
            skip_deeper_than = depth
            continue
        out.append(line)
    return "\n".join(out)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan,
    excluding the one-time build plans of cached (InMemoryRelation)
    subtrees.

    AQE may later coalesce partitions but never removes a shuffle
    boundary — this is the plan-time worst case.
    """
    plan = _strip_cached_subtrees(explain_str(df, "simple"))
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Broadcast(?:Hash|NestedLoop)Join", plan))


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains a non-broadcast cartesian product —
    at scale that's always a bug."""
    return "CartesianProduct" in explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter sets pushed into file scans (PushedFilters: [...])."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """The column sets each file scan actually reads (ReadSchema) —
    proves column pruning reached the scan."""
    plan = explain_str(df, "formatted")
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The plan subtree under each BroadcastExchange — what actually
    gets shipped to every task. Lets tests assert WHICH side of a join
    is broadcast (e.g. the 10-row query set, never the corpus)."""
    lines = explain_str(df, "simple").splitlines()
    out = []
    for i, line in enumerate(lines):
        m = re.search(r"(\s*(?::  ?|\+- )*)BroadcastExchange", line)
        if not m:
            continue
        depth = len(line) - len(line.lstrip(" :+-"))
        sub = [line]
        for nxt in lines[i + 1 :]:
            nxt_depth = len(nxt) - len(nxt.lstrip(" :+-"))
            if nxt.strip() and nxt_depth <= depth:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def whole_stage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct whole-stage-codegen span ids — wider spans mean more
    of the plan runs as generated JVM code, not interpreted."""
    plan = explain_str(df, "simple")
    # simple mode renders codegen spans as a "*(n)" operator prefix;
    # formatted/tree modes spell out "WholeStageCodegen (n)" — match
    # both so the helper works across render styles
    ids = {int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", plan)}
    ids |= {int(m) for m in re.findall(r"\*\((\d+)\) ", plan)}
    return sorted(ids)
