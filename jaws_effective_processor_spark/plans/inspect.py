"""Extract assertable facts from a DataFrame's physical plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what `.explain(mode)` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle-exchange operators in the physical plan,
    excluding the one-time build plans of cached (InMemoryRelation)
    subtrees.

    Counted by WALKING THE JVM PLAN TREE (r12, replacing the
    explain-text heuristic): ShuffleExchangeExec nodes, stopping at
    InMemoryTableScanExec (a cached frame's build executes once per
    session — the state-store materialization — so its exchanges are
    not per-query cost) and descending into AdaptiveSparkPlanExec's
    initial plan. The old text strip was defeated both ways by
    Spark's rendering of NESTED AdaptiveSparkPlan sections inside
    cached builds (`== Final/Initial Plan ==` bodies print DEDENTED
    past the enclosing InMemoryRelation's indent — the r7 audit
    note): cached-build exchanges leaked INTO counts once the cache
    had materialized (order-dependent: one query measured 4 fresh
    and 40 after an unrelated artifact executed), and a dedented
    section could swallow real outer exchanges OUT of the count.
    The tree walk is rendering-independent and order-stable.

    AQE may later coalesce partitions but never removes a shuffle
    boundary — this is the plan-time worst case.

    Counting semantics (ADVICE r12): a ReusedExchangeExec is a LEAF
    that re-reads another subtree's shuffle output, so a reused
    shuffle counts ONCE (the budgets price distinct exchanges, not
    fan-out of their readers), and scalar-subquery expression plans
    hang off expressions rather than children() so their exchanges
    are NOT counted — subquery-shaped builds are one-time scalar
    materializations (the trainer-chain convergence scalars), the
    same class the InMemoryTableScan stop excludes.

    VERSION ASSUMPTION: the walk reflects into Spark's internal
    physical-plan API (AdaptiveSparkPlanExec.initialPlan(),
    QueryStageExec.plan(), TreeNode.children()), present in Spark
    3.2-4.x and pinned by tests/test_plans.py (every budget test
    exercises the walk). If a future Spark renames them, the walk
    raises a clear error below instead of silently returning a wrong
    count.
    """

    def is_keyed_shuffle(node) -> bool:
        # keyed exchanges only (hash/range/single-partition), matching
        # the budgets' established semantics: RoundRobinPartitioning
        # is spread_if_undersplit faking input splits on small local
        # fixtures — at scale the splits exist and the spread doesn't
        part = node.outputPartitioning().getClass().getSimpleName()
        return part.startswith(
            ("HashPartitioning", "RangePartitioning", "SinglePartition")
        )

    def walk(node) -> int:
        name = node.getClass().getSimpleName()
        if name.startswith("InMemoryTableScan"):
            return 0
        n = (
            1
            if name.startswith("ShuffleExchange")
            and is_keyed_shuffle(node)
            else 0
        )
        if name.startswith("AdaptiveSparkPlan"):
            return n + walk(node.initialPlan())
        if name.endswith("QueryStageExec"):
            # materialized AQE stages wrap their plan out of children()
            return n + walk(node.plan())
        ch = node.children()
        for i in range(ch.length()):
            n += walk(ch.apply(i))
        return n

    try:
        return walk(df._jdf.queryExecution().executedPlan())
    except Exception as exc:  # pragma: no cover - version guard
        raise RuntimeError(
            "shuffle_count's JVM plan-tree walk failed — it assumes "
            "Spark 3.2-4.x internal plan APIs (AdaptiveSparkPlanExec."
            "initialPlan, QueryStageExec.plan, TreeNode.children); "
            "re-pin the walk against this Spark version"
        ) from exc


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


def trivial_join_conditions(df: DataFrame) -> list[str]:
    """Predicates comparing an attribute to ITSELF (identical exprId
    on both sides of an equality) anywhere in the physical plan's
    join keys, join conditions, or filter conditions — the
    trivially-true self-join class commit 603dc64 fixed at eight ADC
    cell-join sites (r13 verdict item 7: pin the class so a refactor
    can't silently reintroduce it).

    Why the ANALYZED logical plan and not the physical one: when a
    self-join's condition resolves both column references to the
    SAME attribute, Catalyst cannot extract it as an equi-join key
    (a key needs one side each) and the optimizer's
    SimplifyBinaryComparison then rewrites `a = a` to isnotnull(a)
    — so by executedPlan the smoking gun is GONE and all that
    remains is a loosened join shape (often a nested-loop with only
    the residual predicates, the r13 symptom) plus silent
    NULL-dropping. Results can still be accidentally correct, which
    is exactly why this needs a plan assertion rather than a value
    test. At the analyzed level the degenerate EqualTo is still
    literal, wherever it sits (Join condition, Filter — pushdown has
    not run yet, so checking every predicate site catches it before
    the optimizer can relocate or disguise it).

    Walks the JVM logical TreeNode API (children()/condition(),
    stable across Spark 3.2-4.x like shuffle_count's physical walk).
    Returns one human-readable string per offending predicate;
    sound plans return []."""

    def attr_id(e):
        if e.getClass().getSimpleName() == "AttributeReference":
            eid = e.exprId()
            return (eid.id(), str(eid.jvmId()))
        return None

    out: list[str] = []

    def walk_expr(e, where: str) -> None:
        if e.getClass().getSimpleName() in ("EqualTo", "EqualNullSafe"):
            li, ri = attr_id(e.left()), attr_id(e.right())
            if li is not None and li == ri:
                out.append(f"{where}: {e.sql()}")
        ch = e.children()
        for i in range(ch.length()):
            walk_expr(ch.apply(i), where)

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name in ("Join", "Filter"):
            cond = node.condition()
            cname = cond.getClass().getSimpleName()
            if cname.startswith("Some"):  # Join: Option[Expression]
                walk_expr(cond.get(), name)
            elif not cname.startswith("None"):  # Filter: Expression
                walk_expr(cond, name)
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


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
