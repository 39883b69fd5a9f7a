"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
same conf block is what we would ship to a 1000-executor cluster —
AQE (runtime re-planning, skew-join splitting, partition coalescing)
and Arrow-backed Python interop are the scale-critical settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# InferFiltersFromGenerate synthesizes `size(arr) > 0 AND isnotnull(arr)`
# below every explode(). For exploded arrays that are COMPUTED (shingle
# hashes, n-grams, band keys — our whole text family), the synthesized
# filter inlines the full array-construction expression into an
# interpreted Filter that runs BEFORE the projection computes the array
# — i.e. the expensive expression is evaluated 2-3x per row, with
# shared subexpressions (split(text)) re-expanded at every reference.
# Measured on the contamination query at sf0.1: 16.5 s with the rule,
# 0.3 s without. explode() already skips empty/null arrays, so the
# rule only re-derives what Generate does natively.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "jaws-effective-processor-spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions by the advisory TARGET SIZE
        # instead of maximizing parallelism (the Spark tuning guide's
        # own recommendation — parallelismFirst=true exists only to
        # avoid regressions when first enabling AQE). With it true,
        # every exchange of a small intermediate fans out into
        # core-count micro-tasks whose scheduling dwarfs their work
        # (measured r14 opt round, 13-query mixed subset, A/B/A:
        # window/aggregate-heavy queries 10-40% faster with false —
        # rag_bucket_report 0.82 -> 0.54-0.63 s, event_funnel 0.38 ->
        # 0.32-0.38, effective_registrations 0.44 -> 0.39-0.47 — no
        # consistent regression anywhere). Scale-adaptive by
        # construction: at real data sizes the 64 MB advisory target
        # yields full parallelism; only small reduce sides coalesce.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.optimizer.excludedRules", _EXCLUDED_RULES)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # let AQE coalesce partitions INSIDE cached plans (default
        # false): the session-cached serving artifacts (centroid
        # tables, ground truth, code/routing frames) otherwise pin
        # their build-time 32-partition shape forever — a 50-row
        # ground-truth table was read as 32 near-empty tasks by every
        # recall query (measured r14: ~35-50 ms of pure scheduling per
        # such scan; ANN family total 11.1 -> 9.9 s with this on).
        # Size-adaptive by construction: AQE only coalesces small
        # outputs, so corpus-scaled cached frames keep their
        # parallelism at real scale (guide §2.2: fewer, larger
        # partitions).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # marks sessions built by this engine: consumers that trade
        # memory for repeat-execution speed (entry_queries._PLAN_CACHE)
        # may do so without bound ONLY on our own sized sessions — a
        # foreign session (the round driver's plain default-heap one)
        # gets a capped cache instead
        .config("spark.jaws.engineSession", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _shed_sql_ui_listener(spark: SparkSession) -> None:
    """Detach the SQLAppStatusListener from a UI-DISABLED session.

    The listener feeds the SQL tab's status store: per-execution
    physical-plan descriptions plus per-metric value arrays, retained
    for spark.sql.ui.retainedExecutions = 1000 executions — a STATIC
    conf that cannot be lowered on a session built elsewhere. On a
    default-1g-heap driver sweeping the 151-query registry that store
    is pure dead weight when no UI exists to read it: measured r11
    (jmap -histo:live at query 144): ~186k SQLPlanMetric objects and
    the dominant byte[]/long[] slices, ~310 MB of post-GC live heap
    (729 -> 418 MB with the listener removed), and the sweep's tail
    OOMed without this. Removing a listener the UI cannot consume
    changes no plan, no result, and no metric any consumer reads —
    sessions with spark.ui.enabled=true are left untouched.

    The listener registers lazily with SharedState, so the first call
    (before any SQL ran) may find nothing — pin_session_conf runs
    per query-build, so the second call catches it."""
    try:
        jsc = spark.sparkContext._jsc.sc()
        # case-insensitive (ADVICE r11): SparkConf accepts "TRUE"/"True"
        # as UI-enabled; matching only the lowercase literal would shed
        # the listener from a session whose UI is actually running
        if jsc.conf().get("spark.ui.enabled", "true").lower() == "true":
            return
        for listener in jsc.listenerBus().listeners().toArray():
            if listener.getClass().getName().endswith(
                ".SQLAppStatusListener"
            ):
                jsc.removeSparkListener(listener)
    except Exception:
        pass  # py4j surface drift — hygiene only, never fail a query


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Runtime-settable confs we depend on for oracle parity.

    Applied defensively inside every query entry point because the
    driver may hand us a session built elsewhere. UTC matters: the
    testdata parquet stores naive timestamps, and epoch arithmetic
    must agree with DuckDB's UTC-naive interpretation.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.optimizer.excludedRules", _EXCLUDED_RULES)
    # A foreign plain session arrives with the 200-partition shuffle
    # default. At local scale that inflates every exchange to 200
    # tasks whose driver-side status-store metadata (TaskDataWrapper
    # + metrics rows) accumulates across a long many-query session —
    # measured r11: a default-1g-heap driver session OOMed on the
    # 150th registry query with ~880 MB live after GC, a large slice
    # of it task/metric bookkeeping. Right-size to the machine's
    # parallelism; AQE partition coalescing already makes the runtime
    # shape equivalent, and no query's RESULT depends on the
    # partition count (every ranking rides a total order).
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(default_parallelism())
        )
    # Robustness to the testdata's physical timestamp encoding: the
    # current testdata stores TIMESTAMP(micros, NTZ), which Spark reads
    # natively. If a dataset ships TIMESTAMP(NANOS) — which Spark's
    # reader rejects by default — this conf makes it readable as
    # epoch-nanos BIGINT. Event-time math never assumes either
    # encoding: adapters.event_ms()/event_ts() and relational.ms_of()/
    # ts_of() dispatch on the actual column type per-DataFrame.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # cached-plan AQE partition coalescing (see get_spark) — pinned
    # here too so a foreign driver session serves the session-cached
    # artifacts at their size-appropriate partition count instead of
    # the build-time shuffle width. Set BEFORE any artifact builds
    # (this runs per query construction); results never depend on
    # partitioning (rankings ride total orders), only task counts do.
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    # size-based (not parallelism-first) AQE partition coalescing —
    # see get_spark for the measurement; pinned here so a foreign
    # driver session gets the same task sizing.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    # foreign-session heap hygiene (r11): a UI-less session keeps no
    # SQL status store — see _shed_sql_ui_listener. Engine sessions
    # (16g, UI conf under our control) skip the walk.
    if spark.conf.get("spark.jaws.engineSession", "false") != "true":
        _shed_sql_ui_listener(spark)
    return spark
