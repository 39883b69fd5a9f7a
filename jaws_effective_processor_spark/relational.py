"""The relational/SQL surface — §2.9 categories as first-class queries.

The reference has no SQL surface (SURVEY.md §2.9); Catalyst supplies
sorts, limits, top-k, set ops, distinct, grouping sets, window
functions, scalar functions, semi/anti joins, subqueries, and
approximate aggregates for free once the engine exposes DataFrames.
These queries pin that surface with DuckDB oracles over the star
schema.

Determinism discipline for the hash gate:
- money/doubles are reduced with CAST(floor(x*100) AS BIGINT)
  ("cents") before summing — IEEE floor is bit-identical across
  engines, unlike round() tie-breaking or float sum ordering;
- averages are integer `DIV` of exact sums;
- timestamps convert through the schema-adaptive ms_of()/ts_of()
  helpers (never a hard-coded physical-encoding assumption), and
  outputs carry epoch-ms bigints;
- every ORDER BY inside a window has a unique tie-break key.

Scale notes are per-query docstrings; the common themes: dimension
joins broadcast, aggregations are partial (map-side combine), filters
and projections sit directly on the parquet scan so pushdown/pruning
apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_table


def cents(col: Column) -> Column:
    return F.floor(col * 100).cast("long")


def _is_long(df: DataFrame, name: str) -> bool:
    return df.schema[name].dataType.typeName() in ("long", "bigint")


def ts_of(df: DataFrame, name: str) -> Column:
    """Timestamp column regardless of physical encoding.

    Dispatches on the actual input schema: TIMESTAMP(micros, NTZ)
    (the current testdata for events.ts and orders/lineitem dates)
    casts natively; epoch-nanos BIGINT (TIMESTAMP(NANOS) parquet read
    under the legacy nanosAsLong conf) converts by exact integer
    division. Session TZ is pinned UTC so NTZ and epoch math agree
    with DuckDB.
    """
    if _is_long(df, name):
        return F.timestamp_micros(F.expr(f"{name} DIV 1000"))
    return F.col(name).cast("timestamp")


def ms_of(df: DataFrame, name: str) -> Column:
    if _is_long(df, name):
        return F.expr(f"{name} DIV 1000000")
    return F.unix_millis(F.col(name).cast("timestamp"))


# ------------------------------------------------------------ queries


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 6 aggregates.

    At 100 TB: pure map-side partial aggregation into 4 groups — the
    shuffle carries ~4 rows per task. The filter and the 7-column
    projection push down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.filter(ts_of(li, "l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(disc_price).alias("sum_disc_cents"),
            F.sum(charge).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty_cents", F.expr("sum_qty_cents DIV count_order")
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join region⋈nation⋈customer⋈orders⋈lineitem.

    region/nation broadcast (tiny dims); customer⋈orders⋈lineitem
    shuffle on their keys with AQE picking broadcast for customer at
    small SF and sort-merge at scale.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: 10 highest-revenue customers (sort + limit).

    TakeOrderedAndProject at the physical layer — per-partition top-10
    then a single-reduce merge; never a full sort at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_custkey"))
        .limit(10)
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then count by priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o96 = orders.filter(F.year(ts_of(orders, "o_orderdate")) == 1996)
    return (
        o96.join(li, o96["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_parts_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join, grouped by brand."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part["p_partkey"] == li["l_partkey"], "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets incl. grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
    )


def q_customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic window functions per customer order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    total = cents(F.col("o_totalprice"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ms_of(orders, "o_orderdate").alias("order_ms"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag(total).over(w).alias("prev_cents"),
        F.sum(total)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_cents"),
    )


def q_segment_custkeys_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: EXCEPT + INTERSECT branches tagged and unioned."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    only_orders = with_orders.exceptAll(building).distinct()
    both = with_orders.intersect(building)
    return only_orders.withColumn("side", F.lit("orders_not_building")).unionByName(
        both.withColumn("side", F.lit("building_with_orders"))
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column DISTINCT aggregation.

    Decomposed into independent distinct->count passes joined on a
    1-row broadcast: N countDistinct columns in one agg triggers an
    Expand (N+1x row multiplication into a single-group reduce),
    while each distinct->count is a partial-agg shuffle that stays
    parallel at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def dcount(col: str, alias: str) -> DataFrame:
        # NULL keys would form a group here but are excluded by SQL
        # COUNT(DISTINCT ...) — filter to match (latent on TPC-H keys)
        return (
            li.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.lit(1))
            .agg(F.count("*").alias(alias))
        )

    return (
        dcount("l_partkey", "n_parts")
        .crossJoin(F.broadcast(dcount("l_suppkey", "n_supps")))
        .crossJoin(F.broadcast(dcount("l_orderkey", "n_orders")))
        .crossJoin(F.broadcast(li.agg(F.count("*").alias("n_rows"))))
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ / numeric quantile sketch),
    oracle-checkable.

    Sketch estimates are engine-specific, so the raw estimate can
    never hash-match a DuckDB oracle. Instead the query emits the
    EXACT values plus booleans asserting the Spark sketches land
    within their documented error bounds — the oracle emits the same
    exact values with literal TRUEs, so the hash gate passes iff the
    sketches actually hold their bounds on this data. (The sketch
    estimates themselves stay bound-checked in test_properties.py.)

    At 100 TB the point of the sketch path is one map-side partial
    HLL register set per task instead of a count-distinct shuffle;
    the exact twins here are affordable because the check runs at
    oracle SF only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # One sketch pass (map-side partial HLL/KLL registers, no Expand).
    sketches = li.agg(
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("_approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_approx_median"),
    )
    # Exact distinct counts as separate distinct->count passes: mixing
    # several DISTINCT aggregates in one agg triggers an Expand (row
    # multiplication) into a single-group reduce — measured 5x slower
    # at sf0.1 and worse with scale. distinct->count is a partial-agg
    # shuffle each, fully parallel.
    # NULL-key groups excluded to match SQL COUNT(DISTINCT ...)
    exact_parts = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy("l_partkey")
        .agg(F.lit(1))
        .agg(F.count("*").alias("exact_parts"))
    )
    exact_orders = (
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.lit(1))
        .agg(F.count("*").alias("exact_orders"))
    )
    # Median check by RANK, not by value: percentile_approx's contract
    # is rank error <= 1/accuracy (1e-4 at the default 10000), so the
    # scalable assertion is "the fraction of rows at or below the
    # estimate is 0.5 +/- 0.005". An exact percentile twin would drag
    # every value into one reducer — the non-scalable shape.
    # Tie-tolerant: with tie-heavy values the <=-fraction can jump
    # past 0.505 by the tie mass even when the sketch meets its rank
    # contract, so assert frac(<) <= 0.505 AND frac(<=) >= 0.495 —
    # the estimate's rank INTERVAL straddles the median.
    # r14 opt round: the 1-row sketch frame used to be referenced
    # TWICE — as the final output's left side AND (projected to
    # _approx_median) as the broadcast inside this rank check — and
    # Spark re-executes an unmaterialized subtree per reference, so
    # the sketch pass scanned lineitem twice per run. The rank check
    # now broadcasts the FULL 1-row sketch frame and carries the
    # sketch columns through its aggregate with first() (constant
    # across the crossJoined rows — identical values), so the sketch
    # subtree appears exactly once in the plan: 5 lineitem scans -> 4
    # (guide §2.4: remove duplicate passes). Empty-input parity: with
    # an empty table the exact-count subframes are empty, so the final
    # crossJoin output is empty under both shapes.
    median_rank = (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(sketches))
        .agg(
            F.first("_approx_parts").alias("_approx_parts"),
            F.first("_approx_orders").alias("_approx_orders"),
            (
                F.sum(
                    (F.col("l_extendedprice") < F.col("_approx_median")).cast(
                        "long"
                    )
                )
                / F.count("*")
            ).alias("_median_rank_lt"),
            (
                F.sum(
                    (F.col("l_extendedprice") <= F.col("_approx_median")).cast(
                        "long"
                    )
                )
                / F.count("*")
            ).alias("_median_rank_le"),
        )
    )
    # approx_count_distinct default rsd=0.05: assert within 3*rsd.
    return (
        median_rank.crossJoin(F.broadcast(exact_parts))
        .crossJoin(F.broadcast(exact_orders))
        .select(
            "exact_parts",
            "exact_orders",
            (
                F.abs(F.col("_approx_parts") - F.col("exact_parts")) * 100
                <= F.col("exact_parts") * 15
            ).alias("parts_within_15pct"),
            (
                F.abs(F.col("_approx_orders") - F.col("exact_orders")) * 100
                <= F.col("exact_orders") * 15
            ).alias("orders_within_15pct"),
            (
                (F.col("_median_rank_lt") <= 0.505)
                & (F.col("_median_rank_le") >= 0.495)
            ).alias("median_rank_within_halfpct"),
        )
    )


APPROX_PCT_PERMILLE = (250, 500, 750, 950)  # swept quantiles
APPROX_PCT_SLACK_PERMILLE = 5  # rank tolerance beyond the sketch's 1e-4


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-quantile sketch (KLL-style percentile_approx),
    oracle-checkable: per event_type, the exact row count plus one
    boolean per swept quantile asserting the sketch estimate's RANK
    interval straddles the target quantile — the approx_distinct
    pattern extended to a grouped quantile VECTOR (the p50/p95
    latency-dashboard shape every telemetry pipeline serves).

    Rank check, tie-tolerant and integer-exact: for target q with
    slack s (both permille), assert 1000 * count(v < est) <=
    (q + s) * n + 1000 AND 1000 * count(v <= est) >= (q - s) * n -
    1000 — the +-1000 absorbs single-row discreteness at small
    groups, and comparing products keeps both engines in BIGINT
    arithmetic (no float division to disagree on). The oracle emits
    the exact counts with literal TRUEs, so the hash gate passes iff
    the sketch held its contract on this data.

    Scale shape: ONE sketch aggregation (map-side partial KLL
    registers per task — the whole point vs an exact percentile's
    single-reducer sort), the per-group estimates broadcast back for
    the rank-count pass, one more grouped aggregation. Never a
    global sort, never a per-group value collect."""
    ev = load_table(spark, sf_dir, "events")
    v = cents(F.col("value"))
    base = ev.select("event_type", v.alias("_v"))
    qs = [p / 1000 for p in APPROX_PCT_PERMILLE]
    sk = base.groupBy("event_type").agg(
        F.percentile_approx("_v", qs).alias("_est")
    )
    j = base.join(F.broadcast(sk), "event_type")
    counts = j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        *[
            F.sum(
                (F.col("_v") < F.element_at(F.col("_est"), i + 1)).cast(
                    "long"
                )
            ).alias(f"_lt{i}")
            for i in range(len(qs))
        ],
        *[
            F.sum(
                (F.col("_v") <= F.element_at(F.col("_est"), i + 1)).cast(
                    "long"
                )
            ).alias(f"_le{i}")
            for i in range(len(qs))
        ],
    )
    s = APPROX_PCT_SLACK_PERMILLE
    checks = [
        (
            (
                F.col(f"_lt{i}") * 1000
                <= (p + s) * F.col("n_events") + 1000
            )
            & (
                F.col(f"_le{i}") * 1000
                >= (p - s) * F.col("n_events") - 1000
            )
        ).alias(f"p{p}_rank_ok")
        for i, p in enumerate(APPROX_PCT_PERMILLE)
    ]
    return counts.select("event_type", "n_events", *checks)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters (frequent-items sketch) with an oracle-checkable
    inclusion guarantee — the skew-detection primitive of a 100 TB
    pipeline (find the keys that will blow up a shuffle BEFORE
    shuffling on them).

    `DataFrame.stat.freqItems` is a single-pass streaming-summary
    sketch (Karp-Shenker-Papadimitriou); its contract is that every
    item with frequency >= support IS returned (false positives
    possible, false negatives not). Like approx_distinct, the sketch
    output itself can't hash-match another engine, so the query emits
    exact per-item counts plus the membership boolean the contract
    guarantees: every event_type here holds ~20% share >> the 5%
    support, so `in_sketch` must be TRUE row-for-row and the oracle
    emits literal TRUE.
    """
    events = load_table(spark, sf_dir, "events")
    exact = events.groupBy("event_type").agg(F.count("*").alias("n_events"))
    fi = events.stat.freqItems(["event_type"], support=0.05)
    return exact.crossJoin(F.broadcast(fi)).select(
        "event_type",
        "n_events",
        F.array_contains(
            F.col("event_type_freqItems"), F.col("event_type")
        ).alias("in_sketch"),
    )


def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap detection + running session ids.

    Two stacked windows over the same (user_id, event order)
    partitioning — one shuffle, both windows in one physical stage.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    base = events.select(
        "user_id", "event_id", ms_of(events, "ts").alias("ms")
    ).withColumn("prev_ms", F.lag("ms").over(w))
    flagged = base.withColumn(
        "new_session",
        F.when(
            F.col("prev_ms").isNull() | (F.col("ms") - F.col("prev_ms") > 1800000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
    )


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day buckets by integer division of epoch-ms."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            (ms_of(events, "ts") / F.lit(86400000)).cast("long").alias("day_bucket"),
            "event_type",
            cents(F.col("value")).alias("value_cents"),
        )
        .groupBy("day_bucket", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value_cents").alias("sum_value_cents"))
    )


def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention-cohort triangle: users grouped by first-seen
    day (integer epoch-day bucket, the q_events_daily idiom — robust
    to the testdata's physical ts encoding via ms_of), counted on each
    later active day as an offset from their cohort day. THE
    product-analytics view every event warehouse serves.

    Scale shape: one (user, day) distinct pass (this is the dedup
    shuffle — a user's many events per day collapse before anything
    wide happens), one user-keyed window for the cohort day, and one
    bounded (cohort, offset) aggregation. After the distinct, each
    user appears at most once per (cohort_day, day_offset), so
    count(*) IS the distinct-user count — no second distinct needed
    (the twin relies on the same invariant)."""
    events = load_table(spark, sf_dir, "events")
    day = (ms_of(events, "ts") / F.lit(86400000)).cast("long")
    ud = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id")
    base = ud.withColumn("cohort_day", F.min("day").over(w))
    return (
        base.select(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: price above brand average (window form)."""
    part = load_table(spark, sf_dir, "part")
    wb = Window.partitionBy("p_brand")
    pc = cents(F.col("p_retailprice"))
    # price > avg  <=>  price * n > sum : pure integer compare, no
    # double->int cast (DuckDB rounds those, Spark truncates).
    return (
        part.withColumn("price_cents", pc)
        .withColumn("brand_sum", F.sum(pc).over(wb))
        .withColumn("brand_n", F.count("*").over(wb))
        .filter(F.col("price_cents") * F.col("brand_n") > F.col("brand_sum"))
        .select("p_partkey", "p_brand", "price_cents")
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/date/math function library over orders."""
    orders = load_table(spark, sf_dir, "orders")
    ts = ts_of(orders, "o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(ts).cast("long").alias("order_year"),
        F.month(ts).cast("long").alias("order_month"),
        F.unix_millis(F.date_trunc("month", ts)).alias("month_start_ms"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.length("o_orderstatus").cast("long").alias("status_len"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("tag"),
        F.abs(cents(F.col("o_totalprice")) - F.lit(100000)).alias("abs_diff_cents"),
    )


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts as columns."""
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    out = piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in ("click", "error", "purchase", "signup", "view")
        ],
    )
    return out


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event (activation) picks up the user's
    most recent purchase at-or-before it (operators/asof.py; DuckDB
    native ASOF JOIN is the oracle)."""
    from .operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("activation_id"),
        "user_id",
        ms_of(events, "ts").alias("ts_ms"),
    )
    right = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", ms_of(events, "ts").alias("ts_ms"))
        .agg(
            F.max(F.floor(F.col("value") * 100).cast("long")).alias(
                "purchase_cents"
            )
        )
    )
    return asof_join(
        left, right, key="user_id", ts="ts_ms", payload_cols=["purchase_cents"]
    )


def q_range_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within ±60s of each error event,
    via the banded equi-join operator (operators/range_join.py)."""
    from .operators.range_join import range_join

    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("activation_id"), ms_of(events, "ts").alias("ms")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), ms_of(events, "ts").alias("ms")
    )
    return (
        range_join(errors, purchases, point="ms", radius=60_000)
        .groupBy("activation_id")
        .agg(F.count("*").alias("n_nearby_purchases"))
    )


def q_json_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + array scalar functions: build a JSON doc per row (same
    string both engines), extract typed fields back out, and exercise
    array construct/aggregate/predicate ops."""
    from .tables import spread_if_undersplit

    # the per-row work (from_json parse + sequence/aggregate lambdas)
    # is the whole query, and the projection runs interpreted (no
    # codegen id in the plan) — at sf0.1 the single-split orders scan
    # serialized it on one core (0.61 s). Spread so the map-only work
    # uses the cluster; at real scale the scan has thousands of splits
    # and the branch disappears (r14 opt round, guide §2.5 input skew).
    orders = spread_if_undersplit(spark, load_table(spark, sf_dir, "orders"))
    js = F.concat(
        F.lit('{"k":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"p":"'),
        F.col("o_orderpriority"),
        F.lit('"}'),
    )
    arr = F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 1).cast("int"))
    words = F.split("o_orderpriority", "-")
    # one from_json parse serves both extractions: project the parsed
    # STRUCT once and take its fields in an outer select — two
    # getField(from_json(...)) expressions in one projection measured
    # 1.8x the single-parse plan (codegen does not CSE the parse);
    # get_json_object per field re-parses too
    parsed = F.from_json(js, "k BIGINT, p STRING")
    return orders.select(
        "o_orderkey",
        parsed.alias("j"),
        F.size(arr).cast("long").alias("arr_len"),
        F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("arr_sum"),
        F.array_contains(arr, F.lit(3)).alias("arr_has_3"),
        F.element_at(words, 1).alias("prio_word"),
        F.array_join(F.sort_array(words), "|").alias("sorted_words"),
    ).select(
        "o_orderkey",
        F.col("j.k").alias("json_key"),
        F.col("j.p").alias("json_prio"),
        "arr_len",
        "arr_sum",
        "arr_has_3",
        "prio_word",
        "sorted_words",
    )


def q_events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate at two resolutions in one
    pass: hourly and daily event counts via GROUPING SETS (one shuffle,
    map-side partials for both granularities)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        (ms_of(events, "ts") / F.lit(3600000)).cast("long").alias("hour_bucket"),
        (ms_of(events, "ts") / F.lit(86400000)).cast("long").alias("day_bucket"),
        "event_type",
        "value",
    )
    base.createOrReplaceTempView("ev_buckets")
    return spark.sql(
        """
        SELECT CASE WHEN hour_bucket IS NOT NULL THEN 'hour' ELSE 'day' END
                 AS resolution,
               coalesce(hour_bucket, day_bucket) AS bucket,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents
        FROM ev_buckets
        GROUP BY GROUPING SETS ((hour_bucket, event_type),
                                (day_bucket, event_type))
        """
    )


def q_event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the per-user event-type count matrix back to
    long form — wide->long is the inverse surface of q_event_type_pivot
    and stays a single aggregation + local expand (no extra shuffle)."""
    types = ("click", "error", "purchase", "signup", "view")
    wide = q_event_type_pivot(spark, sf_dir).select(
        "user_id", *[F.col(f"n_{t}").alias(t) for t in types]
    )
    return wide.unpivot(
        ids=["user_id"],
        values=list(types),
        variableColumnName="event_type",
        valueColumnName="n",
    )


def q_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per priority —
    the continuous-quantile aggregate family (p25/p50/p75 + count).
    Single agg shuffle on a 5-value key; percentile is an exact
    sort-based aggregate (vs approx_distinct's sketch)."""
    orders = load_table(spark, sf_dir, "orders")
    # one percentile(..., array(...)) evaluation instead of three:
    # each percentile() call buffers+sorts the group separately, so
    # folding them into one array-quantile aggregate is a 3x cut in
    # sort work (and one pass at scale)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.percentile(
                "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("_p"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("_p")[0].alias("p25"),
            F.col("_p")[1].alias("p50"),
            F.col("_p")[2].alias("p75"),
        )
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: per user, the first view, the first
    click AFTER that view, and the first purchase AFTER that click —
    with the stage reached (1-3). The MATCH_RECOGNIZE-style pattern
    query of product analytics, expressed as staged conditional
    aggregations.

    Scale shape: three aggregations and two joins, ALL keyed on
    user_id — one hash partitioning carried through the whole plan
    (AQE reuses the exchange), no window over the raw event stream,
    no self-join amplification.
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_type", ms_of(events, "ts").alias("ms")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("view_ms"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ms") > F.col("view_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("click_ms"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ms") > F.col("click_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("purchase_ms"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ms",
            "click_ms",
            "purchase_ms",
            (
                F.lit(1)
                + F.col("click_ms").isNotNull().cast("int")
                + F.col("purchase_ms").isNotNull().cast("int")
            )
            .cast("long")
            .alias("stage"),
        )
    )


def q_lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (returnflag, linestatus) — all four
    grouping combinations in ONE pass; `grouping_id()` disambiguates
    aggregate NULLs from data NULLs. Spark plans this as a single
    Expand + hash aggregate (4x row expansion into map-side partials,
    one shuffle), the standard multi-grouping strategy; at 100 TB the
    expansion factor is the fixed grouping-set count, not data-driven.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("g_id"),
        F.count("*").alias("n"),
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
    )


def q_customer_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: NTILE quartile bands and exact
    cumulative-distribution ranks of customers by account balance
    within nation. One hash exchange on the nation key feeds every
    window (shared partitioning); the nation dim is a broadcast.
    Ordering is made total with the custkey tiebreak so both engines
    band identically."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    bal = cents(F.col("c_acctbal"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("acctbal_cents"), F.col("c_custkey")
    )
    return (
        cust.select("c_custkey", "c_nationkey", bal.alias("acctbal_cents"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "n_name",
            "acctbal_cents",
            F.ntile(4).over(w).cast("long").alias("band"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


# deterministic change-set derivation for the MERGE demo: keys
# hitting these moduli become deletes / updates / inserts
MERGE_DELETE_MOD = 13
MERGE_UPDATE_MOD = 10
MERGE_INSERT_MOD = 17
MERGE_INSERT_KEY_OFFSET = 3_000_000_000


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse MERGE INTO (upsert+delete) applied as changelog
    compaction: the change set (deletes for key % 13 == 0, updates
    with +100.00 for key % 10 == 0, inserts under offset keys for
    key % 17 == 0 — derived deterministically from the base so the
    oracle regenerates it) is UNIONed onto the base at a higher
    version and the survivor per key is the latest non-delete row.

    This is the S1 KTable-compaction machinery applied to batch table
    maintenance — one window pass partitioned by key, no join at all,
    the same single-exchange shape Delta/Iceberg MERGE compiles to
    when the change set is not broadcastable. Delete-vs-update
    precedence falls out of version ordering, not special cases.

    r14 opt round, evaluated and KEPT as the union: synthesizing the
    changelog scan-locally (explode of per-row role structs — one base
    scan instead of four) produced the identical row multiset but
    measured 0.49 -> 0.84 s (1.06 s with a pre-explode spread): the
    four single-split branch scans run as CONCURRENT single-task
    stages locally, which beats one serialized scan+explode, and the
    spread's exchange costs more than the duplicate decode it removes
    (the lineitem_cube finding again). In a real MERGE the change set
    is a different table, so the 4-scan shape is fixture-only anyway."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        cents(F.col("o_totalprice")).alias("totalprice_cents"),
        F.lit(0).alias("_v"),
        F.lit(False).alias("_del"),
    )
    key = F.col("o_orderkey")
    # delete outranks update (v=2 > v=1): a key divisible by both
    # moduli must deterministically resolve to the delete, as MERGE's
    # matched-clause order would
    deletes = orders.filter(key % MERGE_DELETE_MOD == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit(None).cast("long").alias("totalprice_cents"),
        F.lit(2).alias("_v"),
        F.lit(True).alias("_del"),
    )
    updates = (
        orders.filter((key % MERGE_UPDATE_MOD == 0))
        .select(
            "o_orderkey",
            "o_custkey",
            (cents(F.col("o_totalprice")) + 10000).alias("totalprice_cents"),
            F.lit(1).alias("_v"),
            F.lit(False).alias("_del"),
        )
    )
    inserts = orders.filter(key % MERGE_INSERT_MOD == 0).select(
        (key + MERGE_INSERT_KEY_OFFSET).alias("o_orderkey"),
        "o_custkey",
        F.lit(0).cast("long").alias("totalprice_cents"),
        F.lit(1).alias("_v"),
        F.lit(False).alias("_del"),
    )
    merged = base.unionByName(deletes).unionByName(updates).unionByName(
        inserts
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("_v").desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col("_del"))
        .select("o_orderkey", "o_custkey", "totalprice_cents")
    )


TOP_ORDERS_PER_CUSTOMER = 3


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group: each customer's 3 largest orders by value —
    the canonical rank-filter window (ONE exchange on the group key;
    a groupBy+join or per-group sort-limit would shuffle twice).
    Deterministic total order via the orderkey tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("totalprice_cents").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            cents(F.col("o_totalprice")).alias("totalprice_cents"),
        )
        .withColumn("order_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("order_rank") <= TOP_ORDERS_PER_CUSTOMER)
    )


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: all customer-name pairs
    within Levenshtein distance 1, via deletion-neighborhood
    candidate blocking + exact verify (operators/fuzzy.py) — never
    an all-pairs comparison."""
    from .functions.dedup import _cached_frame
    from .operators.fuzzy import edit_distance_pairs
    from .tables import spread_if_undersplit

    # the variant build is CPU-heavy per-row work (len(s)+1 substring
    # constructions + xxhash each) — spread the undersplit local scan
    # so it doesn't serialize on a few cores (measured r14: the build
    # stage ran 7 tasks on 32 cores at sf0.1; at real scale the scan
    # has thousands of splits and this branch disappears)
    cust = spread_if_undersplit(
        spark, load_table(spark, sf_dir, "customer")
    ).select("c_custkey", "c_name")
    return edit_distance_pairs(
        cust,
        "c_custkey",
        "c_name",
        # the variant-hash table is a session artifact like the dedup
        # signature frames: built once, read by both join sides
        variant_cache=lambda build: _cached_frame(
            spark, sf_dir, "fuzzy_variants", build
        ),
    )


DEBOUNCE_MS = 3_600_000  # drop repeats within an hour of the previous


def q_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream debounce: within each (user, event_type) series,
    drop events arriving less than DEBOUNCE_MS after the previous
    event — the telemetry-hygiene dedup run before counting anything
    (double-fired clicks, retried error beacons). Retained rows carry
    their gap (NULL for the first event of a series — ADVICE r8: a
    sentinel value would be indistinguishable from a genuine
    out-of-order gap of the same magnitude; negative gaps from
    ts-decreasing event sequences stay visible and retained, they are
    reorderings, not debounce repeats).

    Lag-vs-previous-event semantics (not previous RETAINED event):
    expressible as ONE window pass in any engine, deterministic, and
    the standard debounce; the chain-collapsing variant needs a
    sequential scan both engines would pay a per-key sort for anyway.
    Scale shape: one hash exchange on (user_id, event_type) — the
    same partitioning the sessionizer uses — and a scan-local filter;
    robust to the testdata's physical ts encoding via ms_of."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    base = events.select(
        "user_id",
        "event_type",
        "event_id",
        ms_of(events, "ts").alias("_ms"),
    ).withColumn("_prev_ms", F.lag("_ms").over(w))
    gap = (F.col("_ms") - F.col("_prev_ms")).cast("long")
    return (
        base.select("user_id", "event_type", "event_id", gap.alias("gap_ms"))
        .filter(
            F.col("gap_ms").isNull()
            | (F.col("gap_ms") < 0)
            | (F.col("gap_ms") >= DEBOUNCE_MS)
        )
    )
