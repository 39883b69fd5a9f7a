"""Incremental maintenance of the effective-alarm snapshot.

The reference is a continuously-updating KTable pipeline: every new
record updates ONLY its own alarm key (Kafka Streams state stores are
per-key incremental by construction). The batch analog at 100 TB must
not re-run the whole pipeline when a day of new events arrives — it
should recompute only the PARTITIONS OF KEYS the delta touches and
carry every other row of the previous snapshot forward unchanged.

`incremental_effective_alarms` demonstrates exactly that contract on
the driver's fixtures, split at the median event id:

    base    = full pipeline over events with seq <= S   (the "yesterday
              snapshot" a real deployment would have persisted)
    delta   = events with seq > S
    touched = distinct alarm names appearing in the delta
    result  = base rows for untouched names
              UNION pipeline re-run restricted to touched names

The correctness claim — incremental == full recompute — IS the oracle:
the registered DuckDB twin is the plain full-snapshot SQL
(EFFECTIVE_ALARMS_SQL), so the driver's hash check proves the delta
path loses nothing. Scale shape: `touched` is a small distinct set
(broadcast); the base snapshot is anti-joined against it (broadcast
hash anti — no shuffle of the base), and the re-run pipeline reads
only delta-touched keys (at real scale, with the event log partitioned
by key range, that scan prunes to the touched partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import adapters
from ..cache import SessionFrameCache
from ..tables import load_table


def snapshot_split_seq(events: DataFrame) -> DataFrame:
    """1-row frame holding the split point (median event id) — the
    deterministic stand-in for 'the seq the previous run ended at'."""
    return events.agg(
        F.expr("max(event_id) DIV 2").cast("long").alias("split_seq")
    )


_BASE_SNAPSHOT_CACHE = SessionFrameCache("incremental_base_snapshot")


def _base_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'yesterday snapshot' (pipeline over events with seq <=
    split), cached per (session, sf_dir): in a real deployment this is
    a PERSISTED artifact the incremental run reads, not something it
    recomputes — and both the incremental and CDC operators consume
    the same one. Cache() is the session-scoped stand-in for that
    persisted snapshot."""

    def _build():
        from ..pipeline import effective_alarms_from_events

        events = load_table(spark, sf_dir, "events")
        ev = events.join(F.broadcast(snapshot_split_seq(events)))
        base_events = ev.filter(
            F.col("event_id") <= F.col("split_seq")
        ).drop("split_seq")
        return effective_alarms_from_events(spark, base_events)

    return _BASE_SNAPSHOT_CACHE.get_or_build(spark, (sf_dir,), _build)


def incremental_effective_alarms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..pipeline import OUTPUT_COLS, effective_alarms_from_events

    events = load_table(spark, sf_dir, "events")
    split = snapshot_split_seq(events)

    # scalar split seq via broadcast 1-row cross join (never collected)
    ev = events.join(F.broadcast(split))
    base_events = ev.filter(F.col("event_id") <= F.col("split_seq")).drop(
        "split_seq"
    )

    base = _base_snapshot(spark, sf_dir)

    # Keys the delta touches directly — PLUS keys whose override
    # expiration crosses between the base and full snapshot clocks:
    # wall-clock timers (W1/W2, ShelveExpirationRule/OnDelayExpiration-
    # Rule) change a key's state with NO new event on it, so an
    # expiration firing in the window counts as touched. A coarse
    # superset (any override record whose expiration lies in the
    # window) is fine — recomputing an unchanged key is wasted work,
    # never a wrong answer.
    #
    # Scan discipline: every event type maps to exactly one of the
    # three logs (signup -> instances; error/view/click -> activations;
    # purchase -> overrides — adapters.py module doc), so "names the
    # delta touches" is ONE scan of the delta with a type gate, not a
    # 3-way union of per-log scans. Both snapshot clocks likewise fold
    # into ONE 1-row aggregate (max event time overall / up to the
    # split) instead of two separate scans. The touched plan is
    # broadcast from two places (anti-join + semi-join) and its subtree
    # executes per broadcast, so keeping it single-scan matters twice.
    clocks = ev.select(
        adapters.event_ms(ev).alias("ems"), "event_id", "split_seq"
    ).agg(
        F.max("ems").alias("full_ms"),
        F.max(F.when(F.col("event_id") <= F.col("split_seq"), F.col("ems")))
        .alias("base_ms"),
    )
    expired_in_window = (
        adapters.overrides_log(base_events)
        .join(F.broadcast(clocks))
        .filter(
            (F.col("expiration") > F.col("base_ms"))
            & (F.col("expiration") <= F.col("full_ms"))
        )
        .select("name")
    )
    # the type gate and key derivation are the adapters' own constants
    # (LOG_EVENT_TYPES / alarm_name_expr), so a newly-routed event
    # type or a changed key format widens this gate automatically —
    # a stale inline copy here would silently carry touched keys
    # forward unrecomputed
    delta_touched = (
        ev.filter(F.col("event_id") > F.col("split_seq"))
        .filter(F.col("event_type").isin(*adapters.LOG_EVENT_TYPES))
        .select(adapters.alarm_name_expr().alias("name"))
    )
    # Materialize the two frames every downstream branch re-reads,
    # exactly as a real incremental job stages its delta before the
    # recompute. Without this, Catalyst re-inlines the touched/delta
    # subtrees into every consumer — the three log projections, the
    # snapshot clock, the anti- and semi-joins — compounding to ~39
    # scans of the event log and ~70 exchanges in ONE plan (measured
    # at r4); with it the delta is scanned once and reused. Lazy
    # (eager=False): the cost lands inside the query's own execution,
    # not at build time.
    touched = (
        delta_touched.unionByName(expired_in_window)
        .distinct()
        .localCheckpoint(eager=False)
    )

    # no broadcast hint on purpose: touched is tiny after the distinct
    # and AQE picks broadcast from the runtime size; a very wide delta
    # (touched ~ all keys) can exceed the broadcast limit, and then the
    # right plan is a shuffled join — let AQE make that call.
    carried = base.join(touched, "name", "left_anti")
    # the re-run still reads the FULL log for touched keys (state is
    # key-complete, not delta-only), but only for those keys — with a
    # key-partitioned log this scan prunes to the touched partitions
    touched_events = (
        ev.drop("split_seq")
        .join(
            touched,
            adapters.alarm_name_expr() == F.col("name"),
            "left_semi",
        )
        .localCheckpoint(eager=False)
    )
    recomputed = effective_alarms_from_events(
        spark, touched_events, clock_events=events
    )
    return carried.unionByName(recomputed).select(*OUTPUT_COLS)


def alarm_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshot versions: what changed between the
    base (seq <= split) and current effective-alarm snapshots —
    `added` / `removed` / `changed` rows with before/after state,
    rows with unchanged state suppressed. This is the changelog a
    downstream consumer would ingest instead of re-reading the whole
    snapshot — the batch analog of the topic the reference publishes
    (every KTable update IS a CDC record).

    Scale shape: both snapshot plans share the event scan; the diff is
    one full-outer join on the alarm key followed by a row-local
    compare — no extra shuffles beyond the two pipelines.
    """
    from ..pipeline import effective_alarms

    base = _base_snapshot(spark, sf_dir).select(
        "name", F.col("state").alias("state_before")
    )
    # the "after" side IS the flagship snapshot — reuse its cached
    # monolog instead of re-deriving the full pipeline
    cur = effective_alarms(spark, sf_dir).select(
        "name", F.col("state").alias("state_after")
    )
    j = base.join(cur, "name", "full_outer")
    return j.select(
        "name",
        F.when(F.col("state_before").isNull(), F.lit("added"))
        .when(F.col("state_after").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        "state_before",
        "state_after",
    ).filter(
        F.col("state_before").isNull()
        | F.col("state_after").isNull()
        | (F.col("state_before") != F.col("state_after"))
    )
