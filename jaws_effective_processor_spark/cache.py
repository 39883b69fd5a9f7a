"""Session-scoped DataFrame materialization cache.

Several operator families materialize a derived frame once per
(session, sf_dir) — the alarm monolog, the incremental base snapshot,
the dedup signature tables — mirroring the state stores / persisted
artifacts a deployed pipeline keeps (see pipeline.alarm_monolog).

Lifetime discipline, in two layers:

- The map is keyed WEAKLY on the SparkSession. On its own that is NOT
  sufficient: the cached DataFrames (the values) hold strong
  references back to their session, so a WeakKeyDictionary entry
  whose value references its key is never collectable (the weakref
  module documents exactly this trap). The weak keying still helps
  for sessions released before any frame was cached, but it cannot
  free a populated entry.
- Therefore every access also PURGES entries whose session has been
  stopped (`spark._jsc` is None after SparkSession.stop()). Dropping
  the entry map releases the DataFrames, which releases the py4j
  plan objects and breaks the value->key cycle, so the stopped
  session itself becomes collectable. Executor storage needs no
  unpersist — it died with the session's JVM state.
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _is_stopped(spark: SparkSession) -> bool:
    try:
        return spark._jsc is None  # cleared by SparkSession.stop()
    except Exception:
        return True


# Bench/test observability hook (r15, VERDICT r14 item 3): when set to
# a list, every SessionFrameCache read appends its (sf_dir, tag) key —
# bench.py records, per query, which session ARTIFACTS the query's
# timed body serves from, so warm per-query numbers can be told apart
# from pure-compute numbers in BENCH_DETAIL.json. Plan-only memos
# (SessionPlanCache) are excluded: they pin no data, only resolved
# file listings. No effect when unset; never touched by query code.
_TOUCH_LOG: list | None = None


def set_touch_log(log: list | None) -> None:
    global _TOUCH_LOG
    _TOUCH_LOG = log


class SessionFrameCache:
    """get_or_build(spark, key, build) -> build().cache(), memoized
    per (session, key); stopped sessions' entries are purged on the
    next access from any session."""

    def __init__(self, label: str | None = None) -> None:
        # label: human-readable family name used by the touch log for
        # caches keyed on (sf_dir,) alone (monolog/history/snapshot)
        self.label = label
        self._by_session: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
            weakref.WeakKeyDictionary()
        )

    def _purge_stopped(self) -> None:
        for sess in [s for s in self._by_session if _is_stopped(s)]:
            self._by_session[sess].clear()
            del self._by_session[sess]

    def get_or_build(
        self,
        spark: SparkSession,
        key: tuple,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        self._purge_stopped()
        if _TOUCH_LOG is not None and type(self) is SessionFrameCache:
            tag = key[-1] if len(key) > 1 else (self.label or "frame")
            _TOUCH_LOG.append(str(tag))
        per = self._by_session.get(spark)
        if per is None:
            per = {}
            self._by_session[spark] = per
        df = per.get(key)
        if df is None:
            df = self._wrap(build())
            per[key] = df
        return df

    def _wrap(self, df: DataFrame) -> DataFrame:
        return df.cache()

    def clear(self) -> None:
        """Unpersist and drop everything (test hook)."""
        for per in self._by_session.values():
            for df in per.values():
                try:
                    df.unpersist()
                except Exception:  # session may already be stopped
                    pass
            per.clear()
        self._by_session.clear()


class SessionPlanCache(SessionFrameCache):
    """Plan-only memo: same per-(session, key) lifetime discipline as
    SessionFrameCache but WITHOUT persisting the data. Reusing the
    DataFrame object reuses its resolved relation — file listing and
    parquet footer schema — which otherwise cost ~0.1 s of driver-side
    work PER spark.read call (measured at sf0.1; at cluster scale the
    relisting is an object-store LIST per query). Every execution
    still scans parquet with full column pruning / predicate pushdown
    — nothing is pinned in executor storage.

    Safe only for immutable paths: a memoized relation serves a STALE
    file listing if files are rewritten underneath it (the driver's
    testdata tables never are; writers like write_corpus_shards must
    not route reads through this)."""

    def _wrap(self, df: DataFrame) -> DataFrame:
        return df
