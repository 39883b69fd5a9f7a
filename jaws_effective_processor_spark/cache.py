"""Session-scoped DataFrame materialization cache.

Several operator families materialize a derived frame once per
(session, sf_dir) — the alarm monolog, the incremental base snapshot,
the dedup signature tables — mirroring the state stores / persisted
artifacts a deployed pipeline keeps (see pipeline.alarm_monolog).

The cache is keyed WEAKLY on the SparkSession: a plain module-level
dict keyed by (session, ...) pins both the driver-side plan objects
and the executor storage of every stopped session for the life of the
process (real in long-lived multi-session processes such as the test
suite). A WeakKeyDictionary drops a session's whole entry map when the
session itself is garbage, so cached frames die with their session.
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class SessionFrameCache:
    """get_or_build(spark, key, build) -> build().cache(), memoized
    per (session, key); entries evaporate with the session."""

    def __init__(self) -> None:
        self._by_session: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
            weakref.WeakKeyDictionary()
        )

    def get_or_build(
        self,
        spark: SparkSession,
        key: tuple,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        per = self._by_session.get(spark)
        if per is None:
            per = {}
            self._by_session[spark] = per
        df = per.get(key)
        if df is None:
            df = build().cache()
            per[key] = df
        return df

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
