"""Spark 4 `transformWithState` processors — the production path for
the reference's per-key state machines and wall-clock timers.

`applyInPandasWithState` (streaming/processors.py) covers the same
semantics on the older API; these StatefulProcessor implementations
are the exact-fit mapping SURVEY.md §2.5/§2.7 calls for:

- TransitionProcessor  = T1 (PreviousActiveStateStore,
  ActivationRule.java:323-429): ValueState holding the previous
  activation per alarm.
- ExpirationProcessor  = W1/W2 (ShelveExpirationRule.java:105-190,
  OnDelayExpirationRule.java:108-196): ValueState + a REAL per-key
  processing-time timer — registerTimer/handleExpiredTimer replaces
  the reference's JVM-global Cancellable registry, and the state
  store replaces its double-cancel race guard (timer updates are
  transactional per key, ShelveExpirationRule.java:171-179).

Scale: state lives in the Structured Streaming state store (RocksDB
provider at scale), partitioned by the grouping key — the same
alarm-name partitioning every other stage uses, so no extra shuffle.

Environment gate: the transformWithState Python driver worker speaks
protobuf to the JVM state server; containers without `google.protobuf`
cannot run it (check `tws_available()`). Semantics are covered either
way — streaming/processors.py implements the same machines on
applyInPandasWithState, and the two are asserted equivalent where the
dependency exists (tests/test_tws.py).

Install attempt (round 4, 2026-08-14): `pip download protobuf`
fails with "No matching distribution found" — the container has no
route to PyPI — and no protobuf wheel or importable `google.protobuf`
package exists anywhere on the filesystem (searched /opt, /usr,
site-packages; only typeshed stubs and shaded JVM jars). The
dependency cannot be installed in this environment; the two
tests/test_tws.py skips are permanent here and the
applyInPandasWithState twins carry the tested semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

def tws_available() -> bool:
    """True if the transformWithState driver worker can run here (it
    needs google.protobuf to talk to the JVM state server)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


TRANSITION_OUT_SCHEMA = (
    "name string, seq long, active boolean, "
    "transition_to_active boolean, transition_to_normal boolean"
)

EXPIRATION_OUT_SCHEMA = "name string, tombstone boolean, expiration long"

# past-due expirations fire after this clamp, not immediately
# (ShelveExpirationRule.java:141-145)
PAST_DUE_CLAMP_MS = 1000


class TransitionProcessor(StatefulProcessor):
    """T1 — active/normal transition detection per alarm."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._prev = handle.getValueState("prev_active", "active boolean")

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(
            "seq", kind="stable"
        )
        prev = bool(self._prev.get()[0]) if self._prev.exists() else False
        # NoActivation and tombstone normalize to not-active
        # (ActivationRule.java:392-395,362-385); vectorized scan —
        # same machine as processors.transition_fn
        from .processors import transition_flags

        cur = (pdf["union_type"] == "Activation").to_numpy(dtype=bool)
        to_active, to_normal, final = transition_flags(cur, prev)
        self._prev.update((final,))
        yield pd.DataFrame(
            {
                "name": key[0],
                "seq": pdf["seq"].astype("int64").to_numpy(),
                "active": cur,
                "transition_to_active": to_active,
                "transition_to_normal": to_normal,
            }
        )

    def close(self) -> None:
        pass


class ExpirationProcessor(StatefulProcessor):
    """W1/W2 — per-key wall-clock override expiration with timers."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._exp = handle.getValueState("armed_expiration", "expiration long")

    def _disarm(self) -> None:
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._exp.clear()

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(
            "seq", kind="stable"
        )
        last = pdf.iloc[-1]
        # (re)arming always cancels the previous timer for the alarm
        # (ShelveExpirationRule.java:121-129)
        self._disarm()
        if not bool(last["tombstone"]) and not pd.isna(last["expiration"]):
            exp = int(last["expiration"])
            now = timerValues.getCurrentProcessingTimeInMs()
            self._exp.update((exp,))
            self._handle.registerTimer(max(exp, now + PAST_DUE_CLAMP_MS))
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        exp = int(self._exp.get()[0]) if self._exp.exists() else None
        self._disarm()
        yield pd.DataFrame(
            [{"name": key[0], "tombstone": True, "expiration": exp}]
        )

    def close(self) -> None:
        pass


def transitions_tws(activations: DataFrame) -> DataFrame:
    """T1 over transformWithState (input: seq,name,union_type)."""
    return activations.groupBy("name").transformWithStateInPandas(
        TransitionProcessor(),
        TRANSITION_OUT_SCHEMA,
        "append",
        "ProcessingTime",
    )


def expiration_tws(overrides: DataFrame, ovr_type: str) -> DataFrame:
    """W1 (Shelved) / W2 (OnDelayed) over transformWithState."""
    filtered = overrides.filter(F.col("type") == ovr_type)
    return filtered.groupBy("name").transformWithStateInPandas(
        ExpirationProcessor(),
        EXPIRATION_OUT_SCHEMA,
        "append",
        "ProcessingTime",
    )
