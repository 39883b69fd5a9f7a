"""Structured Streaming stateful processors (T1-T4, W1/W2, S1).

Each function is the `applyInPandasWithState` twin of a reference
Kafka Streams Processor + RocksDB store (SURVEY.md §2.5/§2.7): Spark's
checkpointed state store replaces RocksDB, GroupState timeouts replace
wall-clock punctuation. Rows inside a micro-batch are replayed in
`seq` order so per-key event order matches Kafka per-partition order
regardless of batch boundaries.

(Spark 4's transformWithState would be the native fit — per-key named
states + exact timers — but its driver worker needs google.protobuf,
absent in this container. applyInPandasWithState has the same
distribution/checkpoint properties; state is a single tuple per key.)

Scale: state is hash-partitioned by the grouping key across executors,
exactly Kafka Streams task partitioning; swap the state store provider
to RocksDB (`spark.sql.streaming.stateStore.providerClass`) for wide
key spaces.
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Iterator

import pandas as pd

TRANSITION_OUT = "name string, seq long, active boolean, " \
    "transition_to_active boolean, transition_to_normal boolean"
BOOL_STATE = "flag boolean"

LATCH_OUT = "name string, seq long, latching boolean"
ONDELAY_OUT = "name string, seq long, ondelaying boolean"
ONESHOT_OUT = "name string, seq long, unshelving boolean"

LATEST_OUT = "name string, seq long, payload string, deleted boolean"
LATEST_STATE = "seq long, payload string"

EXPIRATION_OUT = "name string, tombstone boolean, expiration long"
EXPIRATION_STATE = "expiration long"


def _ordered(rows: Iterable[pd.DataFrame]) -> pd.DataFrame:
    chunks = list(rows)
    if not chunks:
        return pd.DataFrame()
    pdf = pd.concat(chunks, ignore_index=True)
    return pdf.sort_values("seq", kind="stable")


def transition_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T1 — previous-activation store + transition flags
    (ActivationRule.java:323-429). NoActivation and tombstones
    normalize to not-active (ActivationRule.java:392-395)."""
    pdf = _ordered(rows)
    prev = bool(state.get[0]) if state.exists else False
    out = []
    for _, row in pdf.iterrows():
        cur = row["union_type"] == "Activation"
        out.append(
            {
                "name": key[0],
                "seq": int(row["seq"]),
                "active": cur,
                "transition_to_active": cur and not prev,
                "transition_to_normal": (not cur) and prev,
            }
        )
        prev = cur
    state.update((prev,))
    yield pd.DataFrame(out)


def latch_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T2 — latching persists from trigger until a Latched override is
    observed (LatchRule.java:177-205); guard: class registered+latchable."""
    pdf = _ordered(rows)
    latching = bool(state.get[0]) if state.exists else False
    out = []
    for _, row in pdf.iterrows():
        flag = False
        if not pd.isna(row["latchable"]) and bool(row["latchable"]):
            if bool(row["ov_latched"]):
                latching = False
            elif bool(row["transition_to_active"]):
                latching = True
            flag = latching
        out.append({"name": key[0], "seq": int(row["seq"]), "latching": flag})
    state.update((latching,))
    yield pd.DataFrame(out)


def ondelay_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T3 — identical machine for ondelaying (OnDelayRule.java:183-213)."""
    pdf = _ordered(rows)
    ondelaying = bool(state.get[0]) if state.exists else False
    out = []
    for _, row in pdf.iterrows():
        flag = False
        registered = not pd.isna(row["ondelayseconds"]) and (
            int(row["ondelayseconds"]) > 0
        )
        if registered:
            if bool(row["ov_ondelayed"]):
                ondelaying = False
            elif bool(row["transition_to_active"]):
                ondelaying = True
            flag = ondelaying
        out.append({"name": key[0], "seq": int(row["seq"]), "ondelaying": flag})
    state.update((ondelaying,))
    yield pd.DataFrame(out)


def oneshot_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T4 — unshelving persists from transition-to-normal while
    one-shot-shelved; the store write is unconditional so the state
    clears when the guard fails (OneShotRule.java:163-191)."""
    pdf = _ordered(rows)
    stored = bool(state.get[0]) if state.exists else False
    out = []
    for _, row in pdf.iterrows():
        unshelving = False
        if bool(row["shelved_oneshot"]):
            unshelving = stored
            if bool(row["transition_to_normal"]):
                unshelving = True
        stored = unshelving
        out.append({"name": key[0], "seq": int(row["seq"]), "unshelving": unshelving})
    state.update((stored,))
    yield pd.DataFrame(out)


def latest_per_key_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """S1 — KTable materialization: latest (seq, payload) per key; null
    payload = tombstone (RegistrationRule.java:81-89). Emits a
    changelog of latest values."""
    pdf = _ordered(rows)
    if pdf.empty:
        return
    last = pdf.iloc[-1]
    cur_seq = int(state.get[0]) if state.exists else -1
    if int(last["seq"]) > cur_seq:
        payload = None if pd.isna(last["payload"]) else str(last["payload"])
        state.update((int(last["seq"]), payload))
        yield pd.DataFrame(
            [
                {
                    "name": key[0],
                    "seq": int(last["seq"]),
                    "payload": payload,
                    "deleted": payload is None,
                }
            ]
        )


def expiration_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """W1/W2 — per-key processing-time expiration.

    Upsert: (re)arm the timeout at `expiration` (past-due clamps to
    +1s — ShelveExpirationRule.java:137-145); tombstone in: disarm
    (ShelveExpirationRule.java:121-129). Timeout fire: emit a
    tombstone for the alarm (ShelveExpirationRule.java:147-169)."""
    if state.hasTimedOut:
        exp = int(state.get[0]) if state.exists else None
        state.remove()
        yield pd.DataFrame(
            [{"name": key[0], "tombstone": True, "expiration": exp}]
        )
        return
    pdf = _ordered(rows)
    if pdf.empty:
        return
    last = pdf.iloc[-1]
    if bool(last["tombstone"]) or pd.isna(last["expiration"]):
        if state.exists:
            state.remove()
    else:
        exp = int(last["expiration"])
        now = int(time.time() * 1000)
        state.update((exp,))
        state.setTimeoutDuration(max(exp - now, 1000))
    return
