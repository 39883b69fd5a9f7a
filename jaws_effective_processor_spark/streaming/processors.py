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

import numpy as np
import pandas as pd

TRANSITION_OUT = "name string, seq long, active boolean, " \
    "transition_to_active boolean, transition_to_normal boolean"
BOOL_STATE = "flag boolean"

LATCH_OUT = "name string, seq long, latching boolean"
ONDELAY_OUT = "name string, seq long, ondelaying boolean"
ONESHOT_OUT = "name string, seq long, unshelving boolean"
MASK_OUT = "name string, seq long, masking boolean, unmasking boolean"

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


def _bools(pdf: pd.DataFrame, col: str) -> np.ndarray:
    """Nullable-boolean column -> bool ndarray (Arrow nulls are None,
    which the old row loops read as falsy — fillna(False) matches)."""
    return pdf[col].fillna(False).to_numpy(dtype=bool)


def transition_flags(cur: np.ndarray, prev: bool):
    """T1 core, vectorized: per-row transition flags from the current
    activation array and the carried previous state. Returns
    (to_active, to_normal, final_state)."""
    prev_arr = np.concatenate(([prev], cur[:-1])) if len(cur) else cur
    return cur & ~prev_arr, ~cur & prev_arr, (bool(cur[-1]) if len(cur) else prev)


def guarded_latch(
    guard: np.ndarray, reset: np.ndarray, set_: np.ndarray, init: bool
):
    """T2/T3 core, vectorized. On guard rows the state resets on
    `reset`, sets on `set_` (reset wins), else carries; non-guard rows
    leave the state untouched and read as flag=False. The sequential
    machine is a last-event scan: each row's state is the most recent
    set/reset event at or before it (or `init` if none yet) —
    expressed as forward-filled event positions via maximum.accumulate
    instead of a Python row loop. Returns (flags, final_state)."""
    n = len(guard)
    if n == 0:
        return np.zeros(0, dtype=bool), init
    ev = np.where(guard & reset, -1, np.where(guard & set_, 1, 0))
    pos = np.arange(n)
    last = np.maximum.accumulate(np.where(ev != 0, pos, -1))
    state = np.where(last >= 0, ev[np.maximum(last, 0)] == 1, init)
    return np.where(guard, state, False), bool(state[-1])


def oneshot_scan(guard: np.ndarray, trigger: np.ndarray, init: bool):
    """T4 core, vectorized: s_i = guard_i & (s_{i-1} | trigger_i) —
    the state survives only through unbroken guard runs, so it's a
    per-run cummax of the trigger (with the carried state folded into
    the first row). Returns (flags, final_state)."""
    n = len(guard)
    if n == 0:
        return np.zeros(0, dtype=bool), init
    # a guard=False row clears the state AND ignores its own trigger,
    # but shares a run_id with the guard run that follows it — mask
    # triggers by guard so a non-guard trigger can't leak into that run
    t_eff = trigger & guard
    if guard[0] and init:
        t_eff[0] = True
    run_id = np.cumsum(~guard)  # constant within each guard=True run
    s = pd.Series(t_eff).groupby(run_id).cummax().to_numpy(dtype=bool) & guard
    return s, bool(s[-1])


def transition_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T1 — previous-activation store + transition flags
    (ActivationRule.java:323-429). NoActivation and tombstones
    normalize to not-active (ActivationRule.java:392-395)."""
    pdf = _ordered(rows)
    prev = bool(state.get[0]) if state.exists else False
    if pdf.empty:
        state.update((prev,))
        return
    cur = (pdf["union_type"] == "Activation").to_numpy(dtype=bool)
    to_active, to_normal, final = transition_flags(cur, prev)
    state.update((final,))
    yield pd.DataFrame(
        {
            "name": key[0],
            "seq": pdf["seq"].astype("int64").to_numpy(),
            "active": cur,
            "transition_to_active": to_active,
            "transition_to_normal": to_normal,
        }
    )


def latch_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T2 — latching persists from trigger until a Latched override is
    observed (LatchRule.java:177-205); guard: class registered+latchable."""
    pdf = _ordered(rows)
    latching = bool(state.get[0]) if state.exists else False
    if pdf.empty:
        state.update((latching,))
        return
    flags, final = guarded_latch(
        _bools(pdf, "latchable"),
        _bools(pdf, "ov_latched"),
        _bools(pdf, "transition_to_active"),
        latching,
    )
    state.update((final,))
    yield pd.DataFrame(
        {
            "name": key[0],
            "seq": pdf["seq"].astype("int64").to_numpy(),
            "latching": flags,
        }
    )


def ondelay_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T3 — identical machine for ondelaying (OnDelayRule.java:183-213)."""
    pdf = _ordered(rows)
    ondelaying = bool(state.get[0]) if state.exists else False
    if pdf.empty:
        state.update((ondelaying,))
        return
    secs = pdf["ondelayseconds"]
    flags, final = guarded_latch(
        (secs.notna() & (secs.fillna(0) > 0)).to_numpy(dtype=bool),
        _bools(pdf, "ov_ondelayed"),
        _bools(pdf, "transition_to_active"),
        ondelaying,
    )
    state.update((final,))
    yield pd.DataFrame(
        {
            "name": key[0],
            "seq": pdf["seq"].astype("int64").to_numpy(),
            "ondelaying": flags,
        }
    )


def oneshot_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T4 — unshelving persists from transition-to-normal while
    one-shot-shelved; the store write is unconditional so the state
    clears when the guard fails (OneShotRule.java:163-191)."""
    pdf = _ordered(rows)
    stored = bool(state.get[0]) if state.exists else False
    if pdf.empty:
        state.update((stored,))
        return
    flags, final = oneshot_scan(
        _bools(pdf, "shelved_oneshot"),
        _bools(pdf, "transition_to_normal"),
        stored,
    )
    state.update((final,))
    yield pd.DataFrame(
        {
            "name": key[0],
            "seq": pdf["seq"].astype("int64").to_numpy(),
            "unshelving": flags,
        }
    )


def mask_fn(key, rows, state) -> Iterator[pd.DataFrame]:
    """T5 (CORRECTED, beyond-reference) — per-child masked-override
    reconciliation against PARENT activity.

    The reference's MaskRule processor is unfinished dead code
    (MaskRule.java:192-226: the store tracks `masking` but the
    transition update is commented out, and the unmask stream maps
    the wrong source at MaskRule.java:124-125). The corrected machine
    implements the documented intent (MaskRule.java:27-29): a Masked
    override is ADDED when the child's parent becomes active and
    REMOVED when the parent stops being active. Once a mismatch emits
    an override, the override is taken as applied (the feedback topic
    loops it back, exactly like LatchRule's emissions), so the masked
    state simply tracks parent activity — the machine is the T1
    transition core over the parent_active signal, seeded from the
    stored/observed masked state. Emits only reconciliation rows
    (masking = add override, unmasking = tombstone)."""
    pdf = _ordered(rows)
    if state.exists:
        masked = bool(state.get[0])
    elif not pdf.empty and pdf["ov_masked"].notna().any():
        masked = bool(pdf["ov_masked"].dropna().iloc[0])
    else:
        masked = False
    if pdf.empty:
        state.update((masked,))
        return
    pa = _bools(pdf, "parent_active")
    masking, unmasking, final = transition_flags(pa, masked)
    state.update((final,))
    emit = masking | unmasking
    if not emit.any():
        return
    yield pd.DataFrame(
        {
            "name": key[0],
            "seq": pdf["seq"].astype("int64").to_numpy()[emit],
            "masking": masking[emit],
            "unmasking": unmasking[emit],
        }
    )


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


HEAVY_OUT = "token string, n_occurrences long"
HEAVY_STATE = "count long, emitted boolean"


def make_heavy_hitter_fn(threshold: int):
    """Streaming threshold detector (emit-once heavy hitters): per
    token, accumulate the occurrence count across micro-batches and
    emit ONE row the first time the cumulative count reaches
    `threshold` — the streaming twin of the batch heavy-hitters
    report, with exact counts instead of a sketch (state is one
    (count, emitted) tuple per distinct key, the natural fit for
    applyInPandasWithState; a bounded-memory variant would hold a
    count-min sketch per partition instead of per-key state).

    Emit-once (not emit-on-every-crossing-batch) keeps the output a
    changelog of newly-hot tokens, which is what a downstream
    blocklist/vocab updater consumes."""

    def fn(key, rows, state) -> Iterator[pd.DataFrame]:
        n = sum(len(chunk) for chunk in rows)
        if state.exists:
            count, emitted = int(state.get[0]), bool(state.get[1])
        else:
            count, emitted = 0, False
        count += n
        if not emitted and count >= threshold:
            emitted = True
            yield pd.DataFrame(
                [{"token": key[0], "n_occurrences": count}]
            )
        state.update((count, emitted))

    return fn
