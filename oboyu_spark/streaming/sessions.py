"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

The batch operator (operators/sessionize.py) needs the whole
conversation in one window partition; on a live transcript stream the
conversation never ends, so the session assignment must carry STATE —
(last event-time seen, current session ordinal, current session start)
per conv_id — across micro-batches and restarts (the state store is
checkpointed). This is the applyInPandasWithState shape: one state row
per group key, Arrow batches in, assigned rows out.

Semantics match the batch operator exactly on any prefix of the
stream: a new session starts when the floored-epoch gap to the
previous turn of the same conversation exceeds ``gap_minutes``.

Late-data contract (cross-batch out-of-order events): an event older
than the conversation's high-water mark can only arrive in a LATER
micro-batch (within a batch the rows are time-sorted first).

- It NEVER rewinds state: the stored last_ts is the max event time
  seen, so one straggler cannot make the next on-time event open a
  spurious session.
- With ``late_tolerance_minutes=None`` (default) it is assigned to the
  conversation's CURRENT session — prefix semantics: replaying the
  stream in order reproduces the batch operator exactly (pinned by
  test), and a late event merges forward rather than re-opening
  history.
- With a finite tolerance, events older than ``high_water −
  tolerance`` are DROPPED (the watermark-style cutoff) — they are too
  old to assign meaningfully and would otherwise glue two closed
  sessions together.

State-size contract (``bounded_state``): the default mode keeps one
state row per conv_id for the lifetime of the query — exact batch
parity, but on an unbounded-cardinality stream the state store grows
monotonically. ``bounded_state=True`` bounds it:

- The stream gets a ``gap + tolerance`` event-time watermark and the
  operator an ``EventTimeTimeout``; a conversation idle past that
  horizon is EVICTED (its state row removed).
- Eviction is semantically safe: the timeout only fires once the
  watermark has passed ``last_ts + gap + tolerance``, and input rows
  older than the watermark are dropped by the stateful operator, so
  any future event of an evicted conversation must exceed the gap and
  would have opened a NEW session even with the state present.
- Session identity in this mode is ``conv_id#t<epoch>`` where
  ``<epoch>`` is the floored epoch-seconds of the first event SEEN in
  the session — derivable without prior state, hence IDENTICAL whether
  or not an eviction happened in between (pinned by test). Late
  merged events do not retro-date it.
- ``session_idx`` becomes epoch-local: it resets to 0 when a
  conversation re-appears after eviction (the documented
  reset-on-evict ordinal contract; use session_id for identity).

The three-field state schema replaces round-3's two-field one, so
pre-existing checkpoints must be rebuilt (fresh checkpoint dir).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .aggregate import TRANSCRIPT_SCHEMA

OUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, "
    "session_idx int, session_id string"
)
STATE_SCHEMA = "last_ts long, cur_idx int, cur_start long"


def make_session_assigner(gap_minutes: int = 30,
                          late_tolerance_minutes: int | None = None,
                          bounded_state: bool = False):
    gap_s = gap_minutes * 60
    tol_s = None if late_tolerance_minutes is None \
        else late_tolerance_minutes * 60

    def assign(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if bounded_state and state.hasTimedOut:
            # idle past gap+tolerance: every future event must open a
            # new session regardless, and its bounded-mode session_id
            # (first-seen epoch) needs no memory — state is droppable
            # without changing any future assignment.
            state.remove()
            return
        if state.exists:
            last_ts, cur_idx, cur_start = state.get
        else:
            last_ts, cur_idx, cur_start = None, 0, None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "turn_idx"], ignore_index=True)
        idxs = []
        starts = []
        keep = []
        for t in rows["ts"]:
            te = int(pd.Timestamp(t).value // 1_000_000_000)  # floor epoch s
            if (tol_s is not None and last_ts is not None
                    and te < last_ts - tol_s):
                keep.append(False)  # below the lateness cutoff: drop
                continue
            if last_ts is not None and te - last_ts > gap_s:
                cur_idx += 1
                cur_start = te
            if cur_start is None:
                cur_start = te  # first event of this conversation
            idxs.append(cur_idx)
            starts.append(cur_start)
            keep.append(True)
            # high-water mark: a late (te < last_ts) event merges into
            # the current session but never rewinds state (and never
            # retro-dates the session's first-seen start)
            last_ts = te if last_ts is None else max(last_ts, te)
        state.update((last_ts, cur_idx, cur_start))
        if bounded_state and last_ts is not None:
            # evict once the watermark passes the point where any new
            # event is a new session anyway; clamp defensively — the
            # timeout must sit strictly beyond the current watermark
            horizon_ms = (last_ts + gap_s + (tol_s or 0)) * 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
        out = rows[pd.Series(keep, index=rows.index)]
        if bounded_state:
            session_ids = [f"{conv_id}#t{s}" for s in starts]
        else:
            session_ids = [f"{conv_id}#{i}" for i in idxs]
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": out["turn_idx"],
                "ts": out["ts"],
                "session_idx": idxs,
                "session_id": session_ids,
            }
        )

    return assign


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    late_tolerance_minutes: int | None = None,
    schema: str = TRANSCRIPT_SCHEMA,
    trigger_once: bool = True,
    bounded_state: bool = False,
):
    """Start (and by default run-once) the stateful sessionization
    stream writing assigned turns to parquet. Re-running with the same
    checkpoint resumes session ordinals where the last run stopped.
    See the module docstring for the late-data contract controlled by
    ``late_tolerance_minutes`` and the state-size contract controlled
    by ``bounded_state`` (set it on unbounded-key-cardinality streams;
    the state store then holds only conversations active within the
    gap+tolerance horizon instead of every conversation ever seen)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    src = stream.select("conv_id", "turn_idx", "ts")
    if bounded_state:
        horizon_min = gap_minutes + (late_tolerance_minutes or 0)
        src = src.withWatermark("ts", f"{horizon_min} minutes")
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    assigned = src.groupBy("conv_id").applyInPandasWithState(
        make_session_assigner(gap_minutes, late_tolerance_minutes,
                              bounded_state=bounded_state),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )
    writer = (
        assigned.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
