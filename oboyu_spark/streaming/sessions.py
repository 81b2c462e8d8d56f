"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

The batch operator (operators/sessionize.py) needs the whole
conversation in one window partition; on a live transcript stream the
conversation never ends, so the session assignment must carry STATE —
(last event-time seen, current session ordinal) per conv_id — across
micro-batches and restarts (the state store is checkpointed). This is
the applyInPandasWithState shape: one state row per group key, Arrow
batches in, assigned rows out.

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
STATE_SCHEMA = "last_ts long, cur_idx int"


def make_session_assigner(gap_minutes: int = 30,
                          late_tolerance_minutes: int | None = None):
    gap_s = gap_minutes * 60
    tol_s = None if late_tolerance_minutes is None \
        else late_tolerance_minutes * 60

    def assign(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.exists:
            last_ts, cur_idx = state.get
        else:
            last_ts, cur_idx = None, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "turn_idx"], ignore_index=True)
        idxs = []
        keep = []
        for t in rows["ts"]:
            te = int(pd.Timestamp(t).value // 1_000_000_000)  # floor epoch s
            if (tol_s is not None and last_ts is not None
                    and te < last_ts - tol_s):
                keep.append(False)  # below the lateness cutoff: drop
                continue
            if last_ts is not None and te - last_ts > gap_s:
                cur_idx += 1
            idxs.append(cur_idx)
            keep.append(True)
            # high-water mark: a late (te < last_ts) event merges into
            # the current session but never rewinds state
            last_ts = te if last_ts is None else max(last_ts, te)
        state.update((last_ts, cur_idx))
        out = rows[pd.Series(keep, index=rows.index)]
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": out["turn_idx"],
                "ts": out["ts"],
                "session_idx": idxs,
                "session_id": [f"{conv_id}#{i}" for i in idxs],
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
):
    """Start (and by default run-once) the stateful sessionization
    stream writing assigned turns to parquet. Re-running with the same
    checkpoint resumes session ordinals where the last run stopped.
    See the module docstring for the late-data contract controlled by
    ``late_tolerance_minutes``."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    assigned = (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_session_assigner(gap_minutes, late_tolerance_minutes),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
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
