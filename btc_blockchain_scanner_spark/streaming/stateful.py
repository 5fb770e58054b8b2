"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no true streaming (SURVEY.md §2.8 — batch-with-polling);
this is the engine-completeness piece the north-star asks for: arbitrary
per-key state (here: gap-based session windows over the events stream)
maintained across micro-batches with timeout-driven emission.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
STATE_SCHEMA = "start long, last long, n long"


def _make_update_fn(use_timeout: bool):
    def update_sessions(key, pdfs, state: GroupState):
        """Per-user session accumulator: extend the open session while event
        gaps stay under 30 min; emit sessions closed by an in-batch gap (or
        by processing-time timeout when enabled)."""
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
        else:
            ts_list = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 10**6) for t in pdf["ts"])  # ms epoch
            ts_list.sort()
            if ts_list:
                if state.exists:
                    start, last, n = state.get
                else:
                    start, last, n = ts_list[0], ts_list[0], 0
                for t in ts_list:
                    if t - last > SESSION_GAP_MS:
                        closed.append((user_id, start, last, n))
                        start, n = t, 0
                    last = t
                    n += 1
                state.update((start, last, n))
                if use_timeout:
                    state.setTimeoutDuration(SESSION_GAP_MS)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return update_sessions


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "stateful_sessions",
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    use_timeout: bool = False,
):
    """Start an AvailableNow stream producing closed sessions per user via
    arbitrary keyed state. Returns the streaming query (memory sink).

    ``use_timeout=False`` (default) fits drain-style AvailableNow runs:
    sessions close on in-batch gaps, open sessions persist in state for the
    next invocation. ``use_timeout=True`` adds ProcessingTimeTimeout-driven
    closure for CONTINUOUS triggers — do not combine with AvailableNow,
    which would keep issuing state-cleanup batches until the 30-min
    timeouts fire (observed hang).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    sessions = (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(use_timeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
