"""Custom stateful streaming operator — session windows over a keyed event
stream via ``applyInPandasWithState``.

The role of Solr's always-on streaming daemons (``DaemonStream`` wrapping a
rollup, SURVEY §2.9) where the aggregate needs CUSTOM state transitions that
tumbling windows can't express: a session extends while events keep arriving
within ``gap_seconds`` of the previous one and closes at the first larger
silence. State per key = the open session (start, last, n, sum); an incoming
batch folds into it in event-time order and every CLOSED session is emitted
downstream (append mode).

Sessionization is batch-expressible (lag + running sum of gap flags), so
``sessionize_batch`` is the exact oracle: on any finite input whose last
event per key is beyond the gap, the streaming operator emits exactly the
batch sessions (asserted in tests/test_stateful.py across multi-batch
replays).

Scale shape: state is per-key and O(1); the only shuffle is the groupBy on
the session key — 100 TB of events sessionize with no global ordering and
no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),  # epoch NANOSECONDS — exact
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 1800.0
) -> DataFrame:
    """events: a STREAMING DataFrame with (user_id, ts, value). Emits closed
    sessions. The open tail session per key stays in state until a later
    event closes it (feed a max-ts sentinel per key to flush a finite
    stream, or switch the timeout to EventTimeTimeout + watermark for
    wall-clock flushing in production)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        ev = pd.concat(list(pdf_iter), ignore_index=True)
        if len(ev) == 0:
            return
        ev = ev.sort_values("ts")
        ns = ev["ts"].astype("int64")  # epoch nanoseconds, exact
        vals = ev["value"].astype(float)
        gap_ns = int(gap_seconds * 1e9)
        if state.exists:
            start, last, n, s = state.get
            cur = [int(start), int(last), int(n), float(s)]
        else:
            cur = None
        out = []
        for t, v in zip(ns, vals):
            t = int(t)
            if cur is not None and t - cur[1] > gap_ns:
                out.append((key[0], cur[0], cur[1], cur[2], cur[3]))
                cur = None
            if cur is None:
                cur = [t, t, 1, float(v)]
            else:
                cur[1] = t
                cur[2] += 1
                cur[3] += float(v)
        state.update((cur[0], cur[1], cur[2], cur[3]))
        if out:
            df = pd.DataFrame(
                out, columns=["user_id", "start", "end", "n_events", "sum_value"]
            )
            yield pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "session_start": pd.to_datetime(df["start"]),
                    "session_end": pd.to_datetime(df["end"]),
                    "n_events": df["n_events"].astype("int64"),
                    "sum_value": df["sum_value"],
                }
            )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: float = 1800.0) -> DataFrame:
    """Exact batch twin: session id = running count of over-gap silences per
    key (lag + cumulative sum — two keyed window passes, no global order)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # exact integer microseconds; cast handles TIMESTAMP_NTZ parquet columns
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    new_session = F.when(
        t - F.lag(t).over(w) > F.lit(int(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = events.select(
        "user_id", "ts", "value", F.sum(new_session).over(w_run).alias("session_no")
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
