"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState``.

The reference has no streaming analogue (SURVEY.md §1.3 — it is a batch
harvester); this is the north-rule's streaming-pipeline addition: the
canonical "custom stateful operator" shape (per-key state that survives
micro-batches) the brief calls out, applied to crawl/event telemetry —
per-user sessions with a gap timeout.

Semantics (deterministic, SQL-oracle-checkable):
* events arrive per user in timestamp order ACROSS batches (segments are
  time-split, like WARC drops); within a batch they are sorted here
* a gap > ``gap_seconds`` between consecutive events opens a new session
* a session row is emitted when the session CLOSES; a ``_flush``
  punctuation row (ts beyond every real event) closes the last open
  session per key — the availableNow analogue of a watermark firing,
  since the state store has no more batches to time out in

State per user: (session_idx, start, last, count) — O(1) per key, so
state size scales with |keys|, not |events|; the state store shuffles by
key exactly like a streaming aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("t_start", T.LongType()),
    T.StructField("t_end", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_idx", T.LongType()),
    T.StructField("start", T.LongType()),
    T.StructField("last", T.LongType()),
    T.StructField("count", T.LongType()),
])

FLUSH_MARKER = "_flush"


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap: int = SESSION_GAP_SECONDS,
) -> Iterator[pd.DataFrame]:
    """Per-key stateful function.  Input columns: user_id, t (epoch
    seconds, int64), event_type.  Emits closed sessions."""
    (user_id,) = key
    if state.exists:
        idx, start, last, count = state.get
    else:
        idx, start, last, count = -1, -1, -1, 0

    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("t")
        for t, etype in zip(pdf["t"], pdf["event_type"]):
            t = int(t)
            if etype == FLUSH_MARKER:
                if count > 0:
                    out.append((user_id, idx, count, start, last))
                    count = 0
                continue
            if count == 0:
                idx, start, last, count = idx + 1, t, t, 1
            elif t - last > gap:
                out.append((user_id, idx, count, start, last))
                idx, start, last, count = idx + 1, t, t, 1
            else:
                last, count = t, count + 1

    state.update((idx, start, last, count))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "session_idx", "n_events",
                          "t_start", "t_end"]
        )


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """events (user_id, t:int64 epoch-seconds, event_type) stream →
    closed-session stream.  One state-store shuffle on user_id."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize_over_segments(
    spark: SparkSession,
    feed_dir: str,
    out_name: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Drain a time-split segment feed through the stateful operator
    (one micro-batch per segment file via maxFilesPerTrigger=1) into a
    memory sink; returns the accumulated session relation."""
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("t", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(feed_dir)
    )
    sessions = sessionize_stream(stream, gap_seconds)
    q = (
        sessions.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(out_name)
