"""Custom stateful streaming operator: watermark-driven sessionization.

``applyInPandasWithState`` over the event stream keeps each key's OPEN
sessions as explicit state and emits a session row the moment the event-
time watermark proves it can no longer grow (no event within ``gap`` can
still arrive). This is the streaming twin of the batch gaps-and-islands
merge (operators/eras.py) — same session definition, incremental
emission — and the engine's demonstration of the Structured Streaming
custom-state surface (the batch CDC path deliberately uses foreachBatch +
ledger instead; see streaming/stream.py).

Late data: the watermark delay equals the session gap, so an event that
arrives later than ``gap`` behind the stream head may be dropped by the
watermark — exactly the contract a gap-based session admits (such an
event could only extend a session that is still provably open).

State is bounded: one (start, end, count) triple per OPEN session per
key; closed sessions leave state immediately. Timeouts flush idle keys
without waiting for their next event.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# open sessions, columnar: starts/ends in epoch-ms, counts
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _merge_sessions(intervals: list[tuple[int, int, int]], gap_ms: int):
    """Gaps-and-islands over (start_ms, end_ms, n) triples — the same
    merge rule as operators/eras.py (join when start <= prev_end + gap)."""
    merged: list[list[int]] = []
    for s, e, n in sorted(intervals):
        if merged and s <= merged[-1][1] + gap_ms:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += n
        else:
            merged.append([s, e, n])
    return [tuple(x) for x in merged]


def sessionize_stream(
    spark,
    events_path: str,
    checkpoint_path: str,
    gap_seconds: int = 1800,
    query_name: str = "sessions",
    max_files_per_trigger: int | None = 1,
    output_path: str | None = None,
):
    """Drain the event dir (availableNow) emitting closed sessions.

    Sink: an in-memory table named ``query_name`` by default (inspection;
    memory sinks cannot recover a checkpoint), or — with ``output_path``
    — parquet-append via foreachBatch, which IS checkpoint-recoverable:
    a restart with the same checkpoint re-emits nothing (state store +
    committed offsets replay clean). Returns the query handle after
    termination."""
    gap_ms = gap_seconds * 1000

    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        open_sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, counts = state.get
            open_sessions = list(zip(starts, ends, counts))

        new_points: list[tuple[int, int, int]] = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_ms = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000)
                new_points.extend((int(t), int(t), 1) for t in ts_ms)

        merged = _merge_sessions(open_sessions + new_points, gap_ms)
        wm = state.getCurrentWatermarkMs()
        closed = [x for x in merged if x[1] + gap_ms <= wm]
        still_open = [x for x in merged if x[1] + gap_ms > wm]

        if still_open:
            state.update(
                (
                    [s for s, _, _ in still_open],
                    [e for _, e, _ in still_open],
                    [n for _, _, n in still_open],
                )
            )
            # flush via timer once the watermark passes the oldest close point
            state.setTimeoutTimestamp(min(e for _, e, _ in still_open) + gap_ms)
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(closed),
                    "session_start": pd.to_datetime([s for s, _, _ in closed], unit="ms"),
                    "session_end": pd.to_datetime([e for _, e, _ in closed], unit="ms"),
                    "n_events": [n for _, _, n in closed],
                }
            )

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)

    from pyspark.sql import functions as F

    sessions: DataFrame = (
        # watermarks require TIMESTAMP (ltz); NTZ sources are cast —
        # epoch-ms state arithmetic is zone-agnostic either way
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", f"{gap_seconds} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
    if output_path is not None:
        writer = sessions.writeStream.foreachBatch(
            lambda df, epoch_id: df.write.mode("append").parquet(output_path)
        )
    else:
        writer = sessions.writeStream.format("memory").queryName(query_name)
    q = (
        writer.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
