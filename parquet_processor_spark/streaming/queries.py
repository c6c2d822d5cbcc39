"""Driver-visible streaming queries.

Each query genuinely executes a Structured Streaming job (availableNow
trigger, fresh checkpoint, memory sink) and returns the result table —
rows-only checks, since the oracle harness can't run a stream. The
windowed-aggregation semantics are hash-verified separately by batch
twins: ``window_tumbling`` (ops/windows.py) for ``streaming_tumbling``,
``window_session`` (ops/temporal.py) for ``streaming_session``, and
``window_running_sum`` for the per-user totals that
``streaming_stateful`` maintains as explicit GroupState.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from parquet_processor_spark.registry import query
from parquet_processor_spark.streaming.jobs import (
    read_event_stream,
    session_counts,
    stateful_user_totals,
    tumbling_counts,
)


def _run_stream(df: DataFrame, mode: str) -> DataFrame:
    name = f"stream_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ppspark_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.table(name)


@query("streaming_tumbling", tags=("streaming",))
def streaming_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    events = read_event_stream(spark, f"{sf}/events.parquet")
    return _run_stream(tumbling_counts(events), "complete")


@query("streaming_session", tags=("streaming", "session"))
def streaming_session(spark: SparkSession, sf: str) -> DataFrame:
    events = read_event_stream(spark, f"{sf}/events.parquet")
    return _run_stream(session_counts(events), "complete")


@query("streaming_stateful", tags=("streaming", "stateful"))
def streaming_stateful(spark: SparkSession, sf: str) -> DataFrame:
    events = read_event_stream(spark, f"{sf}/events.parquet")
    return _run_stream(stateful_user_totals(events), "update")


@query("streaming_stream_join", tags=("streaming", "join"))
def streaming_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_processor_spark.streaming.jobs import stream_stream_view_purchase

    events = read_event_stream(spark, f"{sf}/events.parquet")
    return _run_stream(stream_stream_view_purchase(events), "append")
