"""Driver-visible streaming queries.

``streaming_tumbling`` genuinely executes a Structured Streaming job
(availableNow trigger, fresh checkpoint, memory sink) and returns the
result table — rows-only check, since the oracle harness can't run a
stream. Its windowed-aggregation semantics are hash-verified separately
by the batch twin ``window_tumbling`` (ops/windows.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from parquet_processor_spark.registry import query
from parquet_processor_spark.streaming.jobs import read_event_stream, tumbling_counts


@query("streaming_tumbling", tags=("streaming",))
def streaming_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    name = f"stream_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="ppspark_ckpt_")
    events = read_event_stream(spark, f"{sf}/events.parquet")
    q = tumbling_counts(events).writeStream.format("memory").queryName(name).outputMode(
        "complete"
    ).option("checkpointLocation", checkpoint).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return spark.table(name)
