"""C6 global cancellation: a long-running job must actually die when
cancel_all fires (reference cancel_workflows.yml:21-61)."""

from __future__ import annotations

import threading
import time

import pytest

from parquet_processor_spark.session import cancel_all, stop_streams


def test_cancel_all_kills_running_job(spark):
    from pyspark.sql import functions as F

    # a job that would run for minutes: wide cartesian + slow predicate
    big = spark.range(0, 1 << 22).alias("a").crossJoin(spark.range(0, 1 << 12).alias("b"))
    result: dict = {}

    def run() -> None:
        try:
            big.where(F.sha2(F.concat(F.col("a.id"), F.col("b.id")), 256) == "x").count()
            result["outcome"] = "finished"
        except Exception as e:  # noqa: BLE001 — cancellation surfaces as SparkException
            result["outcome"] = f"cancelled: {type(e).__name__}"

    worker = threading.Thread(target=run, daemon=True)
    t0 = time.time()
    worker.start()
    # let the job get scheduled, then pull the red button
    while not spark.sparkContext.statusTracker().getActiveJobsIds():
        if time.time() - t0 > 30:
            pytest.fail("job never started")
        time.sleep(0.1)
    cancel_all(spark)
    worker.join(timeout=60)
    assert not worker.is_alive(), "job survived cancel_all"
    assert result["outcome"].startswith("cancelled"), result
    assert time.time() - t0 < 60


def test_stop_streams_stops_active_query(spark, tmp_path):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.isActive
    n = stop_streams(spark)
    assert n >= 1 and not q.isActive
