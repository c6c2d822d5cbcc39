"""Batch pipeline: manifest → fetch → normalize → partitioned parquet
(+ dead-letter + control metrics), with a canary gate.

This collapses the reference's three workflows (SURVEY.md §3):
- processor (test_parquet_processor.py:268-389) → the fetch stage
- coordinator (test_parquet_coordinator.yml:38-356) → Spark's scheduler
  + ``canary`` (a limit(10) dry run gated on the same thresholds as
  evaluate_test_run.py:107-113)
- artifact exchange → a partitioned parquet write (K4 layout
  {segment}/{run_ts}, test_parquet_processor.yml:76,82)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_processor_spark.pipeline.fetch import Transport, fetch_stage, no_network_transport
from parquet_processor_spark.pipeline.schemas import MANIFEST_SCHEMA, REQUIRED_COLUMNS


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSON manifest scan with explicit schema (no inference pass)."""
    return spark.read.schema(MANIFEST_SCHEMA).json(path)


def global_index(urls: DataFrame, segment_size: int = 5000) -> DataFrame:
    """W1/W2: stable manifest position + range segment.

    A single-partition row_number window would serialize at 100 TB, so
    the index is built scalably: per-partition counts → cumulative
    offsets (tiny driver-side list, one value per partition) → offset +
    intra-partition row_number. Segment label matches the reference's
    '{k}k-{k}k' naming (test_parquet_coordinator.yml:262-276).
    """
    part = urls.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    local = part.withColumn("_local_rn", F.row_number().over(w) - 1)
    # Cumulative offsets re-enter the plan as a BROADCAST JOIN on a
    # (pid, offset) DataFrame — one row per partition. The previous
    # shape (a coalesce(when(_pid==k, off)...) chain with one branch
    # per partition) was a pathological Catalyst expression tree at
    # 10^4-10^5 tasks; a 2-column broadcast table is O(1) in the plan
    # regardless of partition count.
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = urls.sparkSession
    offset_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset long")
    local = local.join(F.broadcast(offset_df), "_pid", "left").withColumn(
        "_offset", F.coalesce(F.col("_offset"), F.lit(0))
    )
    seg = F.floor(F.col("batch_index") / segment_size)
    return (
        local.withColumn("batch_index", (F.col("_local_rn") + F.col("_offset")).cast("long"))
        .withColumn(
            "segment",
            F.concat(
                (seg * segment_size / 1000).cast("long").cast("string"),
                F.lit("k-"),
                ((seg + 1) * segment_size / 1000).cast("long").cast("string"),
                F.lit("k"),
            ),
        )
        .drop("_pid", "_local_rn", "_offset")
    )


@dataclass
class PipelineResult:
    """Control-state analog (test_parquet_processor.py:377-385)."""

    total_processed: int
    error_count: int
    skipped_count: int
    next_index: int
    has_more: bool


@dataclass
class CanaryMetrics:
    """evaluate_test_run.py:91-113 equivalents."""

    total_records: int
    avg_time: float
    error_rate: float
    success: bool


def canary_gate(
    records: DataFrame,
    min_records: int = 8,
    max_avg_time: float = 30.0,
    max_error_rate: float = 0.2,
) -> CanaryMetrics:
    """C1: the reference's canary acceptance test (evaluate_test_run.py:107-113)."""
    row = records.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("processing_time").alias("avg_time"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_err"),
    ).collect()[0]
    # rate computed host-side: an in-plan n_err/n is an ANSI
    # divide-by-zero on an EMPTY canary (caught by the empty-input
    # suite via pipeline_cost_estimate) — and an empty canary must
    # fail the gate on min_records, not crash it
    n, avg_time = row["n"], row["avg_time"] or 0.0
    err_rate = (row["n_err"] / n) if n else 0.0
    ok = n >= min_records and avg_time < max_avg_time and err_rate < max_error_rate
    return CanaryMetrics(n, avg_time, err_rate, ok)


def run_pipeline(
    spark: SparkSession,
    manifest_path: str,
    output_dir: str,
    transport: Transport = no_network_transport,
    *,
    start_index: int = 0,
    max_records: int | None = None,
    segment_size: int = 5000,
    num_tasks: int = 32,
    canary: bool = True,
    run_ts: str = "run",
) -> PipelineResult:
    """End-to-end batch pipeline (SURVEY.md §3.1 rebuilt).

    manifest → project/filter urls (P1) → global index (W1) + segment
    (W2) → offset/limit slice (O1) → repartition → mapInPandas fetch →
    split success/dead-letter (T4) → partitioned parquet (K4) + skipped
    JSON (K3) → control metrics (K6).

    Live network fetch is OPT-IN: the default transport refuses
    loudly; pass ``urllib_transport`` (http/https only) or your own
    ``Transport`` to actually fetch.
    """
    urls = (
        read_manifest(spark, manifest_path)
        .select("url")
        .where(F.col("url").isNotNull())
    )
    indexed = global_index(urls, segment_size)
    total_urls = indexed.count()
    end_index = total_urls if max_records is None else min(start_index + max_records, total_urls)
    sliced = indexed.where(
        (F.col("batch_index") >= start_index) & (F.col("batch_index") < end_index)
    )

    if canary:
        canary_records = fetch_stage(sliced.limit(10), transport)
        metrics = canary_gate(canary_records)
        if not metrics.success:
            raise RuntimeError(
                f"canary gate failed: records={metrics.total_records} "
                f"avg_time={metrics.avg_time:.2f}s error_rate={metrics.error_rate:.2%}"
            )

    fetched = fetch_stage(sliced.repartition(num_tasks), transport).join(
        sliced.select("batch_index", "segment"), "batch_index"
    )
    fetched = fetched.withColumn("run_ts", F.lit(run_ts)).cache()

    ok = fetched.where(F.col("error").isNull())
    dead = fetched.where(F.col("error").isNotNull()).select(
        "url",
        F.col("batch_index").alias("index"),
        F.col("error").alias("reason"),
        "processing_time",
        F.col("attempt").alias("attempts"),
    )

    missing = [c for c in REQUIRED_COLUMNS if c not in fetched.columns]
    if missing:
        raise ValueError(f"schema contract violation, missing {missing}")

    ok.write.mode("append").partitionBy("segment", "run_ts").parquet(f"{output_dir}/records")
    dead.write.mode("append").json(f"{output_dir}/skipped")

    n_ok = ok.count()
    n_dead = dead.count()
    fetched.unpersist()
    return PipelineResult(
        total_processed=n_ok,
        error_count=n_dead,
        skipped_count=n_dead,
        next_index=end_index,
        has_more=end_index < total_urls,
    )
