"""Driver-visible pipeline queries (rows-only checks — the fetch stage
is opaque Python by design, SURVEY.md §2.1 S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.pipeline.fetch import fake_transport, fetch_stage
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


@query(
    "pipeline_fetch",
    # The fake transport is fully deterministic in the URL id, so the
    # whole mapInPandas fetch stage (retry loop, media-type dispatch,
    # dead-letter marking included) is SQL-replayable: the oracle
    # recomputes every output field from doc_id.
    oracle="""
    select 'https://example.org/concern/media/' || doc_id as url,
           doc_id as batch_index,
           case when doc_id % 17 = 0
                then 'TimeoutError: simulated timeout for https://example.org/concern/media/'
                     || doc_id
                end as error,
           case when doc_id % 17 = 0 then null
                when doc_id % 2 = 0 then 'volumetric image series'
                else 'mesh' end as media_type,
           case when doc_id % 17 = 0 then null
                else cast(doc_id as varchar) end as media_id,
           case when doc_id % 17 = 0 then null
                when doc_id % 2 = 0 then 'MicroCT'
                else 'Mesh' end as modality,
           case when doc_id % 17 = 0 then null
                when doc_id % 3 <> 0 then 'open'
                else 'restricted' end as publication_status
    from documents
    """,
    tags=("pipeline",),
)
def pipeline_fetch(spark: SparkSession, sf: str) -> DataFrame:
    """Manifest→fetch analog on testdata: documents provide the URL ids.

    Deterministic fake transport; output is the wide scrape schema with
    success rows and dead-letter rows distinguished by `error`.
    """
    urls = t(spark, sf, "documents").select(
        F.concat(
            F.lit("https://example.org/concern/media/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.col("doc_id").alias("batch_index"),
    )
    fetched = fetch_stage(urls, fake_transport)
    return fetched.select(
        "url", "batch_index", "error", "media_type", "media_id", "modality", "publication_status"
    )


@query(
    "pipeline_media_dispatch",
    oracle="""
    select cast(doc_id as varchar) as media_id,
           case when doc_id % 17 = 0 then 'dead_letter'
                when doc_id % 2 = 0 then 'volumetric image series'
                else 'mesh' end as media_type,
           count(*) over (partition by
               case when doc_id % 17 = 0 then 'dead_letter'
                    when doc_id % 2 = 0 then 'volumetric image series'
                    else 'mesh' end) as type_count
    from documents
    """,
    tags=("pipeline",),
)
def pipeline_media_dispatch(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-checkable twin of the fetch stage's media-type dispatch
    (P4): same routing rule the fake transport applies, expressed
    declaratively so the dispatch logic itself is hash-verified."""
    from pyspark.sql import Window

    mt = (
        F.when(F.col("doc_id") % 17 == 0, "dead_letter")
        .when(F.col("doc_id") % 2 == 0, "volumetric image series")
        .otherwise("mesh")
    )
    d = t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("media_id"), mt.alias("media_type")
    )
    return d.withColumn(
        "type_count", F.count(F.lit(1)).over(Window.partitionBy("media_type"))
    )


@query(
    "pipeline_cost_estimate",
    # model quantities are pure functions of the manifest; canary_ok
    # is derived from the gate's own min-records rule (canary size >=
    # 8) rather than hardcoded true, so an under-8-document fixture
    # flips BOTH engines instead of failing the parity check as a
    # false alarm. The budget verdict (est_total_time < budget) is a
    # WALL-CLOCK fact SQL cannot restate, so it lives in the pytest
    # gate (tests/test_pipeline.py::test_cost_estimate_budget_verdict),
    # not in the hash-checked row — every remaining column here is
    # oracle-computed (r10 verdict item #6).
    oracle="""
    select cast(count(*) as bigint) as n_manifest,
           cast(least(10, count(*)) as bigint) as n_canary,
           cast(count(*) - least(10, count(*)) as bigint) as n_remaining,
           cast(ceil(cast(count(*) as double) / 5000) as int) as est_segments,
           least(10, count(*)) >= 8 as canary_ok
    from documents
    """,
    tags=("pipeline", "cost", "canary"),
)
def pipeline_cost_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """C2 — the reference coordinator's cost estimate
    (test_parquet_coordinator.yml:257-281 behavior): run the 10-record
    canary through the fetch stage, take its measured avg per-record
    time, and extrapolate run cost over the remaining manifest:
    est_total_time = avg_time * n_remaining, gated against the same
    30 s/record budget as the C1 canary gate. The deterministic model
    quantities (manifest size, canary size, remainder, segment count at
    the coordinator's 5000-record segmenting) hash-check along with
    the data-derived canary_ok; the wall-clock budget verdict is the
    pytest gate test_cost_estimate_budget_verdict (time is not an
    oracle-computable fact).

    100 TB shape: the canary costs 10 records regardless of manifest
    size, the model is arithmetic on ONE count, and the decision
    (proceed / resize the run) happens before any at-scale work starts
    — exactly the reference's "estimate before the long run" loop.
    """
    from parquet_processor_spark.pipeline.run import canary_gate

    urls = t(spark, sf, "documents").select(
        F.concat(
            F.lit("https://example.org/concern/media/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.col("doc_id").alias("batch_index"),
    )
    n = urls.count()  # eager-by-design: ONE count parameterizes the model row
    canary = fetch_stage(urls.orderBy("batch_index").limit(10), fake_transport)
    metrics = canary_gate(canary)
    n_canary = min(10, n)
    n_remaining = n - n_canary
    return spark.createDataFrame(
        [
            (
                n,
                n_canary,
                n_remaining,
                -(-n // 5000),
                bool(metrics.success),
            )
        ],
        "n_manifest bigint, n_canary bigint, n_remaining bigint, "
        "est_segments int, canary_ok boolean",
    )
