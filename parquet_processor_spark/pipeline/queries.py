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
