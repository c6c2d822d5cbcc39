"""Sink round-trip queries: write → read back → oracle-compare against
the source table. The oracle (a plain SELECT on the original table)
hash-verifies that the full write+read cycle is lossless — covering
K1/K2/K3/K4 with a real correctness check rather than a rows-only pass.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark import io as pio
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

_SELECT = "select l_orderkey, l_linenumber, l_quantity, l_returnflag from lineitem where l_quantity >= 40"


def _subset(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


# K1+K4: partitioned parquet write, read back through the partition layout.
@query("sink_parquet", oracle=_SELECT, tags=("sink",))
def sink_parquet(spark: SparkSession, sf: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="ppspark_sink_parquet_")
    pio.write_parquet(_subset(spark, sf), out, mode="overwrite", partition_by=("l_returnflag",))
    back = pio.read_parquet(spark, out)
    # partition column comes back typed as read; restore column order/types
    return back.select(
        "l_orderkey", "l_linenumber", "l_quantity", F.col("l_returnflag").cast("string").alias("l_returnflag")
    )


# K2: CSV round trip with explicit read schema (no inference drift).
@query("sink_csv_roundtrip", oracle=_SELECT, tags=("sink",))
def sink_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="ppspark_sink_csv_")
    pio.write_csv(_subset(spark, sf), out)
    return pio.read_csv(
        spark,
        out,
        schema="l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string",
    )


# K3: JSON-lines round trip.
@query("sink_json_roundtrip", oracle=_SELECT, tags=("sink",))
def sink_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="ppspark_sink_json_")
    pio.write_json(_subset(spark, sf), out)
    return pio.read_json(
        spark,
        out,
        schema="l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string",
    )


# ORC round trip — Spark's second bundled columnar format; same
# write→read-back→oracle-compare contract as the parquet sink.
@query("sink_orc_roundtrip", oracle=_SELECT, tags=("sink",))
def sink_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="ppspark_sink_orc_")
    _subset(spark, sf).write.mode("overwrite").orc(out)
    return spark.read.orc(out)


# Clustered-at-rest layout: range-partition by the query key, sort
# within partitions, write parquet, read back through a range filter.
# At 100 TB this is the layout that makes parquet row-group min/max
# statistics actually skip IO for time/key-range queries: each output
# file covers a narrow, sorted l_shipdate slice, so a date-range
# predicate prunes whole files (footer stats) and whole row groups
# inside the survivors. The oracle replays the filtered scan on the
# source table — proving the clustered write+filtered read is exact.
@query(
    "sink_sorted_roundtrip",
    oracle="""
    select l_orderkey, l_linenumber, l_shipdate, l_quantity
    from lineitem
    where l_shipdate >= date '1997-01-01' and l_shipdate < date '1997-04-01'
    """,
    tags=("sink", "layout"),
)
def sink_sorted_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="ppspark_sink_sorted_")
    (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
