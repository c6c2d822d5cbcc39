"""Testdata table access (see /root/repo/TESTDATA.md).

``t(spark, sf_dir, name)`` is the single scan entry point — a plain
``spark.read.parquet`` so Catalyst gets full pushdown/pruning on the
vectorized parquet reader (the Spark analog of the reference's
column-whitelist fetch, test_parquet_processor.py:79-130).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.parquet stores INT64 TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects (PARQUET_TYPE_ILLEGAL) unless this
        # runtime-settable conf maps it to long. Set it here so sessions
        # we didn't build (the driver's harness session) read it too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (spark.sql.legacy.parquet.nanosAsLong);
        # truncate to micros exactly like DuckDB does for ns timestamps.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
