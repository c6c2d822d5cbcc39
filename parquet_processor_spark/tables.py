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
    if name == "events":
        df = _normalize_event_time(df)
    return df


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP (LTZ) regardless of how the parquet
    writer encoded it — the testdata generator has shipped both INT64
    TIMESTAMP(NANOS) (read as bigint under nanosAsLong) and plain
    timestamp[us] (read as TIMESTAMP_NTZ). Event-time streaming
    (``withWatermark``) only accepts TIMESTAMP, and DuckDB treats the
    stored values as naive wall-clock, so both encodings converge on
    "wall-clock interpreted as UTC":

    - bigint nanos → truncate to micros (DuckDB does the same) → LTZ.
    - TIMESTAMP_NTZ → wall-clock micros since the NTZ epoch
      (``timestampdiff`` on two NTZ operands is pure calendar
      arithmetic, session-tz-independent) → ``timestamp_micros`` LTZ.
      Never a plain NTZ→LTZ cast: that routes through the *session*
      time zone, and mutating ``spark.sql.session.timeZone`` here
      (the previous approach) made every later tz-sensitive query in
      a foreign session depend on whether an NTZ events table had
      been read first.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        micros = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        df = df.withColumn("ts", F.timestamp_micros(micros))
    return df
