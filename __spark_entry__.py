"""Driver contract for the spark-graft builder (PySpark target).

entry()  — flagship Q1-shaped pricing summary at sf0.001.
queries() — every implemented operator from SURVEY.md §2 (+ §2.13
            extensions), keyed by the names declared in the survey.
oracle_sql() — DuckDB twins for every SQL-expressible query.

Implementation lives in parquet_processor_spark/; this module is a thin
adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_processor_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
