"""Scale-pattern operators: the join strategies that keep working when
the data grows 1000× — salting for skewed keys, bucketing for
shuffle-free co-located joins — plus value-range window frames.

Each is oracle-checked against the PLAIN formulation (a salted join
must equal the unsalted join; a bucketed join must equal the ordinary
join), so the test proves the rewrite is semantics-preserving, and
tests/test_plan_quality.py proves the plan actually changed shape.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

_SALT = 8


# Skew-salted aggregation-join: per-order line counts joined to orders.
# The salt splits each hot orderkey's lineitem rows across _SALT
# sub-keys (deterministic: l_linenumber % salt — no RNG), partial-
# aggregates per (key, salt), then merges — the classic two-phase
# rewrite that bounds any single reducer's load under key skew. Result
# is provably identical to the direct groupBy+join the oracle runs.
@query(
    "join_skew_salted",
    oracle="""
    select o.o_orderkey, o.o_orderpriority,
           count(*) as n_lines,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as total_qty
    from orders o join lineitem l on o.o_orderkey = l.l_orderkey
    group by o.o_orderkey, o.o_orderpriority
    """,
    tags=("join", "skew", "scale"),
)
def join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % _SALT).cast("int")
    )
    partial = li.groupBy("l_orderkey", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
    )
    merged = partial.groupBy("l_orderkey").agg(
        F.sum("pn").alias("n_lines"), F.sum("pq").cast("double").alias("total_qty")
    )
    o = t(spark, sf, "orders")
    return merged.join(o, merged.l_orderkey == o.o_orderkey).select(
        "o_orderkey", "o_orderpriority", "n_lines", "total_qty"
    )


# Bucketed co-located join: both sides written bucketed by the join key
# (8 buckets), then joined bucket-to-bucket with NO shuffle on either
# side — the at-rest layout IS the partitioning. At 100 TB this is the
# difference between a join that moves 2×100 TB through the shuffle
# service and one that moves nothing.
@query(
    "join_bucketed",
    oracle="""
    select c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    from customer c join orders o on c.c_custkey = o.o_custkey
    where o.o_totalprice > 100000
    """,
    tags=("join", "bucket", "scale"),
)
def join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    left, right = bucketed_tables(spark, sf)
    return (
        left.join(right, left.c_custkey == right.o_custkey)
        .where(F.col("o_totalprice") > 100000)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


_PROCESS_START = time.time()


def _clear_stale_table_dir(spark: SparkSession, name: str) -> None:
    """Remove a leftover warehouse directory for ``name``.

    A fresh process starts with an empty in-memory catalog, but the
    warehouse dir on disk may still hold the previous process's table
    files — and saveAsTable refuses to create a managed table over a
    non-empty location. Fixed names + this sweep keep the warehouse at
    exactly one table pair per sf instead of leaking one per process.

    Only dirs whose mtime predates THIS process's start are swept: a
    dir modified after we started belongs to a concurrently-running
    process (writes bump the dir mtime), and rmtree'ing it under that
    process would fail both of us. Such a dir falls through to
    saveAsTable, which errors loudly rather than corrupting silently.
    """
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    path = os.path.join(warehouse, name)
    if os.path.isdir(path):
        try:
            if os.path.getmtime(path) >= _PROCESS_START:
                return
        except OSError:
            return
        shutil.rmtree(path, ignore_errors=True)


def bucketed_tables(spark: SparkSession, sf: str, buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """Write customer/orders bucketed by the join key and read back.

    Table names are fixed per sf, so repeat calls in one process reuse
    the tables (catalog hit) and repeated processes overwrite the same
    pair instead of accumulating per-PID copies in the warehouse dir.
    """
    tag = f"b{hashlib.md5(sf.encode()).hexdigest()[:8]}"
    names = (f"ppspark_cust_{tag}", f"ppspark_ord_{tag}")
    catalog = spark.catalog
    if not catalog.tableExists(names[0]):
        _clear_stale_table_dir(spark, names[0])
        (
            t(spark, sf, "customer")
            .select("c_custkey", "c_name")
            .write.bucketBy(buckets, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable(names[0])
        )
    if not catalog.tableExists(names[1]):
        _clear_stale_table_dir(spark, names[1])
        (
            t(spark, sf, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice")
            .write.bucketBy(buckets, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(names[1])
        )
    return spark.table(names[0]), spark.table(names[1])


# Value-range window frame (RANGE, not ROWS): orders within 1000.0 of
# the current total price, per priority class. Range frames depend only
# on values — deterministic under ties by construction.
@query(
    "window_range_frame",
    oracle="""
    select o_orderkey, o_orderpriority, o_totalprice,
           count(*) over (partition by o_orderpriority order by o_totalprice
                          range between 1000.0 preceding and current row) as n_near_below
    from orders
    """,
    tags=("window", "frame"),
)
def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    # pyspark's Window.rangeBetween only accepts integer offsets; the
    # fractional range frame is expressed through the SQL window syntax.
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.expr(
            "count(*) over (partition by o_orderpriority order by o_totalprice"
            " range between 1000.0 preceding and current row)"
        ).alias("n_near_below"),
    )


# Boolean + bitwise aggregate family.
@query(
    "agg_bool_bit",
    oracle="""
    select l_returnflag,
           bool_and(l_quantity > 0) as all_positive,
           bool_or(l_quantity > 49) as any_large,
           bit_and(l_orderkey) as key_bit_and,
           bit_or(l_orderkey) as key_bit_or,
           bit_xor(l_orderkey) as key_bit_xor
    from lineitem group by l_returnflag
    """,
    tags=("agg", "bool", "bitwise"),
)
def agg_bool_bit(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
            F.bool_or(F.col("l_quantity") > 49).alias("any_large"),
            F.bit_and("l_orderkey").alias("key_bit_and"),
            F.bit_or("l_orderkey").alias("key_bit_or"),
            F.bit_xor("l_orderkey").alias("key_bit_xor"),
        )
    )
