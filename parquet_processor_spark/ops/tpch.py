"""Flagship analytical queries (TPC-H-shaped, on the driver's synthetic
star schema — see TESTDATA.md).

These are the headline bench queries: they compose scan + pushed filter
+ multi-join + partial aggregation + sort in single declarative plans.
The reference's aggregator (test_parquet_aggregator.yml:169-181) only
ever computes count/mean/sum over one table; these generalize that to
the full star schema, which is what the engine must do at 100 TB.

Numeric policy: money expressions are computed in bounded-precision
decimal — (12,2)×(4,2) products keep precision ≤ 22 so neither engine
overflows or rescales — then summed exactly and rounded identically,
making the DuckDB oracle hash match bitwise (see numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

# Shared decimal sub-expressions (identical spelling both engines).
_DISC_PRICE_SQL = "cast(l_extendedprice as decimal(12,2)) * cast(1 - l_discount as decimal(4,2))"
_CHARGE_SQL = f"{_DISC_PRICE_SQL} * cast(1 + l_tax as decimal(4,2))"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    )


def _charge() -> F.Column:
    return _disc_price() * ((F.lit(1) + F.col("l_tax")).cast("decimal(4,2)"))


# Q1-shaped pricing summary: the flagship (entry() runs this).
@query(
    "q1_pricing_summary",
    oracle=f"""
    select l_returnflag, l_linestatus,
           cast(sum(l_quantity) as double) as sum_qty,
           cast(round(sum(cast(l_extendedprice as decimal(12,2))), 2) as double) as sum_base_price,
           cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as sum_disc_price,
           cast(round(sum({_CHARGE_SQL}), 2) as double) as sum_charge,
           sum(l_quantity) / count(*) as avg_qty,
           cast(sum(cast(l_extendedprice as decimal(12,2))) as double) / count(*) as avg_price,
           cast(sum(cast(l_discount as decimal(4,2))) as double) / count(*) as avg_disc,
           count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '2001-09-01 00:00:00'
    group by l_returnflag, l_linestatus
    """,
    tags=("tpch", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("sum_base_price"),
        F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(_charge()), 2).cast("double").alias("sum_charge"),
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price"),
        (
            F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / F.count(F.lit(1))
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# Q3-shaped shipping priority: 3-way join, revenue top-k.
@query(
    "q3_shipping_priority",
    oracle=f"""
    select l.l_orderkey,
           cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as revenue,
           o.o_orderdate
    from customer c
      join orders o on c.c_custkey = o.o_custkey
      join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and o.o_orderdate < timestamp '1998-01-01 00:00:00'
      and l.l_shipdate > timestamp '1998-01-01 00:00:00'
    group by l.l_orderkey, o.o_orderdate
    order by revenue desc, l.l_orderkey
    limit 10
    """,
    tags=("tpch", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# Q5-shaped local-supplier revenue: 5-way join through the region
# hierarchy; dims broadcast, fact joins stay co-partitioned on orderkey.
@query(
    "q5_local_supplier",
    oracle=f"""
    select n.n_name,
           cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as revenue
    from customer c
      join orders o on c.c_custkey = o.o_custkey
      join lineitem l on l.l_orderkey = o.o_orderkey
      join supplier s on l.l_suppkey = s.s_suppkey and c.c_nationkey = s.s_nationkey
      join nation n on s.s_nationkey = n.n_nationkey
      join region r on n.n_regionkey = r.r_regionkey
    where r.r_name = 'ASIA'
      and o.o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o.o_orderdate < timestamp '1998-01-01 00:00:00'
    group by n.n_name
    order by revenue desc
    """,
    tags=("tpch", "bench"),
)
def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# Q6-shaped forecast revenue: pure scan+filter+aggregate — the pushdown
# showcase (explain shows PushedFilters on shipdate/discount/quantity).
@query(
    "q6_forecast_revenue",
    oracle="""
    select cast(round(sum(cast(l_extendedprice as decimal(12,2))
                          * cast(l_discount as decimal(4,2))), 2) as double) as revenue
    from lineitem
    where l_shipdate >= timestamp '1997-01-01 00:00:00'
      and l_shipdate < timestamp '1998-01-01 00:00:00'
      and l_discount between 0.03 and 0.07
      and l_quantity < 24
    """,
    tags=("tpch", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )
