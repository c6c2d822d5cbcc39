"""Additional TPC-H-shaped analytical queries (Q4/Q10/Q12/Q14/Q18/Q19
analogs adapted to the synthetic schema) — the wide-join / subquery /
conditional-aggregation half of the bench suite.

Same numeric policy as tpch.py: decimal-exact money sums, raw doubles
for deterministic divisions, unique-key tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.ops.tpch import _DISC_PRICE_SQL, _disc_price
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


# Q4 analog: order-priority checking — EXISTS-correlated semi join
# (late-shipping lineitems), grouped priority counts.
@query(
    "q4_order_priority",
    oracle="""
    select o_orderpriority, count(*) as order_count
    from orders o
    where o.o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o.o_orderdate < timestamp '1997-01-01 00:00:00'
      and exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey
                    and l.l_shipdate > o.o_orderdate + interval 60 days)
    group by o_orderpriority
    """,
    tags=("tpch", "bench"),
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("interval 60 days")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# Q10 analog: returned items — 4-way join, per-customer revenue, top 20.
@query(
    "q10_returned_items",
    oracle=f"""
    select c.c_custkey, c.c_name, n.n_name,
           cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as revenue
    from customer c
      join orders o on c.c_custkey = o.o_custkey
      join lineitem l on l.l_orderkey = o.o_orderkey
      join nation n on c.c_nationkey = n.n_nationkey
    where l.l_returnflag = 'R'
      and o.o_orderdate >= timestamp '1997-01-01 00:00:00'
      and o.o_orderdate < timestamp '1998-01-01 00:00:00'
    group by c.c_custkey, c.c_name, n.n_name
    order by revenue desc, c.c_custkey
    limit 20
    """,
    tags=("tpch", "bench"),
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# Q12 analog: priority-class line counts by linestatus (conditional agg).
@query(
    "q12_priority_class",
    oracle="""
    select l_linestatus,
           cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH') then 1 else 0 end) as bigint)
             as high_line_count,
           cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH') then 1 else 0 end) as bigint)
             as low_line_count
    from lineitem join orders on l_orderkey = o_orderkey
    where l_shipdate >= timestamp '1997-01-01 00:00:00'
      and l_shipdate < timestamp '1998-01-01 00:00:00'
    group by l_linestatus
    """,
    tags=("tpch", "bench"),
)
def q12_priority_class(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# Q14 analog: promo revenue share — ratio of two exact decimal sums
# (identical double division both engines → bitwise match, no rounding).
@query(
    "q14_promo_share",
    oracle=f"""
    select cast(100 * sum(case when p_type = 'PROMO' then {_DISC_PRICE_SQL}
                               else cast(0 as decimal(12,2)) end) as double)
           / cast(sum({_DISC_PRICE_SQL}) as double) as promo_share
    from lineitem join part on l_partkey = p_partkey
    where l_shipdate >= timestamp '1997-06-01 00:00:00'
      and l_shipdate < timestamp '1997-12-01 00:00:00'
    """,
    tags=("tpch", "bench"),
)
def q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-12-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (F.lit(100) * F.sum(promo)).cast("double")
                / F.sum(_disc_price()).cast("double")
            ).alias("promo_share")
        )
    )


# Q18 analog: large-volume orders — HAVING subquery feeding a join.
@query(
    "q18_large_orders",
    oracle="""
    with big as (
      select l_orderkey, cast(sum(l_quantity) as double) as total_qty
      from lineitem group by l_orderkey having sum(l_quantity) > 150
    )
    select c.c_name, o.o_orderkey, o.o_totalprice, big.total_qty
    from big
      join orders o on big.l_orderkey = o.o_orderkey
      join customer c on o.o_custkey = c.c_custkey
    order by o.o_totalprice desc, o.o_orderkey
    limit 20
    """,
    tags=("tpch", "bench"),
)
def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# Q19 analog: disjunctive multi-attribute predicates (brand × quantity
# bands) — the OR-of-ANDs pushdown/codegen exercise.
@query(
    "q19_brand_bands",
    oracle=f"""
    select cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as revenue
    from lineitem join part on l_partkey = p_partkey
    where (p_brand = 'Brand#1' and p_type in ('SMALL', 'MEDIUM') and l_quantity between 1 and 20)
       or (p_brand = 'Brand#2' and p_type in ('LARGE', 'PROMO') and l_quantity between 10 and 30)
       or (p_size >= 40 and l_quantity between 20 and 40)
    """,
    tags=("tpch", "bench"),
)
def q19_brand_bands(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_type").isin("SMALL", "MEDIUM")
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_type").isin("LARGE", "PROMO")
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_size") >= 40) & F.col("l_quantity").between(20, 40))
    )
    return joined.where(cond).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue")
    )
