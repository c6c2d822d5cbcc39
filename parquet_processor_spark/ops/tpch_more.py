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


# Q7 analog: volume shipping — revenue between two nation pairs by
# year. Exercises the double-dimension join (supplier nation AND
# customer nation) with a symmetric pair predicate.
@query(
    "q7_volume_shipping",
    oracle=f"""
    select sn.n_name as supp_nation, cn.n_name as cust_nation,
           cast(year(l.l_shipdate) as int) as l_year,
           cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as revenue
    from lineitem l
      join supplier s on l.l_suppkey = s.s_suppkey
      join nation sn on s.s_nationkey = sn.n_nationkey
      join orders o on l.l_orderkey = o.o_orderkey
      join customer c on o.o_custkey = c.c_custkey
      join nation cn on c.c_nationkey = cn.n_nationkey
    where ((sn.n_name = 'NATION_5' and cn.n_name = 'NATION_10')
        or (sn.n_name = 'NATION_10' and cn.n_name = 'NATION_5'))
    group by sn.n_name, cn.n_name, cast(year(l.l_shipdate) as int)
    """,
    tags=("tpch", "bench"),
)
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    sn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_5"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
    )


# Q9 analog: product-type profit by nation and year. The synthetic
# schema has no partsupp/supplycost, so profit = discounted revenue
# minus a retail-cost proxy (p_retailprice × quantity × 0.9) — the
# join/aggregation shape (5-way star, substring part filter) is Q9's.
@query(
    "q9_product_profit",
    oracle=f"""
    select n.n_name as nation, cast(year(o.o_orderdate) as int) as o_year,
           cast(round(sum({_DISC_PRICE_SQL}
                 - cast(p.p_retailprice as decimal(12,2))
                   * cast(l.l_quantity as decimal(12,2))
                   * cast(0.9 as decimal(3,1))), 2) as double) as profit
    from lineitem l
      join part p on l.l_partkey = p.p_partkey
      join supplier s on l.l_suppkey = s.s_suppkey
      join nation n on s.s_nationkey = n.n_nationkey
      join orders o on l.l_orderkey = o.o_orderkey
    where p.p_name like '%a%'
    group by n.n_name, cast(year(o.o_orderdate) as int)
    """,
    tags=("tpch", "bench"),
)
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").where(F.col("p_name").like("%a%"))
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    o = t(spark, sf, "orders")
    profit = _disc_price() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit(0.9).cast("decimal(3,1)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


# Q13 analog: customer order-count distribution — left outer join (so
# zero-order customers count), two stacked aggregations.
@query(
    "q13_order_distribution",
    oracle="""
    select c_count, count(*) as custdist
    from (
      select c.c_custkey, count(o.o_orderkey) as c_count
      from customer c left join orders o on c.c_custkey = o.o_custkey
      group by c.c_custkey
    )
    group by c_count
    """,
    tags=("tpch", "bench"),
)
def q13_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# Q17 analog: small-quantity revenue — per-part average-quantity
# correlated threshold feeding a filter, summed revenue / 7.
@query(
    "q17_small_quantity",
    oracle="""
    with avg_qty as (
      select l_partkey, sum(l_quantity) / count(*) as avg_q
      from lineitem group by l_partkey
    )
    select cast(sum(cast(l.l_extendedprice as decimal(12,2))) as double) / 7.0
             as avg_yearly
    from lineitem l
      join part p on l.l_partkey = p.p_partkey
      join avg_qty a on l.l_partkey = a.l_partkey
    where p.p_brand = 'Brand#1' and l.l_quantity < 0.5 * a.avg_q
    """,
    tags=("tpch", "bench"),
)
def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").where(F.col("p_brand") == "Brand#1")
    # The brand filter broadcast-joins BELOW the per-part average:
    # each part's average only depends on its own rows, so restricting
    # the aggregate to qualifying parts is exact while shrinking its
    # shuffle to the brand's share of the fact table (Q17's correlated
    # subquery is per-part — the unfiltered aggregate computes averages
    # for parts the outer query then discards).
    lif = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    avg_q = lif.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_q")
    )
    return (
        lif.join(avg_q, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_q"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


# Q22 analog: wealthy customers with no large order — above-average
# balance, anti-joined against orders over 400k (scalar subquery +
# anti join; every synthetic customer has SOME order, so the plain
# no-orders predicate would be vacuous).
@query(
    "q22_idle_customers",
    oracle="""
    select c_mktsegment, count(*) as n_cust,
           cast(round(sum(cast(c_acctbal as decimal(18,2))), 2) as double) as total_bal
    from customer c
    where c_acctbal > (
        select cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*)
        from customer where c_acctbal > 0
      )
      and not exists (select 1 from orders o
                      where o.o_custkey = c.c_custkey and o.o_totalprice > 400000)
    group by c_mktsegment
    """,
    tags=("tpch", "bench"),
)
def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    # Above-average threshold as a 1-row broadcast join — no driver
    # collect; the whole query stays one lazy plan.
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
        .join(o.where(F.col("o_totalprice") > 400000), c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )
