"""Final TPC-H-shaped analogs (Q2/Q8/Q11/Q15/Q16/Q20/Q21), completing
the 22-query family on the synthetic schema.

The synthetic star schema has no ``partsupp`` table and lineitem has no
commit/receipt dates, so the partsupp-dependent queries (Q2/Q11/Q16/Q20)
derive the supplier-part relationship from ``lineitem`` itself (the set
of (partkey, suppkey) pairs that actually shipped), and Q21's "kept
orders waiting" predicate is re-expressed over ``l_returnflag``. The
*plan shapes* — correlated min subquery, scalar-subquery HAVING gate,
count-distinct grouping, exists/not-exists double correlation — are the
originals' (reference parity: the reference only ever computes
count/mean/sum, test_parquet_aggregator.yml:169-181; these queries are
the north-star general-capability extension).

Numeric policy matches tpch.py: money sums in bounded decimal, rounded
identically in both engines; double division only where IEEE-exact in
both (min/max/equality over identical doubles is deterministic).

Scale notes (SCALE.md): every dimension side is broadcast; the derived
"offers" / per-key aggregates partial-aggregate map-side before their
single shuffle; scalar thresholds are one-row aggregates collected on
the driver (no cross-join of a 100 TB fact side against itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.ops.tpch import _DISC_PRICE_SQL, _disc_price
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


# Q2 analog: min-cost supplier. "Supply offers" = per (part, supplier)
# minimum observed unit price in lineitem; pick, per EUROPE-region
# STANDARD part of size >= 25, the supplier(s) matching the per-part
# minimum — the correlated-min-subquery shape of Q2.
@query(
    "q2_min_cost_supplier",
    oracle="""
    with offers as (
      select l_partkey, l_suppkey, min(l_extendedprice / l_quantity) as unit_cost
      from lineitem group by l_partkey, l_suppkey
    )
    select s.s_acctbal, s.s_name, n.n_name, p.p_partkey, o.unit_cost
    from offers o
      join part p on o.l_partkey = p.p_partkey
      join supplier s on o.l_suppkey = s.s_suppkey
      join nation n on s.s_nationkey = n.n_nationkey
      join region r on n.n_regionkey = r.r_regionkey
    where p.p_size >= 25 and p.p_type = 'STANDARD' and r.r_name = 'EUROPE'
      and o.unit_cost = (select min(o2.unit_cost) from offers o2
                         where o2.l_partkey = o.l_partkey)
    order by s.s_acctbal desc, n.n_name, s.s_name, p.p_partkey
    limit 100
    """,
    tags=("tpch", "bench"),
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated min via ONE lineitem pass: the naive shape
    aggregates lineitem into `offers`, re-aggregates offers into
    per-part minima, and self-joins the two — Spark evaluates the
    unshared `offers` subtree twice, scanning and shuffling the fact
    table per branch. Here the per-part minimum is a window over the
    single offers aggregate (one extra exchange of the SMALL offer
    table on l_partkey), and the part filter broadcast-joins BELOW
    the aggregate so the fact shuffle only carries qualifying parts.
    The predicate `unit_cost = min` compares identical stored doubles
    on both engines.
    """
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").where(
        (F.col("p_size") >= 25) & (F.col("p_type") == "STANDARD")
    )
    offers = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        offers.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# Q8 analog: national market share — NATION_3's share of ASIA-region
# PROMO revenue per order year (ratio of conditional decimal sums).
@query(
    "q8_market_share",
    oracle=f"""
    select cast(year(o.o_orderdate) as int) as o_year,
           cast(sum(case when sn.n_name = 'NATION_3' then {_DISC_PRICE_SQL}
                         else cast(0 as decimal(12,2)) end) as double)
             / cast(sum({_DISC_PRICE_SQL}) as double) as mkt_share
    from lineitem l
      join part p on l.l_partkey = p.p_partkey
      join orders o on l.l_orderkey = o.o_orderkey
      join customer c on o.o_custkey = c.c_custkey
      join nation cn on c.c_nationkey = cn.n_nationkey
      join region r on cn.n_regionkey = r.r_regionkey
      join supplier s on l.l_suppkey = s.s_suppkey
      join nation sn on s.s_nationkey = sn.n_nationkey
    where r.r_name = 'ASIA' and p.p_type = 'PROMO'
    group by cast(year(o.o_orderdate) as int)
    """,
    tags=("tpch", "bench"),
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").where(F.col("p_type") == "PROMO")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    cn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", _disc_price()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(nation_vol).cast("double") / F.sum(_disc_price()).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# Q11 analog: important stock — per-part shipped value for NATION_1
# suppliers, kept when above 0.1% of the nation's total (scalar-subquery
# HAVING gate). Threshold is a driver-side one-row aggregate, not a
# cross join against the fact table.
@query(
    "q11_important_stock",
    oracle=f"""
    with nation_li as (
      select l.l_partkey, {_DISC_PRICE_SQL} as val
      from lineitem l
        join supplier s on l.l_suppkey = s.s_suppkey
        join nation n on s.s_nationkey = n.n_nationkey
      where n.n_name = 'NATION_1'
    )
    select l_partkey, cast(round(sum(val), 2) as double) as part_value
    from nation_li
    group by l_partkey
    having cast(sum(val) as double)
           > (select cast(sum(val) as double) * 0.001 from nation_li)
    """,
    tags=("tpch", "bench"),
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").where(F.col("n_name") == "NATION_1")
    nation_li = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("l_partkey", _disc_price().alias("val"))
    )
    # Scalar threshold as an unpartitioned window over the per-part
    # DECIMAL sums — summing the exact decimals in any order equals
    # the all-rows total, so this matches the oracle bitwise while
    # evaluating the fact join + aggregate ONCE (a separate agg branch
    # would re-run the unshared nation_li subtree). The window's
    # single partition holds one narrow row per part, never fact rows.
    from pyspark.sql import Window

    total = F.sum("dec_value").over(Window.partitionBy())
    return (
        nation_li.groupBy("l_partkey")
        .agg(
            F.round(F.sum("val"), 2).cast("double").alias("part_value"),
            F.sum("val").alias("dec_value"),
        )
        .withColumn("threshold", total.cast("double") * F.lit(0.001))
        .where(F.col("dec_value").cast("double") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# Q15 analog: top supplier — quarterly revenue per supplier, keep the
# supplier(s) hitting the maximum (the view + scalar-max shape of Q15).
@query(
    "q15_top_supplier",
    oracle=f"""
    with revenue as (
      select l_suppkey as supplier_no,
             cast(round(sum({_DISC_PRICE_SQL}), 2) as double) as total_revenue
      from lineitem
      where l_shipdate >= timestamp '1997-01-01 00:00:00'
        and l_shipdate < timestamp '1997-04-01 00:00:00'
      group by l_suppkey
    )
    select s.s_suppkey, s.s_name, r.total_revenue
    from supplier s join revenue r on s.s_suppkey = r.supplier_no
    where r.total_revenue = (select max(total_revenue) from revenue)
    order by s.s_suppkey
    """,
    tags=("tpch", "bench"),
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("total_revenue")
    )
    # Scalar max as an unpartitioned window over the per-supplier
    # aggregate — NOT a separate 1-row agg branch: an agg+join-back
    # re-evaluates the unshared `revenue` subtree, scanning and
    # shuffling the fact table twice. The window runs over the
    # supplier-sized aggregate (frames, no sort — no orderBy), so its
    # single partition holds one narrow row per supplier, never fact
    # rows.
    from pyspark.sql import Window

    top = F.max("total_revenue").over(Window.partitionBy())
    s = t(spark, sf, "supplier")
    return (
        revenue.withColumn("top_revenue", top)
        .where(F.col("total_revenue") == F.col("top_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# Q16 analog: supplier diversity per part group — distinct shippers per
# (brand, type, size) over observed lineitem pairs, excluding one brand
# and deficit-balance suppliers (Q16's NOT-IN complaint filter).
@query(
    "q16_part_supplier_types",
    oracle="""
    select p.p_brand, p.p_type, p.p_size,
           count(distinct l.l_suppkey) as supplier_cnt
    from (select distinct l_partkey, l_suppkey from lineitem) l
      join part p on l.l_partkey = p.p_partkey
    where p.p_brand <> 'Brand#5'
      and p.p_type in ('SMALL', 'ECONOMY', 'PROMO')
      and p.p_size in (1, 10, 20, 30, 40, 50)
      and l.l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
    group by p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "bench"),
)
def q16_part_supplier_types(spark: SparkSession, sf: str) -> DataFrame:
    pairs = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_type").isin("SMALL", "ECONOMY", "PROMO")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 50)
    )
    bad_supp = t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# Q20 analog: part promotion — EUROPE suppliers who shipped more than
# half the average per-supplier volume of 'small%' parts in 1997
# (per-key aggregate gated by a global scalar aggregate, Q20's
# availqty-threshold shape).
@query(
    "q20_part_promotion",
    oracle="""
    with supp_qty as (
      select l.l_suppkey, cast(sum(l.l_quantity) as double) as qty
      from lineitem l
        join part p on l.l_partkey = p.p_partkey
      where p.p_name like 'small%'
        and l.l_shipdate >= timestamp '1997-01-01 00:00:00'
        and l.l_shipdate < timestamp '1998-01-01 00:00:00'
      group by l.l_suppkey
    )
    select s.s_name, s.s_acctbal
    from supplier s
      join nation n on s.s_nationkey = n.n_nationkey
      join supp_qty q on q.l_suppkey = s.s_suppkey
    where n.n_regionkey = 3
      and q.qty > (select 0.5 * sum(qty) / count(*) from supp_qty)
    order by s.s_name
    """,
    tags=("tpch", "bench"),
)
def q20_part_promotion(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part").where(F.col("p_name").like("small%"))
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp_qty = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
        # eager-by-design: supp_qty feeds BOTH the threshold scalar
        # and the filter spine; without materialization Catalyst
        # plans the lineitem scan + semi join + groupBy TWICE (the
        # branches push different IsNotNull sets, so ReuseExchange
        # never fires — r12 plan audit). The materialized frame is
        # ~1 row per supplier: tiny at any SF.
        .localCheckpoint(eager=True)
    )
    # Global average as a 1-row broadcast join — no driver collect.
    threshold = supp_qty.agg(
        (F.lit(0.5) * F.sum("qty") / F.count(F.lit(1))).alias("threshold")
    )
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").where(F.col("n_regionkey") == 3)
    return (
        supp_qty.join(F.broadcast(threshold))
        .where(F.col("qty") > F.col("threshold"))
        .drop("threshold")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# Q21 analog: suppliers who kept orders waiting. No commit/receipt
# dates in the synthetic lineitem, so "waiting" is re-expressed as: a
# NATION_2 supplier's 'R'-flagged line in a finalized ('F') order where
# some OTHER supplier also shipped (EXISTS l2) but no other supplier's
# line was 'R'-flagged (NOT EXISTS l3) — the sole-blame double
# correlation that makes Q21 the hardest plan of the family.
@query(
    "q21_waiting_suppliers",
    oracle="""
    select s.s_name, count(*) as numwait
    from lineitem l1
      join orders o on o.o_orderkey = l1.l_orderkey
      join supplier s on l1.l_suppkey = s.s_suppkey
      join nation n on s.s_nationkey = n.n_nationkey
    where o.o_orderstatus = 'F'
      and l1.l_returnflag = 'R'
      and n.n_name = 'NATION_2'
      and exists (select 1 from lineitem l2
                  where l2.l_orderkey = l1.l_orderkey
                    and l2.l_suppkey <> l1.l_suppkey)
      and not exists (select 1 from lineitem l3
                      where l3.l_orderkey = l1.l_orderkey
                        and l3.l_suppkey <> l1.l_suppkey
                        and l3.l_returnflag = 'R')
    group by s.s_name
    order by numwait desc, s.s_name
    limit 100
    """,
    tags=("tpch", "bench"),
)
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation").where(F.col("n_name") == "NATION_2")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    )
    return (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
