"""Queries exercised through the spark.sql SQL interface (temp views),
demonstrating the engine's second API surface: CTEs, GROUPING SETS,
scalar subqueries, and DataFrame pivot.

The reference exposes no SQL; the north star requires general query
capability, and the driver's oracle harness is itself SQL — these
queries prove the SQL front-end produces plans identical in result to
the DataFrame front-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


def _view(spark: SparkSession, sf: str, name: str) -> None:
    t(spark, sf, name).createOrReplaceTempView(name)


# GROUPING SETS through SQL (complements rollup/cube in aggregates.py).
@query(
    "agg_grouping_sets",
    oracle="""
    select r_name, n_name, count(*) as n_cust
    from customer
      join nation on c_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
    group by grouping sets ((r_name), (n_name), ())
    """,
    tags=("agg", "rollup", "sql"),
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    for name in ("customer", "nation", "region"):
        _view(spark, sf, name)
    return spark.sql(
        """
        select r_name, n_name, count(*) as n_cust
        from customer
          join nation on c_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
        group by grouping sets ((r_name), (n_name), ())
        """
    )


# Uncorrelated scalar subquery through SQL; the threshold is computed as
# exact-decimal-sum / count so both engines compare against the same double.
@query(
    "subquery_scalar",
    oracle="""
    select o_orderkey, o_totalprice
    from orders
    where o_totalprice > (
      select cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) from orders
    )
    """,
    tags=("sql", "subquery"),
)
def subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "orders")
    return spark.sql(
        """
        select o_orderkey, o_totalprice
        from orders
        where o_totalprice > (
          select cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) from orders
        )
        """
    )


# Correlated EXISTS through SQL (the J4 existence probe, SQL-spelled).
@query(
    "subquery_correlated",
    oracle="""
    select c_custkey, c_name
    from customer c
    where exists (
      select 1 from orders o
      where o.o_custkey = c.c_custkey and o.o_totalprice > 400000
    )
    """,
    tags=("sql", "subquery"),
)
def subquery_correlated(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "customer")
    _view(spark, sf, "orders")
    return spark.sql(
        """
        select c_custkey, c_name
        from customer c
        where exists (
          select 1 from orders o
          where o.o_custkey = c.c_custkey and o.o_totalprice > 400000
        )
        """
    )


# CTE pipeline through SQL.
@query(
    "sql_cte",
    oracle="""
    with per_cust as (
      select o_custkey, count(*) as n_orders
      from orders group by o_custkey
    )
    select c_mktsegment,
           count(*) as n_cust,
           cast(sum(n_orders) as bigint) as total_orders,
           max(n_orders) as max_orders
    from per_cust join customer on o_custkey = c_custkey
    group by c_mktsegment
    """,
    tags=("sql",),
)
def sql_cte(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "orders")
    _view(spark, sf, "customer")
    return spark.sql(
        """
        with per_cust as (
          select o_custkey, count(*) as n_orders
          from orders group by o_custkey
        )
        select c_mktsegment,
               count(*) as n_cust,
               cast(sum(n_orders) as bigint) as total_orders,
               max(n_orders) as max_orders
        from per_cust join customer on o_custkey = c_custkey
        group by c_mktsegment
        """
    )


# DataFrame pivot (wide conditional aggregation); oracle spells the
# equivalent CASE matrix. Pivot values are pinned for determinism.
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "agg_pivot",
    oracle=f"""
    select cast(year(ts) as int) as yr,
           {", ".join(f"cast(sum(case when event_type = '{et}' then 1 else 0 end) as bigint) as {et}" for et in _EVENT_TYPES)}
    from events
    group by cast(year(ts) as int)
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .withColumn("yr", F.year("ts"))
        .groupBy("yr")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()  # lazy: GroupedData.count() is a transform, not an action
        .na.fill(0, list(_EVENT_TYPES))
    )


# Recursive CTE (Spark 4 WITH RECURSIVE): dense month calendar walked
# from min to max order date, left-joined so empty months appear — the
# gap-free time-series frame every reporting pipeline needs.
_RECURSIVE_SQL = """
with recursive months(m, mx) as (
  select cast(date_trunc('month', min(o_orderdate)) as date) as m,
         cast(date_trunc('month', max(o_orderdate)) as date) as mx
  from orders
  union all
  select cast(m + interval 1 month as date), mx from months
  where m < mx
),
per as (
  select cast(date_trunc('month', o_orderdate) as date) as m, count(*) as n_orders
  from orders group by 1
)
select months.m as month_start, coalesce(per.n_orders, 0) as n_orders
from months left join per on per.m = months.m
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL, tags=("sql", "recursive"))
def sql_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "orders")
    return spark.sql(_RECURSIVE_SQL)


# LATERAL correlated subquery: top-2 customers per nation — the
# per-group top-k spelled as a lateral instead of a window.
_LATERAL_SQL = """
select n.n_name, tc.c_name, tc.c_acctbal
from nation n,
lateral (select c_name, c_acctbal from customer c
         where c.c_nationkey = n.n_nationkey
         order by c_acctbal desc, c_name limit 2) tc
"""


@query("join_lateral", oracle=_LATERAL_SQL, tags=("sql", "join", "lateral"))
def join_lateral(spark: SparkSession, sf: str) -> DataFrame:
    _view(spark, sf, "nation")
    _view(spark, sf, "customer")
    return spark.sql(_LATERAL_SQL)
