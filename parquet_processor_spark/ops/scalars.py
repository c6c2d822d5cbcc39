"""Extended scalar-function packs (SURVEY.md §2.9 generalized): string,
date-part, math, null-handling, and array functions, plus grouped
string/statistical aggregates built from exact sums.

Cross-engine notes baked into each oracle:
- weekday: Spark weekday() is 0=Monday; DuckDB spells it isodow()-1.
- no exp/ln/pow in oracle-checked queries (libm results differ across
  implementations); sqrt is IEEE-exact so it's fine.
- variance/stddev are computed from exact integer sums with the
  textbook formula spelled identically on both sides — the built-in
  stddev aggregates use different accumulation schemes per engine and
  would NOT hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


@query(
    "fn_string_funcs",
    oracle="""
    select p_partkey,
           upper(p_name) as up_name,
           substring(p_name, 2, 5) as mid_name,
           lpad(p_brand, 12, '*') as padded_brand,
           reverse(p_type) as rev_type,
           translate(p_name, 'aeiou', '.....') as devoweled,
           length(p_name) as name_len
    from part
    """,
    tags=("scalar", "string"),
)
def fn_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 2, 5).alias("mid_name"),
        F.lpad("p_brand", 12, "*").alias("padded_brand"),
        F.reverse("p_type").alias("rev_type"),
        F.translate("p_name", "aeiou", ".....").alias("devoweled"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "fn_date_parts",
    oracle="""
    select o_orderkey,
           year(o_orderdate) as yr,
           month(o_orderdate) as mo,
           day(o_orderdate) as dy,
           quarter(o_orderdate) as qtr,
           isodow(o_orderdate) - 1 as wd,
           date_trunc('month', o_orderdate) as month_start,
           last_day(o_orderdate) as month_end
    from orders
    """,
    tags=("scalar", "temporal"),
)
def fn_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").alias("wd"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "fn_date_arith",
    oracle="""
    select l_orderkey, l_linenumber,
           l_shipdate + interval 7 days as ship_plus_week,
           date_diff('day', timestamp '1995-01-01 00:00:00', l_shipdate) as days_since_epoch_start
    from lineitem
    """,
    tags=("scalar", "temporal"),
)
def fn_date_arith(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_shipdate") + F.expr("interval 7 days")).alias("ship_plus_week"),
        F.datediff(
            F.col("l_shipdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
    )


@query(
    "fn_math",
    oracle="""
    select l_orderkey, l_linenumber,
           abs(l_discount - 0.05) as disc_dev,
           ceil(l_extendedprice) as price_ceil,
           floor(l_extendedprice) as price_floor,
           sqrt(l_quantity) as qty_sqrt,
           l_orderkey % 7 as key_mod,
           l_quantity * l_quantity as qty_sq
    from lineitem
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        # Spark ceil/floor return LONG; DuckDB's return DOUBLE — cast so
        # the oracle's 68424.0 and Spark's 68424 canonicalize identically.
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@query(
    "fn_null_funcs",
    oracle="""
    select l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) as disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) as disc_or_neg,
           (l_tax is null) as tax_missing
    from lineitem
    """,
    tags=("scalar", "null"),
)
def fn_null_funcs(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias("disc_or_neg"),
        F.isnull("l_tax").alias("tax_missing"),
    )


# The head-of-array probe is emitted as four scalar columns, not an
# array<double> cell: harnesses canonicalize with pandas sorts, and a
# raw list cell is unhashable/unsortable there.
@query(
    "fn_array_ops",
    oracle="""
    select vec_id,
           len(embedding) as dim,
           cast(embedding[1] as double) as first_dim,
           cast(embedding[2] as double) as head2,
           cast(embedding[3] as double) as head3,
           cast(embedding[4] as double) as head4
    from embeddings
    """,
    tags=("scalar", "array"),
)
def fn_array_ops(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 2).cast("double").alias("head2"),
        F.element_at("embedding", 3).cast("double").alias("head3"),
        F.element_at("embedding", 4).cast("double").alias("head4"),
    )


# URL parsing — the scraper-adjacent function family (the reference's
# whole workload is keyed by media-page URLs). URLs are synthesized
# deterministically from documents columns, then decomposed with
# parse_url (JVM-side); the oracle uses equivalent regexes.
@query(
    "fn_url_parse",
    oracle="""
    with u as (
      select doc_id,
             'https://example.org/' || source || '/doc/' || doc_id
               || '?chars=' || n_chars || '&lang=' || lang as url
      from documents
    )
    select doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) as proto,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) as host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) as path,
           regexp_extract(url, '\\?(.*)$', 1) as query,
           regexp_extract(url, '[?&]chars=([^&]*)', 1) as chars_param
    from u
    """,
    tags=("scalar", "url"),
)
def fn_url_parse(spark: SparkSession, sf: str) -> DataFrame:
    url = F.concat(
        F.lit("https://example.org/"),
        F.col("source"),
        F.lit("/doc/"),
        F.col("doc_id"),
        F.lit("?chars="),
        F.col("n_chars"),
        F.lit("&lang="),
        F.col("lang"),
    )
    return (
        t(spark, sf, "documents")
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("chars")).alias("chars_param"),
        )
    )


@query(
    "agg_string_concat",
    oracle="""
    select l_returnflag,
           string_agg(distinct l_linestatus, ',' order by l_linestatus) as statuses
    from lineitem group by l_returnflag
    """,
    tags=("agg", "string"),
)
def agg_string_concat(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses")
        )
    )


@query(
    "agg_stats_manual",
    oracle="""
    select l_returnflag,
           count(*) as n,
           (sum(l_quantity * l_quantity) - sum(l_quantity) * sum(l_quantity) / count(*))
             / (count(*) - 1) as var_qty,
           sqrt((sum(l_quantity * l_quantity) - sum(l_quantity) * sum(l_quantity) / count(*))
             / (count(*) - 1)) as stddev_qty
    from lineitem group by l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats_manual(spark: SparkSession, sf: str) -> DataFrame:
    n = F.count(F.lit(1))
    s = F.sum("l_quantity")
    ss = F.sum(F.col("l_quantity") * F.col("l_quantity"))
    var = (ss - s * s / n) / (n - F.lit(1))
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(n.alias("n"), var.alias("var_qty"), F.sqrt(var).alias("stddev_qty"))
    )


# Map-typed column ops: parse the events JSON props into a map and work
# on it with the map function family (the nested statistics.json
# media_types map, SURVEY.md §1.2, as a live column type).
# Keys are emitted sorted and comma-joined (not array<string>): string
# cells survive harness-side pandas canonicalization, arrays do not,
# and sorting makes the value independent of JSON key order.
@query(
    "fn_map_ops",
    oracle="""
    select event_id,
           cast(json_extract_string(props, '$.k') as bigint) as k_val,
           array_to_string(list_sort(json_keys(props)), ',') as keys,
           cast(len(json_keys(props)) as int) as n_keys
    from events
    """,
    tags=("scalar", "map", "json"),
)
def fn_map_ops(spark: SparkSession, sf: str) -> DataFrame:
    m = F.from_json("props", "map<string,bigint>")
    return t(spark, sf, "events").select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys"),
        F.size(m).alias("n_keys"),
    )


# Lateral explode with ordinality — the array→rows pivot that feeds
# any per-token/per-dimension pipeline stage.
@query(
    "explode_positional",
    oracle="""
    select vec_id, cast(i - 1 as int) as pos,
           cast(embedding[i] as double) as val
    from embeddings, generate_series(1, 8) as g(i)
    where vec_id < 50
    """,
    tags=("scalar", "array", "explode"),
)
def explode_positional(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "embeddings")
        .where(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v"))
        .select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    )


# Struct (nested record) operations: pack, field access, nested
# access — the statistics-record shape (SURVEY.md §1.2) as a
# first-class column type. The struct itself isn't emitted (engines
# render struct cells differently: Row vs dict); the round-tripped
# fields prove pack+access, and to_json proves serialization.
@query(
    "fn_struct_ops",
    oracle="""
    select o_orderkey,
           {'priority': o_orderpriority, 'total': o_totalprice}.total as total_again,
           {'outer_f': {'inner_f': o_custkey}}.outer_f.inner_f as nested_key,
           to_json({'priority': o_orderpriority}) as info_json
    from orders
    """,
    tags=("scalar", "struct"),
)
def fn_struct_ops(spark: SparkSession, sf: str) -> DataFrame:
    info = F.struct(
        F.col("o_orderpriority").alias("priority"), F.col("o_totalprice").alias("total")
    )
    nested = F.struct(F.struct(F.col("o_custkey").alias("inner_f")).alias("outer_f"))
    return t(spark, sf, "orders").select(
        "o_orderkey",
        info.getField("total").alias("total_again"),
        nested.getField("outer_f").getField("inner_f").alias("nested_key"),
        F.to_json(F.struct(F.col("o_orderpriority").alias("priority"))).alias("info_json"),
    )


# ANSI-safe error-handling scalar family: try_* returns NULL where
# strict evaluation would raise (division by zero, bad casts) — the
# batch-pipeline contract for dirty data (never kill a 100 TB job on
# one malformed cell; route nulls to the dead-letter predicate).
@query(
    "fn_try_arith",
    oracle="""
    select l_orderkey, l_linenumber,
           case when l_discount = 0 then null
                else l_extendedprice / l_discount end as safe_ratio,
           case when l_tax = 0 then null
                else l_quantity / l_tax end as qty_per_tax,
           try_cast(l_returnflag as bigint) as flag_num,
           try_cast(cast(l_linenumber as varchar) as bigint) as line_rt
    from lineitem
    """,
    tags=("scalar", "null", "safety"),
)
def fn_try_arith(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_discount").alias("safe_ratio"),
        F.try_divide("l_quantity", "l_tax").alias("qty_per_tax"),
        F.expr("try_cast(l_returnflag as bigint)").alias("flag_num"),
        F.expr("try_cast(cast(l_linenumber as string) as bigint)").alias("line_rt"),
    )
