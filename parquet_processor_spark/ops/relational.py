"""Scans, projections, filters, and scalar functions.

Covers SURVEY.md §2.1 (S1-S3), §2.3 (P1-P8), §2.9 (F1-F14). Each
reference operator is re-expressed as a declarative DataFrame query so
Catalyst pushes predicates and prunes columns into the parquet scan
(the reference does this by hand with per-media-type field whitelists,
test_parquet_processor.py:79-130, and eager page-load stops, :136-148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

# --- S2/S3: parquet scan with projection + predicate pushdown ------------
# Reference: evaluate_test_run.py:27,77 (read single parquet),
# test_parquet_aggregator.yml:121-128 (recursive discovery → one read).


@query(
    "scan_parquet",
    oracle="""
    select l_orderkey, l_linenumber, l_quantity
    from lineitem
    where l_quantity >= 45
    """,
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf: str) -> DataFrame:
    # .explain must show PushedFilters: [GreaterThanOrEqual(l_quantity,45.0)]
    # and ReadSchema limited to the three columns.
    return (
        t(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --- S1/F14: JSON parsing (the manifest scan analog) ---------------------
# Reference: test_parquet_processor.py:426-428 json.load of the manifest.
# The events.props column carries the JSON payload in the testdata.


@query(
    "scan_json",
    oracle="""
    select event_id, cast(json_extract_string(props, '$.k') as bigint) as k
    from events
    where cast(json_extract_string(props, '$.k') as bigint) > 50
    """,
    tags=("scan", "json"),
)
def scan_json(spark: SparkSession, sf: str) -> DataFrame:
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = t(spark, sf, "events").withColumn("j", F.from_json("props", schema))
    return (
        parsed.select("event_id", F.col("j.k").alias("k"))
        .where(F.col("k") > 50)
    )


@query(
    "fn_json_extract",
    oracle="""
    select event_id, cast(json_extract_string(props, '$.k') as bigint) as k
    from events
    """,
    tags=("scalar", "json"),
)
def fn_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    # get_json_object path variant (reference F14: json round-trips,
    # test_parquet_processor.py:347,427).
    return t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


# --- P1: project + not-null filter ---------------------------------------
# Reference: [r['url'] for r in data if r.get('url')]  (processor :429)


@query(
    "project_filter_notnull",
    oracle="select doc_id, text from documents where text is not null",
    tags=("filter",),
)
def project_filter_notnull(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "documents").select("doc_id", "text").where(F.col("text").isNotNull())


# --- P2/F1/F2: column-value normalization --------------------------------
# Reference: field.lower().replace(' ','_').replace('(','').replace(')','')
# (processor :255,258)


@query(
    "fn_string_normalize",
    oracle="""
    select p_partkey,
           replace(replace(replace(lower(p_type), ' ', '_'), '(', ''), ')', '') as norm_type
    from part
    """,
    tags=("scalar", "string"),
)
def fn_string_normalize(spark: SparkSession, sf: str) -> DataFrame:
    norm = F.col("p_type")
    norm = F.lower(norm)
    for a, b in ((" ", "_"), ("(", ""), (")", "")):
        norm = F.replace(norm, F.lit(a), F.lit(b))
    return t(spark, sf, "part").select("p_partkey", norm.alias("norm_type"))


# --- P3/F3/F4: first-line / trim extraction ------------------------------
# Reference: elem.text.strip().split('\n')[0]  (processor :254)


@query(
    "fn_string_firstline",
    oracle="""
    select doc_id, split_part(trim(text), chr(10), 1) as first_line
    from documents
    """,
    tags=("scalar", "string"),
)
def fn_string_firstline(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "documents").select(
        "doc_id", F.element_at(F.split(F.trim(F.col("text")), "\n"), 1).alias("first_line")
    )


# --- P4: media-type dispatch (conditional schema) ------------------------
# Reference: different field catalogs per media_type (processor :103-128).
# Rebuilt as when/otherwise over event_type.


@query(
    "case_when_dispatch",
    oracle="""
    select event_id,
           case when event_type = 'purchase' then 'revenue'
                when event_type = 'error' then 'ops'
                else 'engagement' end as channel
    from events
    """,
    tags=("filter",),
)
def case_when_dispatch(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "error", "ops")
        .otherwise("engagement")
        .alias("channel"),
    )


# --- P5: error-row predicate ---------------------------------------------
# Reference: df['error'].notna() (evaluate_test_run.py:93); the events
# table's 'error' event_type plays the role of the error rows.


@query(
    "filter_error_rows",
    oracle="select event_id, user_id, value from events where event_type = 'error'",
    tags=("filter",),
)
def filter_error_rows(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
    )


# --- P6/F5: prefix predicate ---------------------------------------------
# Reference: artifact.name.startswith('processed-parquet-data-')
# (aggregator.yml:74, coordinator.yml:139)


@query(
    "filter_prefix",
    oracle="select o_orderkey, o_orderpriority from orders where o_orderpriority like '1-%'",
    tags=("filter",),
)
def filter_prefix(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .where(F.col("o_orderpriority").startswith("1-"))
        .select("o_orderkey", "o_orderpriority")
    )


# --- P7/F9: temporal predicate -------------------------------------------
# Reference: run.created_at >= coordinator.created_at (aggregator.yml:55-57)


@query(
    "filter_temporal",
    oracle="""
    select o_orderkey, o_orderdate from orders
    where o_orderdate >= timestamp '1998-01-01 00:00:00'
    """,
    tags=("filter",),
)
def filter_temporal(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_orderdate")
    )


# --- P8: compound status predicate ---------------------------------------
# Reference: completed ∧ dispatch-event ∧ branch-match (coordinator.yml:105-116)


@query(
    "filter_compound",
    oracle="""
    select o_orderkey from orders
    where o_orderstatus = 'O'
      and o_orderpriority like '1-%'
      and o_orderdate >= timestamp '1997-01-01 00:00:00'
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").startswith("1-")
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey")


# --- F6: regex extract (capture group) -----------------------------------
# Reference: match(/processed-parquet-data-(\d+k-\d+k)/) (aggregator.yml:89)


@query(
    "fn_regexp_extract",
    oracle=r"select c_custkey, regexp_extract(c_name, '(\d+)', 1) as name_num from customer",
    tags=("scalar", "string"),
)
def fn_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "customer").select(
        "c_custkey", F.regexp_extract("c_name", r"(\d+)", 1).alias("name_num")
    )


# --- F8: timestamp format -------------------------------------------------
# Reference: strftime('%Y%m%d_%H%M%S') (processor :395)


@query(
    "fn_date_format",
    oracle="select o_orderkey, strftime(o_orderdate, '%Y-%m') as order_month from orders",
    tags=("scalar", "temporal"),
)
def fn_date_format(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    )


# --- F10: string concat / format -----------------------------------------


@query(
    "fn_concat",
    oracle="select n_nationkey, n_name || '-' || cast(n_regionkey as varchar) as tag from nation",
    tags=("scalar", "string"),
)
def fn_concat(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "nation").select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("-"), F.col("n_regionkey").cast("string")).alias("tag"),
    )


# --- F12: least + cast ----------------------------------------------------
# Reference: min(remaining, max_records), int() casts (processor :434-437,460)


@query(
    "fn_least_cast",
    oracle="""
    select l_orderkey, l_linenumber,
           cast(least(l_quantity, 25.0) as int) as capped_qty
    from lineitem
    """,
    tags=("scalar",),
)
def fn_least_cast(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.col("l_quantity"), F.lit(25.0)).cast("int").alias("capped_qty"),
    )


# --- F13: elapsed-seconds arithmetic -------------------------------------
# Reference: time.time() - start_time (processor :305,335). Session TZ is
# UTC so unix_timestamp matches DuckDB's epoch() on naive timestamps.


@query(
    "fn_ts_diff",
    oracle="""
    select l.l_orderkey, l.l_linenumber,
           cast(epoch(l.l_shipdate) - epoch(o.o_orderdate) as bigint) as ship_delay_s
    from lineitem l join orders o on l.l_orderkey = o.o_orderkey
    """,
    tags=("scalar", "temporal"),
)
def fn_ts_diff(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")).alias("ship_delay_s"),
    )


# Generator source: spark.range — the manifest-index generator (the
# reference derives segment index ranges arithmetically,
# test_parquet_coordinator.yml:262-276; range() is its Spark source).
@query(
    "scan_range",
    oracle="""
    select i as idx, i * i as idx_sq, i // 1000 as segment
    from generate_series(0, 9999) as t(i)
    """,
    tags=("scan", "generator"),
)
def scan_range(spark: SparkSession, sf: str) -> DataFrame:
    return spark.range(0, 10000).select(
        F.col("id").alias("idx"),
        (F.col("id") * F.col("id")).alias("idx_sq"),
        (F.col("id") / 1000).cast("long").alias("segment"),
    )
