"""Regression guard: the driver's correctness harness builds its OWN
SparkSession without our session.py confs. tables.t() must still read
every table — in round 1 all events.parquet reads died with
PARQUET_TYPE_ILLEGAL (INT64 TIMESTAMP(NANOS)) because only our session
set spark.sql.legacy.parquet.nanosAsLong. t() now sets it at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_processor_spark.tables import t


def test_events_reads_in_unconfigured_session(spark, sf_dir):
    # newSession() shares the JVM but gets its own SQLConf; unset the
    # legacy conf to mimic the driver's vanilla session.
    fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    df = t(fresh, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0
    # the ns→µs conversion must yield sane timestamps, not epoch garbage
    yr = df.select(F.min(F.year("ts")).alias("y")).collect()[0].y
    assert 1990 <= yr <= 2100


def test_events_query_runs_in_unconfigured_session(spark, sf_dir):
    from parquet_processor_spark.registry import all_queries

    fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    out = all_queries()["agg_groupby_count"](fresh, sf_dir)
    assert out.count() > 0


def test_numeric_results_independent_of_partitioning(spark, sf_dir):
    # The determinism contract (numeric.py: decimal-exact sums, fixed
    # tie-breaks, single trailing double ops) must hold under ANY
    # parallelism — a partition-count-dependent result would pass the
    # local oracle and silently break on a real cluster. Run the most
    # numerically sensitive queries at 64 and at 7 shuffle partitions
    # and require identical values.
    from parquet_processor_spark.registry import all_queries

    sensitive = [
        "agg_corr", "feature_zscore", "agg_gini", "quality_bigram_lm",
        # round-6 numerically sensitive additions: exact-moment OLS,
        # EWMA lag chains, discrete-rank MAD/winsorize, 1/size weights,
        # decimal cohort LTV cumsum, Benford shares
        "agg_regression", "window_ewma", "feature_mad_outliers",
        "feature_winsorize", "sample_downweight_dups", "events_cohort_ltv",
        "agg_benford",
        # round-13: two-phase ranks whose tie ORDER is partition-
        # dependent but whose values must not be (gini re-covered
        # under the new rank path), pinned-order double folds, and
        # sorted listagg canonicalization
        "agg_trimmed_mean", "window_cume_dist", "agg_levene",
        "events_cem_att", "agg_hhi", "agg_string_agg",
        "graph_degree_assortativity", "events_autocorrelation",
        "report_embedding_health",
    ]
    qs = all_queries()
    wide = spark.newSession()
    narrow = spark.newSession()
    narrow.conf.set("spark.sql.shuffle.partitions", "7")
    for name in sensitive:
        a = sorted(map(tuple, qs[name](wide, sf_dir).collect()))
        b = sorted(map(tuple, qs[name](narrow, sf_dir).collect()))
        assert a == b, f"{name}: result depends on partition count"
