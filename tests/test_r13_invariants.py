"""Mathematical invariants of the round-13 operators on the fixture
tables — bounds and identities that must hold for ANY input, checked
beside the oracle parity (which pins the VALUES, not the math)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_processor_spark.registry import all_queries

from .conftest import SF_SMALL

Q = all_queries()


def test_hhi_bounds(spark):
    rows = Q["agg_hhi"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["hhi"] <= 1.0
        assert r["hhi"] >= 1.0 / r["n_suppliers"] - 1e-12
        if r["hhi_normalized"] is not None:
            assert -1e-12 <= r["hhi_normalized"] <= 1.0 + 1e-12


def test_acf_and_assortativity_are_correlations(spark):
    for r in Q["events_autocorrelation"](spark, SF_SMALL).collect():
        if r["acf"] is not None:
            assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
    [g] = Q["graph_degree_assortativity"](spark, SF_SMALL).collect()
    if g["assortativity"] is not None:
        assert -1.0 - 1e-9 <= g["assortativity"] <= 1.0 + 1e-9


def test_trimmed_mean_bounds_and_counts(spark):
    [r] = Q["agg_trimmed_mean"](spark, SF_SMALL).collect()
    assert r["n_kept"] == r["n"] - 2 * r["k_each_side"]
    src = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .where(F.col("o_orderstatus") == "F")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()[0]
    )
    assert src["lo"] <= r["trimmed_mean"] <= src["hi"]


def test_cume_dist_is_a_cdf(spark):
    df = Q["window_cume_dist"](spark, SF_SMALL)
    rows = df.orderBy("o_totalprice", "o_orderkey").collect()
    assert rows and abs(max(r["cd"] for r in rows) - 1.0) < 1e-12
    last = 0.0
    for r in rows:
        assert r["cd"] >= last - 1e-12  # monotone in the order value
        assert 0.0 < r["cd"] <= 1.0
        last = r["cd"]


def test_time_embargo_gap_holds(spark):
    rows = {r["split"]: r for r in Q["split_time_embargo"](spark, SF_SMALL).collect()}
    assert set(rows) == {"train", "embargo", "test"}
    assert str(rows["train"]["max_ts"]) < "2024-01-19"
    assert str(rows["test"]["min_ts"]) >= "2024-01-22"
    assert "2024-01-19" <= str(rows["embargo"]["min_ts"])
    assert str(rows["embargo"]["max_ts"]) < "2024-01-22"


def test_levene_decomposition_nonnegative(spark):
    [r] = Q["agg_levene"](spark, SF_SMALL).collect()
    assert r["ss_between"] >= -1e-6 and r["ss_within"] >= -1e-6
    assert r["k_groups"] >= 1 and r["n"] > 0


def test_proportions_and_cochran_sanity(spark):
    [z] = Q["agg_proportions_ztest"](spark, SF_SMALL).collect()
    assert 0.0 <= z["p_a"] <= 1.0 and 0.0 <= z["p_b"] <= 1.0
    assert z["x_a"] <= z["n_a"] and z["x_b"] <= z["n_b"]
    [q] = Q["agg_cochran_q"](spark, SF_SMALL).collect()
    for c in ("c1", "c2", "c3"):
        assert 0 <= q[c] <= q["n_users"]
    if q["q_stat"] is not None:
        assert q["q_stat"] >= 0.0


def test_string_agg_lists_are_sorted_and_counted(spark):
    for r in Q["agg_string_agg"](spark, SF_SMALL).collect():
        segs = r["segments"].split(",")
        assert segs == sorted(segs) and len(segs) == r["n_segments"]
        if r["top_customers"] is not None:
            assert 1 <= len(r["top_customers"].split(",")) <= 3


def test_date_shift_preserves_spans(spark):
    rows = Q["anonymize_date_shift"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -14 <= r["shift_days"] <= 14
        assert r["span_preserved"] is True
        assert r["span_sec"] == r["span_sec_shifted"]


def test_feature_windows_are_nested(spark):
    rows = Q["feature_time_windows"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_1d"] <= r["n_7d"] <= r["n_30d"]
        assert 1 <= r["days_active_30d"] <= 30
        assert r["recency_sec"] >= 0


def test_cem_matched_subset(spark):
    [r] = Q["events_cem_att"](spark, SF_SMALL).collect()
    assert 0 <= r["n_bins_matched"] <= r["n_bins"] <= 4
    if r["n_treated_matched"] == 0:
        assert r["att_dollars"] is None


def test_embedding_health_moments(spark):
    rows = Q["report_embedding_health"](spark, SF_SMALL).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["variance"] >= -1e-12
        assert 0.0 <= r["zero_frac"] <= 1.0
        assert r["dead_dim"] == (abs(r["variance"]) < 1e-18)


def test_ivf_recall_curve_monotone_and_exhaustive_at_full_probe(spark):
    rows = {r["probe_num"]: r for r in Q["report_ivf_recall_curve"](spark, SF_SMALL).collect()}
    assert sorted(rows) == [1, 2, 4, 6, 8]
    # the resolved absolute depths follow the derived geometry:
    # nprobe = max(2, floor(n_cells * num / 8)) — monotone in num,
    # full probe covers every cell
    nprobes = [rows[p]["nprobe"] for p in (1, 2, 4, 6, 8)]
    assert nprobes == sorted(nprobes) and nprobes[0] >= 2
    overlaps = [rows[p]["n_overlap"] for p in (1, 2, 4, 6, 8)]
    assert overlaps == sorted(overlaps), f"curve not monotone: {overlaps}"
    full = rows[8]
    assert full["n_overlap"] == full["n_brute"] > 0, "full probe must be exhaustive"
