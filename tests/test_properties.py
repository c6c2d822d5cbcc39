"""Property-based checks (hypothesis): invariants that must hold for
ANY data, not just the synthetic tables — sink round-trip fidelity
under adversarial values (unicode, quotes, newlines, NaN, extremes)
and dedup partition laws.
"""

from __future__ import annotations

import math
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SCHEMA = "k long, x double, s string"

rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True),
            st.none(),
        ),
        st.one_of(st.text(max_size=40), st.none()),
    ),
    min_size=1,
    max_size=25,
)

prop = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _key(t):
    k, x, s = t
    if x is not None and math.isnan(x):
        x = "nan"
    return (k, repr(x), s is None, s or "")


@given(data=rows)
@prop
def test_parquet_roundtrip_is_lossless(spark, tmp_path_factory, data):
    df = spark.createDataFrame([Row(k=k, x=x, s=s) for k, x, s in data], SCHEMA)
    out = tempfile.mkdtemp(prefix="prop_parquet_", dir=tmp_path_factory.getbasetemp())
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out).collect()
    assert sorted(map(_key, ((r.k, r.x, r.s) for r in back))) == sorted(map(_key, data))


@given(data=rows)
@prop
def test_json_roundtrip_preserves_non_null(spark, tmp_path_factory, data):
    # JSON cannot carry NaN/Inf or distinguish absent vs null — restrict
    # to finite/None, which the sink contract documents.
    data = [(k, None if x is None or not math.isfinite(x) else x, s) for k, x, s in data]
    df = spark.createDataFrame([Row(k=k, x=x, s=s) for k, x, s in data], SCHEMA)
    out = tempfile.mkdtemp(prefix="prop_json_", dir=tmp_path_factory.getbasetemp())
    df.write.mode("overwrite").json(out)
    back = spark.read.schema(SCHEMA).json(out).collect()
    assert sorted(map(_key, ((r.k, r.x, r.s) for r in back))) == sorted(map(_key, data))


texts = st.lists(st.text(alphabet="ab \n", min_size=0, max_size=30), min_size=1, max_size=15)


@given(data=texts)
@prop
def test_exact_dedup_partitions_rows(spark, data):
    # dedup groups partition the input: group sizes sum to row count,
    # one group per distinct text, keep_id is the minimal member.
    df = spark.createDataFrame(
        [Row(doc_id=i, text=s) for i, s in enumerate(data)], "doc_id long, text string"
    )
    out = (
        df.groupBy(F.md5(F.col("text").cast("binary")).alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .collect()
    )
    assert sum(r.n_copies for r in out) == len(data)
    assert len(out) == len(set(data))
    firsts = {}
    for i, s in enumerate(data):
        firsts.setdefault(s, i)
    assert sorted(r.keep_id for r in out) == sorted(firsts.values())


keys = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40),
    min_size=1,
    max_size=40,
    unique=True,
)


@given(data=keys)
@prop
def test_global_row_number_is_dense_sorted_rank(spark, data):
    # Two-phase global index law: for ANY distinct key set, rn must be
    # exactly the 1-based rank in sorted order — dense, no gaps, no
    # dependence on partitioning or bucket boundaries.
    from parquet_processor_spark.ops.windows import global_row_number

    df = spark.createDataFrame([(k,) for k in data], "k long").repartition(4)
    out = {r["k"]: r["rn"] for r in global_row_number(df, "k").collect()}
    want = {k: i + 1 for i, k in enumerate(sorted(data))}
    assert out == want


# --- round-5 operator family invariants --------------------------------


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
    ),
    members=st.sets(st.integers(min_value=0, max_value=10_000), max_size=8),
)
@prop
def test_bloom_filter_never_false_negative(spark, keys, members):
    # The md5-derived portable bloom (ops/scale_patterns.join_bloom_filtered)
    # must NEVER reject a true member, for ANY key set — the FP rate is
    # data-dependent, the zero-FN guarantee is structural.
    from parquet_processor_spark.ops.scale_patterns import (
        _BLOOM_BITS_PER_KEY,
        _BLOOM_SEEDS,
        _bloom_pos,
    )

    build = spark.createDataFrame(
        [Row(k=int(m)) for m in members] or [Row(k=None)], "k long"
    ).where(F.col("k").isNotNull())
    m_row = build.agg(
        (F.lit(_BLOOM_BITS_PER_KEY) * F.greatest(F.count(F.lit(1)), F.lit(1))).alias("m")
    )
    bits = (
        build.crossJoin(F.broadcast(m_row))
        .select(
            F.explode(F.array(*[_bloom_pos(s, F.col("k")) for s in _BLOOM_SEEDS])).alias("b")
        )
        .agg(F.sort_array(F.collect_set("b")).alias("bits"))
    )
    probe = spark.createDataFrame([Row(k=int(k)) for k in keys], "k long")
    flagged = (
        probe.crossJoin(F.broadcast(bits))
        .crossJoin(F.broadcast(m_row))
        .select(
            "k",
            (
                F.array_contains("bits", _bloom_pos(_BLOOM_SEEDS[0], F.col("k")))
                & F.array_contains("bits", _bloom_pos(_BLOOM_SEEDS[1], F.col("k")))
            ).alias("pass"),
        )
        .collect()
    )
    for r in flagged:
        if r.k in members:
            assert r.pass_ if hasattr(r, "pass_") else r["pass"], f"false negative for member {r.k}"


@given(
    vals=st.lists(
        st.one_of(st.floats(allow_nan=False, allow_infinity=False, width=32), st.none()),
        min_size=1,
        max_size=20,
    )
)
@prop
def test_rolling_median_matches_brute_force(spark, vals):
    # The array-spelled frame median (ops/window_more.window_rolling_median
    # rewrite) must equal a per-row brute-force median of the trailing
    # 5 non-null values, including interpolation on even counts.
    from pyspark.sql import Window

    data = [Row(i=i, v=float(v) if v is not None else None) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "i long, v double")
    w = Window.partitionBy(F.lit(1)).orderBy("i").rowsBetween(-4, Window.currentRow)
    arr = F.array_sort(F.collect_list("v").over(w))
    n = F.size(arr)
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise(
            (
                F.element_at(arr, (n / 2).cast("int"))
                + F.element_at(arr, (n / 2 + 1).cast("int"))
            )
            / F.lit(2.0)
        )
    )
    got = {r.i: r.m for r in df.select("i", med.alias("m")).collect()}
    for i in range(len(vals)):
        window_vals = sorted(
            v for v in (vals[max(0, i - 4): i + 1]) if v is not None
        )
        if not window_vals:
            expect = None
        else:
            k = len(window_vals)
            expect = (
                window_vals[k // 2]
                if k % 2 == 1
                else (window_vals[k // 2 - 1] + window_vals[k // 2]) / 2.0
            )
        g = got[i]
        if expect is None:
            assert g is None
        else:
            assert g == pytest.approx(expect, nan_ok=True)


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # order id
            st.integers(min_value=0, max_value=15),  # part id
        ),
        min_size=1,
        max_size=50,
    )
)
@prop
def test_copurchase_pairs_match_naive_self_join(spark, baskets):
    # The basket-generator pair expansion must equal the naive distinct
    # self-join for ANY order/part multiset (duplicates collapse).
    from itertools import combinations

    df = spark.createDataFrame(
        [Row(o=o, p=p) for o, p in baskets], "o long, p long"
    )
    collapsed = df.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("parts"))
    pairs = (
        collapsed.select(F.posexplode("parts").alias("i", "p1"), "parts")
        .select(
            "p1",
            F.explode(
                F.expr("slice(parts, i + 2, greatest(size(parts) - i - 1, 0))")
            ).alias("p2"),
        )
        .groupBy("p1", "p2")
        .count()
        .collect()
    )
    got = {(r.p1, r.p2): r["count"] for r in pairs}
    expect: dict = {}
    from collections import defaultdict

    per_order = defaultdict(set)
    for o, p in baskets:
        per_order[o].add(p)
    exp = defaultdict(int)
    for parts in per_order.values():
        for a, b in combinations(sorted(parts), 2):
            exp[(a, b)] += 1
    assert got == dict(exp)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # group
            st.integers(min_value=-1000, max_value=1000),  # value
            st.integers(min_value=1, max_value=9),      # weight
        ),
        min_size=1,
        max_size=30,
    )
)
@prop
def test_weighted_median_matches_expansion(spark, vals):
    # The weighted median of (v, w) must equal the ordinary lower
    # median of the multiset where each v repeats w times — the
    # defining property, checked against a plain python expansion.
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [Row(g=g, v=float(v), w=w) for g, v, w in vals], "g long, v double, w long"
    )
    vw = df.groupBy("g", "v").agg(F.sum("w").alias("w"))
    wcum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("g")
    c = vw.select("g", "v", F.sum("w").over(wcum).alias("cw"), F.sum("w").over(wtot).alias("tw"))
    got = {
        r["g"]: r["m"]
        for r in c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .collect()
    }
    expanded: dict[int, list[float]] = {}
    for g, v, w in vals:
        expanded.setdefault(g, []).extend([float(v)] * w)
    for g, xs in expanded.items():
        xs.sort()
        # lower median: smallest x with cumulative count >= half the total
        n = len(xs)
        want = xs[(n - 1) // 2] if n % 2 else xs[n // 2 - 1]
        assert got[g] == want, (g, xs, got[g], want)


def test_bpe_merge_round_is_overlap_safe(spark):
    # 'a b a b' must fuse BOTH occurrences of the top pair (a,b) in
    # one round — naive single-space replace misses the second
    # occurrence because consecutive matches share a separator (the
    # double-space surgery exists exactly for this). Counts are
    # weighted by cnt; the fused pair must vanish from the next
    # round's pair counts.
    from parquet_processor_spark.ops.text import _bpe_merge_round, _bpe_pairs

    syms = spark.createDataFrame(
        [("a b a b", 2), ("a b c", 1), ("x a b", 1)], "sym string, cnt long"
    )
    top, merged = _bpe_merge_round(syms, weight="cnt")
    [(pa, pb, n)] = top.collect()
    assert (pa, pb, n) == ("a", "b", 6)
    got = {r["sym"]: r["cnt"] for r in merged.collect()}
    assert got == {"ab ab": 2, "ab c": 1, "x ab": 1}
    nxt = {r["pair"]: r["n"] for r in _bpe_pairs(merged, "cnt").collect()}
    assert "a b" not in nxt and nxt.get("ab ab") == 2


def test_bpe_pairs_single_symbol_rows_contribute_nothing(spark):
    # Spark's sequence(1, 0) is DESCENDING [1, 0] — without the n>=2
    # guard a one-symbol row crashes on element_at(ws, 0) and would
    # emit a phantom single-symbol "pair" where DuckDB emits none.
    from parquet_processor_spark.ops.text import _bpe_pairs

    syms = spark.createDataFrame(
        [("solo",), ("",), ("a b",)], "sym string"
    )
    got = {r["pair"]: r["n"] for r in _bpe_pairs(syms).collect()}
    assert got == {"a b": 1}


@given(
    toks=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_count_min_never_underestimates(spark, toks):
    # The CMS one-sided guarantee must hold for ANY token multiset:
    # est >= exact for every key, and est == exact when the key's
    # buckets are collision-free in some row.
    from parquet_processor_spark.ops.aggregates import cms_from_tokens

    df = spark.createDataFrame([(x,) for x in toks], "tok string")
    rows = cms_from_tokens(df).collect()
    exact = {}
    for x in toks:
        exact[x] = exact.get(x, 0) + 1
    assert {r["tok"] for r in rows} == set(exact)
    for r in rows:
        assert r["n_exact"] == exact[r["tok"]]
        assert r["n_est"] >= r["n_exact"]
    # sketch mass conservation: each of the d rows holds every token
    # exactly once, so sum of (est - exact) is bounded by total mass
    total = len(toks)
    for r in rows:
        assert r["n_est"] <= total


@given(
    months=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=30)
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bitmap_popcount_equals_distinct_count(spark, months):
    # bit_or month-bitmap + popcount must agree with count(distinct)
    # for ANY month multiset, at any partitioning (bit_or is
    # associative + commutative + idempotent).
    df = spark.createDataFrame([(m,) for m in months], "m int").repartition(4)
    bm = F.bit_or(F.expr("shiftleft(cast(1 as bigint), m - 1)"))
    row = df.agg(
        bm.alias("bitmap"),
        F.bit_count(bm).alias("pop"),
        F.countDistinct("m").alias("nd"),
    ).collect()[0]
    assert row["pop"] == row["nd"] == len(set(months))
    assert row["bitmap"] == sum(1 << (m - 1) for m in set(months))


fc_spine = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),   # day offset
        st.integers(min_value=1, max_value=1000),  # daily count
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(spine=fc_spine, shift=st.integers(min_value=-3000, max_value=3000))
@prop
def test_forecast_is_invariant_to_calendar_shifts(spark, spine, shift):
    # The OLS rebase (x = days since the type's own min date) makes the
    # fit a function of the SHAPE of the series, not its calendar
    # position: shifting every date by the same k days must reproduce
    # slope/intercept/r2/forecasts bitwise.
    import datetime

    from parquet_processor_spark.ops.temporal import forecast_of_daily

    base = datetime.date(2020, 6, 1)

    def run(k):
        rows = [("t", base + datetime.timedelta(days=off + k), y) for off, y in spine]
        df = spark.createDataFrame(rows, "event_type string, d date, y long")
        out = forecast_of_daily(df).collect()
        return out[0] if out else None

    a, b = run(0), run(shift)
    if a is None:
        assert b is None  # degenerate (zero x-variance) stays degenerate
        return
    for col in ("n_days", "slope", "intercept", "r2", "forecast_next", "forecast_7d"):
        assert a[col] == b[col], col


@given(spine=fc_spine, a0=st.integers(min_value=0, max_value=50),
       b0=st.integers(min_value=-20, max_value=20))
@prop
def test_forecast_recovers_an_exact_line(spark, spine, a0, b0):
    # Feed counts that sit EXACTLY on y = a0 + b0*x (clamped positive):
    # the closed-form moments must recover the slope exactly when the
    # line is representable, r2 must be 1 (or the fit degenerate), and
    # the forecasts must extrapolate the same line.
    import datetime

    from parquet_processor_spark.ops.temporal import forecast_of_daily

    base = datetime.date(2021, 1, 1)
    xs = sorted(off for off, _ in spine)
    ys = {x: a0 + b0 * (x - xs[0]) for x in xs}
    if any(y < 0 for y in ys.values()):
        return  # counts must be non-negative; skip unrepresentable lines
    rows = [("t", base + datetime.timedelta(days=x), ys[x]) for x in xs]
    df = spark.createDataFrame(rows, "event_type string, d date, y long")
    out = forecast_of_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["slope"] == float(b0)
    assert r["intercept"] == float(a0)
    if b0 != 0:
        assert r["r2"] == 1.0
    else:
        assert r["r2"] is None  # constant y: zero variance, r2 undefined
    assert r["forecast_next"] == float(a0 + b0 * (xs[-1] - xs[0] + 1))
    assert r["forecast_7d"] == float(a0 + b0 * (xs[-1] - xs[0] + 7))


# Calibration-table invariants (N168): for ANY (score, label) spine —
# not just the fixture — the deciles must partition the population
# (sizes differ by <= 1, counts sum to n), per-bin rates must be
# consistent with the raw sums, and the ECE identity must hold in
# EXACT integers: sum over bins of n_users * abs_gap * (n_users * mx)
# ... folded back, |sum_score - mx * n_pos| summed equals the same
# statistic computed directly from the spine.
_cal_spine = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),   # score (views)
        st.integers(min_value=0, max_value=1),    # label (purchased)
    ),
    min_size=1,
    max_size=40,
)


@given(data=_cal_spine)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_calibration_bins_partition_and_gap_identity(spark, tmp_path_factory, data):
    import os

    from parquet_processor_spark.registry import all_queries

    d = tempfile.mkdtemp(prefix="prop_cal_", dir=tmp_path_factory.getbasetemp())
    # synthesize an events table producing exactly this (score, label)
    # spine: user u emits `score` views and `label` purchases
    ev = []
    eid = 0
    for u, (score, label) in enumerate(data):
        for _ in range(score):
            ev.append((eid, u, "view")); eid += 1
        if label:
            ev.append((eid, u, "purchase")); eid += 1
        if score == 0 and not label:
            ev.append((eid, u, "click")); eid += 1  # keep the user visible
    spark.createDataFrame(
        [(e, "2024-01-01 00:00:00", u, t_, 1.0, "{}") for (e, u, t_) in ev],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    rows_ = all_queries()["agg_calibration"](spark, d).collect()
    n = len(data)
    sizes = [r["n_users"] for r in rows_]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    mx = max(s for s, _ in data)
    direct = sum(abs(s - mx * l) for s, l in data) if mx else None
    for r in rows_:
        assert 0.0 <= r["frac_pos"] <= 1.0
        if mx == 0:
            assert r["mean_pred"] is None and r["abs_gap"] is None
        else:
            assert 0.0 <= r["mean_pred"] <= 1.0
    if mx:
        # ECE identity: per-bin |sum_score - mx*n_pos| recovered from
        # the emitted gap (abs_gap * n_users * mx is exactly integral)
        recovered = sum(round(r["abs_gap"] * r["n_users"] * mx) for r in rows_)
        # bin-level |.| <= spine-level sum of |.| (triangle inequality),
        # and both sides agree when recomputed bin-by-bin
        per_bin = sum(abs(r["sum_score"] - mx * r["n_pos"]) for r in rows_)
        assert recovered == per_bin <= direct


# --- exact_ntile_cuts: the distributed-selection ntile must agree with
# the real window ntile for ANY spine — heavy ties, null classes,
# n < bins, single rows, clustered ids. The order key is drawn from a
# tiny domain so tie classes straddle boundaries (the level-3 path) in
# most examples.
ntile_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
        st.integers(min_value=0, max_value=10**6),
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda r: r[1],
)


@given(data=ntile_rows, n_bins=st.sampled_from([2, 3, 10]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_ntile_cuts_match_window_ntile(spark, data, n_bins):
    from pyspark.sql import Window

    from parquet_processor_spark.ops.ranked_bins import exact_ntile_cuts, ntile_assign

    df = spark.createDataFrame(
        [(1 if k is None else 0, 0.0 if k is None else float(k), oid) for k, oid in data],
        "nf int, okey double, oid long",
    )
    # small num_buckets so multi-class buckets and bucket-straddling
    # boundaries actually occur at test sizes
    cuts = exact_ntile_cuts(df, n_bins, num_buckets=4)
    got = {
        r["oid"]: r["bin"]
        for r in df.select(
            "oid",
            ntile_assign(cuts, F.col("nf"), F.col("okey"), F.col("oid")).alias("bin"),
        ).collect()
    }
    want = {
        r["oid"]: r["bin"]
        for r in df.select(
            "oid",
            F.ntile(n_bins)
            .over(Window.orderBy("nf", "okey", "oid"))
            .alias("bin"),
        ).collect()
    }
    assert got == want


def test_kendall_spearman_match_hand_computed_witness(spark, tmp_path_factory):
    # Textbook witness: x = 1..5 against y-ranks (2,1,4,3,5).
    # Discordant pairs are exactly {(1,2),(3,4)} -> C=8, D=2,
    # tau = 6/10 = 0.6; Spearman d^2 = 1+1+1+1+0 = 4 ->
    # rho = 1 - 6*4/(5*24) = 0.8. No ties, so tau_b == tau and the
    # average-rank machinery must reproduce the classic formulas
    # exactly (both values are dyadic rationals — bitwise-exact
    # doubles).
    import datetime as _dt

    from parquet_processor_spark.registry import all_queries
    from parquet_processor_spark.tables import TABLES, t as _t

    from .conftest import SF_SMALL

    d = tmp_path_factory.mktemp("rank_witness")
    ship = _dt.datetime(2024, 1, 1)
    discounts = [0.02, 0.01, 0.04, 0.03, 0.05]
    for tab in TABLES:
        base = _t(spark, SF_SMALL, tab).limit(0)
        if tab == "lineitem":
            rows = [
                (i + 1, i + 1, i + 1, 1, float(i + 1), 10.0, discounts[i], 0.0, "A", "O", ship)
                for i in range(5)
            ]
            base = base.unionByName(spark.createDataFrame(rows, base.schema))
        base.write.mode("overwrite").parquet(str(d / f"{tab}.parquet"))
    tau = all_queries()["agg_kendall_tau"](spark, str(d)).collect()[0]
    assert tau["concordant"] == 8 and tau["discordant"] == 2
    assert tau["tau_b"] == 0.6, tau
    rho = all_queries()["agg_spearman_rho"](spark, str(d)).collect()[0]
    assert rho["n"] == 5 and rho["rho"] == 0.8, rho


def test_mcnemar_cramers_anova_match_hand_computed_witnesses(spark, tmp_path_factory):
    # Three textbook fixtures, each small enough to compute by hand:
    # McNemar: b=3 docs pass only the char gate, c=1 only the token
    #   gate -> chi2 = (3-1)^2/(3+1) = 1.0, not significant.
    # Cramér: perfectly associated 2x2 (status A <-> priority P1,
    #   B <-> P2, 10 rows each) -> chi2 = n = 20, V^2 = 1.0 exactly.
    # ANOVA: source a = {1,2,3}, source b = {4,5,6} chars ->
    #   SSB = 13.5, SSW = 4, F = (13.5/1)/(4/4) = 13.5 exactly.
    from parquet_processor_spark.registry import all_queries
    from parquet_processor_spark.tables import TABLES, t as _t

    from .conftest import SF_SMALL

    q = all_queries()

    def fixture(doc_rows=None, order_rows=None):
        d = tmp_path_factory.mktemp("stats_witness")
        for tab in TABLES:
            base = _t(spark, SF_SMALL, tab).limit(0)
            if tab == "documents" and doc_rows:
                base = base.unionByName(spark.createDataFrame(doc_rows, base.schema))
            if tab == "orders" and order_rows:
                base = base.unionByName(spark.createDataFrame(order_rows, base.schema))
            base.write.mode("overwrite").parquet(str(d / f"{tab}.parquet"))
        return str(d)

    long_text = "w " * 100  # 100+ ws-tokens (passes the 80-token gate)
    short_text = "w w w"    # 3 tokens
    docs = (
        # both gates pass (2): chars >= 500, tokens >= 80
        [(i, long_text, "en", "s", 600) for i in range(2)]
        # only_a (3): chars >= 500, tokens < 80
        + [(10 + i, short_text, "en", "s", 600) for i in range(3)]
        # only_b (1): chars < 500, tokens >= 80
        + [(20, long_text, "en", "s", 100)]
        # neither (1)
        + [(30, short_text, "en", "s", 100)]
    )
    mc = q["agg_mcnemar"](spark, fixture(doc_rows=docs)).collect()[0]
    assert (mc["both_pass"], mc["only_a"], mc["only_b"], mc["neither"]) == (2, 3, 1, 1)
    assert mc["mcnemar_chi2"] == 1.0 and mc["significant_95"] is False

    import datetime as _dt

    od = _dt.datetime(2024, 1, 1)
    orders = [(i, 1, "A", 10.0, od, "P1") for i in range(10)] + [
        (100 + i, 1, "B", 10.0, od, "P2") for i in range(10)
    ]
    cv = q["agg_cramers_v"](spark, fixture(order_rows=orders)).collect()[0]
    assert cv["n"] == 20 and cv["chi2"] == 20.0 and cv["cramers_v2"] == 1.0

    docs2 = [(i, "x", "en", "a", i + 1) for i in range(3)] + [
        (10 + i, "x", "en", "b", i + 4) for i in range(3)
    ]
    an = q["agg_anova"](spark, fixture(doc_rows=docs2)).collect()[0]
    assert an["n"] == 6 and an["k_groups"] == 2
    assert an["ss_between"] == 13.5 and an["ss_within"] == 4.0
    assert an["f_stat"] == 13.5
