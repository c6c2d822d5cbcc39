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
