"""Similarity search over embeddings (SURVEY.md §2.13 N3).

Brute-force cosine top-k is the correctness baseline; the scale paths
are (a) label-blocked all-pairs (the blocking key stands in for an IVF
cell / LSH bucket) and (b) random-hyperplane LSH bucketing. Dot
products are computed with zip_with/aggregate higher-order functions —
JVM-side, float→double exact casts, sequential summation, so the
DuckDB oracle (same expression spelled with list comprehensions)
matches after round(…, 6).

At 100 TB: precompute norms once per row (done here), broadcast the
query vector(s), and prune with the bucket join before any dot product
is evaluated — the all-pairs product never materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_processor_spark.io import scratch_dir
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

# Identical dot-product spelling for both engines: a sequential left
# fold (list_reduce ↔ F.aggregate), starting from 0.0, so the double
# summation order is identical and results match bitwise — no rounding.
_DOT_SQL = (
    "list_reduce(list_prepend(cast(0 as double), "
    "[cast(a.embedding[i] as double) * cast(b.embedding[i] as double) "
    "for i in generate_series(1, len(a.embedding))]), (acc, v) -> acc + v)"
)
_NORM_A_SQL = (
    "sqrt(list_reduce(list_prepend(cast(0 as double), "
    "[cast(x as double) * cast(x as double) for x in a.embedding]), (acc, v) -> acc + v))"
)
_NORM_B_SQL = (
    "sqrt(list_reduce(list_prepend(cast(0 as double), "
    "[cast(x as double) * cast(x as double) for x in b.embedding]), (acc, v) -> acc + v))"
)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def assign_cells(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Map-side IVF cell assignment: collect the (cid, c_emb) centroid
    table once (bounded control state — sqrt(N) rows by the derived
    geometry), broadcast it to the executors inside an Arrow kernel's
    closure, and pick each vector's best cell with a per-batch NumPy
    argmax — one ArrowEvalPython pass beside the scan, zero shuffle.

    r14 optimization (guide §4.2, the pair_cos_arrow precedent): the
    previous shape evaluated three interpreted higher-order folds per
    (row, centroid) — dot + both norms via zip_with/aggregate — which
    at the SF-derived cell count (n_cells = √N) cost ~3.1 s at sf0.1
    vs 0.30 s for this kernel (measured; plans/r14). Bit-exactness is
    preserved because np.cumsum accumulates left-to-right exactly like
    the sequential fold (float32→float64 casts are exact, norms are
    the same sqrt-of-fold, the cosine is the same one-IEEE-division of
    dot/(na*nc)), np.argmax resolves ties — and NaNs — to the lowest
    centroid id exactly like the previous (s, -cid) struct max, and
    the bitwise equality of every (cell, best_cos) against the old
    expression tree is pinned by tests/test_dedup_vector.py.

    The naive shape (crossJoin + groupBy + max_by) funnels the FULL
    float vectors through an Exchange just to pick a winner — at 100 TB
    that is a corpus-wide shuffle of the widest column for what is
    per-row arithmetic (FAISS assigns cells map-side for the same
    reason, with exactly this broadcast-centroid layout).

    Returns e's columns plus ``cell`` (winning centroid id) and
    ``best_cos`` (its cosine score).
    """
    rows = cent.select("cid", "c_emb").collect()  # eager-by-design:
    # n_cells = sqrt(N) control rows — the same mass the previous
    # shape collapsed into a single broadcast array row
    rows.sort(key=lambda r: r["cid"])  # argmax-first-hit == lowest cid
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cmat = (
        np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 0), dtype=np.float64)
    )
    # centroid norms once per centroid: sqrt of the same left fold
    ncs = (
        np.sqrt(np.cumsum(cmat * cmat, axis=1)[:, -1])
        if len(rows)
        else np.zeros(0, dtype=np.float64)
    )

    @F.pandas_udf("cell bigint, best_cos double")
    def _best(emb: pd.Series) -> pd.DataFrame:
        n = len(emb)
        mask = np.array([v is not None for v in emb], dtype=bool)
        if n == 0 or len(cids) == 0 or not mask.any():
            none = pd.Series([None] * n, dtype="object")
            return pd.DataFrame({"cell": none, "best_cos": none})
        emat = np.stack([np.asarray(v, dtype=np.float64) for v in emb[mask]])
        na = np.sqrt(np.cumsum(emat * emat, axis=1)[:, -1])
        scores = np.empty((emat.shape[0], len(cids)), dtype=np.float64)
        for j in range(len(cids)):
            scores[:, j] = np.cumsum(emat * cmat[j], axis=1)[:, -1] / (na * ncs[j])
        idx = np.argmax(scores, axis=1)  # ties and NaNs -> first hit == lowest cid
        if mask.all():
            return pd.DataFrame(
                {"cell": cids[idx], "best_cos": scores[np.arange(len(idx)), idx]}
            )
        # null embeddings emit (null, null). Precondition: every
        # fixture embedding is non-null (generation fills all rows;
        # the empty-input suite covers the 0-row case), so this branch
        # only guards pathological input. NOTE the old struct-max shape
        # differed here — (lowest cid, null) — but only for null
        # embeddings, which cannot occur in fixtures; non-null rows
        # keep their argmax
        cell = pd.Series([None] * n, dtype="object")
        best = pd.Series([None] * n, dtype="object")
        cell[mask] = list(cids[idx])
        best[mask] = list(scores[np.arange(len(idx)), idx])
        return pd.DataFrame({"cell": cell, "best_cos": best})

    return e.withColumn("_best", _best(F.col("embedding"))).select(
        *e.columns,
        F.col("_best.cell").alias("cell"),
        F.col("_best.best_cos").alias("best_cos"),
    )


# N3 baseline: brute-force cosine top-k against a fixed query vector
# (the embedding of vec_id=0), query side broadcast.
@query(
    "sim_topk",
    oracle=f"""
    select b.vec_id,
           {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) as cos_sim
    from (select embedding from embeddings where vec_id = 0) a
    cross join (select vec_id, embedding from embeddings where vec_id <> 0) b
    order by {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) desc, b.vec_id
    limit 10
    """,
    tags=("vector", "bench"),
)
def sim_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    base = e.where(F.col("vec_id") != 0).select("vec_id", "embedding")
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.col("cos_raw").alias("cos_sim"))
    )


# N3 near-dup variant: label-blocked all-pairs cosine ≥ threshold.
# The label equi-join is the blocking step (IVF-cell analog): pairs only
# form within a block, so cost is Σ block² not N².
@query(
    "sim_pairs_blocked",
    oracle=f"""
    select a.vec_id as vec_a, b.vec_id as vec_b,
           {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) as cos_sim
    from embeddings a join embeddings b
      on a.label = b.label and a.vec_id < b.vec_id
    where {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) >= 0.18
    """,
    tags=("vector", "dedup"),
)
def sim_pairs_blocked(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .where(cos >= 0.18)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
    )


# N3 scale path: random-hyperplane LSH, BANDED. A single h-bit sketch
# requires all h signs to agree, so collision probability decays as
# p^h (p = 1 - theta/pi per plane) — at the loose tau=0.18 threshold
# (theta ~ 80 deg, p ~ 0.56) an 8-bit sketch collides on ~1% of true
# pairs. The standard fix (Indyk-Motwani banding, same scheme
# dedup_near uses for MinHash) is L independent bands of r planes:
# a pair is a candidate if it agrees on ALL r planes of ANY band, so
# recall = 1 - (1 - p^r)^L. Band keys are injective (band*8 + sig,
# sig < 2^r), so unrelated (band, sig) combinations never collide.
#
# Hyperplane coefficients are PRECOMPUTED literal arrays (md5-derived
# driver-side, exactly-representable doubles), embedded identically in
# the Spark plan and in the DuckDB oracle SQL — which is what makes the
# banded candidate set hash-checkable cross-engine (the previous
# per-row xxhash64 coefficients had no DuckDB equivalent). Literal
# planes are also cheaper: no per-row hash evaluation, the projection
# is a pure fused multiply-add fold inside codegen.
_N_PLANES = 8
_N_BANDS = 8
_PLANES_PER_BAND = 3
_COEFF_DIM = 64  # testdata embeddings are 64-d at every SF (TESTDATA.md);
# shorter vectors slice the plane, longer ones need _COEFF_DIM raised.


def _plane_coeffs(plane: int) -> list[float]:
    """Deterministic coefficients in [-1, 1), one per dimension.

    h = 20 md5 bits → h/2^19 - 1.0 is exactly representable (≤ 20
    significand bits), so repr() round-trips bit-exactly through both
    engines' float parsers — the sign of the projection is the same
    IEEE double comparison on both sides."""
    import hashlib

    out = []
    for i in range(1, _COEFF_DIM + 1):
        h = int(hashlib.md5(f"plane{plane}_{i}".encode()).hexdigest()[:5], 16)
        out.append(h / float(1 << 19) - 1.0)
    return out


def _plane_sign(emb: Column, plane: int) -> Column:
    coeff = F.slice(F.lit(_plane_coeffs(plane)), F.lit(1), F.size(emb))
    proj = F.aggregate(
        F.zip_with(emb, coeff, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(emb: Column) -> Column:
    """Bit-pack sign(emb · plane_p) for p in 0.._N_PLANES-1 (single sketch).

    Kept as the building-block / test reference; the registered LSH
    queries use :func:`lsh_band_keys` (banded, recall-safe)."""
    bucket = F.lit(0)
    for p in range(_N_PLANES):
        bucket = bucket + _plane_sign(emb, p) * F.lit(1 << p)
    return bucket


def lsh_band_keys(emb: Column, n_bands: int = _N_BANDS) -> Column:
    """Array of ``n_bands`` band keys: key_b = b*8 + sig_b where sig_b
    packs the sign bits of band b's ``_PLANES_PER_BAND`` hyperplanes
    (sig < 8, so the key is injective — no hash mixing needed, and the
    same arithmetic is spelled verbatim in the DuckDB oracles). Explode
    + equi-join on the key = candidate generation; a pair colliding in
    any band becomes a candidate exactly once after pair-level
    dropDuplicates. The first ``_N_BANDS`` bands are a prefix of any
    larger ``n_bands`` (same planes), so raising the band count only
    adds probes — it never changes existing keys."""
    keys = []
    for band in range(n_bands):
        sig = F.lit(0)
        for j in range(_PLANES_PER_BAND):
            plane = _N_PLANES + band * _PLANES_PER_BAND + j  # disjoint from lsh_bucket's planes
            sig = sig + _plane_sign(emb, plane) * F.lit(1 << j)
        keys.append((F.lit(band * 8) + sig).cast("long"))
    return F.array(*keys)


def lsh_band_keys_arrow(n_bands: int = _N_BANDS):
    """Arrow-vectorized twin of :func:`lsh_band_keys` — returns a
    ``pandas_udf`` column function computing the SAME band keys.

    The sketch projection is a dense matmul, which interpreted
    higher-order-function folds evaluate element-by-element (~3 ms/row
    for 16 bands; measured 6 s warm over 2000 rows) — exactly the case
    the engine's UDF policy reserves Arrow kernels for. The numpy path
    is bit-exact with the JVM fold and therefore with the DuckDB
    oracles: ``np.cumsum`` is ``np.add.accumulate`` — a SEQUENTIAL
    left fold by specification (never pairwise like ``np.sum``) — over
    the identical float64 products, so every projection, sign, and key
    matches the JVM twin exactly (asserted vector-for-vector in
    tests/test_dedup_vector.py). ~4x warm speedup at sf0.1; the gap
    widens with corpus size.

    At 100 TB: one Arrow batch per task, planes shipped once in the
    closure (few KB), output is the same narrow (vec_id, band_key)
    stream the candidate join consumes — nothing else changes.
    """
    r = _PLANES_PER_BAND
    C = np.array(
        [_plane_coeffs(_N_PLANES + b * r + j) for b in range(n_bands) for j in range(r)]
    )

    @F.pandas_udf("array<bigint>")
    def keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        E = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        Cs = C[:, : E.shape[1]]
        proj = np.cumsum(E[:, None, :] * Cs[None, :, :], axis=2)[:, :, -1]
        signs = (proj > 0).astype(np.int64)
        sig = sum(signs[:, j::r] * (1 << j) for j in range(r))
        out = np.arange(n_bands, dtype=np.int64)[None, :] * 8 + sig
        return pd.Series(list(out))

    return keys


def _coeff_sql(plane: int) -> str:
    """The plane's coefficient list as a DuckDB literal — repr() round-
    trips each double exactly, so both engines hold identical planes."""
    return "[" + ",".join(repr(c) for c in _plane_coeffs(plane)) + "]"


def _band_key_sql(tbl: str, band: int) -> str:
    """DuckDB spelling of one band key: the same slice/zip/fold sign
    arithmetic as :func:`_plane_sign` + :func:`lsh_band_keys`."""
    bits = []
    for j in range(_PLANES_PER_BAND):
        plane = _N_PLANES + band * _PLANES_PER_BAND + j
        proj = (
            f"list_reduce(list_prepend(cast(0 as double), "
            f"[cast({tbl}.embedding[i] as double) * ({_coeff_sql(plane)})[i] "
            f"for i in generate_series(1, len({tbl}.embedding))]), (acc, v) -> acc + v)"
        )
        bits.append(f"(case when {proj} > 0 then {1 << j} else 0 end)")
    return f"cast({band * 8} + {' + '.join(bits)} as bigint)"


def _dot_sql(x: str, y: str) -> str:
    """DuckDB dot product between ``x.embedding`` and ``y.embedding``,
    spelled as the same sequential left fold as :func:`dot`."""
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"[cast({x}.embedding[i] as double) * cast({y}.embedding[i] as double) "
        f"for i in generate_series(1, len({x}.embedding))]), (acc, v) -> acc + v)"
    )


def _norm_sql(x: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(cast(0 as double), "
        f"[cast(v as double) * cast(v as double) for v in {x}.embedding]), (acc, v) -> acc + v))"
    )


def _cos_sql(x: str, y: str) -> str:
    return f"{_dot_sql(x, y)} / ({_norm_sql(x)} * {_norm_sql(y)})"


# Hot-bucket cap for the hyperplane-LSH posting-list family
# (dedup_embedding_lsh, sim_range_search, sim_knn_graph) — the same
# document-frequency discipline the shingle (_SHINGLE_DF_CAP) and
# audio (_AUDIO_DF_CAP) families enforce. A band key shared by d
# vectors contributes d*(d-1)/2 candidate pairs, so on a correlated
# corpus (near-duplicate web text => clustered embeddings — the
# NORMAL case at 100x) one bucket holding a large corpus fraction
# turns the blocked join quadratic AND overflows the task that
# collects its posting list. Buckets past the cap are dropped BEFORE
# any list is collected (count pre-aggregate + broadcast anti-join —
# the ops/multimodal.py _audio_capped_postings recipe), so neither
# failure mode can occur; an over-cap bucket carries no blocking
# signal anyway (its sign pattern matches a corpus-scale fraction,
# i.e. boilerplate geometry, not duplication). At the test SFs the
# largest bucket holds 371 vectors (sf0.1; 95 at sf0.01), so the cap
# provably changes nothing locally — it exists for the 100x corpus.
# Mirrored in every oracle via
# `qualify count(*) over (partition by band_key) <= cap`.
_EMB_BUCKET_CAP = 1000


def capped_band_postings(e: DataFrame, n_bands: int, cap: int = _EMB_BUCKET_CAP) -> DataFrame:
    """(band_key, ids) hyperplane-LSH posting lists over an embeddings
    frame, hot buckets (> cap vectors) dropped before collection.

    The keyed projection is ONE Arrow pass over the corpus,
    localCheckpoint'ed (eager-by-design) because both the
    hot-key statistic and the posting-list build read it — 16-byte
    (vec_id, band_key) rows, so the materialization is narrow. The
    hot-key table is tiny by construction (at most n_bands * 8 rows
    here; at most #buckets/cap of the corpus in general), so it
    broadcasts, and the anti-join prunes map-side before the one
    posting-list shuffle."""
    keyed = e.select(
        "vec_id",
        F.explode_outer(lsh_band_keys_arrow(n_bands)(F.col("embedding"))).alias("band_key"),
    ).localCheckpoint(eager=True)
    hot = (
        keyed.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > cap)
        .select("band_key")
    )
    return (
        keyed.join(F.broadcast(hot), "band_key", "left_anti")
        .groupBy("band_key")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )


def bucket_pair_cos(e: DataFrame, n_bands: int, cap: int = _EMB_BUCKET_CAP) -> DataFrame:
    """(a_id, b_id, cos_sim) for every DISTINCT unordered pair of
    vectors sharing >= 1 capped LSH band bucket (a_id < b_id), with the
    cosine scored INSIDE the bucket — the r15 shape for the whole
    banded pair family (sim_range_search, dedup_embedding_lsh,
    sim_knn_graph, mine_bitext_mutual).

    Why (guide §8 / §4.2): the previous shape materialized the pair
    spine, then re-joined BOTH embedding sides by id and shipped
    2 x 64 doubles PER CANDIDATE PAIR into the pair_cos_arrow kernel —
    ~1.7 GB at sf0.1 for sim_range_search's 1.7M candidates, and at
    100 TB a pair-mass-sized payload movement (pair mass quadratic in
    bucket density) twice over. Here the heavy bytes move once per
    POSTING (n_bands x corpus — linear), pairs never exist outside the
    bucket-local NumPy kernel, and only (a_id, b_id, cos) longs+double
    leave it; a tau predicate placed above this helper prunes before
    the pair-dedup exchange, so survivors alone shuffle.

    Bit-exactness (the pair_cos_arrow contract, pinned by
    tests/test_dedup_vector.py::test_bucket_pair_cos_bit_exact...):
    per pair the dot is np.cumsum(A*B)[-1] — the identical sequential
    left fold — and per-vector norms are the same sqrt-of-cumsum the
    JVM norm() fold computes (the assign_cells precedent); the one
    IEEE division matches dot/(na*nb). Multi-band duplicate pairs are
    re-scored per shared bucket, but deterministically identically, so
    the pair-level dropDuplicates keeps the same rows the
    score-after-dedup shape produced.

    Hot buckets past ``cap`` drop BEFORE any payload is grouped (the
    capped_band_postings anti-join, same statistic, same keyed Arrow
    pass); within a bucket the pair enumeration is chunked so the
    kernel's scratch stays bounded (cap^2/2 pairs max per bucket).
    """
    keyed = e.select(
        "vec_id",
        F.explode_outer(lsh_band_keys_arrow(n_bands)(F.col("embedding"))).alias("band_key"),
    ).localCheckpoint(eager=True)  # eager-by-design: 16-byte rows, read by the hot-key statistic AND the posting build
    hot = (
        keyed.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > cap)
        .select("band_key")
    )
    sided = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    posts = (
        keyed.join(F.broadcast(hot), "band_key", "left_anti")
        .join(sided, "vec_id")
        .select("band_key", "vec_id", "nrm", "embedding")
    )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        s = len(pdf)
        if s < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        ii, jj = np.triu_indices(s, k=1)
        out_a, out_b, out_c = [], [], []
        for lo in range(0, len(ii), 65536):  # bounded scratch per chunk
            ic, jc = ii[lo : lo + 65536], jj[lo : lo + 65536]
            d = np.cumsum(E[ic] * E[jc], axis=1)[:, -1]  # the sequential left fold
            out_a.append(ids[ic])
            out_b.append(ids[jc])
            out_c.append(d / (nrm[ic] * nrm[jc]))
        return pd.DataFrame(
            {
                "a_id": np.concatenate(out_a),
                "b_id": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    return posts.groupBy("band_key").applyInPandas(
        _score, "a_id long, b_id long, cos_sim double"
    )


def _keyed_post_sql(n_bands: int, cap: int = _EMB_BUCKET_CAP) -> str:
    """keyed + post CTEs: banded keys and the df-capped posting
    relation — the DuckDB twin of :func:`capped_band_postings`."""
    keys = ", ".join(_band_key_sql("e", b) for b in range(n_bands))
    return f"""
    keyed as (
      select e.vec_id, unnest([{keys}]) as band_key from embeddings e
    ),
    post as (
      select vec_id, band_key from keyed
      qualify count(*) over (partition by band_key) <= {cap}
    )
    """


# N3 scale path #2: IVF (inverted-file) ANN. Coarse quantizer = the
# first n_cells seed vectors (the embeddings of vec_id 1..n_cells —
# deterministic, no RNG) where the cell count derives from the CORPUS:
# n_cells = max(8, floor(sqrt(N))), the FAISS sizing norm. r13's sweep
# showed a cell count frozen at 8 under-provisions a growing corpus
# (recall decayed 0.7→0.6→0.2 per decade at fixed nprobe); deriving
# the geometry from N holds the operating point at every SF — the
# serving probe depth is likewise a FRACTION of the cells
# (nprobe = max(2, floor(n_cells * num / 8)), serving num = 4, i.e.
# half the cells; see report_ivf_recall_curve for the measured curve).
# Every vector is assigned to its max-cosine cell (map-side, centroids
# broadcast); at 100 TB the assignment is a narrow map stage and the
# search shuffles only the probed cells' partitions — the all-pairs
# product never forms. Both engines run the identical algorithm (same
# geometry derivation, fold-order dot products, argmax tiebreak), so
# the oracle hash-matches exactly.
_IVF_MIN_CELLS = 8
_IVF_MIN_NPROBE = 2
_IVF_SERVE_NUM = 4  # serving nprobe = n_cells * 4/8 — the measured knee on the isotropic fixture


def _ivf_geom_sql(src: str = "embeddings", num: int = _IVF_SERVE_NUM) -> str:
    """The ``ivfp`` params CTE: (n_cells, nprobe) derived from the
    corpus row count — one shared derivation for every IVF oracle so
    the served geometry can never diverge between engines."""
    return f"""ivfp as (
      select n_cells,
             greatest({_IVF_MIN_NPROBE},
                      cast(floor(n_cells * {num} / 8.0) as bigint)) as nprobe
      from (select greatest({_IVF_MIN_CELLS},
                            cast(floor(sqrt(count(*))) as bigint)) as n_cells
            from {src})
    )"""


def _ivf_params(e: DataFrame, num: int = _IVF_SERVE_NUM) -> DataFrame:
    """1-row (n_cells, nprobe) — the Spark twin of _ivf_geom_sql over
    the same corpus frame. Bounded control state: broadcast wherever
    consumed, never collected."""
    n_cells = F.greatest(
        F.lit(_IVF_MIN_CELLS).cast("long"),
        F.floor(F.sqrt(F.count(F.lit(1)))).cast("long"),
    )
    return e.agg(n_cells.alias("n_cells")).select(
        "n_cells",
        F.greatest(
            F.lit(_IVF_MIN_NPROBE).cast("long"),
            F.floor(F.col("n_cells") * num / 8.0).cast("long"),
        ).alias("nprobe"),
    )


def _ivf_centroids(e: DataFrame, params: DataFrame) -> DataFrame:
    """(cid, c_emb): the first n_cells seed vectors under the derived
    geometry — n_cells is a 1-row broadcast, so this is a map-side
    filter beside the scan, not a shuffle."""
    return (
        e.crossJoin(F.broadcast(params.select("n_cells")))
        .where(F.col("vec_id").between(F.lit(1), F.col("n_cells")))
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
    )


def _ivf_probe_list(e: DataFrame, cent: DataFrame, params: DataFrame) -> DataFrame:
    """(q_cell): the query's top-nprobe cells by centroid cosine.
    The rank window runs over the n_cells-row centroid score table
    (bounded control state — the single-partition window is over
    sqrt(N) rows, never the corpus)."""
    from pyspark.sql import Window

    cell_cos = cosine(F.col("embedding"), F.col("c_emb"))
    w = Window.orderBy(F.desc("s"), F.asc("q_cell"))
    return (
        e.where(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(cent))
        .select(F.col("cid").alias("q_cell"), cell_cos.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(params.select("nprobe")))
        .where(F.col("rn") <= F.col("nprobe"))
        .select("q_cell")
    )


@query(
    "sim_topk_ivf",
    oracle=f"""
    with {_ivf_geom_sql()},
    centroids as (
      select e.vec_id as cid, e.embedding
      from embeddings e, ivfp where e.vec_id between 1 and ivfp.n_cells
    ),
    assign as (
      select vec_id, embedding, cid as cell from (
        select e.vec_id, e.embedding, c.cid,
               row_number() over (partition by e.vec_id
                                  order by {_cos_sql('e', 'c')} desc, c.cid) as rn
        from embeddings e cross join centroids c
      ) where rn = 1
    ),
    q as (select vec_id, embedding, cell from assign where vec_id = 0)
    select b.vec_id, cast(b.cell as bigint) as cell, {_cos_sql('a', 'b')} as cos_sim
    from q a join assign b on a.cell = b.cell and b.vec_id <> 0
    order by cos_sim desc, b.vec_id
    limit 10
    """,
    tags=("vector", "ivf"),
)
def sim_topk_ivf(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    cent = _ivf_centroids(e, _ivf_params(e))
    assign = assign_cells(e, cent)
    q = assign.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("cell").alias("q_cell")
    )
    cand = assign.where(F.col("vec_id") != 0).join(
        F.broadcast(q), F.col("cell") == F.col("q_cell")
    )
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        cand.select("vec_id", F.col("cell").cast("long").alias("cell"), cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cell", F.col("cos_raw").alias("cos_sim"))
    )


# nprobe>1 IVF: a real ANN serves more than the query's own cell —
# the nearest-centroid boundary cuts true neighbors off (the classic
# IVF recall cliff), and probing the nprobe closest cells buys recall
# for nprobe/n_cells extra candidate mass. Probe list = the query's
# top-nprobe cells by centroid cosine; base vectors keep their single
# argmax cell assignment. Probe depths are expressed as EIGHTHS of the
# derived cell count (num/8) so the operating point scales with the
# corpus instead of pinning an absolute depth.


def _ivf_nprobe_oracle_sql(num: int) -> str:
    """The sim_topk_ivf_nprobe oracle with the probe-depth numerator
    (nprobe = max(2, floor(n_cells * num / 8))) as a parameter —
    reused per-depth by report_ivf_recall_curve."""
    return f"""
    with {_ivf_geom_sql(num=num)},
    centroids as (
      select e.vec_id as cid, e.embedding
      from embeddings e, ivfp where e.vec_id between 1 and ivfp.n_cells
    ),
    scored as (
      select e.vec_id, e.embedding, c.cid,
             row_number() over (partition by e.vec_id
                                order by {_cos_sql('e', 'c')} desc, c.cid) as rn
      from embeddings e cross join centroids c
    ),
    assign as (select vec_id, embedding, cid as cell from scored where rn = 1),
    probe as (select cid as q_cell from scored, ivfp
              where vec_id = 0 and rn <= ivfp.nprobe),
    q as (select embedding from embeddings where vec_id = 0)
    select b.vec_id, cast(b.cell as bigint) as cell, {_cos_sql('a', 'b')} as cos_sim
    from q a
    cross join (select s.vec_id, s.embedding, s.cell
                from assign s join probe p on s.cell = p.q_cell) b
    where b.vec_id <> 0
    order by cos_sim desc, b.vec_id
    limit 10
    """


@query(
    "sim_topk_ivf_nprobe",
    oracle=_ivf_nprobe_oracle_sql(_IVF_SERVE_NUM),
    tags=("vector", "ivf"),
)
def sim_topk_ivf_nprobe(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN at the served probe depth (nprobe = half the derived
    cell count): the query probes its nprobe closest cells instead of
    only its own (``sim_topk_ivf``), recovering neighbors that the
    hard cell boundary assigns elsewhere. Hash-checked: both engines
    run the identical geometry derivation, argmax assignment, probe
    ranking, and fold-order cosine.

    SF-robustness (r13 verdict item 3): n_cells = max(8, floor(√N))
    and nprobe = max(2, floor(n_cells/2)) both derive from the corpus,
    so the probed MASS FRACTION — and with it measured recall — holds
    at every SF (0.7-0.9 across sf0.001/0.01/0.1) instead of decaying
    as the corpus outgrows a frozen cell count. Half the cells is the
    measured knee on this near-isotropic fixture (recall tracks probed
    mass when there is no cluster structure to exploit — see
    recall_sim_topk_ivf_nprobe); on clustered real embeddings the same
    machinery reaches the target at far smaller fractions.

    100 TB shape: identical to single-probe IVF — assignment is one
    map stage against broadcast centroids, and the candidate join
    broadcasts an nprobe-row probe list, so the cost multiplier is
    exactly the probed fraction (nprobe/n_cells of the corpus scanned
    per query), never a second shuffle. The recall/cost knob is the
    gate-verified ``recall_sim_topk_ivf_nprobe`` plus the per-corpus
    ``report_ivf_recall_curve`` operating curve."""
    return _ivf_topk_nprobe(spark, sf, _IVF_SERVE_NUM)


def _ivf_topk_nprobe(spark: SparkSession, sf: str, num: int) -> DataFrame:
    e = t(spark, sf, "embeddings")
    params = _ivf_params(e, num)
    cent = _ivf_centroids(e, params)
    assign = assign_cells(e, cent)
    probe = _ivf_probe_list(e, cent, params)
    q_emb = (
        e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")).limit(1)
    )
    cand = assign.where(F.col("vec_id") != 0).join(
        F.broadcast(probe), F.col("cell") == F.col("q_cell")
    )
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        cand.crossJoin(F.broadcast(q_emb))
        .select("vec_id", F.col("cell").cast("long").alias("cell"), cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cell", F.col("cos_raw").alias("cos_sim"))
    )


def _sim_topk_lsh_oracle(n_bands: int) -> str:
    keys = ", ".join(_band_key_sql("e", b) for b in range(n_bands))
    return f"""
    with keyed as (
      select e.vec_id, unnest([{keys}]) as band_key from embeddings e
    ),
    qk as (select distinct band_key from keyed where vec_id = 0),
    cand as (
      select distinct k.vec_id from keyed k join qk using (band_key)
      where k.vec_id <> 0
    )
    select b.vec_id, {_cos_sql('b', 'a')} as cos_sim
    from embeddings b
    join cand c on b.vec_id = c.vec_id
    cross join (select embedding from embeddings where vec_id = 0) a
    order by cos_sim desc, b.vec_id
    limit 10
    """


_LSH_TOPK_BANDS = 16


@query(
    "sim_topk_lsh",
    oracle=_sim_topk_lsh_oracle(_LSH_TOPK_BANDS),
    tags=("vector", "lsh"),
)
def sim_topk_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Banded-LSH ANN top-k, hash-checked against a DuckDB oracle that
    spells the identical banding (same literal hyperplanes, same
    injective band keys, same fold-order cosine) in SQL — feasible
    since the plane coefficients became engine-neutral literals.

    Candidates = vectors sharing >= 1 of the query's L band keys. The
    band-key equi-join against the L-row broadcast query side prunes
    MAP-SIDE (explode feeds a broadcast-hash join — no shuffle of the
    exploded rows) before any cosine is evaluated; dropDuplicates
    (vec_id) collapses multi-band hits before scoring. L=16 here: the
    probe side is one vector, so extra bands cost only map work while
    pushing expected recall past 0.95 at the measured top-10 cosine
    range (0.27-0.33, p^r ~ 0.21/band)."""
    n_bands = _LSH_TOPK_BANDS
    e = t(spark, sf, "embeddings")
    # explode_outer: plain explode would infer a size>0 filter that
    # pushdown turns into a second ArrowEvalPython pass of the
    # band-key UDF (see dedup._explode_shingles); the band array has
    # fixed length n_bands, never empty.
    keyed = e.select(
        "vec_id",
        "embedding",
        F.explode_outer(lsh_band_keys_arrow(n_bands)(F.col("embedding"))).alias("band_key"),
    )
    q_keys = keyed.where(F.col("vec_id") == 0).select(F.col("band_key").alias("q_key"))
    q_emb = (
        e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")).limit(1)
    )
    # Score BEFORE the duplicate collapse (the dedup_near discipline):
    # a vector hit in k bands yields k identical (vec_id, cos) rows, so
    # dropDuplicates(vec_id) shuffles 16-byte spines instead of 512-byte
    # embeddings — the cosine recompute per extra hit is map-side and
    # ~30x cheaper than shipping the payload (measured on the x100 soak).
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        keyed.where(F.col("vec_id") != 0)
        .join(F.broadcast(q_keys), F.col("band_key") == F.col("q_key"))
        .crossJoin(F.broadcast(q_emb))
        .select("vec_id", cos.alias("cos_raw"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.col("cos_raw").alias("cos_sim"))
    )


# IVF centroid TRAINING: k-means (Lloyd) as an iterative DataFrame
# algorithm — the missing half of sim_topk_ivf, whose centroids are a
# fixed seed set. Deterministic throughout: init = the embeddings of
# vec_id 1..k (no RNG), ties in assignment break to the lowest cid,
# fixed iteration count (no float-convergence test).
_KM_K = 8
_KM_ITERS = 4


@query(
    "kmeans_ivf_train",
    oracle=(
        f"select {_KM_K} as k, count(*) as n_assigned, true as inertia_improved "
        "from embeddings"
    ),
    tags=("vector", "ivf", "iterative", "evidence"),
)
def kmeans_ivf_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train IVF cells with Lloyd iterations and emit the oracle-checkable
    facts: k, corpus size, and inertia(final) <= inertia(init).

    Per iteration (all DataFrame ops): broadcast the k centroids against
    the corpus, argmax-cosine assign (max_by with lowest-cid tiebreak),
    then recompute each centroid as the element-wise mean via
    posexplode → avg per (cell, dim) → array_sort(collect_list) re-pack.
    The k-row centroid table is localCheckpointed per round, so round N
    never replays rounds 1..N-1; the corpus is scanned once per round —
    the canonical 100 TB k-means shape (centroids broadcast, data never
    shuffles except the tiny per-cell partial means).

    Exact centroid float values depend on partial-sum order, which is
    why the driver gate is the inertia MONOTONICITY boolean plus exact
    counts, not centroid coordinates (same policy as ops/recall.py).
    """
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")

    def assign(cent: DataFrame) -> DataFrame:
        # map-side argmax over the broadcast centroid array: the corpus
        # never shuffles for assignment (see assign_cells)
        return assign_cells(e, cent)

    def inertia(assigned: DataFrame) -> DataFrame:
        return assigned.agg(F.sum(1 - F.col("best_cos")).alias("inertia"))

    cent = e.where(F.col("vec_id").between(1, _KM_K)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    first_assign = assign(cent)
    inertia0 = inertia(first_assign).select(F.col("inertia").alias("inertia_init"))
    assigned = first_assign
    for _ in range(_KM_ITERS):
        cent = (
            assigned.select("cell", F.posexplode("embedding").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
                ).alias("c_emb")
            )
            .select(F.col("cell").alias("cid"), "c_emb")
            .localCheckpoint()  # eager-by-design: k-row centroid table; cuts per-round lineage
        )
        assigned = assign(cent)
    final = assigned.agg(
        F.count(F.lit(1)).alias("n_assigned"), F.sum(1 - F.col("best_cos")).alias("inertia_final")
    )
    return final.crossJoin(inertia0).select(
        F.lit(_KM_K).cast("int").alias("k"),
        "n_assigned",
        # 1e-9 slack: inertia is a float sum; Lloyd never increases it
        (F.col("inertia_final") <= F.col("inertia_init") + 1e-9).alias("inertia_improved"),
    )


# N254: IVF serving from TRAINED centroids — kmeans_ivf_train wired
# into the serving path (the r13 sweep's remedy, completed: r14 first
# made the geometry SF-derived with seed centroids; this member
# serves the same derived n_cells/nprobe from Lloyd-TRAINED cells).
# Hash-exact end to end by the IVFPQ discipline: unit-normalized
# vectors quantize to exact ints (floor(x * 2^24 + 0.5) — power-of-
# two scaling is IEEE-exact), Lloyd's per-(cell, dim) sums are
# order-free bigints, each centroid coordinate is ONE IEEE division,
# and every distance is a pinned-order left fold — so the DuckDB
# oracle replays the unrolled training bitwise (the _ivfpq_ctes
# pattern at 64 dims with a data-derived k).
_IVF_TRAIN_ITERS = 2
_IVFPQ_SCALE = float(1 << 24)  # power-of-two: float32 * scale is EXACT (shared with the IVFPQ family below)


def _ivf_qvec(e: DataFrame) -> DataFrame:
    """(vec_id, qv array<long>): unit-normalized embedding quantized
    to exact integers — the full-width twin of _ivfpq_qsubs."""
    return _unit(e).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(_IVFPQ_SCALE) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("qv"),
    )


def _ivf_qdist(qv, cv):
    """Pinned-order L2² between a quantized vector and a double
    centroid: sequential left fold over the zipped dims (both engines
    fold in index order, so the float total is bit-identical)."""
    return F.aggregate(
        F.zip_with(qv, cv, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _ivf_assign_q(qv_df: DataFrame, cb: DataFrame) -> DataFrame:
    """qv_df's columns plus ``cell``: argmin-distance assignment against
    the k-row trained centroid table (k = derived n_cells <= sqrt(N) —
    bounded control state), collected once, shipped via sc.broadcast
    (one fetch per executor), and argmin'd per batch in NumPy — one
    ArrowEvalPython pass beside the scan; the corpus never shuffles
    for assignment (assign_cells' map-side shape).

    r15 (guide §4.2, the assign_cells/_ivfpq_assign_det pattern): the
    previous shape evaluated an interpreted zip_with/aggregate fold
    per (row, centroid) against a broadcast array — the same
    per-element interpreted cost the r14 kernels removed elsewhere.
    Bit-exact with the old array_min(transform(struct(d, cid))): the
    distance is np.cumsum((q-c)*(q-c)) — the identical sequential left
    fold as _ivf_qdist (its 0.0 seed is bitwise-neutral: squares are
    never -0.0), int64 q's cast to float64 exactly (|q| <= 2^24 *
    sqrt scale < 2^53), and np.argmin's first-hit rule over
    cid-ascending rows equals the struct-min (d, cid) tie ordering.
    Null handling replicates the struct-min exactly: a null qv (or any
    null element) made every per-centroid distance null and the
    struct-min then tied down to the LOWEST cid — here a null row
    yields all-NaN distances and np.argmin likewise returns the first
    (lowest-cid) index. Pinned bitwise by tests/test_dedup_vector.py::
    test_ivf_assign_q_arrow_bit_exact_with_jvm_struct_min.
    """
    rows = cb.select("cid", "cv").collect()  # eager-by-design: k-row trained-centroid control table rides the Arrow kernel closure
    rows.sort(key=lambda r: r["cid"])  # argmin-first-hit == lowest cid
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cmat = (
        np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rows])
        if rows
        else np.zeros((0, 0), dtype=np.float64)
    )
    bc = SparkSession.getActiveSession().sparkContext.broadcast((cids, cmat))

    @F.pandas_udf("bigint")
    def _cell(qv: pd.Series) -> pd.Series:
        cids_b, cmat_b = bc.value
        n = len(qv)
        if n == 0 or len(cids_b) == 0:
            return pd.Series([None] * n, dtype="object")
        mask = np.array([v is not None for v in qv], dtype=bool)
        out = pd.Series([None] * n, dtype="object")
        if mask.any():
            # None elements inside a row become NaN -> all-NaN distance
            # row -> argmin index 0 == lowest cid (the struct-min rule)
            Q = np.stack(
                [np.asarray(v, dtype=np.float64) for v in qv[mask]]
            )
            d = np.empty((Q.shape[0], len(cids_b)), dtype=np.float64)
            for j in range(len(cids_b)):
                t = Q - cmat_b[j]
                d[:, j] = np.cumsum(t * t, axis=1)[:, -1]
            out[mask] = list(cids_b[np.argmin(d, axis=1)])
        else:
            # whole-row nulls: every distance was null, struct-min tie
            # broke to the lowest cid
            return pd.Series([int(cids_b[0])] * n, dtype="object")
        out[~mask] = int(cids_b[0])
        return out

    return qv_df.select(*qv_df.columns, _cell(F.col("qv")).alias("cell"))


def _ivf_train_cells(e: DataFrame, params: DataFrame, iters: int = _IVF_TRAIN_ITERS) -> tuple[DataFrame, DataFrame]:
    """(qv, cb): the quantized corpus and the Lloyd-trained centroid
    table (cid, cv array<double>) under the derived n_cells geometry.
    Per round: map-side argmin assignment (broadcast centroids), then
    the per-(cell, dim) integer-mean update — posexplode to (cell,
    dim, sum, count) partials map-side combined, re-packed by
    array_sort; the k-row centroid table is localCheckpointed per
    round so round N never replays rounds 1..N-1 (kmeans_ivf_train's
    loop discipline with hash-exact arithmetic)."""
    qv = _ivf_qvec(e).localCheckpoint(eager=True)  # eager-by-design: read by every Lloyd round + the serve
    cb = (
        qv.crossJoin(F.broadcast(params.select("n_cells")))
        .where(F.col("vec_id").between(F.lit(1), F.col("n_cells")))
        .select(
            F.col("vec_id").alias("cid"),
            F.transform("qv", lambda x: x.cast("double")).alias("cv"),
        )
    )
    for _ in range(iters):
        assigned = _ivf_assign_q(qv, cb)
        cb = (
            assigned.select("cell", F.posexplode("qv").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("i", (F.col("s").cast("double") / F.col("n")).alias("m"))
                        )
                    ),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .select(F.col("cell").alias("cid"), "cv")
            .localCheckpoint(eager=True)  # eager-by-design: k-row centroid table per round
        )
    return qv, cb


def _ivf_trained_oracle() -> str:
    """Unrolled-Lloyd DuckDB replay of the trained-cell serve (the
    _ivfpq_ctes pattern at full width): quantize, seed from the
    derived n_cells, {iters} integer-Lloyd rounds, assign + probe by
    the same pinned-order distance, exact-cosine rerank."""
    dim = _COEFF_DIM
    unorm = (
        "sqrt(list_reduce(list_prepend(cast(0 as double), "
        "[cast(x as double) * cast(x as double) for x in embedding]), (acc, v) -> acc + v))"
    )
    dist = (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"list_transform(generate_series(1, {dim}), i -> "
        f"(cast(q.qv[i] as double) - c.cv[i]) * (cast(q.qv[i] as double) - c.cv[i]))), "
        f"(acc, v) -> acc + v)"
    )
    rounds = []
    prev = "cb0"
    for r in range(1, _IVF_TRAIN_ITERS + 1):
        rounds.append(f"""
    a{r} as materialized (
      select vec_id, qv, cid as cell from (
        select q.vec_id, q.qv, c.cid,
               row_number() over (partition by q.vec_id
                                  order by {dist}, c.cid) as rn
        from qvec q join {prev} c on true
      ) where rn = 1
    ),
    cbu{r} as (
      select cell, i, cast(sum(qv[i]) as double) / count(*) as m
      from a{r}, generate_series(1, {dim}) t(i)
      group by cell, i
    ),
    cb{r} as materialized (
      select cell as cid, list(m order by i) as cv from cbu{r} group by cell
    )""")
        prev = f"cb{r}"
    return f"""
    with {_ivf_geom_sql()},
    u as materialized (
      select vec_id,
             [cast(cast(x as double) / {unorm} as real) for x in embedding] as embedding
      from embeddings
    ),
    qvec as materialized (
      select vec_id,
             [cast(floor(cast(x as double) * {_IVFPQ_SCALE!r} + 0.5) as bigint)
              for x in embedding] as qv
      from u
    ),
    cb0 as materialized (
      select q.vec_id as cid, [cast(x as double) for x in q.qv] as cv
      from qvec q, ivfp where q.vec_id between 1 and ivfp.n_cells
    ),
    {",".join(rounds)},
    assign as materialized (
      select vec_id, cid as cell from (
        select q.vec_id, c.cid,
               row_number() over (partition by q.vec_id
                                  order by {dist}, c.cid) as rn
        from qvec q join {prev} c on true
      ) where rn = 1
    ),
    probe as (
      select cell as q_cell from (
        select q.vec_id, c.cid as cell,
               row_number() over (order by {dist}, c.cid) as rn
        from (select * from qvec where vec_id = 0) q join {prev} c on true
      ), ivfp where rn <= ivfp.nprobe
    )
    select b.vec_id, cast(b.cell as bigint) as cell, {_cos_sql('a', 'b')} as cos_sim
    from (select embedding from u where vec_id = 0) a
    cross join (select s.vec_id, u.embedding, s.cell
                from assign s join probe p on s.cell = p.q_cell
                join u on u.vec_id = s.vec_id) b
    where b.vec_id <> 0
    order by cos_sim desc, b.vec_id
    limit 10
    """


@query(
    "sim_topk_ivf_trained",
    oracle=_ivf_trained_oracle(),
    tags=("vector", "ivf", "iterative"),
)
def sim_topk_ivf_trained(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN served from Lloyd-TRAINED centroids at the derived
    geometry (n_cells = max(8, ⌊√N⌋) seeds, {iters} integer-Lloyd
    rounds, nprobe = half the cells) — kmeans_ivf_train's training
    loop wired into an actual hash-checked serve. The probe ranking
    and cell assignment use the same pinned-order quantized distance
    the training used; the rerank is exact cosine over the candidate
    set. Both engines replay the identical unrolled training, so the
    top-10 hash-matches bitwise despite two rounds of float centroid
    updates.

    100 TB shape: training is kmeans_ivf_train's canonical loop
    (broadcast centroids, map-side argmin, per-(cell, dim) integer
    partials map-side combined — the corpus never shuffles); serving
    is sim_topk_ivf_nprobe's plan against the trained table. Rounds
    are a scheduled offline cost; the serve touches nprobe/n_cells of
    the corpus per query. `recall_sim_topk_ivf_trained` is the
    measured-recall twin.
    """
    e = t(spark, sf, "embeddings")
    params = _ivf_params(e)
    qv, cb = _ivf_train_cells(e.select("vec_id", "embedding"), params)
    assigned = _ivf_assign_q(qv, cb).select("vec_id", "cell")
    from pyspark.sql import Window

    # probe = the query's top-nprobe TRAINED cells by the same
    # quantized distance (n_cells-row control table, bounded window)
    cb_scored = (
        qv.where(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(cb))
        .select(F.col("cid").alias("q_cell"), _ivf_qdist(F.col("qv"), F.col("cv")).alias("d"))
    )
    w = Window.orderBy(F.asc("d"), F.asc("q_cell"))
    probe = (
        cb_scored.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(params.select("nprobe")))
        .where(F.col("rn") <= F.col("nprobe"))
        .select("q_cell")
    )
    u = _unit(e.select("vec_id", "embedding"))
    q_emb = u.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")).limit(1)
    cand = (
        assigned.where(F.col("vec_id") != 0)
        .join(F.broadcast(probe), F.col("cell") == F.col("q_cell"))
        .join(u, "vec_id")
    )
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        cand.crossJoin(F.broadcast(q_emb))
        .select("vec_id", F.col("cell").cast("long").alias("cell"), cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cell", F.col("cos_raw").alias("cos_sim"))
    )


# N3c: scalar (uint8) quantization of the embedding column — the
# vector-compression step an ANN system applies before indexing at
# scale (a 64-d float32 corpus shrinks 4x; IVF/LSH probes then scan
# byte codes). Per-dimension affine codes against corpus min/max, plus
# per-vector reconstruction error so a pipeline can gate on
# quantization loss. Everything is exact-deterministic: min/max are
# order-independent, the per-element quantize/dequantize is a fixed
# IEEE op sequence, and the error reductions are sequential left folds
# (the _DOT_SQL policy) — so the whole operator hash-matches DuckDB
# despite being float arithmetic end to end. floor(x + 0.5) stands in
# for round() (engines disagree on round's .5 rule, verify-skill note).
@query(
    "embedding_quantize",
    oracle=f"""
    with dims as (
      select i,
             cast(min(embedding[i]) as double) as mn,
             cast(max(embedding[i]) as double) as mx
      from embeddings, generate_series(1, {_COEFF_DIM}) as t(i)
      group by i
    ),
    dl as (select list(mn order by i) as mns, list(mx order by i) as mxs from dims),
    q as (
      select e.vec_id, e.embedding, dl.mns, dl.mxs,
             [case when mxs[i] = mns[i] then cast(0 as double)
                   else floor((cast(embedding[i] as double) - mns[i])
                              / (mxs[i] - mns[i]) * 255 + 0.5) end
              for i in generate_series(1, len(embedding))] as codes
      from embeddings e cross join dl
    ),
    err as (
      select vec_id, codes,
             [cast(embedding[i] as double)
              - (mns[i] + codes[i] * ((mxs[i] - mns[i]) / 255))
              for i in generate_series(1, len(embedding))] as errs
      from q
    )
    select vec_id,
           cast(len(codes) as bigint) as n_dims,
           list_reduce(list_prepend(cast(0 as bigint),
             [cast(c as bigint) for c in codes]), (acc, v) -> acc + v) as sum_codes,
           list_reduce(list_prepend(cast(0 as double), errs),
             (acc, v) -> acc + v * v) as sse,
           list_reduce(list_prepend(cast(0 as double), errs),
             (acc, v) -> greatest(acc, abs(v))) as max_abs_err
    from err
    """,
    tags=("vector", "compression"),
)
def embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Uint8 scalar quantization with per-vector reconstruction error.

    100 TB shape: pass 1 is a posexplode into a 64-key min/max
    aggregate — map-side combined, the shuffle carries 64 rows per
    task; the 64-struct range table broadcasts (1-row crossJoin, never
    a driver scalar), and pass 2 quantizes map-side inside codegen
    with zero shuffle. The codes themselves would be written as a
    binary/array column next to the vector; here the checkable facts
    (code checksum + SSE + max abs error) are emitted so the driver
    hash-verifies the whole construction.
    """
    e = t(spark, sf, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.min("val").cast("double").alias("mn"),
            F.max("val").cast("double").alias("mx"),
        )
    )
    packed = dims.agg(F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("d"))

    emb = F.col("embedding")
    d = F.col("d")

    def code_at(i: Column) -> Column:
        x = F.element_at(emb, i).cast("double")
        mn = F.element_at(d, i)["mn"]
        mx = F.element_at(d, i)["mx"]
        return F.when(mx == mn, F.lit(0.0)).otherwise(
            F.floor((x - mn) / (mx - mn) * F.lit(255.0) + F.lit(0.5)).cast("double")
        )

    def err_at(i: Column) -> Column:
        x = F.element_at(emb, i).cast("double")
        mn = F.element_at(d, i)["mn"]
        mx = F.element_at(d, i)["mx"]
        return x - (mn + F.element_at(F.col("codes"), i) * ((mx - mn) / F.lit(255.0)))

    idx = F.sequence(F.lit(1), F.size(emb))
    with_codes = (
        e.crossJoin(F.broadcast(packed))
        .withColumn("codes", F.transform(idx, code_at))
        .withColumn("errs", F.transform(idx, err_at))
    )
    return with_codes.select(
        "vec_id",
        F.size("codes").cast("long").alias("n_dims"),
        F.aggregate(
            F.transform(F.col("codes"), lambda c: c.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_codes"),
        F.aggregate(F.col("errs"), F.lit(0.0), lambda acc, v: acc + v * v).alias("sse"),
        F.aggregate(
            F.col("errs"), F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
        ).alias("max_abs_err"),
    )


# N3d: product quantization (PQ) training — the vector-compression
# step real ANN indexes (FAISS IVF-PQ) apply at corpus scale: split
# each D-dim vector into M subvectors, k-means each subspace
# independently, store M one-byte codes per vector (here 64 floats →
# 4 codes: 64x). Scalar quantization (embedding_quantize) compresses
# per dimension; PQ compresses per SUBSPACE, capturing cross-dim
# structure — the standard at-rest format for billion-vector search.
_PQ_M = 4
_PQ_K = 8
_PQ_ITERS = 2


def _l2sq(a, b) -> F.Column:
    """Sequential-fold squared L2 distance between two float arrays
    (fixed fold order — the _DOT_SQL determinism policy)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_subvectors(e: DataFrame, m_sub: int = _PQ_M) -> DataFrame:
    """(vec_id, m, sub): each vector split into M equal subvectors."""
    subdim = (F.size("embedding") / m_sub).cast("int")
    return e.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m_sub - 1)),
                lambda m: F.struct(
                    m.alias("m"), F.slice("embedding", m * subdim + 1, subdim).alias("sub")
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))


def _pq_assign(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """Per (vec_id, m): nearest codebook entry (argmin L2, ties to the
    lowest code id) — the PQ ENCODE step; broadcast codebook, no
    shuffle of the subvectors beyond the groupBy's map-side combine."""
    d = _l2sq(F.col("sub"), F.col("c_sub"))
    return (
        subs.join(F.broadcast(cb), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min(F.struct(d.alias("d"), F.col("cid").alias("cid"))).alias("best"),
            F.first("sub").alias("sub"),
        )
        .select("vec_id", "m", F.col("best.cid").alias("cell"),
                F.col("best.d").alias("d"), "sub")
    )


def _pq_train(subs: DataFrame, k: int = _PQ_K, iters: int = _PQ_ITERS) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Lloyd-train the M codebooks; returns (codebook, first
    assignment, final assignment). Deterministic init = subvectors of
    vec_id 1.._PQ_K; each round's M*K-row codebook localCheckpoints to
    cut the per-round lineage."""
    cb = subs.where(F.col("vec_id").between(1, k)).select(
        "m", F.col("vec_id").alias("cid"), F.col("sub").alias("c_sub")
    )
    assigned0 = _pq_assign(subs, cb)
    assigned = assigned0
    for _ in range(iters):
        cb = (
            assigned.select("m", "cell", F.posexplode("sub").alias("i", "x"))
            .groupBy("m", "cell", "i")
            .agg(F.avg("x").alias("c"))
            .groupBy("m", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "c"))),
                    lambda s: s["c"].cast("float"),
                ).alias("c_sub")
            )
            .select("m", F.col("cell").alias("cid"), "c_sub")
            .localCheckpoint()  # eager-by-design: M*K-row codebook; cuts per-round lineage
        )
        assigned = _pq_assign(subs, cb)
    return cb, assigned0, assigned


@query(
    "embedding_pq_train",
    oracle=f"""
    select cast({_PQ_M} as int) as m,
           cast({_PQ_K} as int) as k,
           cast(count(*) as bigint) as n_vectors,
           cast({_PQ_M} * count(*) as bigint) as n_codes,
           true as sse_improved
    from embeddings
    """,
    tags=("vector", "pq", "iterative", "evidence"),
)
def embedding_pq_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train PQ codebooks (M={m} subspaces × K={k} codes, Lloyd
    iterations on squared L2 per subspace) and emit the checkable
    facts: corpus size, code count (every vector got all M codes),
    and SSE(final) <= SSE(init) — Lloyd's monotonicity, the same gate
    policy as kmeans_ivf_train (exact centroid floats are partial-sum-
    order dependent; the BOOLEAN is not).

    100 TB shape: ALL M subspaces train in ONE plan per round — the
    corpus explodes to (vec_id, m, subvector) map-side, the M*K-row
    codebook broadcasts, assignment is a per-row argmin (no shuffle),
    and the centroid update aggregates per (m, cell, dim) — tiny,
    map-side combined. One corpus scan per Lloyd round, localCheckpoint
    cuts the per-round lineage exactly like k-means/PageRank/CC. Codes
    for the full corpus would then be written 4 bytes/vector — the
    compression that lets an IVF-PQ probe scan codes instead of floats.
    Deterministic: init codebook = subvectors of vec_id 1..K, argmin
    ties break to the lowest code id, fixed iteration count.
    """
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    subs = _pq_subvectors(e)
    cb, assigned0, assigned = _pq_train(subs)
    sse0 = assigned0.agg(F.sum("d").alias("sse_init"))
    final = assigned.agg(
        F.count_distinct(F.col("vec_id")).alias("n_vectors"),
        F.count(F.lit(1)).alias("n_codes"),
        F.sum("d").alias("sse_final"),
    )
    return final.crossJoin(F.broadcast(sse0)).select(
        F.lit(_PQ_M).cast("int").alias("m"),
        F.lit(_PQ_K).cast("int").alias("k"),
        "n_vectors",
        "n_codes",
        (F.col("sse_final") <= F.col("sse_init") + 1e-9).alias("sse_improved"),
    )


# IVF-PQ with ADC + exact refine — the composition the two pieces
# above imply (FAISS's IndexIVFPQ + IndexRefineFlat, the standard
# billion-vector serving path): probe the query's nprobe closest IVF
# cells, rank THOSE candidates by asymmetric distance (query
# subvector vs each candidate's 1-byte-per-subspace PQ code — reads
# codes, never candidate floats), keep the top-R, and exact-rerank
# only those R with full vectors. Quantization loss is confined to
# the prune: with R >> k the refine recovers the nprobe ceiling
# (measured: ADC-only top-10 overlap 4-5/10; refined = 6-7/10 = the
# exact-within-probed-cells ceiling).
_IVFPQ_M = 16      # 4-dim subspaces over the 64-dim fixture vectors
_IVFPQ_K = 32      # 5 bits/subspace -> 80-bit codes (25x vs floats)
_IVFPQ_R = 50      # ADC shortlist size the refine step reranks
_IVFPQ_ITERS = 2   # Lloyd rounds (matches _PQ_ITERS)
_IVFPQ_SUBDIM = 4  # 64 / _IVFPQ_M


def _unit(e: DataFrame) -> DataFrame:
    """Vectors scaled to unit norm — L2 ADC then ranks like cosine."""
    return e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x / norm(F.col("embedding"))).cast("float")
        ).alias("embedding"),
    )


def _ivfpq_qsubs(e: DataFrame) -> DataFrame:
    """(vec_id, m, q1..q4): subvectors quantized to EXACT integers —
    floor(x * 2^24 + 0.5) of the unit-normalized float32 components.
    Power-of-two scaling of a float32 is exact in IEEE, so both
    engines produce the identical bigint; every downstream Lloyd sum
    is then integer arithmetic (order-free), which is what makes the
    trained codebook — and therefore the whole ADC path —
    hash-checkable cross-engine."""
    return e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_IVFPQ_M - 1))).alias("m"),
        "embedding",
    ).select(
        "vec_id",
        "m",
        *[
            F.floor(
                F.element_at("embedding", F.col("m") * _IVFPQ_SUBDIM + d).cast("double")
                * F.lit(_IVFPQ_SCALE)
                + F.lit(0.5)
            ).alias(f"q{d}")
            for d in range(1, _IVFPQ_SUBDIM + 1)
        ],
    )


def _det_l2sq(qp: str, cp: str) -> F.Column:
    """Left-associated squared L2 over the 4 scalar dims — the same
    IEEE tree the oracle spells as (q1-c1)*(q1-c1) + ... ."""
    out = None
    for d in range(1, _IVFPQ_SUBDIM + 1):
        t = F.col(f"{qp}{d}").cast("double") - F.col(f"{cp}{d}")
        out = t * t if out is None else out + t * t
    return out


def _ivfpq_assign_det(subsq: DataFrame, cb: DataFrame) -> DataFrame:
    """subsq's columns plus ``cell``: per (vec_id, m) argmin-L2 code,
    ties to the lowest cid.

    r14 (guide §4.2, the assign_cells pattern): the codebook is
    BOUNDED control state (M*K rows — a constant of the index format),
    so it collects once and ships to the executors via sc.broadcast
    (one fetch per executor, not a per-task closure payload); each
    batch computes the K distances per row in NumPy and argmins. The
    previous shape was a broadcast join + (vec_id, m)-keyed min-struct
    aggregate — a 32x row blowup through an exchange per Lloyd call.
    r15: subsq's q columns pass THROUGH the projection, so the Lloyd
    centroid update consumes the kernel output directly instead of
    re-joining the assignment back to subsq on (vec_id, m) — one fewer
    corpus-sized exchange per training round (guide §2.4).
    Bit-exact: the distance is the same left-associated
    ((t1²+t2²)+t3²)+t4² float64 tree (_det_l2sq; the quantized q's are
    |q| <= 2^24 so the int->double cast is exact), and np.argmin's
    first-hit tie rule over cid-ascending columns equals the
    min(struct(d, cid)) ordering. Pinned bitwise by
    tests/test_dedup_vector.py::test_ivfpq_assign_arrow_bit_exact.
    Preconditions (documented hard edges vs the old join+min-struct):
    every m value in subsq must exist in cb (the old inner join
    silently dropped unknown m's; the kernel raises instead — both are
    unreachable, since subsq and cb derive from the same _IVFPQ_SUBS
    split), and codebook coordinates must be non-NaN (np.argmin picks
    a NaN as the minimum where min(struct) ranked it last; cb entries
    are exact-integer means, so NaN cannot occur).
    """
    dims = list(range(1, _IVFPQ_SUBDIM + 1))
    rows = cb.select("m", "cid", *[f"c{d}" for d in dims]).collect()  # eager-by-design: M*K-row codebook rides the Arrow kernel closure
    # per-subspace codebook slices, cid-ascending so argmin-first == lowest cid
    by_m: dict = {}
    for r in sorted(rows, key=lambda r: (r["m"], r["cid"])):
        by_m.setdefault(r["m"], []).append(
            (r["cid"], [r[f"c{d}"] for d in dims])
        )
    cids_m = {m: np.array([c for c, _ in v], dtype=np.int64) for m, v in by_m.items()}
    cmat_m = {m: np.array([e for _, e in v], dtype=np.float64) for m, v in by_m.items()}
    bc = SparkSession.getActiveSession().sparkContext.broadcast((cids_m, cmat_m))

    @F.pandas_udf("bigint")
    def _code(
        m: pd.Series, q1: pd.Series, q2: pd.Series, q3: pd.Series, q4: pd.Series
    ) -> pd.Series:
        cids_b, cmat_b = bc.value
        n = len(m)
        if n == 0 or not cids_b:
            return pd.Series([None] * n, dtype="object")
        q = np.stack([s.to_numpy(dtype=np.float64) for s in (q1, q2, q3, q4)], axis=1)
        mv = m.to_numpy()
        out = np.empty(n, dtype=np.int64)
        for mm in np.unique(mv):
            if int(mm) not in cmat_b:
                raise ValueError(f"_ivfpq_assign_det: subspace m={mm} missing from codebook")
            sel = mv == mm
            c = cmat_b[int(mm)]  # (K, SUBDIM)
            t = q[sel][:, None, :] - c[None, :, :]  # (n_m, K, SUBDIM)
            d = t[..., 0] * t[..., 0]
            for j in range(1, t.shape[-1]):
                d = d + t[..., j] * t[..., j]  # left-associated, matches _det_l2sq
            out[sel] = cids_b[int(mm)][np.argmin(d, axis=1)]
        return pd.Series(out)

    return subsq.select(
        *subsq.columns, _code(F.col("m"), *[F.col(f"q{d}") for d in dims]).alias("cell")
    )


def _ivfpq_train_det(subsq: DataFrame, k: int, iters: int) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd on quantized subvectors: centroid update =
    exact bigint per-dim sums (commutative — no float-order hazard)
    followed by ONE IEEE division, so every round's codebook is
    bit-identical across engines and partitionings. Returns
    (codebook(m, cid, c1..c4 double), final assignment)."""
    dims = range(1, _IVFPQ_SUBDIM + 1)
    cb = subsq.where(F.col("vec_id").between(1, k)).select(
        "m",
        F.col("vec_id").alias("cid"),
        *[F.col(f"q{d}").cast("double").alias(f"c{d}") for d in dims],
    )
    for _ in range(iters):
        # r15 (guide §2.4): the assignment kernel passes the q columns
        # through, so the centroid update aggregates the kernel output
        # directly — the old shape re-joined the (vec_id, m)-keyed
        # assignment back to subsq, a corpus-sized exchange per round
        cb = (
            _ivfpq_assign_det(subsq, cb)
            .groupBy("m", "cell")
            .agg(
                *[
                    (F.sum(f"q{d}").cast("double") / F.count(F.lit(1))).alias(f"c{d}")
                    for d in dims
                ]
            )
            .select("m", F.col("cell").alias("cid"), *[f"c{d}" for d in dims])
            .localCheckpoint()  # eager-by-design: M*K-row codebook; cuts per-round lineage
        )
    return cb, _ivfpq_assign_det(subsq, cb)


# Session-scoped index memo — the _SIG_MEMO discipline (ops/dedup.py):
# the trained IVF-PQ parts are deterministic per (session, sf), and
# BOTH consumers (the serve query and the persist/reload round-trip)
# plus repeated bench/driver passes otherwise re-run the 2-round Lloyd
# training each call. Production keeps the index AT REST
# (sink_ann_index_roundtrip is that path); the memo is the in-session
# analog. Keyed by (applicationId, startTime, sf); entries validated
# against a live context on every hit.
_IVFPQ_MEMO: dict = {}


def _ivfpq_build(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    """Build (or reuse) the IVF-PQ index parts: cell assignment, PQ
    codes, the trained codebook, plus the query-side frames (probe
    list, query subvectors, query embedding)."""
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf)
    ix = _IVFPQ_MEMO.get(key)
    if ix is not None:
        try:
            if sc._jsc.sc().isStopped():
                ix = None
        except Exception:  # noqa: BLE001 — any py4j breakage means "rebuild"
            ix = None
        if ix is None:
            _IVFPQ_MEMO.pop(key, None)
    if ix is not None:
        return ix
    for k in [k for k in _IVFPQ_MEMO if k[:2] != key[:2]]:
        _IVFPQ_MEMO.pop(k, None)
    ix = _ivfpq_build_uncached(spark, sf)
    _IVFPQ_MEMO[key] = ix
    return ix


def _ivfpq_build_uncached(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    e = _unit(t(spark, sf, "embeddings").select("vec_id", "embedding"))
    params = _ivf_params(e)
    cent = _ivf_centroids(e, params)
    assign = assign_cells(e, cent).select("vec_id", "cell")
    probe = _ivf_probe_list(e, cent, params)
    # eager-by-design: the quantized subvector table feeds every Lloyd
    # round's assignment AND both centroid updates AND the query-side
    # distance table — without the cut each of those re-runs the
    # unit-normalize + quantize lineage (measured ~2x on the serve)
    subsq = _ivfpq_qsubs(e).localCheckpoint(eager=True)
    cb, enc = _ivfpq_train_det(subsq, _IVFPQ_K, _IVFPQ_ITERS)
    # eager-by-design: the memoized index parts (the per-vector codes
    # re-derive the whole training otherwise — one assignment pass
    # materialized once per session, read by every consumer)
    codes = enc.select(
        "vec_id", F.col("m").alias("cm"), F.col("cell").alias("code")
    ).localCheckpoint(eager=True)
    qsub = subsq.where(F.col("vec_id") == 0).select(
        "m", *[f"q{d}" for d in range(1, _IVFPQ_SUBDIM + 1)]
    )
    q_emb = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return {"e": e, "assign": assign, "probe": probe, "cb": cb,
            "codes": codes, "qsub": qsub, "q_emb": q_emb}


def _ivfpq_serve(ix: dict[str, DataFrame]) -> DataFrame:
    """Serve one query from index parts: ADC shortlist over codes in
    the probed cells, exact-cosine refine of the top-R. The per-
    candidate ADC total is an order-pinned fold over the M subspace
    distances (sorted by m), not a bare float sum — the last
    nondeterminism the oracle parity needed closed."""
    dtab = ix["qsub"].join(F.broadcast(ix["cb"]), "m").select(
        F.col("m").alias("dm"),
        F.col("cid").alias("dcid"),
        _det_l2sq("q", "c").alias("dq"),
    )
    cand = (
        ix["assign"].where(F.col("vec_id") != 0)
        .join(F.broadcast(ix["probe"]), F.col("cell") == F.col("q_cell"))
        .select("vec_id", "cell")
    )
    adc = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("cm").alias("m"), F.col("dq").alias("dq")))),
            lambda s: s["dq"],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    shortlist = (
        cand.join(ix["codes"], "vec_id")
        .join(F.broadcast(dtab), (F.col("cm") == F.col("dm")) & (F.col("code") == F.col("dcid")))
        .groupBy("vec_id")
        .agg(adc.alias("adc_dist"), F.min("cell").alias("cell"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(_IVFPQ_R)
    )
    return (
        shortlist.join(ix["e"], "vec_id")
        .crossJoin(F.broadcast(ix["q_emb"]))
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# Incremental index maintenance: vectors with id past this fraction of
# the id range play the newly-arriving delta (the dedup-family
# _INCR_DEDUP_CUTOFF_FRAC convention); the codebook and IVF centroids
# train on the CORPUS only and are FROZEN for the delta — the
# production invariant that makes an upsert an append, not a retrain.
_UPSERT_CUTOFF_FRAC = 0.8


def _ivfpq_d2_sql(s: str, c: str) -> str:
    """The oracle twin of _det_l2sq — identical left-associated tree."""
    return " + ".join(
        f"(cast({s}.q{d} as double) - {c}.c{d}) * (cast({s}.q{d} as double) - {c}.c{d})"
        for d in range(1, _IVFPQ_SUBDIM + 1)
    )


def _ivfpq_ctes(corpus_only: bool = False) -> str:
    """Unrolled-Lloyd DuckDB CTE chain of the IVF-PQ pipeline (the
    _kcore_oracle pattern) through the ADC ``short`` list:
    unit-normalize, quantize subvectors to exact ints, replay {iters}
    integer-Lloyd rounds, assign IVF cells, probe, ADC via an
    order-pinned list fold. Hash-checkable because every float is
    either one IEEE division of exact integers or a pinned-order fold.
    With ``corpus_only`` the Lloyd rounds train on the pre-cutoff
    corpus rows while encoding/serving still covers every vector —
    the frozen-codebook upsert contract."""
    unorm = (
        "sqrt(list_reduce(list_prepend(cast(0 as double), "
        "[cast(x as double) * cast(x as double) for x in embedding]), (acc, v) -> acc + v))"
    )
    qcols = ", ".join(
        f"cast(floor(cast(u.embedding[ms.m*{_IVFPQ_SUBDIM} + {d}] as double) "
        f"* {_IVFPQ_SCALE!r} + 0.5) as bigint) as q{d}"
        for d in range(1, _IVFPQ_SUBDIM + 1)
    )
    c0cols = ", ".join(f"cast(q{d} as double) as c{d}" for d in range(1, _IVFPQ_SUBDIM + 1))
    upcols = ", ".join(
        f"cast(sum(s.q{d}) as double) / count(*) as c{d}" for d in range(1, _IVFPQ_SUBDIM + 1)
    )
    rounds = []
    prev = "cb0"
    for r in range(1, _IVFPQ_ITERS + 1):
        rounds.append(f"""
    a{r} as materialized (
      select vec_id, m, cid as cell from (
        select s.vec_id, s.m, c.cid,
               row_number() over (partition by s.vec_id, s.m
                                  order by {_ivfpq_d2_sql('s', 'c')}, c.cid) as rn
        from strain s join {prev} c on s.m = c.m
      ) where rn = 1
    ),
    cb{r} as materialized (
      select s.m, a.cell as cid, {upcols}
      from strain s join a{r} a on s.vec_id = a.vec_id and s.m = a.m
      group by s.m, a.cell
    )""")
        prev = f"cb{r}"
    cutoff = (
        f"""cutoff as (
      select cast(floor(min(vec_id)
                        + {_UPSERT_CUTOFF_FRAC} * (max(vec_id) - min(vec_id)))
                  as bigint) as c
      from embeddings
    ),
    """
        if corpus_only
        else ""
    )
    strain = (
        "strain as materialized (select s.* from subsq s, cutoff where s.vec_id < cutoff.c)"
        if corpus_only
        else "strain as materialized (select * from subsq)"
    )
    # the served IVF geometry derives from the TRAINING corpus (full
    # table here; the pre-cutoff rows under corpus_only — the frozen-
    # index upsert contract freezes geometry at corpus build time)
    geom_src = (
        "(select s.vec_id from u s, cutoff where s.vec_id < cutoff.c)"
        if corpus_only
        else "u"
    )
    return f"""{cutoff}u as materialized (
      select vec_id,
             [cast(cast(x as double) / {unorm} as real) for x in embedding] as embedding
      from embeddings
    ),
    {_ivf_geom_sql(src=geom_src)},
    subsq as materialized (
      select u.vec_id, ms.m, {qcols}
      from u cross join (select unnest(generate_series(0, {_IVFPQ_M - 1})) as m) ms
    ),
    {strain},
    cb0 as materialized (
      select m, vec_id as cid, {c0cols}
      from strain where vec_id between 1 and {_IVFPQ_K}
    ),
    {",".join(rounds)},
    enc as materialized (
      select vec_id, m, cid as cell from (
        select s.vec_id, s.m, c.cid,
               row_number() over (partition by s.vec_id, s.m
                                  order by {_ivfpq_d2_sql('s', 'c')}, c.cid) as rn
        from subsq s join {prev} c on s.m = c.m
      ) where rn = 1
    ),
    cents as (select u.vec_id as cid, u.embedding from u, ivfp
              where u.vec_id between 1 and ivfp.n_cells),
    assign as materialized (
      select vec_id, cell from (
        select e.vec_id, c.cid as cell,
               row_number() over (partition by e.vec_id
                                  order by {_cos_sql('e', 'c')} desc, c.cid) as rn
        from u e cross join cents c
      ) where rn = 1
    ),
    probe as (
      select cell as q_cell from (
        select c.cid as cell,
               row_number() over (order by {_cos_sql('e', 'c')} desc, c.cid) as rn
        from (select embedding from u where vec_id = 0) e cross join cents c
      ), ivfp where rn <= ivfp.nprobe
    ),
    dtab as materialized (
      select c.m, c.cid, {_ivfpq_d2_sql('s', 'c')} as dq
      from (select * from subsq where vec_id = 0) s join {prev} c on s.m = c.m
    ),
    adc as materialized (
      select cd.vec_id, min(cd.cell) as cell,
             list_reduce(list_prepend(cast(0 as double), list(dt.dq order by e.m)),
                         (acc, v) -> acc + v) as adc_dist
      from (select a.vec_id, a.cell from assign a join probe p on a.cell = p.q_cell
            where a.vec_id <> 0) cd
      join enc e on e.vec_id = cd.vec_id
      join dtab dt on dt.m = e.m and dt.cid = e.cell
      group by cd.vec_id
    ),
    short as (select vec_id, cell from adc order by adc_dist, vec_id limit {_IVFPQ_R})"""


def _ivfpq_oracle() -> str:
    """The full-table-trained serve: CTE chain + exact-cosine refine."""
    return f"""
    with {_ivfpq_ctes()}
    select b.vec_id, cast(s.cell as bigint) as cell, {_cos_sql('b', 'a')} as cos_sim
    from short s
    join u b on b.vec_id = s.vec_id
    cross join (select embedding from u where vec_id = 0) a
    order by cos_sim desc, b.vec_id
    limit 10
    """


@query("sim_topk_ivfpq", oracle=_ivfpq_oracle(), tags=("vector", "ivf", "pq"))
def sim_topk_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN: SF-derived cell probe (n_cells = max(8, ⌊√N⌋),
    nprobe = half — the shared serving geometry) -> PQ asymmetric-distance
    shortlist (top-{R} by codes alone) -> exact cosine rerank of the
    shortlist -> top-10. HASH-CHECKED end to end: subvectors quantize
    to exact integers (floor(x * 2^24 + 0.5) of unit-normalized
    float32 — power-of-two scaling is IEEE-exact), so Lloyd's centroid
    sums are order-free bigints and each centroid is one IEEE division;
    the ADC total is an order-pinned fold over the M subspace
    distances. The DuckDB oracle replays the identical unrolled
    training (the _kcore_oracle pattern) and every float matches
    bitwise. ``recall_sim_topk_ivfpq`` stays as the measured-recall
    evidence twin.

    100 TB shape: this is the FAISS at-rest serving plan expressed in
    DataFrames — the corpus is scanned once to train codebooks
    (per-round cost is one scan + an M*K-row broadcast back), codes
    are 10 bytes/vector vs 256 for floats, and a query touches
    nprobe/n_cells of the CODES plus exactly R full vectors. The
    distance table (M*K rows) broadcasts; the ADC sum is a map-side
    groupBy over (vec_id, m) longs; only the R-row shortlist joins
    back to full embeddings. Nothing in the query path shuffles the
    corpus.
    """
    return _ivfpq_serve(_ivfpq_build(spark, sf))


@query(
    "sink_ann_index_roundtrip",
    oracle="select cast(10 as bigint) as n_results, true as parity_ok",
    tags=("vector", "ivf", "pq", "sink", "evidence"),
)
def sink_ann_index_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Persist the IVF-PQ index AT REST (cell assignments, PQ codes,
    trained codebook — the parts a FAISS index file holds) to parquet,
    reload them, serve the query from the reloaded index, and gate on
    BIT-EXACT parity with serving from the in-memory build: all 10
    result rows must match on (vec_id, cell, cos_sim) including the
    float score. Parity is exact by construction — the codebook is
    localCheckpointed (one materialization feeds both serves), parquet
    roundtrips doubles/floats losslessly, and everything downstream of
    the codebook is per-row deterministic arithmetic.

    100 TB shape: this is the production ANN serving story — train
    once, persist codes (10 bytes/vector) + M*K codebook, serve
    queries against the at-rest index without retraining or touching
    corpus floats beyond the R-row refine. The index write is an
    ordinary parquet sink; a serving fleet reads it like any table.
    """

    ix = _ivfpq_build(spark, sf)
    out = scratch_dir("ppspark_annindex_")
    # r15 (guide §2.6 — overlap independent jobs): the three part
    # writes are independent; submit them from a thread pool so the
    # wall is the slowest write, not three sequential barriers
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for fut in [
            pool.submit(
                lambda p: ix[p].write.mode("overwrite").parquet(f"{out}/{p}"), part
            )
            for part in ("assign", "codes", "cb")
        ]:
            fut.result()
    fresh = _ivfpq_serve(ix)
    at_rest = dict(ix)
    for part in ("assign", "codes", "cb"):
        at_rest[part] = spark.read.parquet(f"{out}/{part}")
    served = _ivfpq_serve(at_rest)
    j = fresh.alias("f").join(
        served.alias("s"),
        (F.col("f.vec_id") == F.col("s.vec_id"))
        & (F.col("f.cell") == F.col("s.cell"))
        & (F.col("f.cos_sim") == F.col("s.cos_sim")),
        "left",
    )
    hits = F.coalesce(  # sum over zero rows is null -> vacuously-true parity
        F.sum(F.when(F.col("s.vec_id").isNotNull(), 1).otherwise(0)), F.lit(0)
    )
    n = F.count(F.lit(1))
    return j.agg(n.alias("n_results"), (hits == n).alias("parity_ok"))


# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): k-means-cluster the
# embedding space, then remove near-duplicate pairs WITHIN each
# cluster — the cluster is the blocking key, so the quadratic is per-
# cell, never corpus-wide. The published method's exact shape: cheap
# global structure (clustering) bounds the expensive pairwise check.
_SEMDEDUP_TAU = 0.18  # same fixture-calibrated threshold as sim_pairs_blocked


@query(
    "dedup_semdedup",
    oracle=f"""
    with centroids as (
      select vec_id as cid, embedding from embeddings where vec_id between 1 and 8
    ),
    assign as (
      select vec_id, embedding, cid as cell from (
        select e.vec_id, e.embedding, c.cid,
               row_number() over (partition by e.vec_id
                                  order by {_cos_sql('e', 'c')} desc, c.cid) as rn
        from embeddings e cross join centroids c
      ) where rn = 1
    ),
    pairs as (
      select a.vec_id as va, b.vec_id as vb
      from assign a join assign b on a.cell = b.cell and a.vec_id < b.vec_id
      where {_cos_sql('a', 'b')} >= {_SEMDEDUP_TAU}
    )
    select s.vec_id, cast(s.cell as bigint) as cell,
           min(p.va) as dup_of, (min(p.va) is not null) as is_dup
    from assign s left join pairs p on p.vb = s.vec_id
    group by s.vec_id, s.cell
    """,
    tags=("vector", "dedup", "semdedup"),
)
def dedup_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest centroid
    (map-side argmax — zero shuffle), pair vectors only WITHIN a cell,
    and mark each vector a semantic duplicate of its lowest-id
    within-cell neighbor with cosine >= {tau} (keep-lowest canonical,
    the exact/MinHash family's policy). This is the published
    web-scale semantic dedup recipe: clustering is the blocking key.

    100 TB shape: the only quadratic is per-cell (sum of cell sizes
    squared, the IVF/LSH bound — never N^2 across cells); norms are
    computed once per SIDE of the pair join, not per pair; the
    dup-label collapse is one vec-keyed aggregate. With real web-scale
    data the centroid count scales to sqrt(N) (the paper uses ~10k
    clusters for ~100M docs) and assignment stays map-side.
    """
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    cent = e.where(F.col("vec_id").between(1, 8)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    assign = assign_cells(e, cent).select(
        "vec_id", "embedding", "cell", norm(F.col("embedding")).alias("nrm")
    )
    # spread the pair join's streamed side — the parquet is often ONE
    # row group at check SF, serializing the per-cell quadratic onto
    # one core (same fix as the range-search truth join)
    a = assign.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = assign.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= _SEMDEDUP_TAU)
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
    )
    return (
        assign.select("vec_id", "cell")
        .join(pairs, F.col("vec_id") == F.col("vb"), "left")
        .groupBy("vec_id", F.col("cell").cast("long").alias("cell"))
        .agg(F.min("va").alias("dup_of"))
        .withColumn("is_dup", F.col("dup_of").isNotNull())
        .select("vec_id", "cell", "dup_of", "is_dup")
    )


# Cosine RANGE search (radius query): every pair within a similarity
# ball (cos >= tau), the retrieval mode FAISS calls range_search —
# what near-dup candidate mining and "find everything this similar"
# audits need, where top-k's fixed cutoff either truncates dense
# neighborhoods or pads sparse ones. Candidates come from the same
# 16-band hyperplane LSH as sim_topk_lsh (deterministic literal
# planes), so the found pair set is a checkable cross-engine fact; the
# measured miss rate vs the exact ball is gated by
# recall_range_search.
_RANGE_TAU = 0.35
_RANGE_BANDS = 16


def _range_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """(a_id, b_id, cos_sim) for banded-candidate pairs with cos >= tau.

    r15 (guide §8 — move heavy bytes once): scoring happens INSIDE the
    LSH bucket (bucket_pair_cos), so the 2x64-double payload crosses
    once per posting instead of twice per candidate pair (~1.7 GB of
    vector payload at sf0.1 for 1.7M candidates in the old
    join-then-kernel shape), and the tau predicate prunes BEFORE the
    pair-dedup exchange — only the found set (hundreds of rows, not
    the candidate mass) ever shuffles. Hot buckets past
    ``_EMB_BUCKET_CAP`` still drop before any payload is grouped, and
    the cosine is bit-exact with the fold by the bucket kernel's
    pinned cumsum contract, so the found pairs and their scores are
    unchanged row for row.
    """
    e = t(spark, sf, "embeddings")
    return (
        bucket_pair_cos(e, _RANGE_BANDS)
        .where(F.col("cos_sim") >= _RANGE_TAU)
        .dropDuplicates(["a_id", "b_id"])
    )


def pair_cos_arrow():
    """Arrow-vectorized pair cosine, bit-exact with ``dot()/(na*nb)``.

    A radius query verifies MILLIONS of candidate pairs (r=3 toy bands
    keep the fixture's buckets dense — measured 1.7M candidates from
    2000 vectors at sf0.1), and the interpreted higher-order fold costs
    ~30 us/pair — exactly the hot spot the engine's UDF policy reserves
    Arrow kernels for (the lsh_band_keys_arrow precedent). np.cumsum
    accumulates left-to-right in every NumPy release to date, so the
    float64 dot — and the one-IEEE-division cosine — matches the JVM
    fold and the DuckDB oracle bitwise TODAY; NumPy does not formally
    pin the accumulation order, so the real guard is the pair-for-pair
    equality test in tests/test_dedup_vector.py (a SIMD/pairwise-
    summation change there fails loudly; the fallback is an explicit
    per-dimension add loop). ~25x warm speedup at sf0.1.
    """

    @F.pandas_udf("double")
    def cos(ea: pd.Series, eb: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
        if len(ea) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in ea])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in eb])
        d = np.cumsum(A * B, axis=1)[:, -1]
        return pd.Series(d / (na.to_numpy() * nb.to_numpy()))

    return cos


def _range_keyed_sql() -> str:
    return f"""
    {_keyed_post_sql(_RANGE_BANDS)},
    cand as (
      select distinct k1.vec_id as a_id, k2.vec_id as b_id
      from post k1 join post k2 using (band_key)
      where k1.vec_id < k2.vec_id
    ),
    found as (
      select c.a_id, c.b_id, {_cos_sql('a', 'b')} as cos_sim
      from cand c
      join embeddings a on a.vec_id = c.a_id
      join embeddings b on b.vec_id = c.b_id
      where {_cos_sql('a', 'b')} >= {_RANGE_TAU}
    )
    """


@query(
    "sim_range_search",
    oracle=f"""
    with {_range_keyed_sql()}
    select a_id, b_id, cos_sim from found
    """,
    tags=("vector", "lsh", "range"),
)
def sim_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Radius query: all pairs with cos >= tau via banded candidates.

    Scale lever: r (planes per band). Band selectivity is p^r, so the
    fixture's r=3 keeps 500-vector buckets dense enough to have
    candidates at all, while a production radius runs r=16+ (2^16-key
    bands) so candidate mass tracks the true ball instead of the
    corpus square — measured honestly in SCALE.md (x10 corpus, ~100x
    pair mass, 52x wall = per-pair cost falls 2x). recall_range_search
    is the guard that any retuned r still clears 0.90 measured recall.
    """
    return _range_pairs(spark, sf)


# Measured recall of the banded range search vs the EXACT ball
# (all-pairs — a check-SF-only construct, like every exact twin in
# ops/recall.py). At tau=0.35 the per-plane agreement is p ~ 0.61, so
# a 3-plane band hits with p^3 ~ 0.23 and 16 bands give expected
# recall ~0.985 at the threshold boundary (higher above it); measured
# on the fixture: 267/271 = 0.985 (the misses sit within 0.02 of tau).
@query(
    "recall_range_search",
    oracle=f"""
    with {_range_keyed_sql()},
    truth as (
      select a.vec_id as a_id, b.vec_id as b_id
      from embeddings a join embeddings b on a.vec_id < b.vec_id
      where {_cos_sql('a', 'b')} >= {_RANGE_TAU}
    ),
    m as (
      select (select count(*) from truth) as n_true,
             (select count(*) from found) as n_found,
             (select count(*) from truth t join found f
                on t.a_id = f.a_id and t.b_id = f.b_id) as n_hit
    )
    select cast(n_true as bigint) as n_true,
           cast(n_found as bigint) as n_found,
           cast(n_hit as bigint) as n_hit,
           coalesce(cast(n_hit as double) / cast(n_true as double) >= 0.90, true)
             as recall_ok,
           n_found = n_hit as no_false_positives
    from m
    """,
    tags=("vector", "gate", "range"),
)
def recall_range_search(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    sided = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    # spread the nested-loop's streamed side — the parquet is often ONE
    # row group at check SF, serializing the O(n^2) cosines onto one core
    a = sided.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = sided.alias("b")
    # exact all-pairs truth (check-SF-only construct) — Arrow kernel,
    # bit-exact with the fold (N^2/2 interpreted folds would dominate
    # the gate's wall-clock even at check SF)
    cos = pair_cos_arrow()(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.nrm"), F.col("b.nrm")
    )
    truth = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= _RANGE_TAU)
        .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
    )
    found = _range_pairs(spark, sf).select("a_id", "b_id")
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = found.agg(F.count(F.lit(1)).alias("n_found"))
    n_hit = truth.join(found, ["a_id", "b_id"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_true.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(n_hit))
        .select(
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_found").cast("long").alias("n_found"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.coalesce(
                F.col("n_hit").cast("double") / F.col("n_true").cast("double") >= 0.90,
                F.lit(True),
            ).alias("recall_ok"),
            (F.col("n_found") == F.col("n_hit")).alias("no_false_positives"),
        )
    )


# Johnson-Lindenstrauss random projection (Achlioptas 2003 database-
# friendly variant: dense entries from a fixed symmetric distribution)
# — the dimensionality-reduction step ANN/dedup pipelines run before
# indexing when 64-100x-wider raw embeddings would blow the index
# budget. Projection planes are the engine's literal md5-derived
# coefficients (uniform in [-1,1), E[c^2] = 1/3), so the projected
# vectors are bit-exact cross-engine; E[(3/k)*||Px||^2] = ||x||^2
# makes (3/k)*||Px||^2 / ||x||^2 an unbiased distortion ratio that
# error_random_projection gates row-by-row with exact counting.
_RP_OUT_DIM = 16
_RP_PLANE_BASE = 200  # disjoint from the LSH planes (0..~140)


def _rp_cols() -> list[Column]:
    return [
        dot(F.col("embedding"), F.slice(F.lit(_plane_coeffs(_RP_PLANE_BASE + j)), F.lit(1), F.size(F.col("embedding")))).alias(f"p{j}")
        for j in range(_RP_OUT_DIM)
    ]


def _coeff_sql_f64(plane: int) -> str:
    # A bare decimal literal parses as DECIMAL in DuckDB, and even
    # cast(decimal as double) double-rounds (int128/10^scale — 7 of 64
    # coefficients land a ulp off). The sign-only band-key oracles
    # never cared; a value-checked projection does. An exponent-form
    # literal parses directly as DOUBLE with correct rounding, so
    # `<repr>e0` recovers every coefficient bit-exactly (verified for
    # all planes in tests).
    return "[" + ",".join(f"{c!r}e0" for c in _plane_coeffs(plane)) + "]"


def _rp_col_sql(j: int) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"[cast(e.embedding[i] as double) * ({_coeff_sql_f64(_RP_PLANE_BASE + j)})[i] "
        f"for i in generate_series(1, len(e.embedding))]), (acc, v) -> acc + v)"
    )


@query(
    "embedding_random_projection",
    oracle=f"""
    select vec_id, {", ".join(f"{_rp_col_sql(j)} as p{j}" for j in range(_RP_OUT_DIM))}
    from embeddings e
    """,
    tags=("vector", "projection"),
)
def embedding_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Project 64-d embeddings to 16-d with fixed literal planes.

    100 TB shape: pure narrow projection — k fused-multiply-add folds
    per row beside the scan, zero shuffles; the planes live in the
    plan as literals (few KB). Interpreted-fold cost matters at corpus
    scale exactly as it did for band keys, and the same Arrow matmul
    twin (lsh_band_keys_arrow's np.cumsum recipe) applies verbatim if
    k grows — the fold spelling is kept here because the oracle proves
    it bit-exact.
    """
    return t(spark, sf, "embeddings").select("vec_id", *_rp_cols())


# Distortion gate: exact-count fraction of rows whose unbiased norm
# ratio (3/k)*||Px||^2/||x||^2 lands in [0.4, 2.5] — counting avoids
# cross-row double summation (order-dependent); min/max are
# order-independent so they ride along raw. The fixture's embeddings
# are anisotropic (label clusters), so tails are wider than the iid
# JL prediction: measured within-fraction 0.982 (sf0.01) / 0.992
# (sf0.001) against the 0.95 gate, min ratio 0.24, max 2.37.
@query(
    "error_random_projection",
    oracle=f"""
    with r as (
      select (3.0 / {_RP_OUT_DIM}) *
             ({" + ".join(f"{_rp_col_sql(j)} * {_rp_col_sql(j)}" for j in range(_RP_OUT_DIM))})
             / list_reduce(list_prepend(cast(0 as double),
                 [cast(x as double) * cast(x as double) for x in e.embedding]),
                 (acc, v) -> acc + v) as ratio
      from embeddings e
    )
    select cast(count(*) as bigint) as n_rows,
           cast(sum(case when ratio between 0.4 and 2.5 then 1 else 0 end) as bigint)
             as n_within,
           min(ratio) as min_ratio,
           max(ratio) as max_ratio,
           cast(sum(case when ratio between 0.4 and 2.5 then 1 else 0 end) as double)
             / count(*) >= 0.95 as distortion_ok
    from r
    """,
    tags=("vector", "gate", "projection"),
)
def error_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    # ratio per row: (3/k) * sum_j p_j^2 / ||x||^2 — build the exact
    # expression tree the oracle spells (left-to-right + chain).
    e = t(spark, sf, "embeddings")
    terms = [
        dot(F.col("embedding"), F.slice(F.lit(_plane_coeffs(_RP_PLANE_BASE + j)), F.lit(1), F.size(F.col("embedding"))))
        for j in range(_RP_OUT_DIM)
    ]
    ssum = terms[0] * terms[0]
    for tm in terms[1:]:
        ssum = ssum + tm * tm
    ratio = (F.lit(3.0) / F.lit(float(_RP_OUT_DIM))) * ssum / dot(
        F.col("embedding"), F.col("embedding")
    )
    r = e.select(ratio.alias("ratio"))
    within = F.sum(F.when(F.col("ratio").between(0.4, 2.5), 1).otherwise(0)).cast("long")
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        within.alias("n_within"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        (
            F.sum(F.when(F.col("ratio").between(0.4, 2.5), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
            >= 0.95
        ).alias("distortion_ok"),
    )


# LSH banding-parameter tuning report — the design table behind every
# (r, L) choice in this engine (range search, embedding dedup, topk):
# for each grid cell, the EMPIRICALLY measured recall of "collides in
# >= 1 of the first L bands of r hyperplanes" over the exact tau-ball
# pair set. Published methodology (Indyk-Motwani banding analysis)
# computes 1-(1-p^r)^L from per-plane agreement p; this report skips
# the transcendental p (arccos is not bitwise cross-engine) and counts
# collisions directly — exact integers, one division per row. The L
# columns of a given r are PREFIXES of the same band family, so the
# report reads as a proper recall-vs-cost curve.
_TUNE_PLANE_BASE = 300  # disjoint from LSH (0..~140) and RP (200..215)
_TUNE_GRID_R = (2, 3, 4)
_TUNE_GRID_L = (4, 8, 16)
# The truth set is SAMPLED, not enumerated: 1-in-_TUNE_SAMPLE_MOD
# deterministic md5 anchors (the sample_hash discipline), each paired
# against the whole corpus — the tuning estimate only needs a few
# hundred tau-ball pairs, and the exact all-pairs theta-join was the
# one remaining O(n^2) serving-path construct (10.4 s at sf0.1; a
# production retune over billions of vectors could never enumerate
# the square). Anchor sampling keeps the estimator unbiased per grid
# cell (each anchor's neighborhood is enumerated exactly) and the
# oracle applies the identical predicate, so the report stays
# hash-checked.
_TUNE_SAMPLE_MOD = 8


def _tune_band_sign_cols(emb: Column, r: int) -> list[Column]:
    base = _TUNE_PLANE_BASE + r * 100
    keys = []
    for band in range(max(_TUNE_GRID_L)):
        sig = F.lit(0)
        for j in range(r):
            sig = sig + _plane_sign(emb, base + band * r + j) * F.lit(1 << j)
        keys.append(sig.cast("long").alias(f"r{r}b{band}"))
    return keys


def _tune_band_sign_arrow():
    """Arrow twin of :func:`_tune_band_sign_cols` for ALL grid r
    values in one pass, returning the 48 band signatures as one
    array<bigint> in (r, band) order. The interpreted JVM folds cost
    ~25 us/plane/row and the grid needs 144 plane signs per vector —
    ~7 s of the report's wall at sf0.1 — exactly the dense-matmul
    case the engine reserves Arrow kernels for (lsh_band_keys_arrow
    precedent). Bit-exact with the JVM fold and the DuckDB oracle:
    np.cumsum is a sequential left fold over identical float64
    products (pinned by test_numpy_cumsum_is_still_a_sequential_left_
    fold and the parity test in tests/test_dedup_vector.py)."""
    planes = []
    for r in _TUNE_GRID_R:
        base = _TUNE_PLANE_BASE + r * 100
        for band in range(max(_TUNE_GRID_L)):
            for j in range(r):
                planes.append(base + band * r + j)
    C = np.array([_plane_coeffs(p) for p in planes])
    grid_r = _TUNE_GRID_R
    max_l = max(_TUNE_GRID_L)

    @F.pandas_udf("array<bigint>")
    def sigs(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        E = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        Cs = C[:, : E.shape[1]]
        proj = np.cumsum(E[:, None, :] * Cs[None, :, :], axis=2)[:, :, -1]
        s = (proj > 0).astype(np.int64)
        cols = []
        idx = 0
        for r in grid_r:
            for _band in range(max_l):
                sig = np.zeros(len(E), dtype=np.int64)
                for j in range(r):
                    sig += s[:, idx] << j
                    idx += 1
                cols.append(sig)
        return pd.Series(list(np.stack(cols, axis=1)))

    return sigs


def _tune_band_sql(tbl: str, r: int, band: int) -> str:
    base = _TUNE_PLANE_BASE + r * 100
    bits = []
    for j in range(r):
        plane = base + band * r + j
        proj = (
            f"list_reduce(list_prepend(cast(0 as double), "
            f"[cast({tbl}.embedding[i] as double) * ({_coeff_sql(plane)})[i] "
            f"for i in generate_series(1, len({tbl}.embedding))]), (acc, v) -> acc + v)"
        )
        bits.append(f"(case when {proj} > 0 then {1 << j} else 0 end)")
    return " + ".join(bits)


@query(
    "report_lsh_tuning",
    oracle=f"""
    with truth as (
      select a.vec_id as a_id, b.vec_id as b_id,
             a.embedding as ea, b.embedding as eb
      from embeddings a join embeddings b on a.vec_id <> b.vec_id
      where ('0x' || substr(md5(cast(a.vec_id as varchar)), 1, 13))::bigint
              % {_TUNE_SAMPLE_MOD} = 0
        and {_cos_sql('a', 'b')} >= {_RANGE_TAU}
    ),
    matched as (
      select a_id, b_id,
        {", ".join(
            ", ".join(
                f"case when ({_tune_band_sql('a', r, band)}) = ({_tune_band_sql('b', r, band)}) "
                f"then 1 else 0 end as m_r{r}_b{band}"
                for band in range(max(_TUNE_GRID_L))
            )
            for r in _TUNE_GRID_R
        )}
      from truth
      join embeddings a on a.vec_id = truth.a_id
      join embeddings b on b.vec_id = truth.b_id
    )
    select r, l,
           cast((select count(*) from truth) as bigint) as n_true,
           cast(n_recalled as bigint) as n_recalled,
           cast(n_recalled as double) / (select count(*) from truth) as recall
    from (
      {" union all ".join(
          f'''select {r} as r, {l} as l,
              (select count(*) from matched
               where {" + ".join(f"m_r{r}_b{band}" for band in range(l))} >= 1)
                as n_recalled'''
          for r in _TUNE_GRID_R for l in _TUNE_GRID_L
      )}
    )
    """,
    tags=("vector", "lsh", "report"),
)
def report_lsh_tuning(spark: SparkSession, sf: str) -> DataFrame:
    """Measured recall for every (r, L) banding cell over a SAMPLED
    tau-ball: 1-in-{_TUNE_SAMPLE_MOD} deterministic md5 anchors, each
    paired against the whole corpus (anchor-neighborhood recall — the
    knn-gate shape). The per-cell recall estimator is unbiased and the
    oracle replays the identical sample predicate, so the report stays
    hash-checked.

    100 TB shape: anchor sampling IS the production form — the pair
    mass is n^2/mod and mod scales with the corpus (the report needs
    a few hundred tau-ball pairs, not the square). The band signs for
    all grid cells come from ONE pass over the sampled truth pair set
    with per-side sign columns; all 9 grid cells aggregate in one
    job.
    """
    e = t(spark, sf, "embeddings")
    sided = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    anchor_pred = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        % _TUNE_SAMPLE_MOD
        == 0
    )
    # spread the nested-loop's streamed side — the parquet is often ONE
    # row group at check SF, serializing the anchor-block cosines onto
    # one core
    a = (
        sided.where(anchor_pred)
        .repartition(spark.sparkContext.defaultParallelism)
        .alias("a")
    )
    b = sided.alias("b")
    cos = pair_cos_arrow()(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.nrm"), F.col("b.nrm")
    )
    truth = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .where(cos >= _RANGE_TAU)
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
        )
    )
    # the 48 per-band signatures come from ONE Arrow matmul pass
    # (interpreted folds cost ~7 s here at sf0.1); spread the rows —
    # same single-row-group hazard as the truth join
    names = [f"r{r}b{band}" for r in _TUNE_GRID_R for band in range(max(_TUNE_GRID_L))]
    keyed = (
        e.repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", _tune_band_sign_arrow()(F.col("embedding")).alias("sigs"))
        .select("vec_id", *[F.col("sigs")[i].alias(n) for i, n in enumerate(names)])
    )
    ka = keyed.select(
        F.col("vec_id").alias("_ka"),
        *[
            F.col(f"r{r}b{band}").alias(f"a_r{r}b{band}")
            for r in _TUNE_GRID_R
            for band in range(max(_TUNE_GRID_L))
        ],
    )
    kb = keyed.select(
        F.col("vec_id").alias("_kb"),
        *[
            F.col(f"r{r}b{band}").alias(f"b_r{r}b{band}")
            for r in _TUNE_GRID_R
            for band in range(max(_TUNE_GRID_L))
        ],
    )
    m = truth.join(ka, F.col("a_id") == F.col("_ka")).join(
        kb, F.col("b_id") == F.col("_kb")
    )
    matched = m.select(
        *[
            F.when(F.col(f"a_r{r}b{band}") == F.col(f"b_r{r}b{band}"), 1)
            .otherwise(0)
            .alias(f"m_r{r}_b{band}")
            for r in _TUNE_GRID_R
            for band in range(max(_TUNE_GRID_L))
        ]
    ).localCheckpoint(eager=True)  # eager-by-design: the truth-pair match
    # matrix (a few hundred rows) feeds one aggregate per grid cell
    n_true = matched.count()  # eager-by-design: truth-set size (a few hundred) parameterizes the 9 literal grid rows
    # ALL grid cells are conditional sums over the same few-hundred-row
    # match matrix — ONE aggregate with a column per cell (one job, one
    # pass) then a stack() unpivot to (r, l, n_recalled) rows, instead
    # of len(grid) separate agg jobs in a driver loop.
    cells = [(r, l) for r in _TUNE_GRID_R for l in _TUNE_GRID_L]
    one = matched.agg(
        *[
            F.sum(
                F.when(
                    sum(
                        (F.col(f"m_r{r}_b{band}") for band in range(l)),
                        start=F.lit(0),
                    )
                    >= 1,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"n_r{r}_l{l}")
            for r, l in cells
        ]
    )
    stacked = ", ".join(f"{r}, {l}, n_r{r}_l{l}" for r, l in cells)
    return one.select(
        F.expr(f"stack({len(cells)}, {stacked}) as (r, l, n_recalled)")
    ).select(
        F.col("r").cast("int").alias("r"),
        F.col("l").cast("int").alias("l"),
        F.lit(n_true).cast("long").alias("n_true"),
        F.col("n_recalled").cast("long").alias("n_recalled"),
        (F.col("n_recalled").cast("double") / F.lit(n_true)).alias("recall"),
    )


# Batched multi-query retrieval — the SERVING shape: score a whole
# query batch against the corpus in one pass and keep top-K per query.
# Single-query topk (sim_topk) is the microbenchmark; real encoders
# emit batches, and the engine-side win is amortizing the corpus scan
# across Q queries + letting the rank<=K filter plan as
# WindowGroupLimit (partial top-K BEFORE the shuffle — the Spark 3.5
# optimization the heavy-hitters family already pins).
_BATCH_Q = 5   # query batch: vec_ids 0..4
_BATCH_K = 5


@query(
    "sim_topk_batch",
    oracle=f"""
    with scored as (
      select a.vec_id as q_id, b.vec_id,
             {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) as cos_sim
      from (select vec_id, embedding from embeddings where vec_id < {_BATCH_Q}) a
      cross join (select vec_id, embedding from embeddings
                  where vec_id >= {_BATCH_Q}) b
    )
    select q_id, vec_id, cos_sim, cast(rn as int) as rank
    from (select *, row_number() over (partition by q_id
                                       order by cos_sim desc, vec_id) as rn
          from scored)
    where rn <= {_BATCH_K}
    """,
    tags=("vector", "batch", "serving"),
)
def sim_topk_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{_BATCH_K} cosine neighbors for each of {_BATCH_Q} query
    vectors in ONE corpus pass: broadcast the query batch, score every
    (query, candidate) pair beside the scan, keep rank <= {_BATCH_K}
    per query.

    100 TB shape: the corpus is scanned ONCE for the whole batch (vs Q
    scans for Q single-query calls); the query side is a Q-row
    broadcast so scoring is map-side; the rank filter plans as
    WindowGroupLimit (plan-asserted), which keeps a running top-K per
    query inside each input partition BEFORE the q_id shuffle — K*P
    rows cross the wire per query, never the corpus. The fold
    arithmetic is the family's sequential left fold, bit-identical in
    the oracle.
    """
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings")
    # r14: norms once per side + Arrow pair scoring (guide §4.2;
    # bit-exact — pair_cos_arrow: dot/(ne*nq) is cosine()'s exact
    # expression tree with the norms hoisted off the pair loop)
    q = e.where(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("nq"),
    )
    base = e.where(F.col("vec_id") >= _BATCH_Q).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("ne")
    )
    cos = pair_cos_arrow()(F.col("embedding"), F.col("q_emb"), F.col("ne"), F.col("nq"))
    scored = base.crossJoin(F.broadcast(q)).select(
        "q_id", "vec_id", cos.alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _BATCH_K)
    )


# MMR re-ranking (Carbonell & Goldstein 1998) — diversify the top of a
# retrieval list: greedily pick the candidate maximizing
# lambda*relevance - (1-lambda)*max-similarity-to-already-picked. The
# de-redundancy step every RAG/search pipeline bolts onto its ANN
# shortlist; with lambda = 1/2 each step's score is ONE subtract and
# ONE halving over fold-exact doubles, so the greedy trace is
# bit-identical in the unrolled materialized-CTE oracle.
_MMR_CAND = 20
_MMR_PICK = 5


def _mmr_oracle() -> str:
    cand = f"""
    cand as materialized (
      select b.vec_id, b.embedding,
             {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) as rel
      from (select embedding from embeddings where vec_id = 0) a
      cross join (select vec_id, embedding from embeddings where vec_id <> 0) b
      order by rel desc, b.vec_id limit {_MMR_CAND}
    ),
    sim as materialized (
      select a.vec_id as ida, b.vec_id as idb,
             {_DOT_SQL} / ({_NORM_A_SQL} * {_NORM_B_SQL}) as s
      from cand a join cand b on a.vec_id <> b.vec_id
    )"""
    steps = ["""
    p1 as materialized (
      select vec_id, rel / 2 as mmr from cand
      order by rel / 2 desc, vec_id limit 1
    ),
    sel1 as materialized (select vec_id from p1)"""]
    for r in range(2, _MMR_PICK + 1):
        steps.append(f"""
    p{r} as materialized (
      select c.vec_id, (c.rel - max(s.s)) / 2 as mmr
      from cand c
      join sim s on s.ida = c.vec_id and s.idb in (select vec_id from sel{r - 1})
      where c.vec_id not in (select vec_id from sel{r - 1})
      group by c.vec_id, c.rel
      order by mmr desc, c.vec_id limit 1
    ),
    sel{r} as materialized (
      select vec_id from sel{r - 1} union all select vec_id from p{r}
    )""")
    outs = " union all ".join(
        f"select {r} as pick, vec_id, mmr from p{r}" for r in range(1, _MMR_PICK + 1)
    )
    return f"""
    with {cand},
    {",".join(steps)}
    select cast(pick as int) as pick, vec_id, mmr
    from ({outs}) order by pick
    """


@query("sim_mmr_rerank", oracle=_mmr_oracle(), tags=("vector", "rerank", "diversity"))
def sim_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy MMR over the query-0 top-{_MMR_CAND} shortlist: pick
    {_MMR_PICK} results maximizing (rel - max_sim_to_picked)/2 each
    step (first pick scores rel/2 — the empty-set convention), ties to
    the lowest id. Emits (pick, vec_id, mmr) — the greedy trace, not
    just the set, so ordering bugs cannot hide.

    100 TB shape: MMR is a SHORTLIST algorithm by construction — the
    corpus-sized work is the ANN retrieval that produced the top-N
    (any sim_topk* variant); this operator's loop touches N rows and
    an N x N similarity matrix (400 doubles), both localCheckpointed
    once, so each greedy step is a tiny anti-join + argmax regardless
    of corpus size. Never run MMR on the corpus: diversify the
    shortlist the index returns.
    """
    e = t(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    base = e.where(F.col("vec_id") != 0).select("vec_id", "embedding")
    cand = (
        base.crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", cosine(F.col("embedding"), F.col("q_emb")).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_CAND)
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    sim = (
        a.join(b, F.col("ida") != F.col("idb"))
        .select("ida", "idb", cosine(F.col("ea"), F.col("eb")).alias("s"))
        .localCheckpoint(eager=True)
    )
    first = (
        cand.select("vec_id", (F.col("rel") / 2).alias("mmr"))
        .orderBy(F.col("mmr").desc(), "vec_id")
        .limit(1)
        .localCheckpoint(eager=True)
    )
    picks = first.select(F.lit(1).cast("int").alias("pick"), "vec_id", "mmr")
    selected = first.select("vec_id")
    for r in range(2, _MMR_PICK + 1):
        nxt = (
            cand.join(selected, "vec_id", "left_anti")
            .join(sim, cand["vec_id"] == sim["ida"])
            .join(selected.select(F.col("vec_id").alias("idb")), "idb")
            .groupBy(cand["vec_id"].alias("vec_id"), "rel")
            .agg(F.max("s").alias("maxsim"))
            .select("vec_id", ((F.col("rel") - F.col("maxsim")) / 2).alias("mmr"))
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        picks = picks.unionByName(
            nxt.select(F.lit(r).cast("int").alias("pick"), "vec_id", "mmr")
        )
        selected = selected.unionByName(nxt.select("vec_id")).localCheckpoint(eager=True)
    return picks.orderBy("pick")


# IVF operational diagnostics — the cell-balance report a serving team
# reads before picking nlist/nprobe: per-cell population, corpus
# fraction, and imbalance vs the uniform ideal. Skewed cells are the
# IVF failure mode at scale (a hot cell turns every probe into a near
# full scan; an empty cell wastes a centroid), and the fix — re-train,
# split the hot cell, or raise nprobe — starts from exactly this
# table. Pure integer counting over the deterministic seed-centroid
# assignment, so the report is hash-checked.
@query(
    "report_ivf_balance",
    oracle=f"""
    with {_ivf_geom_sql()},
    centroids as (
      select e.vec_id as cid, e.embedding
      from embeddings e, ivfp where e.vec_id between 1 and ivfp.n_cells
    ),
    assign as (
      select vec_id, cid as cell from (
        select e.vec_id, c.cid,
               row_number() over (partition by e.vec_id
                                  order by {_cos_sql('e', 'c')} desc, c.cid) as rn
        from embeddings e cross join centroids c
      ) where rn = 1
    ),
    tot as (select cast(count(*) as bigint) as n_total from assign)
    select c.cid as cell,
           cast(coalesce(p.n, 0) as bigint) as n_vectors,
           cast(coalesce(p.n, 0) as double) / tot.n_total as frac,
           cast(coalesce(p.n, 0) * ivfp.n_cells as double) / tot.n_total as imbalance
    from centroids c
    left join (select cell, cast(count(*) as bigint) as n from assign group by cell) p
      on p.cell = c.cid
    cross join tot cross join ivfp
    """,
    tags=("vector", "ivf", "report"),
)
def report_ivf_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Per-IVF-cell population report over the DERIVED serving
    geometry (n_cells = max(8, floor(√N)) seed centroids — the same
    index every IVF consumer serves): (cell, n_vectors, frac,
    imbalance) where imbalance is n_vectors / (n_total / n_cells) —
    1.0 is the uniform ideal, and a cell at 3.0 means probes landing
    there scan 3x their fair share. Empty cells appear with zero
    counts (left join from the centroid table), which is the other
    signal worth alarming on.

    100 TB shape: assignment is the map-side broadcast-centroid argmax
    every IVF consumer here shares (assign_cells — no corpus shuffle),
    and the report aggregates to n_cells rows with map-side combine.
    Run it after every re-train; feed hot cells back as split
    candidates. The 1-row total broadcasts for the fraction columns.
    """
    e = t(spark, sf, "embeddings")
    params = _ivf_params(e)
    cent = _ivf_centroids(e, params)
    assign = assign_cells(e, cent).select("vec_id", "cell")
    per = assign.groupBy("cell").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = assign.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        cent.select("cid")
        .join(per, F.col("cell") == F.col("cid"), "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(params.select("n_cells")))
        .select(
            F.col("cid").alias("cell"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_vectors"),
            (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("n_total")).alias("frac"),
            (
                (F.coalesce(F.col("n"), F.lit(0)) * F.col("n_cells")).cast("double")
                / F.col("n_total")
            ).alias("imbalance"),
        )
    )


# k-NN GRAPH construction — every vector's top-K neighbors in ONE job
# (vs sim_topk's one query): the batch ANN-graph primitive SemDeDup-
# style pipelines, graph clustering, and label propagation over
# embeddings all start from. Candidates come from the same literal-
# hyperplane banding as dedup_embedding_lsh; each undirected candidate
# pair is scored ONCE and mirrored (per-element products commute, so
# the mirrored cosine is bitwise identical); the per-source top-K is a
# rank filter that plans as WindowGroupLimit.
_KNN_K = 5
# eval_retrieval_mrr's integer reciprocal-rank trick sums 60 div rank,
# which is exact only while every rank 1.._KNN_K divides 60 — raise K
# past 5 (or to 7+) and the MRR silently corrupts in BOTH engines
# rather than failing (r12 advisor). 60 = lcm(1..5); recompute the
# constant if K grows.
assert all(60 % r == 0 for r in range(1, _KNN_K + 1)), (
    "eval_retrieval_mrr's sixtieths require lcm(1.._KNN_K) | 60"
)
_KNN_BANDS = 8


def _knn_graph_oracle() -> str:
    return f"""
    with {_keyed_post_sql(_KNN_BANDS)},
    cand as (
      select distinct k1.vec_id as src, k2.vec_id as dst
      from post k1 join post k2 using (band_key)
      where k1.vec_id <> k2.vec_id
    ),
    scored as (
      select c.src, c.dst, {_cos_sql('a', 'b')} as cos_sim
      from cand c
      join embeddings a on a.vec_id = c.src
      join embeddings b on b.vec_id = c.dst
    )
    select src, dst, cos_sim, cast(rn as int) as rank
    from (select *, row_number() over (partition by src
                                       order by cos_sim desc, dst) as rn
          from scored)
    where rn <= {_KNN_K}
    """


@query("sim_knn_graph", oracle=_knn_graph_oracle(), tags=("vector", "lsh", "knn", "graph"))
def sim_knn_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{_KNN_K} cosine neighbors for EVERY vector from banded-LSH
    candidates (L={_KNN_BANDS} x r=3 literal hyperplanes — hash-checked
    end to end). Vectors whose buckets yield fewer than K candidates
    emit fewer rows; the measured miss rate vs exact k-NN is gated by
    ``recall_sim_knn_graph``.

    100 TB shape: the band UDF runs ONCE over the corpus and only
    (band_key, vec_id) longs shuffle into posting lists; hot buckets
    past ``_EMB_BUCKET_CAP`` are dropped before any list is collected
    (capped_band_postings — the correlated-corpus quadratic guard);
    each bucket's pairs stream out of chained generators (never a
    band-key self-join); every undirected pair is scored once — the
    mirror row reuses the score, which is bitwise-safe because
    per-element products and the norm product commute; embeddings
    join back by id only for surviving pairs; and the rank<=
    {_KNN_K} filter plans as WindowGroupLimit (partial top-K per map
    task BEFORE the src shuffle), so K*P rows cross the wire per
    source, never the candidate mass.
    """
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings")
    # r15 (guide §8 — move heavy bytes once): each undirected pair is
    # scored INSIDE its LSH bucket (bucket_pair_cos — one band Arrow
    # pass, hot buckets capped before any payload groups), so the
    # embedding payload crosses once per posting instead of twice per
    # candidate pair; the pair-dedup exchange carries (lo, hi, cos)
    # longs+double only. Bit-exact with the previous
    # join-then-pair_cos_arrow shape (the bucket kernel's pinned
    # cumsum contract).
    scored_und = (
        bucket_pair_cos(e, _KNN_BANDS)
        .dropDuplicates(["a_id", "b_id"])
        .select(F.col("a_id").alias("lo"), F.col("b_id").alias("hi"), "cos_sim")
    )
    # mirror via a 2-row explode, NOT a self-union: a union references
    # the scored subtree twice, which re-runs the band-key Arrow pass
    # and the whole pair join per branch (plan-asserted single pass)
    directed = scored_und.select(
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("src"), F.col("hi").alias("dst"), F.col("cos_sim")),
                F.struct(F.col("hi").alias("src"), F.col("lo").alias("dst"), F.col("cos_sim")),
            )
        ).alias("p")
    ).select("p.src", "p.dst", "p.cos_sim")
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst"))
    return (
        directed.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _KNN_K)
    )


# Matryoshka truncation evaluation (Kusupati et al. 2022) — the
# dimension-budget study every modern embedding deployment runs:
# MRL-style models pack coarse-to-fine signal into prefix dimensions,
# so serving can truncate vectors (4-8x index shrink) if retrieval
# survives. For each prefix width this measures, against the full-dim
# top-K for the fixture query, (a) the top-K overlap and (b) whether
# the top-1 survived — the two numbers that decide a truncation
# rollout. All ranking is exact (same fold-order cosine over sliced
# arrays), ties to vec_id, so the report hash-checks.
_MRL_DIMS = (8, 16, 32)
_MRL_K = 10


def _cos_prefix_sql(x: str, y: str, dims: int) -> str:
    """DuckDB cosine over the first ``dims`` dims — the same
    sequential folds as _cos_sql on the sliced arrays."""
    dot_ = (
        f"list_reduce(list_prepend(cast(0 as double), "
        f"[cast({x}.embedding[i] as double) * cast({y}.embedding[i] as double) "
        f"for i in generate_series(1, least({dims}, len({x}.embedding)))]), (acc, v) -> acc + v)"
    )

    def nrm(tbl: str) -> str:
        return (
            f"sqrt(list_reduce(list_prepend(cast(0 as double), "
            f"[cast({tbl}.embedding[i] as double) * cast({tbl}.embedding[i] as double) "
            f"for i in generate_series(1, least({dims}, len({tbl}.embedding)))]), (acc, v) -> acc + v))"
        )

    return f"{dot_} / ({nrm(x)} * {nrm(y)})"


def _mrl_oracle() -> str:
    arms = []
    for dims in _MRL_DIMS:
        arms.append(f"""
    t{dims} as (
      select b.vec_id from embeddings b
      cross join (select embedding from embeddings where vec_id = 0) q
      where b.vec_id <> 0
      order by {_cos_prefix_sql('b', 'q', dims)} desc, b.vec_id
      limit {_MRL_K}
    )""")
        arms.append(f"""
    m{dims} as (
      select {dims} as dims,
             cast((select count(*) from t{dims} x join tfull f on x.vec_id = f.vec_id)
                  as bigint) as n_overlap,
             (select min(vec_id) from (select vec_id from tfull
                                       order by r limit 1))
               in (select vec_id from t{dims}) as top1_kept
      from (select 1)
    )""")
    union = " union all ".join(f"select * from m{d}" for d in _MRL_DIMS)
    return f"""
    with tfull as (
      select b.vec_id, row_number() over (
        order by {_cos_sql('b', 'q')} desc, b.vec_id) as r
      from embeddings b
      cross join (select embedding from embeddings where vec_id = 0) q
      where b.vec_id <> 0
      qualify r <= {_MRL_K}
    ),
    {", ".join(a.strip() for a in arms)}
    select dims, n_overlap,
           cast(n_overlap as double) / {_MRL_K} as overlap_frac, top1_kept
    from ({union})
    order by dims
    """


@query("embedding_matryoshka_eval", oracle=_mrl_oracle(), tags=("vector", "eval", "matryoshka"))
def embedding_matryoshka_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Per prefix width in {_MRL_DIMS}: top-{_MRL_K} overlap with the
    full-dimension ranking and whether the top-1 survived truncation.

    100 TB shape: each arm is the sim_topk serving plan over a SLICED
    column (narrower folds, identical shuffle story — broadcast query,
    TakeOrderedAndProject); the comparison joins K-row lists. The
    decision this feeds — serve at 8/16/32 dims — multiplies directly
    into IVF-PQ index size and ADC bandwidth.
    """
    e = t(spark, sf, "embeddings")
    q_emb = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")).limit(1)
    corpus = e.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q_emb))

    def topk(dims: int | None) -> DataFrame:
        b = F.col("embedding") if dims is None else F.slice("embedding", 1, dims)
        qv = F.col("q_emb") if dims is None else F.slice("q_emb", 1, dims)
        cos = dot(b, qv) / (norm(b) * norm(qv))
        return (
            corpus.select("vec_id", cos.alias("c"))
            .orderBy(F.desc("c"), F.asc("vec_id"))
            .limit(_MRL_K)
        )

    full = topk(None).select("vec_id").localCheckpoint(eager=True)  # eager-by-design: K rows, read by every arm
    top1 = topk(None).limit(1).select(F.col("vec_id").alias("t1"))
    out = None
    for dims in _MRL_DIMS:
        arm = topk(dims).select(F.col("vec_id").alias("a_id"))
        n_overlap = (
            arm.join(full, arm["a_id"] == full["vec_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        )
        kept = (
            arm.join(F.broadcast(top1), arm["a_id"] == F.col("t1"), "left_semi")
            .agg((F.count(F.lit(1)) > 0).alias("top1_kept"))
        )
        row = (
            n_overlap.crossJoin(F.broadcast(kept))
            .select(
                F.lit(dims).cast("int").alias("dims"),
                "n_overlap",
                (F.col("n_overlap").cast("double") / F.lit(float(_MRL_K))).alias("overlap_frac"),
                "top1_kept",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dims")


# Incremental ANN index maintenance — the ingestion-side sibling of
# sink_ann_index_roundtrip: the standing index (trained on the corpus,
# persisted at rest) absorbs a NEW batch of vectors WITHOUT retraining
# — delta vectors are assigned to the frozen IVF centroids, encoded
# with the frozen PQ codebook, and their rows APPENDED to the
# persisted parts; the serve then reads the merged index. This is how
# every production vector index actually grows between periodic
# retrains (FAISS add(), not train()). The audit row carries the count
# ledger (oracle-recomputable) plus a physical parity fact: serving
# from the merged at-rest parts must match, row for row including the
# float score, serving from an in-memory build with the same frozen
# codebook.
def _upsert_oracle() -> str:
    return f"""
    with {_ivfpq_ctes(corpus_only=True)},
    fin as (
      select b.vec_id, {_cos_sql('b', 'a')} as cos_sim
      from short s
      join u b on b.vec_id = s.vec_id
      cross join (select embedding from u where vec_id = 0) a
      order by cos_sim desc, b.vec_id
      limit 1
    )
    select
      cast((select count(*) from u, cutoff where vec_id < c) as bigint) as n_corpus,
      cast((select count(*) from u, cutoff where vec_id >= c) as bigint) as n_delta,
      cast((select count(*) from enc) as bigint) as n_codes_total,
      cast((select count(distinct a.cell) from assign a, cutoff where a.vec_id >= c)
           as bigint) as n_cells_delta_hit,
      cast((select vec_id from fin) as bigint) as top1_id,
      true as serve_parity_ok
    """


@query(
    "sink_ann_index_upsert",
    oracle=_upsert_oracle(),
    tags=("sink", "vector", "ivfpq", "incremental"),
)
def sink_ann_index_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Grow the persisted IVF-PQ index by a delta batch with a FROZEN
    corpus-trained codebook: train on vectors below the
    {_UPSERT_CUTOFF_FRAC} id-range cutoff, persist the corpus parts,
    encode + assign the delta against the frozen codebook/centroids,
    APPEND its rows to the at-rest parts, and serve the query from the
    merged index. Parity is physical: the merged-at-rest serve must
    equal the in-memory frozen-codebook serve bit-for-bit.

    100 TB shape: per batch the work is O(delta) — one broadcast-
    codebook argmin per delta subvector and an appended parquet write;
    the standing corpus is neither rescanned nor re-encoded (its codes
    are 10 bytes/vector at rest). Retraining stays a scheduled offline
    event (the roundtrip op); this is the path between retrains.
    """

    e = _unit(t(spark, sf, "embeddings").select("vec_id", "embedding"))
    bounds = e.agg(
        F.floor(
            F.min("vec_id")
            + F.lit(_UPSERT_CUTOFF_FRAC) * (F.max("vec_id") - F.min("vec_id"))
        )
        .cast("long")
        .alias("c")
    ).collect()[0]  # eager-by-design: the cutoff is catalog state (1 row)
    if bounds["c"] is None:
        return spark.createDataFrame(
            [(0, 0, 0, 0, None, True)],
            "n_corpus bigint, n_delta bigint, n_codes_total bigint, "
            "n_cells_delta_hit bigint, top1_id bigint, serve_parity_ok boolean",
        )
    c = int(bounds["c"])
    # corpus-trained parts share the _IVFPQ_MEMO (variant-tagged key):
    # the 2-round Lloyd training dominates the wall and is identical
    # across driver re-checks / bench passes in one session
    sc = spark.sparkContext
    memo_key = (sc.applicationId, sc.startTime, sf, "corpus")
    cached = _IVFPQ_MEMO.get(memo_key)
    try:
        if cached is not None and sc._jsc.sc().isStopped():
            cached = None
    except Exception:  # noqa: BLE001 — any py4j breakage means "rebuild"
        cached = None
    if cached is not None:
        subsq, cb, codes_all = cached
    else:
        subsq = _ivfpq_qsubs(e).localCheckpoint(eager=True)
        cb, _ = _ivfpq_train_det(subsq.where(F.col("vec_id") < c), _IVFPQ_K, _IVFPQ_ITERS)
        enc_all = _ivfpq_assign_det(subsq, cb)  # FROZEN codebook for corpus AND delta
        codes_all = enc_all.select(
            "vec_id", F.col("m").alias("cm"), F.col("cell").alias("code")
        ).localCheckpoint(eager=True)  # eager-by-design: feeds both writes + the in-memory serve
        _IVFPQ_MEMO[memo_key] = (subsq, cb, codes_all)
    # geometry FROZEN at corpus build time: n_cells/nprobe derive from
    # the pre-cutoff corpus count, never the delta (the upsert contract
    # — an append must not re-shape the index)
    params = _ivf_params(e.where(F.col("vec_id") < c))
    cent = _ivf_centroids(e, params)
    assign = assign_cells(e, cent).select("vec_id", "cell").localCheckpoint(eager=True)
    out = scratch_dir("ppspark_annupsert_")
    # r15 (guide §2.6 — overlap independent jobs): the three index
    # parts write as concurrent driver threads; each part's append
    # chains after its own overwrite (same directory), but the three
    # chains are independent, so the wall is the slowest chain, not
    # the sum of five sequential write barriers.
    from concurrent.futures import ThreadPoolExecutor

    def _write_codes() -> None:
        # v1 corpus at rest, then the upsert: delta rows APPENDED,
        # nothing corpus-sized rewritten
        codes_all.where(F.col("vec_id") < c).write.mode("overwrite").parquet(f"{out}/codes")
        codes_all.where(F.col("vec_id") >= c).write.mode("append").parquet(f"{out}/codes")

    def _write_assign() -> None:
        assign.where(F.col("vec_id") < c).write.mode("overwrite").parquet(f"{out}/assign")
        assign.where(F.col("vec_id") >= c).write.mode("append").parquet(f"{out}/assign")

    def _write_cb() -> None:
        cb.write.mode("overwrite").parquet(f"{out}/cb")

    with ThreadPoolExecutor(max_workers=3) as pool:
        for fut in [pool.submit(w) for w in (_write_codes, _write_assign, _write_cb)]:
            fut.result()
    # serve from the merged at-rest parts vs the in-memory frozen build
    probe = _ivf_probe_list(e, cent, params)
    qsub = subsq.where(F.col("vec_id") == 0).select(
        "m", *[f"q{d}" for d in range(1, _IVFPQ_SUBDIM + 1)]
    )
    q_emb = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    base = {"e": e, "probe": probe, "qsub": qsub, "q_emb": q_emb}
    fresh = _ivfpq_serve(
        {**base, "assign": assign, "cb": cb, "codes": codes_all}
    ).localCheckpoint(eager=True)  # eager-by-design: 10-row serve result, read by the parity compare AND the top1 audit
    served = _ivfpq_serve(
        {
            **base,
            "assign": spark.read.parquet(f"{out}/assign"),
            "cb": spark.read.parquet(f"{out}/cb"),
            "codes": spark.read.parquet(f"{out}/codes"),
        }
    )
    # SYMMETRIC parity (r9 ADVICE): a one-sided left join cannot see
    # extra or duplicated at-rest rows (a double-appended delta joins
    # clean). Compare exact row MULTISETS instead: group each serve by
    # the full row, full-outer join the (row -> count) maps, and any
    # count difference on either side fails parity.
    fa = fresh.groupBy("vec_id", "cell", "cos_sim").agg(F.count(F.lit(1)).alias("n_f"))
    sa = served.groupBy("vec_id", "cell", "cos_sim").agg(F.count(F.lit(1)).alias("n_s"))
    bad = F.sum(
        F.when(
            F.coalesce("n_f", F.lit(0)) != F.coalesce("n_s", F.lit(0)), 1
        ).otherwise(0)
    )
    # r15 (guide §5 — the driver should do almost no data work): the
    # audit ledger is ONE lazy 1-row frame instead of five sequential
    # driver-synchronized actions (parity collect, counts collect,
    # merged-codes count, delta-cell count, top1 collect). Every audit
    # fact becomes a 1-row aggregate cross-joined into the result row;
    # the independent subtrees schedule concurrently inside the single
    # consuming job. Values are identical: counts come from the
    # checkpointed assignment (one row per corpus vector, same rows as
    # e); n_codes_total still scans the MERGED at-rest files (the
    # physical proof the append landed); top1 is the serve order's
    # first row spelled as max(struct(cos_sim, -vec_id)) — same
    # (cos desc, vec_id asc) winner, null on an empty serve.
    parity_row = fa.join(sa, ["vec_id", "cell", "cos_sim"], "full_outer").agg(
        (F.coalesce(bad, F.lit(0)) == 0).alias("serve_parity_ok")
    )
    counts_row = assign.agg(
        F.sum(F.when(F.col("vec_id") < c, 1).otherwise(0)).cast("long").alias("n_corpus"),
        F.sum(F.when(F.col("vec_id") >= c, 1).otherwise(0)).cast("long").alias("n_delta"),
    )
    codes_row = (
        spark.read.parquet(f"{out}/codes")
        .agg(F.count(F.lit(1)).cast("long").alias("n_codes_total"))
    )
    cells_row = (
        assign.where(F.col("vec_id") >= c)
        .select("cell")
        .distinct()  # distinct-then-count (not count_distinct): a null cell, were one ever possible, counts as a value — the old ledger's semantics
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells_delta_hit"))
    )
    top1_row = fresh.agg(
        F.max(F.struct(F.col("cos_sim"), (-F.col("vec_id")).alias("nv"))).alias("_b")
    ).select((-F.col("_b.nv")).cast("bigint").alias("top1_id"))
    return (
        counts_row.crossJoin(F.broadcast(codes_row))
        .crossJoin(F.broadcast(cells_row))
        .crossJoin(F.broadcast(top1_row))
        .crossJoin(F.broadcast(parity_row))
        .select(
            "n_corpus",
            "n_delta",
            "n_codes_total",
            "n_cells_delta_hit",
            "top1_id",
            "serve_parity_ok",
        )
    )


# Filtered vector search — the serving feature every production vector
# store exposes (pgvector WHERE clauses, Qdrant payload filters,
# FAISS IDSelector): top-k cosine restricted to rows passing a
# metadata predicate (here: the query's own label — "same collection"
# filtering). Strategy matters at scale: POST-filtering a top-k list
# under-fills when the filter is selective (ask for 10, filter eats
# 9); this operator PRE-filters — the predicate joins before any
# cosine is evaluated, so the top-k is exact over the filtered
# population by construction.
@query(
    "sim_topk_filtered",
    oracle=f"""
    select b.vec_id, cast(b.label as int) as label, {_cos_sql('b', 'a')} as cos_sim
    from embeddings b
    cross join (select embedding, label from embeddings where vec_id = 0) a
    where b.vec_id <> 0 and b.label = a.label
    order by cos_sim desc, b.vec_id
    limit 10
    """,
    tags=("vector", "serving", "filtered"),
)
def sim_topk_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 cosine neighbors of vec 0 among vectors sharing its
    label — exact PRE-filtered search (the predicate prunes before any
    scoring, so the result is the true top-k of the filtered
    population, never an under-filled post-filtered list).

    100 TB shape: the 1-row query (embedding, label) broadcasts; the
    label equi-condition prunes map-side before the fold evaluates
    (and in a label-partitioned layout becomes partition pruning —
    the at-rest analog); top-k plans as TakeOrderedAndProject. The
    IVF composition (probe cells AND filter) reuses assign_cells
    unchanged — the filter simply rides the candidate stream.
    """
    e = t(spark, sf, "embeddings")
    q = (
        e.where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q_emb"), F.col("label").alias("q_label"))
        .limit(1)
    )
    cos = dot(F.col("embedding"), F.col("q_emb")) / (
        norm(F.col("embedding")) * norm(F.col("q_emb"))
    )
    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("label") == F.col("q_label"))
        .select("vec_id", F.col("label").cast("int").alias("label"), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# LSH bucket-pressure report — the serving-ops diagnostic behind the
# hot-bucket cap (the report_ivf_balance twin for the hyperplane
# family): per band, the bucket-count/size distribution, the pair
# mass the buckets would expand to, and how many buckets sit OVER the
# cap (and are therefore being dropped by capped_band_postings). When
# n_over_cap rises above zero in production, recall is silently paying
# for corpus correlation and the response is raising r (planes per
# band) so selectivity tracks corpus size — this report is the
# tripwire that says so BEFORE the recall gates catch it downstream.
@query(
    "report_lsh_bucket_pressure",
    oracle=f"""
    with {_keyed_post_sql(16)},
    sizes as (
      select band_key // 8 as band, band_key,
             cast(count(*) as bigint) as sz
      from keyed group by band_key
    )
    select cast(band as int) as band,
           cast(count(*) as bigint) as n_buckets,
           cast(max(sz) as bigint) as max_bucket,
           cast(sum(sz * (sz - 1) / 2) as bigint) as pair_mass,
           cast(sum(case when sz > {_EMB_BUCKET_CAP} then 1 else 0 end) as bigint)
             as n_over_cap
    from sizes
    group by band
    """,
    tags=("vector", "lsh", "report"),
)
def report_lsh_bucket_pressure(spark: SparkSession, sf: str) -> DataFrame:
    """Per-band posting-list pressure: bucket count, largest bucket,
    the candidate-pair mass the buckets expand to, and the number of
    buckets over the {_EMB_BUCKET_CAP} cap (currently being dropped).
    Zero over-cap buckets means the caps are pure insurance; a
    non-zero count means blocking selectivity no longer matches the
    corpus and r needs raising (the ×10 replication soak in SCALE.md
    shows exactly this signature).

    100 TB shape: one Arrow band pass, one map-side-combined count per
    bucket, then a 16-row aggregate — the report never expands a pair.
    """
    e = t(spark, sf, "embeddings")
    keyed = e.select(
        F.explode_outer(lsh_band_keys_arrow(16)(F.col("embedding"))).alias("band_key")
    )
    sizes = keyed.groupBy("band_key").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return (
        sizes.select((F.col("band_key") / 8).cast("long").alias("band"), "sz")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias("pair_mass"),
            F.sum(F.when(F.col("sz") > _EMB_BUCKET_CAP, 1).otherwise(0))
            .cast("long")
            .alias("n_over_cap"),
        )
        .select(F.col("band").cast("int").alias("band"), "n_buckets", "max_bucket", "pair_mass", "n_over_cap")
    )


# k-NN classification over the embedding graph — the pseudo-labeling
# step semi-supervised pipelines run (predict a label for every vector
# from its neighbors' majority vote, then keep high-agreement
# predictions as training labels). Composes the hash-checked
# sim_knn_graph: per vector, majority label among its top-{_KNN_K}
# cosine neighbors (ties to the smallest label id), plus agreement
# count and whether the vote matches the vector's actual label — the
# per-row facts an auto-labeling gate thresholds on.
def _knn_classify_oracle() -> str:
    return f"""
    with g as ({_knn_graph_oracle()}),
    cnt as (
      select g.src, e.label as nlabel, count(*) as n
      from g join embeddings e on e.vec_id = g.dst
      group by g.src, e.label
    ),
    pred as (
      select src, nlabel as pred_label, n as n_agree from (
        select *, row_number() over (partition by src
                                     order by n desc, nlabel) as rn
        from cnt
      ) where rn = 1
    )
    select p.src as vec_id, cast(p.pred_label as int) as pred_label,
           cast(p.n_agree as bigint) as n_agree,
           cast(e.label as int) as true_label,
           p.pred_label = e.label as correct
    from pred p join embeddings e on e.vec_id = p.src
    """


@query("embedding_knn_classify", oracle=_knn_classify_oracle(), tags=("vector", "knn", "labeling"))
def embedding_knn_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Majority-vote label prediction per vector from its
    top-{_KNN_K} cosine neighbors (ties to the smallest label id),
    with the agreement count and actual-label match — the
    pseudo-labeling primitive a semi-supervised pipeline gates on
    (keep predictions with n_agree >= threshold as new labels).

    100 TB shape: rides sim_knn_graph's capped-bucket candidate plan
    (K rows per vector cross the wire); the vote is one
    map-side-combined count per (src, label) + a WindowGroupLimit-
    style argmax; labels join back by id on the K-row-per-vector
    spine — embeddings themselves never re-shuffle.
    """
    from pyspark.sql import Window

    g = sim_knn_graph(spark, sf).select("src", "dst")
    lab = t(spark, sf, "embeddings").select("vec_id", "label")
    nl = lab.select(F.col("vec_id").alias("n_id"), F.col("label").alias("nlabel"))
    cnt = (
        g.join(nl, F.col("dst") == F.col("n_id"))
        .groupBy("src", "nlabel")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("src").orderBy(F.col("n").desc(), F.col("nlabel"))
    pred = (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("src", F.col("nlabel").alias("pred_label"), F.col("n").alias("n_agree"))
    )
    return (
        pred.join(lab, pred["src"] == lab["vec_id"])
        .select(
            F.col("src").alias("vec_id"),
            F.col("pred_label").cast("int").alias("pred_label"),
            F.col("n_agree").cast("long").alias("n_agree"),
            F.col("label").cast("int").alias("true_label"),
            (F.col("pred_label") == F.col("label")).alias("correct"),
        )
    )


# N180: margin-free mutual-best bitext mining (Artetxe & Schwenk
# 2019's "intersection" criterion): candidate translation pairs are
# mined between two language slices of the corpus by pairing inside
# hyperplane-LSH buckets, scoring exact cosine on the candidates, and
# keeping pairs where EACH side is the other's best candidate (mutual
# argmax) above a floor. The reference pipeline has no multilingual
# story; this is the training-data operator every parallel-corpus
# build runs (WMT/CCMatrix shape).
_BITEXT_SRC = "en"
_BITEXT_TGT = "de"
_BITEXT_BANDS = 16  # recall knob: probes cost map work only (sim_topk_lsh)
_BITEXT_TAU = 0.2


def _bitext_oracle() -> str:
    keys = ", ".join(_band_key_sql("v", b) for b in range(_BITEXT_BANDS))
    return f"""
    with v as (
      select e.vec_id, d.lang, e.embedding
      from embeddings e join documents d on d.doc_id = e.vec_id
      where d.lang in ('{_BITEXT_SRC}', '{_BITEXT_TGT}')
    ),
    keyed as (
      select v.vec_id, v.lang, unnest([{keys}]) as band_key from v
    ),
    post as (
      select vec_id, lang, band_key from keyed
      qualify count(*) over (partition by band_key) <= {_EMB_BUCKET_CAP}
    ),
    cand as (
      select distinct a.vec_id as src_id, b.vec_id as tgt_id
      from post a join post b using (band_key)
      where a.lang = '{_BITEXT_SRC}' and b.lang = '{_BITEXT_TGT}'
    ),
    scored as (
      select c.src_id, c.tgt_id, {_cos_sql('a', 'b')} as cos_sim
      from cand c
      join embeddings a on a.vec_id = c.src_id
      join embeddings b on b.vec_id = c.tgt_id
    ),
    ranked as (
      select src_id, tgt_id, cos_sim,
             row_number() over (partition by src_id
                                order by cos_sim desc, tgt_id) as r_src,
             row_number() over (partition by tgt_id
                                order by cos_sim desc, src_id) as r_tgt
      from scored
    )
    select src_id, tgt_id, cos_sim from ranked
    where r_src = 1 and r_tgt = 1 and cos_sim >= {_BITEXT_TAU}
    """


@query("mine_bitext_mutual", oracle=_bitext_oracle(), tags=("vector", "text", "mining", "lsh"))
def mine_bitext_mutual(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual-best cross-lingual pair mining over LSH candidates.

    HASH-CHECKED end to end: band keys are the engine-neutral literal
    hyperplanes (lsh_band_keys / _band_key_sql), the hot-bucket cap is
    the mirrored qualify filter, cosine is the shared sequential-fold
    spelling (bitwise identical), and the mutual-argmax window ranks
    order by that exact float with id tie-breaks — so both engines
    keep the same pairs.

    100 TB shape: candidacy never leaves LSH buckets (narrow
    (vec_id, lang, band_key) rows, capped per bucket — no cross-lang
    cartesian anywhere), embeddings join back BY ID only for
    deduplicated candidates, and the mutual filter is two window
    ranks over the candidate table, not the corpus. Raising recall is
    a band-count knob (map-side cost only), exactly the sim_topk_lsh
    trade.
    """
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings")
    d = t(spark, sf, "documents").select("doc_id", "lang")
    v = (
        e.join(d, e["vec_id"] == d["doc_id"])
        .where(F.col("lang").isin(_BITEXT_SRC, _BITEXT_TGT))
        .select("vec_id", "lang", "embedding")
    )
    # r15 (guide §8 — move heavy bytes once): all within-bucket pairs
    # of the en/de slice score INSIDE the bucket (bucket_pair_cos —
    # one band Arrow pass over v, hot-bucket cap before any payload
    # groups, same df statistic as the old qualify-window), then the
    # narrow (a_id, b_id, cos) pairs rejoin the tiny lang map and keep
    # only cross-lang rows oriented src->tgt. The cosine is symmetric
    # BITWISE (per-element products and the norm product commute), so
    # orienting an undirected a<b pair either way reproduces the old
    # directed score exactly; same-lang within-bucket pairs are scored
    # and dropped — vectorized kernel work traded for never shipping
    # 2x64 doubles per candidate pair through two id joins.
    und = bucket_pair_cos(v, _BITEXT_BANDS).dropDuplicates(["a_id", "b_id"])
    langs = v.select("vec_id", "lang")
    la = langs.select(F.col("vec_id").alias("_la_id"), F.col("lang").alias("lang_a"))
    lb = langs.select(F.col("vec_id").alias("_lb_id"), F.col("lang").alias("lang_b"))
    sided = (
        und.join(la, F.col("a_id") == F.col("_la_id"))
        .join(lb, F.col("b_id") == F.col("_lb_id"))
        .where(F.col("lang_a") != F.col("lang_b"))
    )
    scored = sided.select(
        F.when(F.col("lang_a") == _BITEXT_SRC, F.col("a_id")).otherwise(F.col("b_id")).alias("src_id"),
        F.when(F.col("lang_a") == _BITEXT_SRC, F.col("b_id")).otherwise(F.col("a_id")).alias("tgt_id"),
        "cos_sim",
    )
    w_src = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("tgt_id"))
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("cos_sim"), F.asc("src_id"))
    return (
        scored.withColumn("r_src", F.row_number().over(w_src))
        .withColumn("r_tgt", F.row_number().over(w_tgt))
        .where((F.col("r_src") == 1) & (F.col("r_tgt") == 1) & (F.col("cos_sim") >= _BITEXT_TAU))
        .select("src_id", "tgt_id", "cos_sim")
    )


# Multiprobe LSH (Lv et al. 2007, "Multi-Probe LSH"): besides the
# query's own bucket in each band, probe the Hamming-1 perturbations
# of its r-bit sign signature — the buckets a near neighbor most
# likely fell into when ONE hyperplane's sign disagreed. Standard
# practice (FAISS/FLANN) for buying recall without more hash tables:
# same L bands, (r+1)x the probe keys, zero extra index state. The
# band key layout (band*2^r + sig, sig in the low r bits) makes the
# perturbations literal XORs of the key: key ^ 1, key ^ 2, key ^ 4.
def _multiprobe_keys(col: F.Column) -> F.Column:
    return F.array(
        col,
        *[col.bitwiseXOR(F.lit(1 << j)) for j in range(_PLANES_PER_BAND)],
    )


def _sim_topk_lsh_multiprobe_oracle(n_bands: int) -> str:
    keys = ", ".join(_band_key_sql("e", b) for b in range(n_bands))
    flips = ", ".join(f"xor(band_key, {1 << j})" for j in range(_PLANES_PER_BAND))
    return f"""
    with keyed as (
      select e.vec_id, unnest([{keys}]) as band_key from embeddings e
    ),
    qk as (
      select distinct unnest([band_key, {flips}]) as band_key
      from keyed where vec_id = 0
    ),
    cand as (
      select distinct k.vec_id from keyed k join qk using (band_key)
      where k.vec_id <> 0
    )
    select b.vec_id, {_cos_sql('b', 'a')} as cos_sim
    from embeddings b
    join cand c on b.vec_id = c.vec_id
    cross join (select embedding from embeddings where vec_id = 0) a
    order by cos_sim desc, b.vec_id
    limit 10
    """


@query(
    "sim_topk_lsh_multiprobe",
    oracle=_sim_topk_lsh_multiprobe_oracle(_LSH_TOPK_BANDS),
    tags=("vector", "lsh", "multiprobe"),
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """Banded-LSH ANN top-k with Hamming-1 multiprobe: candidates =
    vectors sharing any of the query's L band keys OR any single-bit
    perturbation of them ((r+1)·L = 64 probe keys vs L = 16). Recovers
    neighbors that one hyperplane's sign flipped into an adjacent
    bucket — the recall knob that costs probe keys, not index state.

    100 TB shape: identical to sim_topk_lsh — the corpus side's band
    keys are the SAME Arrow kernel output (an at-rest index shared by
    every probe policy), and the widened probe side is still a
    broadcast of 64 longs feeding the same map-side equi-join; no new
    shuffle, no second index. Hash-checked end to end (the XOR
    perturbations are engine-neutral integer ops).
    """
    n_bands = _LSH_TOPK_BANDS
    e = t(spark, sf, "embeddings")
    keyed = e.select(
        "vec_id",
        "embedding",
        F.explode_outer(lsh_band_keys_arrow(n_bands)(F.col("embedding"))).alias("band_key"),
    )
    q_keys = (
        keyed.where(F.col("vec_id") == 0)
        .select(F.explode(_multiprobe_keys(F.col("band_key"))).alias("q_key"))
        .dropDuplicates(["q_key"])
    )
    q_emb = (
        e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb")).limit(1)
    )
    # score-then-dedup: see sim_topk_lsh — the duplicate collapse
    # shuffles (vec_id, cos) spines, never embeddings; with (r+1)x the
    # probe keys multiprobe hits more bands per candidate, so the
    # payload-free dedup matters even more here
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    return (
        keyed.where(F.col("vec_id") != 0)
        .join(F.broadcast(q_keys), F.col("band_key") == F.col("q_key"))
        .crossJoin(F.broadcast(q_emb))
        .select("vec_id", cos.alias("cos_raw"))
        .dropDuplicates(["vec_id"])
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.col("cos_raw").alias("cos_sim"))
    )


# N233: retrieval ranking-quality eval — MRR and hit-rate@K for the
# ANN serving path against the labeled ground truth (relevant =
# same-label neighbor), the metric pair every retrieval/RAG pipeline
# reports beside recall-vs-brute-force (which only measures ANN
# fidelity, not whether retrieval finds RELEVANT things). NDCG is
# deliberately absent: its log2 discounts are transcendental and
# rank-metric monotone with MRR at K=5 for single-relevance grading.
# Exactness trick: reciprocal ranks 1/r for r in 1..K are not binary-
# exact (1/3, 1/5), so the sum is carried as integer sixtieths
# (60/r in {60,30,20,15,12}) and ONE final division produces the
# float — no order-dependent float accumulation.
def _mrr_oracle() -> str:
    from parquet_processor_spark.registry import _ORACLES

    return f"""
    with g as ({_ORACLES['sim_knn_graph']}),
    rel as (
      select g.src, g.rank
      from g
        join embeddings es on es.vec_id = g.src
        join embeddings ed on ed.vec_id = g.dst
      where es.label = ed.label
    ),
    per as (
      select src, min(rank) as first_rel
      from rel group by src
    ),
    n as (select cast(count(distinct src) as bigint) as n_queries from g),
    s as (
      select cast(count(*) as bigint) as n_with_hit,
             cast(coalesce(sum(60 // first_rel), 0) as bigint) as rr60
      from per
    )
    select n.n_queries, s.n_with_hit,
           cast(s.n_with_hit as double) / nullif(n.n_queries, 0) as hit_rate,
           cast(s.rr60 as double) / 60.0 / nullif(n.n_queries, 0) as mrr
    from n cross join s
    """


@query("eval_retrieval_mrr", oracle=_mrr_oracle(), tags=("vector", "knn", "eval", "retrieval"))
def eval_retrieval_mrr(spark: SparkSession, sf: str) -> DataFrame:
    """Mean reciprocal rank and hit-rate@{k} of the banded-LSH kNN
    graph, grading same-label neighbors as relevant.

    100 TB shape: rides sim_knn_graph's capped-bucket plan (K rows
    per vector); the label joins are id-keyed on that K-row spine
    (embeddings never re-shuffle); per-query first-relevant-rank is
    one map-side-combined min; the metrics are a 1-row expression
    over exact integers (sixtieths), so the floats are two divisions
    — bitwise cross-engine regardless of partitioning.
    """.format(k=_KNN_K)
    # r14 (guide §2.4 — duplicated subtrees): the K-rows-per-vector
    # graph feeds BOTH the relevance join and the n_queries count;
    # unshared, the whole banded-LSH + pair-score + top-K subtree
    # executed twice (plan showed 4 WindowGroupLimit nodes). Bounded:
    # K rows per vector.
    g = (
        sim_knn_graph(spark, sf)
        .select("src", "dst", "rank")
        .localCheckpoint(eager=True)
    )
    lab = t(spark, sf, "embeddings").select("vec_id", "label")
    rel = (
        g.join(lab.select(F.col("vec_id").alias("src"), F.col("label").alias("ls")), "src")
        .join(lab.select(F.col("vec_id").alias("dst"), F.col("label").alias("ld")), "dst")
        .where(F.col("ls") == F.col("ld"))
        .select("src", "rank")
    )
    per = rel.groupBy("src").agg(F.min("rank").alias("first_rel"))
    n = g.agg(F.countDistinct("src").cast("long").alias("n_queries"))
    s = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_with_hit"),
        F.coalesce(F.sum(F.expr("60 div first_rel")), F.lit(0)).cast("long").alias("rr60"),
    )
    return n.crossJoin(F.broadcast(s)).select(
        "n_queries",
        "n_with_hit",
        F.expr("cast(n_with_hit as double) / nullif(n_queries, 0)").alias("hit_rate"),
        F.expr("cast(rr60 as double) / 60.0 / nullif(n_queries, 0)").alias("mrr"),
    )


# N245: embedding-table health report — the QA pass every vector
# corpus needs before indexing: per-dimension mean/variance (a dead
# dimension — zero variance — wastes index bits and breaks whitening;
# a drifted mean breaks cosine vs dot assumptions) plus the zero
# fraction. Cross-engine exactness: per-dimension sums of DOUBLES are
# order-dependent, so values go through the cents discipline first —
# floor(v * 1e6 + 0.5) micro-units are exact integers, summed
# map-side, and the only doubles are shared one-division formula
# texts. The oracle indexes a fixed dims table (the fixture is
# 64-dim; a dim change fails loudly as a row-count mismatch, not a
# silent skew).
_EMB_DIM = 64
_EMB_SCALE = 1_000_000


@query(
    "report_embedding_health",
    oracle=f"""
    with dims as (select cast(range as int) as dim from range({_EMB_DIM})),
    q as (
      select d.dim,
             cast(floor(cast(e.embedding[d.dim + 1] as double) * {_EMB_SCALE} + 0.5) as bigint) as qv
      from embeddings e cross join dims d
    ),
    m as (
      select dim, cast(count(*) as bigint) as n,
             cast(sum(qv) as bigint) as s,
             cast(sum(qv * qv) as bigint) as ss,
             cast(count(case when qv = 0 then 1 end) as bigint) as nz
      from q group by dim
    )
    select dim, n,
           cast(s as double) / ({_EMB_SCALE}.0 * n) as mean,
           (cast(n as double) * ss - cast(s as double) * s)
             / (cast(n as double) * n * {_EMB_SCALE}.0 * {_EMB_SCALE}.0) as variance,
           cast(nz as double) / n as zero_frac,
           (cast(n as double) * ss - cast(s as double) * s) = 0.0 as dead_dim
    from m
    """,
    tags=("vector", "report", "quality"),
)
def report_embedding_health(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension mean / population variance / zero fraction /
    dead-dimension flag over the embeddings table.

    100 TB shape: ONE posexplode + map-side-combined aggregate into
    |dims| integer-moment rows — embeddings never shuffle (only the
    64-row moment table crosses the wire), and every statistic is a
    one-division shared formula text over exact micro-unit integers.
    """
    q = t(spark, sf, "embeddings").select(
        F.posexplode("embedding").alias("dim", "v")
    ).select(
        "dim",
        F.floor(F.col("v").cast("double") * _EMB_SCALE + F.lit(0.5)).cast("long").alias("qv"),
    )
    m = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("long").alias("ss"),
        F.count(F.when(F.col("qv") == 0, 1)).cast("long").alias("nz"),
    )
    var = (
        f"(cast(n as double) * ss - cast(s as double) * s)"
        f" / (cast(n as double) * n * {_EMB_SCALE}.0 * {_EMB_SCALE}.0)"
    )
    return m.select(
        "dim",
        "n",
        F.expr(f"cast(s as double) / ({_EMB_SCALE}.0 * n)").alias("mean"),
        F.expr(var).alias("variance"),
        F.expr("cast(nz as double) / n").alias("zero_frac"),
        F.expr("(cast(n as double) * ss - cast(s as double) * s) = 0.0").alias(
            "dead_dim"
        ),
    )


# N251: the IVF recall-vs-nprobe operating curve as a DRIVER ROW —
# the r13 sf0.1 sweep showed the single-point overlap gates are
# SF-bound (8 frozen seed cells under-provision a growing corpus);
# this report pins the WHOLE curve per corpus, oracle-replayed per
# probe depth, so the serving-knob evidence travels with the data
# instead of living only in a pytest and two docstrings. r14: depths
# are EIGHTHS of the derived cell count (the served geometry), so the
# curve sweeps the same relative operating points at every SF; the
# emitted nprobe column is the resolved absolute depth.
_IVF_CURVE_NUMS = (1, 2, 4, 6, 8)


def _ivf_nprobe_val_sql(num: int) -> str:
    """Scalar subquery: the resolved absolute nprobe for eighth-
    numerator ``num`` — the same derivation as _ivf_geom_sql."""
    ncells = f"greatest({_IVF_MIN_CELLS}, cast(floor(sqrt(count(*))) as bigint))"
    return (
        f"select greatest({_IVF_MIN_NPROBE},"
        f" cast(floor({ncells} * {num} / 8.0) as bigint))"
        f" from embeddings"
    )


def _ivf_curve_oracle() -> str:
    from parquet_processor_spark.registry import _ORACLES

    arms = []
    for p in _IVF_CURVE_NUMS:
        arms.append(
            f"select cast({p} as int) as probe_num,"
            f" cast(({_ivf_nprobe_val_sql(p)}) as bigint) as nprobe,"
            f" cast((select count(*) from ({_ORACLES['sim_topk']})) as bigint)"
            f" as n_brute,"
            f" cast(count(*) as bigint) as n_overlap"
            f" from ({_ORACLES['sim_topk']}) b"
            f" join ({_ivf_nprobe_oracle_sql(p)}) a on a.vec_id = b.vec_id"
        )
    return "\nunion all\n".join(arms)


@query(
    "report_ivf_recall_curve",
    oracle=_ivf_curve_oracle(),
    tags=("vector", "ivf", "report", "evidence"),
)
def report_ivf_recall_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force top-10 overlap of the IVF ANN at probe depths
    num/8 of the derived cell count for num in {nums}: one row per
    depth with the resolved absolute nprobe, exact counts both
    engines. num=4 is the served operating point
    (sim_topk_ivf_nprobe); num=8 probes every cell and must recover
    the brute-force list exactly.

    100 TB shape: each arm is the sim_topk_ivf_nprobe plan (broadcast
    centroids + broadcast probe list — cost multiplier = probed
    fraction), and the overlap join is 10x10; the report is how a
    serving team picks nprobe for a recall target on THEIR corpus,
    and its monotone shape + full recovery at n_cells probes are
    pinned by tests/test_r13_invariants.py.
    """.format(nums=list(_IVF_CURVE_NUMS))
    # eager-by-design: the 10-row brute result is consumed by all
    # {len_arms} arms — without the cut each arm re-executes the
    # brute-force scan (r13 advice)
    brute = sim_topk(spark, sf).select("vec_id").localCheckpoint(eager=True)
    e = t(spark, sf, "embeddings")
    # r14 optimization (guide §2.4 — remove duplicated subtrees): the
    # arms differ ONLY in probe depth, so the corpus assignment, the
    # query's ranked centroid scores, and the per-depth nprobe values
    # are computed ONCE and every arm rides them. The previous shape
    # called _ivf_topk_nprobe per arm — 5 independent re-derivations of
    # centroids + assignment (measured 5.9 s vs 2.4 s at sf0.1). The
    # materialized frames are the index itself ((vec_id, cell) longs —
    # what a serving fleet keeps at rest) and two control tables.
    from pyspark.sql import Window

    nagg = (
        e.agg(
            F.greatest(
                F.lit(_IVF_MIN_CELLS).cast("long"),
                F.floor(F.sqrt(F.count(F.lit(1)))).cast("long"),
            ).alias("n_cells")
        ).localCheckpoint(eager=True)  # eager-by-design: 1 geometry row, read by every arm
    )

    def _nprobe_of(num: int) -> DataFrame:
        return nagg.select(
            F.greatest(
                F.lit(_IVF_MIN_NPROBE).cast("long"),
                F.floor(F.col("n_cells") * num / 8.0).cast("long"),
            ).alias("nprobe")
        )

    cent = _ivf_centroids(e, nagg)
    assign = (
        assign_cells(e, cent)
        .select("vec_id", "cell")
        .localCheckpoint(eager=True)  # eager-by-design: 5 arms read it
    )
    cell_cos = cosine(F.col("embedding"), F.col("c_emb"))
    w = Window.orderBy(F.desc("s"), F.asc("q_cell"))
    scored = (
        e.where(F.col("vec_id") == 0)
        .crossJoin(F.broadcast(cent))
        .select(F.col("cid").alias("q_cell"), cell_cos.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .select("q_cell", "rn")
        .localCheckpoint(eager=True)  # eager-by-design: n_cells control rows
    )
    q_emb = (
        e.where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("q_emb"))
        .limit(1)
        .localCheckpoint(eager=True)  # eager-by-design: 1 control row
    )
    cos = cosine(F.col("embedding"), F.col("q_emb"))
    out = None
    for p in _IVF_CURVE_NUMS:
        probe = (
            scored.crossJoin(F.broadcast(_nprobe_of(p)))
            .where(F.col("rn") <= F.col("nprobe"))
            .select("q_cell")
        )
        got = (
            assign.where(F.col("vec_id") != 0)
            .join(F.broadcast(probe), F.col("cell") == F.col("q_cell"))
            .join(e.select("vec_id", "embedding"), "vec_id")
            .crossJoin(F.broadcast(q_emb))
            .select("vec_id", cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
            .limit(10)
            .select(F.col("vec_id").alias("a_id"))
        )
        arm = (
            brute.join(got, F.col("vec_id") == F.col("a_id"), "left")
            .agg(
                F.lit(p).cast("int").alias("probe_num"),
                F.count(F.lit(1)).cast("long").alias("n_brute"),
                F.coalesce(F.sum(F.when(F.col("a_id").isNotNull(), 1)), F.lit(0))
                .cast("long")
                .alias("n_overlap"),
            )
            .crossJoin(F.broadcast(_nprobe_of(p)))
            .select("probe_num", "nprobe", "n_brute", "n_overlap")
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# N255: the serving DECISION the curve exists for — the smallest probe
# depth whose measured recall clears the target, as an oracle row. A
# serving team runs the curve per corpus and then picks a knob; this
# pins the pick itself (and whether the standing _IVF_SERVE_NUM
# satisfies the target on THIS corpus) so a re-shaped corpus flips the
# driver row, not a dashboard nobody reads.
_IVF_TARGET_RECALL_10 = 7  # >= 7 of the brute top-10


@query(
    "report_ivf_operating_point",
    oracle=f"""
    with curve as ({{curve}}),
    pick as (
      select min(probe_num) as probe_num from curve
      where n_overlap >= least({_IVF_TARGET_RECALL_10}, n_brute)
    )
    select cast({_IVF_TARGET_RECALL_10} as int) as target_overlap,
           cast(pick.probe_num as int) as probe_num,
           cast(c.nprobe as bigint) as nprobe,
           c.n_brute, c.n_overlap,
           pick.probe_num <= {_IVF_SERVE_NUM} as served_depth_ok
    from pick join curve c on c.probe_num = pick.probe_num
    """.format(curve=_ivf_curve_oracle()),
    tags=("vector", "ivf", "report", "evidence"),
)
def report_ivf_operating_point(spark: SparkSession, sf: str) -> DataFrame:
    """The operating-point pick off report_ivf_recall_curve: the
    smallest probe depth (eighths numerator) whose measured brute-
    force overlap reaches min({target}, n_brute) — the min() keeps an
    under-10-result corpus from making the target unreachable — plus
    whether the standing served depth (num={served}) satisfies the
    target on this corpus. Monotone curve => the pick is the exact
    knee, and full probe always qualifies, so the pick exists for any
    non-empty corpus.

    100 TB shape: the curve's arms (each cost ∝ its probed fraction)
    dominate; the pick is a 5-row aggregate. Run after re-index or
    drift: served_depth_ok flipping false IS the re-tune alarm.
    """.format(target=_IVF_TARGET_RECALL_10, served=_IVF_SERVE_NUM)
    curve = report_ivf_recall_curve(spark, sf).localCheckpoint(
        eager=True
    )  # eager-by-design: 5-row curve read by pick + join
    pick = curve.where(
        F.col("n_overlap")
        >= F.least(F.lit(_IVF_TARGET_RECALL_10), F.col("n_brute"))
    ).agg(F.min("probe_num").alias("pn"))
    return (
        curve.join(F.broadcast(pick), F.col("probe_num") == F.col("pn"))
        .select(
            F.lit(_IVF_TARGET_RECALL_10).cast("int").alias("target_overlap"),
            F.col("probe_num").cast("int").alias("probe_num"),
            F.col("nprobe").cast("long").alias("nprobe"),
            "n_brute",
            "n_overlap",
            (F.col("probe_num") <= F.lit(_IVF_SERVE_NUM)).alias("served_depth_ok"),
        )
    )
