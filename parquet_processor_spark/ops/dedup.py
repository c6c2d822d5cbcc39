"""Deduplication family (SURVEY.md §2.13 N1/N2).

Exact, n-gram-Jaccard, MinHash+LSH, and SimHash dedup over the
``documents`` table. Strategy per variant:

- exact (N1): groupBy(content-hash) — one shuffle on a 128-bit key, the
  canonical 100 TB dedup pass.
- n-gram Jaccard: shingle → explode → shingle-equi-join → pair-level
  Jaccard. The shingle join IS the blocking step: only docs sharing at
  least one shingle ever meet, so there is no cross join anywhere.
- MinHash+LSH: k md5-minhashes → b bands → band-signature groupBy →
  candidate pairs only within a bucket. Built entirely from built-in
  higher-order functions (transform/aggregate) — no Python in the path.
- SimHash: 64-bit signature via per-token hash bit-voting, then
  bucketing on 16-bit chunks (Hamming-ball blocking).

All variants are pure DataFrame ops; at 1000 executors each stage is an
ordinary shuffle keyed by hash/shingle/band — no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_processor_spark.io import materializing_count
from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t


# N1: exact dedup — hash-groupBy, keep lowest doc_id as canonical.
@query(
    "dedup_exact",
    oracle="""
    select md5(text) as fp, min(doc_id) as keep_id, count(*) as n_copies
    from documents
    group by md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "documents")
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(words_col: str = "words", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string> (JVM-side only).

    Takes a pre-split ``array<string>`` COLUMN, not the raw text:
    higher-order functions are interpreted, so any expression inside the
    lambda is re-evaluated per element — a ``split(text)`` placed here
    would run once per shingle position (O(words²) per document).
    Binding the split to a column in a prior projection makes the lambda
    read an attribute instead. (CollapseProject keeps the boundary:
    ``words`` is referenced twice below and split isn't cheap.)
    """
    words = F.col(words_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def split_words(spark: SparkSession, sf: str) -> DataFrame:
    """documents → (doc_id, words), repartitioned before the heavy
    shingle/hash stages (the small test file reads as one partition; at
    100 TB the operator must not depend on incoming file layout)."""
    return (
        t(spark, sf, "documents")
        .select("doc_id", F.split("text", r"\s+").alias("words"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


# Hot-shingle document-frequency cap: a shingle shared by d documents
# contributes d*(d-1)/2 rows to the shingle self-join, so ONE
# stop-phrase trigram in millions of docs turns a linear blocking join
# quadratic. Dropping shingles with df > cap before the join bounds
# every block at cap²/2 pairs — the standard guard for Jaccard
# blocking (hot shingles carry no discriminative signal anyway; a
# trigram in >1000 docs identifies boilerplate, not duplication).
# At the test SFs max df is 25, so the cap provably changes nothing
# locally — it exists for the 100× corpus.
_SHINGLE_DF_CAP = 1000


def shingle_pair_counts(sh: DataFrame, cap: int = _SHINGLE_DF_CAP) -> DataFrame:
    """(doc_a, doc_b, n_common, n_sh_a, n_sh_b) with doc_a < doc_b
    from exploded (doc_id, n_sh, shingle) rows — the blocking step of
    the Jaccard/containment family as ONE group-by-shingle block
    expansion, with each doc's total shingle count carried alongside
    its id so score denominators need NO per-doc size join afterward.

    Why not a shingle self-join: the join form reads and re-explodes
    the shingle source once per join side AND shuffles both sides on
    the shingle key (round-4 shape: 3 source passes + 3 exchanges once
    the df-cap statistic joined in). Grouping instead collects each
    shingle's posting list in one map-side-combined pass (shuffle
    carries the 8-byte hashed shingle + (doc_id, n_sh) structs),
    applies the hot-shingle document-frequency cap as a plain
    ``size(docs) <= cap`` filter on the grouped row — no anti join, no
    second statistic pass — and expands each block's C(df,2) pairs as
    two CHAINED generators (posexplode for the left element, an
    array-slice explode for the right): pairs stream out of
    GenerateExec row by row, instead of one interpreted
    nested-transform building the full d²/2 struct array in memory
    before a single explode (a cap-sized hot block would materialize
    ~500k structs in one row under that shape). A shingle shared by d
    docs still costs d*(d-1)/2 pair rows (that IS the operator's
    output lower bound); the cap bounds any single block at cap²/2,
    and AQE splits skewed pair partitions downstream. Carrying n_sh
    (8 bytes) per posting entry also removes the two doc-keyed size
    joins the callers used to run — at corpus scale those were
    full shuffle joins of the pair stream against a per-doc table.
    """
    blocks = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n_sh"))).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= cap))
    )
    left = blocks.select("docs", F.posexplode("docs").alias("i", "a"))
    pairs = left.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("a.n_sh").alias("n_sh_a"),
        # 1-based slice starting one past position i (0-based): every
        # later posting-list entry pairs with entry i exactly once.
        # explode_outer: plain explode would infer size(slice)>0 and
        # evaluate the slice twice per position (guard + generator);
        # the last position's empty slice becomes one null row,
        # dropped by the guard above the Generate.
        F.explode_outer(F.slice("docs", F.col("i") + 2, F.size("docs"))).alias("b"),
    ).where(F.col("b").isNotNull())
    return (
        pairs.groupBy(
            "doc_a",
            "n_sh_a",
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.n_sh").alias("n_sh_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select("doc_a", "doc_b", "n_common", "n_sh_a", "n_sh_b")
    )


def _explode_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, n_sh, shingle) from (doc_id, shingles) — explode_outer,
    NOT explode: plain explode lets InferFiltersFromGenerate add a
    ``size(array) > 0`` guard that predicate pushdown then inlines
    BELOW the shingle projection, re-running the whole
    split→transform→hash expression per input row as a filter
    (measured 4-6× on this stage). word_shingles arrays are never
    empty by construction (``greatest(size-2, 1)``), so outer explode
    is equivalent; the null guard sits ABOVE the Generate (it
    references the generated column, so it cannot be pushed down) and
    only fires for null text.
    """
    return d.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode_outer("shingles").alias("shingle"),
    ).where(F.col("shingle").isNotNull())


def drop_hot_shingles(sh: DataFrame, cap: int = _SHINGLE_DF_CAP) -> DataFrame:
    """Filter exploded (doc_id, shingle) rows to shingles appearing in
    at most ``cap`` documents.

    The df statistic is one map-side-combined aggregate (the shuffle
    carries distinct shingles per task, not occurrences); the hot list
    it yields is tiny by construction (≤ total_occurrences/cap rows,
    in practice a handful of stop-phrases) so the exclusion is a
    broadcast anti join — the exploded rows themselves never shuffle
    for the cap."""
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > cap)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


# N2a: n-gram Jaccard near-dup — shingle join as the blocking step.
@query(
    "dedup_ngram_jaccard",
    oracle=rf"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    hot as (select shingle from sh group by shingle having count(*) > {_SHINGLE_DF_CAP}),
    shc as (select s.* from sh s anti join hot h on s.shingle = h.shingle),
    sizes as (select doc_id, count(*) as n_sh from sh group by doc_id),
    pairs as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_common
      from shc a join shc b on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by a.doc_id, b.doc_id
    )
    select p.doc_a, p.doc_b,
           cast(p.n_common as double)
                 / (sa.n_sh + sb.n_sh - p.n_common) as jaccard
    from pairs p
      join sizes sa on p.doc_a = sa.doc_id
      join sizes sb on p.doc_b = sb.doc_id
    where cast(p.n_common as double) / (sa.n_sh + sb.n_sh - p.n_common) >= 0.2
    """,
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    # Blocking runs on xxhash64(shingle) longs, not shingle strings:
    # the exploded shuffle carries 8-byte keys instead of ~20-byte text
    # (the oracle keeps string shingles — identical counts absent
    # 64-bit collisions, ~1e-8 expected even at sf0.1). The pair
    # source is the shingle_pair_counts block expansion: one source
    # pass, one shingle-keyed shuffle, df cap applied on the grouped
    # posting list. Per-doc sizes ride the posting lists, so the
    # Jaccard denominator needs no size join — the whole query is one
    # scan, two keyed exchanges, zero joins.
    d = split_words(spark, sf).select("doc_id", shingle_hashes().alias("shingles"))
    # Jaccard numerators count only df<=cap shingles (both engines);
    # denominators keep the full per-doc shingle count (size of the
    # pre-explode array), so the capped score is a conservative lower
    # bound of true Jaccard.
    pairs = shingle_pair_counts(_explode_shingles(d))
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")
    )
    return pairs.where(jac >= 0.2).select("doc_a", "doc_b", jac.alias("jaccard"))


# N2a': shingle containment — |A∩B| / min(|A|,|B|). Jaccard misses
# SUBSET duplication (a long doc quoting a short one whole scores low
# Jaccard because the union is large); containment is the standard
# complement for quote/inclusion detection. Same capped shingle join —
# only the denominator changes.
_CONTAINMENT_TAU = 0.6


@query(
    "dedup_containment",
    oracle=rf"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    hot as (select shingle from sh group by shingle having count(*) > {_SHINGLE_DF_CAP}),
    shc as (select s.* from sh s anti join hot h on s.shingle = h.shingle),
    sizes as (select doc_id, count(*) as n_sh from sh group by doc_id),
    pairs as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_common
      from shc a join shc b on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by a.doc_id, b.doc_id
    )
    select p.doc_a, p.doc_b,
           cast(p.n_common as double) / least(sa.n_sh, sb.n_sh) as containment
    from pairs p
      join sizes sa on p.doc_a = sa.doc_id
      join sizes sb on p.doc_b = sb.doc_id
    where cast(p.n_common as double) / least(sa.n_sh, sb.n_sh) >= {_CONTAINMENT_TAU}
    """,
    tags=("dedup",),
)
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment near-dup pairs: |shared shingles| / min(|A|, |B|)
    >= tau — catches a short doc embedded whole in a long one, which
    Jaccard's union denominator dilutes below any usable threshold.
    Identical plan shape (and hot-shingle df cap) as
    :func:`dedup_ngram_jaccard`; one extra ``least``."""
    d = split_words(spark, sf).select("doc_id", shingle_hashes().alias("shingles"))
    pairs = shingle_pair_counts(_explode_shingles(d))
    cont = F.col("n_common").cast("double") / F.least(F.col("n_sh_a"), F.col("n_sh_b"))
    return pairs.where(cont >= _CONTAINMENT_TAU).select(
        "doc_a", "doc_b", cont.alias("containment")
    )


# N2b: MinHash + LSH banding, b=6 bands × r=2 rows over k=12
# minhashes. Candidate pairs = docs sharing any band signature. The
# whole construction is CROSS-ENGINE (hash-checked oracles for
# dedup_near, dedup_connected_lsh, dedup_incremental_minhash):
# - base hash: md5-60bit of the shingle string (the engine's shared
#   hash primitive — `conv(substr(md5(x),1,15),16,10)` in Spark,
#   `('0x'||substr(md5(x),1,15))::bigint` in DuckDB), computed ONCE
#   per shingle;
# - the k permutations are Carter–Wegman universal hashes
#   pi_j(h) = (a_j * (h mod P) + b_j) mod P with P = 2^31 - 1
#   (Mersenne) and md5-derived literal coefficients: every
#   intermediate stays below 2^62, so the arithmetic is EXACT 64-bit
#   integer math both engines replay verbatim — and cheaper than a
#   per-seed re-hash (the datasketch construction);
# - band signatures are md5-60bit over "band:slice" strings, so the
#   posting keys shuffle as 8-byte longs.
# The earlier xxhash64 construction was rows-only forever (DuckDB
# cannot replay xxhash64); this one costs one md5 per shingle (the
# expensive pass is unchanged in shape) + k integer FMAs per shingle
# and buys driver-checkable end-to-end hashes for the whole family.
_K = 12
_BANDS = 6
_ROWS = 2
_MH_P = (1 << 31) - 1  # Mersenne modulus: a*(h%P)+b < 2^62, exact in a long
# Posting-list cap for the banded-minhash family — the
# _SHINGLE_DF_CAP / _EMB_BUCKET_CAP discipline: a band signature
# shared by d docs yields d*(d-1)/2 candidate pairs, so a degenerate
# signature (empty docs, boilerplate) must not go quadratic. At test
# SFs the largest band bucket holds 11 docs (sf0.1) — the cap exists for the
# 100x corpus and is mirrored in every oracle.
_MH_BUCKET_CAP = 1000


def _mh_perm_consts(k: int = _K) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the k universal-hash
    permutations, a in [1, P-1], b in [0, P-1] — md5-derived literals
    both engines embed verbatim (the _plane_coeffs recipe)."""
    import hashlib

    out = []
    for j in range(k):
        a = int(hashlib.md5(f"mhperm_a{j}".encode()).hexdigest()[:8], 16) % (_MH_P - 1) + 1
        b = int(hashlib.md5(f"mhperm_b{j}".encode()).hexdigest()[:8], 16) % _MH_P
        out.append((a, b))
    return out


def md5_long(col: F.Column) -> F.Column:
    """md5-60bit long of a string column — the engine's shared
    cross-engine hash primitive (ops/sampling.py spelling)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_hashes(words_col: str = "words", n: int = 3) -> F.Column:
    """Distinct word-n-gram shingles hashed straight to longs (the
    shingle string never materializes as a column — each is built,
    hashed, and dropped inside one pass over the words array)."""
    words = F.col(words_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, n))),
        )
    )


def shingle_hashes_md5(words_col: str = "words", n: int = 3) -> F.Column:
    """Distinct word-n-gram shingles hashed to md5-60bit longs — the
    cross-engine base hash the minhash signature permutes (the
    xxhash64 :func:`shingle_hashes` stays for consumers whose hash is
    engine-internal: jaccard/containment block keys, simhash bits)."""
    words = F.col(words_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: md5_long(F.concat_ws(" ", F.slice(words, i, n))),
        )
    )


def minhash_signature(hashes_col: F.Column, k: int = _K) -> F.Column:
    """array<long> of k minhashes over md5-60bit shingle hashes via
    universal-hash permutations (a_j*(h mod P)+b_j) mod P — exact
    64-bit integer arithmetic DuckDB replays verbatim, and cheaper
    than a per-seed re-hash (the one expensive string-hash pass
    happened in :func:`shingle_hashes_md5`)."""
    def perm(a: int, b: int):
        # closure factory, NOT default-arg lambda: pyspark reads the
        # lambda's arity to pick the HOF variant, so extra defaulted
        # params would make it bind the 3-arg (value, index) form
        return lambda h: (F.lit(a) * (h % _MH_P) + F.lit(b)) % _MH_P

    return F.array(
        *[F.array_min(F.transform(hashes_col, perm(a, b))) for a, b in _mh_perm_consts(k)]
    )


# Session-scoped signature memo: a fresh .cache() per call would
# register a NEW cache entry every time the query re-runs (bench
# passes, recall gates, repeated driver checks), re-materializing the
# expensive signature stage each time AND accumulating dead cached
# partitions in the shared local-mode heap (the SCALE.md operational
# note — measured as the dedup tail's 1.5-2x session drift). Keyed by
# (applicationId, context startTime, sf_dir) — stable identifiers
# that, unlike id(sparkContext), cannot be recycled by the allocator
# after a stopped context is GC'd. Entries are validated on every hit
# (context alive, plan still registered in the cache manager) so a
# spark.catalog.clearCache() or a restarted session rebuilds rather
# than serving a stale/dead DataFrame. Testdata dirs are immutable.
_SIG_MEMO: dict = {}


def _minhash_sig_cached(spark: SparkSession, sf: str) -> DataFrame:
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, sf)
    sig = _SIG_MEMO.get(key)
    if sig is not None:
        try:
            valid = (not sc._jsc.sc().isStopped()) and sig.is_cached
        except Exception:  # noqa: BLE001 — any py4j breakage means "rebuild"
            valid = False
        if not valid:
            _SIG_MEMO.pop(key, None)
            sig = None
    if sig is None:
        # prune entries bound to other (dead) contexts so the memo
        # stays one-entry-per-(live session, sf)
        for k in [k for k in _SIG_MEMO if k[:2] != key[:2]]:
            _SIG_MEMO.pop(k, None)
        # The BUILD runs at defaultParallelism (split_words repartition:
        # the shingle+md5 pass is CPU-bound and must not inherit a
        # single-file layout), but the CACHE is compacted to a
        # row-count-proportional partition count (~64k sig rows ≈ 8 MB
        # per partition, unclamped above so a 100 TB corpus still gets
        # hundreds of thousands of cache partitions). Inheriting the
        # build's fixed fan-out instead meant every downstream query —
        # dedup_near, the LSH closure, the incremental probe, the
        # recall gates, every bench pass — launched defaultParallelism
        # scan tasks over kilobyte partitions: pure scheduler overhead
        # that at sf0.1 dominated the whole hot path (the r9 verdict's
        # one >2x-baseline query). count() on parquet is a metadata
        # read, so sizing costs no data pass.
        n_docs = t(spark, sf, "documents").count()  # eager-by-design: cache-partition sizing
        target = max(1, -(-n_docs // 64_000))
        # ONE md5 pass for the whole text-dedup family (r10 verdict
        # task: simhash parsed halves of the same digest minhash
        # truncated, in a second full pass). Each distinct shingle's
        # hex digest is computed once; the 60-bit minhash base and the
        # two 32-bit simhash halves all parse from it, and one
        # map-side-combined aggregate builds the k minhash minima AND
        # the 64 simhash bit votes together. The cache stays O(docs):
        # (doc_id, sig array, simhash long) — the exploded shingle
        # rows are never cached.
        words = F.col("words")
        shingles = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
            )
        )
        tok = (
            split_words(spark, sf)
            # null-proof words so every doc keeps its one ""-shingle row
            # (concat_ws over a null slice was already "" in the
            # array-based build; membership must not change)
            .select("doc_id", F.coalesce(words, F.array(F.lit(""))).alias("words"))
            .select("doc_id", F.explode_outer(shingles).alias("s"))
            .select("doc_id", F.md5("s").alias("m"))
            .select(
                "doc_id",
                F.conv(F.substring("m", 1, 15), 16, 10).cast("long").alias("h"),
                F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("h1"),
                F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("h2"),
            )
        )
        aggs = [
            F.min((F.lit(a) * (F.col("h") % _MH_P) + F.lit(b)) % _MH_P).alias(f"_s{j}")
            for j, (a, b) in enumerate(_mh_perm_consts())
        ]
        aggs += [
            F.sum(
                F.when(
                    F.shiftright(F.col("h1" if i < 32 else "h2"), i % 32)
                    .bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(64)
        ]
        votes = tok.groupBy("doc_id").agg(*aggs)
        simhash = F.lit(0).cast("long")
        for i in range(64):
            bit = F.when(F.col(f"_b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            simhash = simhash.bitwiseOR(F.shiftleft(bit, i))
        sig = (
            votes.select(
                "doc_id",
                F.array(*[F.col(f"_s{j}") for j in range(_K)]).alias("sig"),
                simhash.alias("simhash"),
            )
            .repartition(target, "doc_id")
            .cache()
        )
        sig.count()  # eager-by-design: materialize the reused-signature cache
        _SIG_MEMO[key] = sig
    return sig


def _band_rows(sig_df: DataFrame) -> DataFrame:
    """(…passthrough cols…, band, band_sig) from a frame holding a
    ``sig`` array<long> column: one generator per input row emits the
    b band rows, each keyed by the md5-60bit hash of the
    "band:slice" string — cross-engine (the oracle spells
    ``concat(band, ':', s_i, ':', s_j)``) while still shuffling
    8-byte keys. explode_outer for the same reason as
    :func:`_explode_shingles` — the band array has fixed length b,
    never empty, and plain explode would infer a size guard that
    re-evaluates the transform."""
    cols = sig_df.columns
    return sig_df.select(
        *cols,
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BANDS - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    md5_long(
                        F.concat_ws(
                            ":",
                            bi.cast("string"),
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("sig"), bi * _ROWS + 1, _ROWS),
                                    lambda x: x.cast("string"),
                                ),
                                ":",
                            ),
                        )
                    ).alias("band_sig"),
                ),
            )
        ).alias("bs"),
    ).select(*cols, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def _capped_band_blocks(bands: DataFrame, cap: int = _MH_BUCKET_CAP) -> DataFrame:
    """Sorted (band, band_sig, docs) posting lists with hot buckets
    (> cap docs) dropped BEFORE collection — a window ``count``
    over the band key followed by the cap filter, the oracle's
    ``qualify count(*) over (partition by band_sig) <= cap`` replayed
    verbatim. One exchange total: the window hash-partitions on
    (band, band_sig) and the collect_list aggregate reuses that
    partitioning (HashAggregate with no second Exchange — pinned in
    test_plan_quality). The earlier count-preagg + broadcast-anti-join
    shape paid two exchanges plus a broadcast for the same row set
    (r9 verdict: dedup_near the only >2x-baseline query). Scale note:
    a degenerate hot bucket is buffered ONCE by WindowExec
    (spill-backed UnsafeExternalSorter, O(bucket) disk, no OOM) and
    then filtered — it still never reaches collect_list, so no
    unbounded array materializes."""
    w = Window.partitionBy("band", "band_sig")
    return (
        bands.withColumn("df", F.count(F.lit(1)).over(w))
        .where(F.col("df") <= cap)
        .groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("docs"))
        .where(F.size("docs") >= 2)
    )


def _mh_sig_sql() -> str:
    """DuckDB CTE chain sh → hashed → sigs(doc_id, s0..s{k-1}): the
    exact minhash-signature twin (same shingles, same md5-60bit base
    hash, same universal-hash literals)."""
    mins = ",\n             ".join(
        f"min(({a} * (h % {_MH_P}) + {b}) % {_MH_P}) as s{j}"
        for j, (a, b) in enumerate(_mh_perm_consts())
    )
    return rf"""
    sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    hashed as (
      select doc_id, ('0x' || substr(md5(shingle), 1, 15))::bigint as h from sh
    ),
    sigs as (
      select doc_id,
             {mins}
      from hashed group by doc_id
    )"""


def _mh_bands_sql() -> str:
    """bands CTE: one (doc_id, band_sig) row per band, band_sig =
    md5-60bit of the same "band:slice" string Spark's _band_rows
    hashes (band index baked in, so cross-band keys never join)."""
    entries = ", ".join(
        "('0x' || substr(md5(concat("
        + f"{b}, "
        + ", ".join(f"':', s{b * _ROWS + r}" for r in range(_ROWS))
        + ")), 1, 15))::bigint"
        for b in range(_BANDS)
    )
    return f"""
    bands as (
      select doc_id, unnest([{entries}]) as band_sig from sigs
    )"""


def _mh_post_sql() -> str:
    """post CTE: the df-capped posting relation over the whole corpus
    (the _capped_band_blocks twin)."""
    return f"""
    post as (
      select doc_id, band_sig from bands
      qualify count(*) over (partition by band_sig) <= {_MH_BUCKET_CAP}
    )"""


def _mh_est_sql(sa: str, sb: str) -> str:
    """Signature-agreement estimate between two sigs CTE aliases —
    one exact int sum, one IEEE division (bitwise cross-engine)."""
    matches = " + ".join(
        f"(case when {sa}.s{j} = {sb}.s{j} then 1 else 0 end)" for j in range(_K)
    )
    return f"cast({matches} as double) / {float(_K)}"


def _dedup_near_oracle() -> str:
    return f"""
    with {_mh_sig_sql()},
    {_mh_bands_sql()},
    {_mh_post_sql()},
    cand as (
      select distinct a.doc_id as doc_a, b.doc_id as doc_b
      from post a join post b using (band_sig)
      where a.doc_id < b.doc_id
    )
    select c.doc_a, c.doc_b, {_mh_est_sql('sa', 'sb')} as est_jaccard
    from cand c
    join sigs sa on sa.doc_id = c.doc_a
    join sigs sb on sb.doc_id = c.doc_b
    """


@query("dedup_near", oracle=_dedup_near_oracle(), tags=("dedup", "lsh"))
def dedup_near(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH candidate pairs with verified Jaccard-over-signature.

    HASH-CHECKED end to end: the md5-60bit base hash, the
    universal-hash permutations (literal coefficients), the banded
    posting keys, the hot-bucket cap, and the one-division agreement
    estimate are all replayed verbatim by the DuckDB oracle (the
    pytest suite additionally verifies candidacy against brute-force
    Jaccard).
    """
    # Stage 1 (expensive, once): split words, build+hash shingles.
    # Stage 2 (cheap, k passes over longs): the minhash signature.
    # The signature is carried through the band posting lists (k=12
    # longs per entry), so candidate pairs come out of a bucket
    # expansion already holding both signatures — no band-key
    # self-join (which evaluated the signature subtree once per
    # side), no signature re-join by id. The sig table itself is
    # still cached+materialized: consumers (the recall gates join
    # this query against its exact twin) re-evaluate the plan from
    # several subtrees, and the cache pins the one expensive stage.
    sig = _minhash_sig_cached(spark, sf)
    bands = _band_rows(sig)
    blocks = _capped_band_blocks(bands)
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(_K))
    # est is computed BEFORE the pair dedup: a pair colliding in two
    # bands yields identical est rows, so dropDuplicates over
    # (doc_a, doc_b, est) is the same pair set — and the dedup shuffle
    # carries 24-byte rows instead of two k-long signatures each.
    # No round(): est is one IEEE division of exact ints, identical in
    # both engines; rounding implementations are NOT (numeric.py).
    return (
        blocks.select("docs", F.posexplode("docs").alias("i", "a"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.sig").alias("sig_a"),
            F.explode_outer(F.slice("docs", F.col("i") + 2, F.size("docs"))).alias("b"),
        )
        .where(F.col("b").isNotNull())
        .select("doc_a", "sig_a", F.col("b.doc_id").alias("doc_b"), F.col("b.sig").alias("sig_b"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


# N2d: embedding-cosine near-dup — semantic dedup over the embeddings
# table. Blocking first (label block = IVF-cell analog, SQL-exact;
# the LSH variant below is the hash-blocked scale path), cosine >= tau
# within the block, then survivor selection: a vector is a duplicate
# iff some SMALLER-id vector in its block is within the cosine ball,
# and dup_of is the smallest such id. That min-id rule is what makes
# the operator a dedup (keep one representative) rather than a pair
# finder, while staying one keyed shuffle past the pair join — no
# iterative connected components on the hot path.
_EMB_TAU = 0.18


@query(
    "dedup_embedding",
    oracle=f"""
    with pairs as (
      select a.vec_id as keep_cand, b.vec_id as dup
      from embeddings a join embeddings b
        on a.label = b.label and a.vec_id < b.vec_id
      where {{cos}} >= {_EMB_TAU}
    )
    select e.vec_id,
           min(p.keep_cand) as dup_of,
           (min(p.keep_cand) is not null) as is_dup
    from embeddings e left join pairs p on e.vec_id = p.dup
    group by e.vec_id
    """.format(
        cos=(
            "list_reduce(list_prepend(cast(0 as double), "
            "[cast(a.embedding[i] as double) * cast(b.embedding[i] as double) "
            "for i in generate_series(1, len(a.embedding))]), (acc, v) -> acc + v)"
            " / (sqrt(list_reduce(list_prepend(cast(0 as double), "
            "[cast(x as double) * cast(x as double) for x in a.embedding]), (acc, v) -> acc + v))"
            " * sqrt(list_reduce(list_prepend(cast(0 as double), "
            "[cast(x as double) * cast(x as double) for x in b.embedding]), (acc, v) -> acc + v)))"
        )
    ),
    tags=("dedup", "vector"),
)
def dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_processor_spark.ops.vector import norm, pair_cos_arrow

    e = t(spark, sf, "embeddings")
    # Per-vector norms computed on each join SIDE (once per vector),
    # not per pair — dot/(na*nb) is cosine()'s exact expression tree,
    # so the oracle (which spells all three folds per pair) still
    # hash-matches while the block join evaluates one fold per pair.
    # r14: the per-pair dot fold runs in the Arrow kernel (guide §4.2;
    # bit-exact by the pair_cos_arrow contract).
    sided = e.select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm"))
    a = sided.alias("a")
    b = sided.alias("b")
    cos = pair_cos_arrow()(
        F.col("a.embedding"), F.col("b.embedding"), F.col("a.nrm"), F.col("b.nrm")
    )
    pairs = (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .where(cos >= _EMB_TAU)
        .select(F.col("a.vec_id").alias("keep_cand"), F.col("b.vec_id").alias("dup"))
    )
    return (
        e.select("vec_id")
        .join(pairs, F.col("vec_id") == F.col("dup"), "left")
        .groupBy("vec_id")
        .agg(F.min("keep_cand").alias("dup_of"))
        .withColumn("is_dup", F.col("dup_of").isNotNull())
    )


def _emb_lsh_oracle() -> str:
    """DuckDB twin of the banded-hyperplane candidacy + survivor rule:
    the band keys are literal-coefficient sign arithmetic
    (vector._band_key_sql — the same literals the Arrow kernel uses)
    and the hot-bucket cap is the mirrored qualify-count filter, so
    the whole pipeline is hash-checkable."""
    from parquet_processor_spark.ops.vector import _cos_sql, _keyed_post_sql

    return f"""
    with {_keyed_post_sql(8)},
    cand as (
      select distinct k1.vec_id as keep_cand, k2.vec_id as dup
      from post k1 join post k2 using (band_key)
      where k1.vec_id < k2.vec_id
    ),
    pairs as (
      select c.keep_cand, c.dup
      from cand c
      join embeddings a on a.vec_id = c.keep_cand
      join embeddings b on b.vec_id = c.dup
      where {_cos_sql('a', 'b')} >= {_EMB_TAU}
    )
    select e.vec_id, min(p.keep_cand) as dup_of,
           (min(p.keep_cand) is not null) as is_dup
    from embeddings e left join pairs p on p.dup = e.vec_id
    group by e.vec_id
    """


@query("dedup_embedding_lsh", oracle=_emb_lsh_oracle(), tags=("dedup", "vector", "lsh"))
def dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup with random-hyperplane LSH blocking — the
    100 TB path. HASH-CHECKED: the hyperplane coefficients are
    engine-neutral literals, so the DuckDB oracle replays the exact
    banding, candidacy, cosine, and survivor rule (pytest additionally
    measures recall vs the label-blocked exact variant).

    Same survivor rule as :func:`dedup_embedding`, but candidate pairs
    form inside BANDED sign-sketch buckets instead of label blocks
    (L bands x r hyperplanes, Indyk-Motwani banding — same scheme as
    the MinHash ``dedup_near``): a pair is a candidate if all r signs
    of any one band agree, so recall is 1-(1-p^r)^L instead of the
    p^h collapse of a single h-bit sketch. The band-key equi-join
    bounds cost at Σ bucket² per band regardless of label
    distribution; pair-level dropDuplicates collapses multi-band hits
    BEFORE the cosine is evaluated. The sketch is deterministic
    (hash-derived hyperplanes, no RNG state to ship).

    100 TB shape: the candidate self-join shuffles only the narrow
    (vec_id, band_key) projection — 16 bytes/row x L, not L copies of
    the embedding; hot buckets past vector._EMB_BUCKET_CAP are dropped
    BEFORE any posting list is collected (capped_band_postings — on a
    correlated corpus one bucket can hold a large corpus fraction,
    which would OOM the collecting task and go quadratic downstream);
    the embeddings are joined back by id only for the deduplicated
    candidate pairs, so the wide column crosses the wire once per
    surviving pair side instead of L times per row.
    """
    from parquet_processor_spark.ops.vector import bucket_pair_cos

    e = t(spark, sf, "embeddings")
    # r15 (guide §8 — move heavy bytes once): pairs are scored INSIDE
    # their LSH bucket (bucket_pair_cos — one band Arrow pass, hot
    # buckets capped before any payload groups), so the embedding
    # payload crosses once per posting instead of twice per candidate
    # pair, and the tau predicate prunes before the pair-dedup
    # exchange — only surviving near-dup pairs shuffle. Bit-exact with
    # the previous join-then-pair_cos_arrow shape (the bucket kernel's
    # pinned cumsum contract); the survivor rule below is unchanged.
    pairs = (
        bucket_pair_cos(e, 8)
        .where(F.col("cos_sim") >= _EMB_TAU)
        .select(F.col("a_id").alias("keep_cand"), F.col("b_id").alias("dup"))
        .dropDuplicates(["keep_cand", "dup"])
    )
    return (
        e.select("vec_id")
        .join(pairs, F.col("vec_id") == F.col("dup"), "left")
        .groupBy("vec_id")
        .agg(F.min("keep_cand").alias("dup_of"))
        .withColumn("is_dup", F.col("dup_of").isNotNull())
    )


# N2c: SimHash — 64-bit signature by bit-voting over token hashes.
_SIMHASH_BITS = 64


def _simhash_oracle() -> str:
    """The full simhash construction replayed in DuckDB: same
    shingles, 64 signature bits drawn as two 32-bit md5 halves, same
    +1/-1 votes with the >0 tie rule, two's-complement assembly (bit
    63 is the sign term — (1::bigint << 63) would overflow; adding
    the exact min-long constant when b63 wins is the same bit
    pattern Spark's shiftleft(1, 63) OR produces), and the same
    arithmetic-shift + mask chunk extraction (both engines shift
    arithmetically; the & 65535 mask makes the fill bits moot)."""
    sums = ",\n             ".join(
        f"sum(case when ({'h1' if i < 32 else 'h2'} >> {i % 32}) & 1 = 1 "
        f"then 1 else -1 end) as b{i}"
        for i in range(_SIMHASH_BITS)
    )
    assemble = "\n               + ".join(
        f"(case when b{i} > 0 then (1::bigint << {i}) else 0::bigint end)"
        for i in range(_SIMHASH_BITS - 1)
    )
    return rf"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    hx as (
      select doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::bigint as h1,
             ('0x' || substr(md5(shingle), 9, 8))::bigint as h2
      from sh
    ),
    votes as (
      select doc_id,
             {sums}
      from hx group by doc_id
    ),
    sigs as (
      select doc_id,
             (case when b63 > 0 then (-9223372036854775807 - 1) else 0 end)
               + {assemble}
             as simhash
      from votes
    )
    select doc_id, simhash, chunk,
           (simhash >> (chunk * 16)) & 65535 as chunk_val
    from sigs, (select unnest([0, 1, 2, 3]) as chunk)
    """


@query("dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash signatures + 16-bit-chunk LSH buckets — HASH-CHECKED
    end to end since r10: the 64 signature bits are two 32-bit md5
    halves per shingle (the shared md5 primitive, full hex parse both
    engines), so DuckDB replays the bit votes, the two's-complement
    assembly, and the chunk extraction verbatim. The earlier xxhash64
    bits were engine-internal (rows-only forever); md5-60bit alone
    was never enough — it left 4 of 64 bits constant — but the
    128-bit digest has 64 independent bits to spare. Quality evidence
    stays in the ``recall_dedup_simhash`` gate.

    Distributed bit-voting: explode features, one groupBy with 64
    partially-aggregated vote sums (map-side combine does the heavy
    lifting — the shuffle carries 64 ints per doc, not features).
    Fully JVM-side, no Python UDF.

    Features are the 3-gram SHINGLE strings (same feature space as
    the Jaccard family), not whole tokens: on a small shared
    vocabulary, token votes are near-tied on most bits, so
    random-pair Hamming collapses (measured median 14/64 — true
    pairs indistinguishable). Shingles are high-cardinality, giving
    proper simhash behavior: true near-dup pairs land at Hamming <=
    12, random pairs at median 32 (gated by
    ``recall_dedup_simhash``).
    """
    # The signature comes from the SHARED family cache
    # (_minhash_sig_cached): one md5 pass per session computes each
    # distinct shingle's digest and folds both 32-bit simhash halves
    # AND the 60-bit minhash base into one aggregate — this query and
    # the whole minhash family (dedup_near, the LSH closure, the
    # incremental probe) reuse the same O(docs) cached rows.
    sig = _minhash_sig_cached(spark, sf).select("doc_id", "simhash")
    # 4 × 16-bit chunks: near-dups (Hamming distance ≤ 3) share ≥1 chunk.
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(65535)).alias("chunk_val"),
            )
            for c in range(4)
        ]
    )
    return sig.select("doc_id", "simhash", F.explode(chunks).alias("ch")).select(
        "doc_id", "simhash", F.col("ch.chunk").alias("chunk"), F.col("ch.chunk_val").alias("chunk_val")
    )


# N2e: transitive-closure dedup — connected components over the
# near-dup pair graph. The pairwise operators above flag DIRECT
# duplicates; real corpus dedup needs the transitive clusters (A~B,
# B~C => {A,B,C} keep one), which is why production fuzzy-dedup
# pipelines end in a connected-components pass over the candidate
# pair graph.
_CC_MAX_ITERS = 50
# Rounds before the pointer-jump join joins in: quasi-clique dedup
# graphs converge inside these cheap propagation-only rounds; anything
# still unconverged is chain-shaped and needs the O(log d) jumps.
_CC_JUMP_AFTER = 3


def connected_components(nodes: DataFrame | None, edges: DataFrame) -> DataFrame:
    """Min-label propagation to a fixpoint: every node ends labeled
    with the smallest node id reachable from it.

    ``edges``: columns ``src``/``dst`` (any orientation — both
    directions are propagated). ``nodes``: one column ``node``, or
    None to derive the node set from the edges (isolated nodes then
    don't appear; callers assign them their own id with one left
    join — see :func:`dedup_connected`).

    Iterative DataFrame algorithm (the one family where a driver-side
    loop is the right Spark shape). Each round: (1) min-label
    propagation — labels join edges on src, min-aggregate per dst,
    merge with the previous labels (one keyed shuffle); (2) from round
    ``_CC_JUMP_AFTER`` on, POINTER JUMPING (path halving): label ←
    label(label), a self-join on the label table. Step 1 alone needs
    diameter rounds, so an adversarial long-chain pair graph (diameter
    1000 → 1000 rounds) would blow any iteration cap; the jump step
    halves every label chain per round, so the combination converges
    in O(log diameter) — the 50-round cap then covers diameters past
    2^40 instead of 50. Near-dup clusters are quasi-cliques (diameter
    1-3) that converge within the cheap propagation-only rounds, which
    is why the jump join is deferred rather than paid from round one.
    At 100 TB: labels are two longs per node; the (possibly expensive)
    edge lineage is materialized exactly ONCE up front, and
    localCheckpoint each round cuts the growing label lineage so round
    N's plan does not replay rounds 1..N-1.
    """
    edges = edges.localCheckpoint()  # eager-by-design: everything below reuses the edge list every round — pay its lineage once
    und = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).union(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    if nodes is None:
        nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()  # eager-by-design: iterative seed
    for rnd in range(_CC_MAX_ITERS):
        neighbor_min = (
            und.join(labels, und["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("n_min"))
        )
        merged = labels.join(neighbor_min, labels["node"] == F.col("node2"), "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("n_min"), F.col("label"))).alias("label"),
        )
        if rnd >= _CC_JUMP_AFTER:
            # Pointer jump: label ← label's own label. Labels only ever
            # decrease (min semilattice), so jumping never overshoots
            # the component minimum — it just shortcuts chains.
            parent = merged.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            merged = merged.join(parent, merged["label"] == F.col("p_node"), "left").select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))).alias(
                    "label"
                ),
            )
        old = labels.select(F.col("node").alias("o_node"), F.col("label").alias("o_label"))
        stepped = (
            merged.join(old, merged["node"] == F.col("o_node"))
            .select(
                "node",
                "label",
                (F.col("label") < F.col("o_label")).alias("improved"),
            )
        ).localCheckpoint(eager=False)  # materialized by the fused fixpoint count below
        # r15 (guide §5 — fewer driver-synchronized jobs): the fixpoint
        # probe IS the checkpoint's materializing action. The eager
        # checkpoint + separate limit(1).count() probe paid three job
        # launches per round; counting the improved rows over the
        # lazily-checkpointed frame computes (and caches) every
        # partition in ONE job and returns the test statistic.
        changed = materializing_count(stepped.where(F.col("improved")))  # eager-by-design: fixpoint test + checkpoint materialization
        labels = stepped.select("node", "label")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {_CC_MAX_ITERS} rounds")


@query(
    "dedup_connected",
    oracle=rf"""
    with recursive sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    hot as (select shingle from sh group by shingle having count(*) > {_SHINGLE_DF_CAP}),
    shc as (select s.* from sh s anti join hot h on s.shingle = h.shingle),
    sizes as (select doc_id, count(*) as n_sh from sh group by doc_id),
    pairs as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_common
      from shc a join shc b on a.shingle = b.shingle and a.doc_id < b.doc_id
      group by a.doc_id, b.doc_id
    ),
    dup_pairs as (
      select p.doc_a, p.doc_b
      from pairs p
        join sizes sa on p.doc_a = sa.doc_id
        join sizes sb on p.doc_b = sb.doc_id
      where cast(p.n_common as double) / (sa.n_sh + sb.n_sh - p.n_common) >= 0.2
    ),
    edges as (
      select doc_a as a, doc_b as b from dup_pairs
      union all
      select doc_b, doc_a from dup_pairs
    ),
    reach as (
      select a as node, b as r from edges
      union
      select t.node, e.b from reach t join edges e on t.r = e.a
    )
    select d.doc_id,
           least(d.doc_id, coalesce(min(t.r), d.doc_id)) as cluster_id,
           (coalesce(min(t.r), d.doc_id) < d.doc_id) as is_dup
    from documents d left join reach t on d.doc_id = t.node
    group by d.doc_id
    """,
    tags=("dedup", "graph", "iterative"),
)
def dedup_connected(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus dedup by transitive closure: cluster_id = smallest doc_id
    reachable through the Jaccard>=0.2 near-dup pair graph; every doc
    with a smaller clustermate is a duplicate (keep-one-per-cluster).

    Pairs come from the exact shingle-join (:func:`dedup_ngram_jaccard`)
    so the whole operator is oracle-checkable end-to-end (DuckDB replays
    the closure as a recursive CTE); the 100 TB deployment swaps in the
    MinHash-LSH candidate pairs (:func:`dedup_near`) — same closure,
    blocked pair generation.
    """
    pairs = dedup_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # The closure only needs to iterate over docs that appear in the
    # pair graph — a small fraction of the corpus (duplicates are the
    # exception, not the rule; nodes=None derives exactly that set
    # from the already-materialized edges). Singletons get their own
    # id via one final left join, so the per-round label table is
    # O(dup docs), not O(corpus): at 100 TB the iteration runs on the
    # dup graph while the full table is touched exactly once.
    labels = connected_components(None, edges)
    docs = t(spark, sf, "documents").select("doc_id")
    return docs.join(labels, docs["doc_id"] == labels["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        F.coalesce(F.col("label") < F.col("doc_id"), F.lit(False)).alias("is_dup"),
    )


def _keep_best_oracle() -> str:
    from parquet_processor_spark.registry import _ORACLES

    return rf"""
    with ranked as (
      select l.doc_id, l.cluster_id, d.n_chars,
             row_number() over (partition by l.cluster_id
                                order by d.n_chars desc, l.doc_id) as rk
      from ( {_ORACLES['dedup_connected']} ) l
      join documents d on l.doc_id = d.doc_id
    )
    select r.doc_id, r.cluster_id, k.keep_id, (r.doc_id = k.keep_id) as is_kept
    from ranked r
    join (select cluster_id, doc_id as keep_id from ranked where rk = 1) k
      on r.cluster_id = k.cluster_id
    """


@query("dedup_keep_best", oracle=_keep_best_oracle(), tags=("dedup", "graph", "curation"))
def dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical selection: within each transitive-closure dup cluster
    keep the HIGHEST-QUALITY document (longest, tie → lowest doc_id),
    not the lowest-id one — what a production pipeline actually wants
    (the first crawl of a page is often the truncated one). Quality
    here is n_chars standing in for any scoring column.

    Composition: closure labels (:func:`dedup_connected`) joined with
    the quality column, then one map-side-combined ``max_by`` per
    cluster (argmax via struct ordering — (quality, -doc_id) — so the
    tiebreak is deterministic cross-engine), and the k-row keep table
    joins back by cluster_id. At 100 TB the argmax shuffles one row
    per cluster per task; the full corpus crosses the wire once.
    """
    labels = dedup_connected(spark, sf).select("doc_id", "cluster_id")
    docs = t(spark, sf, "documents").select("doc_id", "n_chars")
    joined = labels.join(docs, "doc_id")
    keep = joined.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("n_chars").alias("q"), (-F.col("doc_id")).alias("t")),
        ).alias("keep_id")
    )
    return (
        joined.select("doc_id", "cluster_id")
        .join(keep, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "keep_id",
            (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
        )
    )


def _connected_lsh_oracle() -> str:
    """MinHash pairs (est >= 0.2) + the dedup_connected recursive-CTE
    closure — the whole 100 TB composition replayed in DuckDB."""
    return f"""
    with recursive {_mh_sig_sql()},
    {_mh_bands_sql()},
    {_mh_post_sql()},
    cand as (
      select distinct a.doc_id as doc_a, b.doc_id as doc_b
      from post a join post b using (band_sig)
      where a.doc_id < b.doc_id
    ),
    dup_pairs as (
      select c.doc_a, c.doc_b
      from cand c
      join sigs sa on sa.doc_id = c.doc_a
      join sigs sb on sb.doc_id = c.doc_b
      where {_mh_est_sql('sa', 'sb')} >= 0.2
    ),
    edges as (
      select doc_a as a, doc_b as b from dup_pairs
      union all
      select doc_b, doc_a from dup_pairs
    ),
    reach as (
      select a as node, b as r from edges
      union
      select t.node, e.b from reach t join edges e on t.r = e.a
    )
    select d.doc_id,
           least(d.doc_id, coalesce(min(t.r), d.doc_id)) as cluster_id,
           (coalesce(min(t.r), d.doc_id) < d.doc_id) as is_dup
    from documents d left join reach t on d.doc_id = t.node
    group by d.doc_id
    """


@query("dedup_connected_lsh", oracle=_connected_lsh_oracle(), tags=("dedup", "graph", "lsh", "iterative"))
def dedup_connected_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB fuzzy-dedup composition end-to-end: MinHash-LSH
    candidate pairs (signature-estimated Jaccard >= 0.2) → transitive
    closure → keep-min-per-cluster. Identical closure machinery to
    :func:`dedup_connected`, but pair generation is the banded-LSH
    blocked path instead of the exact shingle join — the shape that
    holds when the corpus no longer fits an exact pair join.

    HASH-CHECKED end to end since the minhash family moved to the
    cross-engine construction (md5-60bit base hash + universal-hash
    permutation literals — see the _K block comment): the oracle
    replays signatures, banding, the bucket cap, the est>=0.2 edge
    rule, and the transitive closure as one recursive CTE.
    :func:`parquet_processor_spark.ops.recall.recall_dedup_connected_lsh`
    additionally gates its cluster assignments against the exact
    closure.
    """
    pairs = (
        dedup_near(spark, sf)
        .where(F.col("est_jaccard") >= 0.2)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labels = connected_components(None, pairs)
    docs = t(spark, sf, "documents").select("doc_id")
    return docs.join(labels, docs["doc_id"] == labels["node"], "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        F.coalesce(F.col("label") < F.col("doc_id"), F.lit(False)).alias("is_dup"),
    )


# N2e: repeated-passage signal — for each document, how many of its
# word 8-grams also occur in ANOTHER document (exact cross-doc passage
# repetition, the span-level statistic behind suffix-array corpus
# dedup). Distinct from Jaccard/containment: no pairing — the output
# is a per-document contamination fraction, linear in the corpus.
_PASSAGE_N = 8


@query(
    "dedup_repeated_ngrams",
    oracle=rf"""
    with w as (
      select doc_id, regexp_split_to_array(text, '\s+') as words from documents
    ),
    grams as (
      select doc_id,
             ('0x' || substr(md5(array_to_string(words[i:i+{_PASSAGE_N - 1}], ' ')), 1, 15))::bigint
               as g
      from w, unnest(generate_series(1, len(words) - {_PASSAGE_N - 1})) as s(i)
    ),
    gd as (select distinct doc_id, g from grams),
    df as (select g, count(*) as n_docs from gd group by g)
    select gr.doc_id,
           count(*) as n_grams,
           cast(sum(case when df.n_docs > 1 then 1 else 0 end) as bigint) as n_shared,
           cast(sum(case when df.n_docs > 1 then 1 else 0 end) as double) / count(*)
             as shared_frac
    from grams gr join df on gr.g = df.g
    group by gr.doc_id
    """,
    tags=("dedup", "ngram", "curation"),
)
def dedup_repeated_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc count and fraction of 8-gram passages shared with at
    least one OTHER document (df computed on distinct doc-gram pairs,
    so within-doc repetition never inflates it).

    100 TB shape: 8-grams hash to 60-bit longs inside one pass over
    the words array (the passage string never leaves the expression);
    the doc-frequency aggregate is map-side combined on the gram key
    (Zipf-ish: the shuffle carries distinct grams per task); the
    score join shuffles the gram stream once and the per-doc rollup
    reuses nothing heavier. Linear end-to-end — no pair join at any
    point, which is what makes the span-level signal usable where
    even blocked pair enumeration is too big. Docs shorter than
    {_PASSAGE_N} words have no 8-grams and are absent by definition.
    """
    n = _PASSAGE_N
    w = t(spark, sf, "documents").select(
        "doc_id", F.split("text", r"\s+").alias("words")
    )
    gram_arr = F.when(
        F.size("words") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("words") - (n - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice("words", i, n))), 1, 15),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.expr("array()"))
    grams = (
        w.select("doc_id", F.explode_outer(gram_arr).alias("g"))
        .where(F.col("g").isNotNull())
    )
    dfreq = grams.distinct().groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        grams.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(shared).cast("long").alias("n_shared"),
            (F.sum(shared).cast("double") / F.count(F.lit(1))).alias("shared_frac"),
        )
    )


# Incremental dedup — the production shape: dedupe the NEW batch
# against the existing corpus without re-deduping the corpus. Docs
# with doc_id >= cutoff play the incoming delta; the rest are the
# standing corpus whose fingerprint set is the only thing consulted.
_INCR_DEDUP_CUTOFF_FRAC = 0.8  # last 20% of ids = the delta


@query(
    "dedup_incremental",
    oracle=f"""
    with cutoff as (
      select cast(floor(min(doc_id)
                        + {_INCR_DEDUP_CUTOFF_FRAC} * (max(doc_id) - min(doc_id)))
                  as bigint) as c
      from documents
    ),
    corpus as (
      select distinct md5(text) as fp from documents, cutoff where doc_id < c
    ),
    delta as (
      select doc_id, md5(text) as fp from documents, cutoff where doc_id >= c
    ),
    marked as (
      select d.doc_id, d.fp,
             case when c.fp is not null then 1 else 0 end as dup_of_corpus,
             case when row_number() over (partition by d.fp order by d.doc_id) > 1
                  then 1 else 0 end as dup_within_delta
      from delta d left join corpus c on d.fp = c.fp
    )
    select doc_id,
           (dup_of_corpus = 0 and dup_within_delta = 0) as is_new_unique,
           dup_of_corpus = 1 as dup_of_corpus,
           dup_within_delta = 1 as dup_within_delta
    from marked
    """,
    tags=("dedup", "incremental"),
)
def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Classify each delta document: new-unique, duplicate of the
    standing corpus, or duplicate within the delta itself (first
    occurrence by doc_id stays new).

    100 TB shape: the standing corpus contributes ONLY its distinct
    fingerprint set (at-rest state a real pipeline maintains as a
    table — here derived in one map-side-combined distinct); the
    delta anti-joins/left-joins that set on the 128-bit key and
    resolves within-delta duplicates with one fingerprint-keyed
    window. Per ingestion batch the cost is O(delta + matched
    fingerprints) — the corpus text is never re-read per batch in
    the maintained-table deployment, and is read once here only to
    build the fixture fingerprints. Cutoff is data-derived
    (min + frac·range, exact integer floor) so the query is
    SF-independent.
    """
    d = t(spark, sf, "documents")
    cutoff = d.agg(
        F.floor(
            F.min("doc_id")
            + F.lit(_INCR_DEDUP_CUTOFF_FRAC) * (F.max("doc_id") - F.min("doc_id"))
        )
        .cast("long")
        .alias("c")
    )
    with_c = d.crossJoin(F.broadcast(cutoff))
    corpus = (
        with_c.where(F.col("doc_id") < F.col("c"))
        .select(F.md5("text").alias("fp"))
        .distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    delta = with_c.where(F.col("doc_id") >= F.col("c")).select(
        "doc_id", F.md5("text").alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    marked = (
        delta.join(corpus, "fp", "left")
        .select(
            "doc_id",
            F.col("in_corpus").isNotNull().alias("dup_of_corpus"),
            (F.row_number().over(w) > 1).alias("dup_within_delta"),
        )
    )
    return marked.select(
        "doc_id",
        (~F.col("dup_of_corpus") & ~F.col("dup_within_delta")).alias("is_new_unique"),
        "dup_of_corpus",
        "dup_within_delta",
    )


# Incremental NEAR-dup — the N62 × N2 composition a 100 TB ingestion
# pipeline actually runs: the standing corpus is represented by its
# MinHash band POSTING LISTS (the at-rest LSH index a real pipeline
# maintains as a table), and each incoming batch (a) probes those
# posting lists with its own band keys to find near-dups of the
# corpus, and (b) blocks against itself to find near-dups within the
# batch. Per batch the cost is O(delta bands + matched buckets) — the
# corpus text is never re-shingled per batch in the maintained-index
# deployment (here the index is derived once from the fixture).
_INCR_MINHASH_TAU = 0.5  # est-Jaccard flag threshold: >= 6 of 12 minhashes agree


def _sig_est(a: str, b: str) -> F.Column:
    """MinHash agreement estimate between two signature columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(_K))


def _incr_cutoff(id_frame: DataFrame) -> DataFrame:
    """1-row (c) cutoff frame: min + frac·range of doc_id, exact
    integer floor. Derive it from the CACHED signature table where one
    is in scope — the scalar subtree re-enters the plan once per
    consumer, and reading it off the cache avoids repeated parquet
    column scans (5 consumers at one point; at corpus scale each was a
    full doc_id pass)."""
    return id_frame.agg(
        F.floor(
            F.min("doc_id")
            + F.lit(_INCR_DEDUP_CUTOFF_FRAC) * (F.max("doc_id") - F.min("doc_id"))
        )
        .cast("long")
        .alias("c")
    )


def _incremental_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b, est_jaccard) where
    doc_b is a delta document: corpus-probe hits plus within-delta
    block pairs. Shared by the classification query and its recall
    gate. Because corpus ids all precede the cutoff and delta ids
    follow it, normalizing corpus-probe pairs as (corpus, delta) and
    delta pairs as (min, max) yields doc_a < doc_b everywhere."""
    sig = _minhash_sig_cached(spark, sf)
    bands = _band_rows(sig.crossJoin(F.broadcast(_incr_cutoff(sig))))
    corpus_bands = bands.where(F.col("doc_id") < F.col("c")).select(
        "doc_id", "sig", "band", "band_sig"
    )
    delta_bands = bands.where(F.col("doc_id") >= F.col("c")).select(
        "doc_id", "sig", "band", "band_sig"
    )
    # The standing index: one posting list per (band, band_sig),
    # df-capped like every posting family (hot buckets dropped BEFORE
    # collection via the window qualify — the _capped_band_blocks
    # shape, mirrored in the oracle's qualify filter over corpus
    # rows). A production pipeline persists exactly this table and
    # appends each batch's survivors to it; the probe below touches
    # only buckets a delta band key actually hits.
    wb = Window.partitionBy("band", "band_sig")
    postings = (
        corpus_bands.withColumn("df", F.count(F.lit(1)).over(wb))
        .where(F.col("df") <= _MH_BUCKET_CAP)
        .groupBy("band", "band_sig")
        .agg(F.collect_list(F.struct("doc_id", "sig")).alias("docs"))
    )
    # The PROBE side is capped by the same per-bucket df rule, counted
    # over DELTA rows only — without it a degenerate delta bucket
    # (empty docs, boilerplate batch) probes the standing index
    # cap×cap quadratically, and the oracle (whose corpus-probe arm
    # joins cpost against the CAPPED dpost) would diverge from an
    # uncapped Spark probe exactly when the cap engages (r9 ADVICE).
    delta_capped = (
        delta_bands.withColumn("df", F.count(F.lit(1)).over(wb))
        .where(F.col("df") <= _MH_BUCKET_CAP)
        .drop("df")
    )
    # No round(): one IEEE division of exact ints (numeric.py).
    est = _sig_est("sig_a", "sig_b")
    probe_pairs = (
        delta_capped.join(postings, ["band", "band_sig"])
        .select(
            F.col("doc_id").alias("doc_b"),
            F.col("sig").alias("sig_b"),
            F.explode("docs").alias("cd"),
        )
        .select(
            F.col("cd.doc_id").alias("doc_a"),
            F.col("cd.sig").alias("sig_a"),
            "doc_b",
            "sig_b",
        )
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Within-delta pairs: the dedup_near block expansion restricted to
    # the batch — df-capped sorted posting list (cap counted over
    # DELTA rows only, mirroring the standing index's corpus-only
    # count), chained-generator pair stream.
    delta_blocks = _capped_band_blocks(delta_bands.select("doc_id", "sig", "band", "band_sig"))
    delta_pairs = (
        delta_blocks.select("docs", F.posexplode("docs").alias("i", "a"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.sig").alias("sig_a"),
            F.explode_outer(F.slice("docs", F.col("i") + 2, F.size("docs"))).alias("b"),
        )
        .where(F.col("b").isNotNull())
        .select("doc_a", "sig_a", F.col("b.doc_id").alias("doc_b"), F.col("b.sig").alias("sig_b"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return probe_pairs.unionByName(delta_pairs)


def _incremental_minhash_oracle() -> str:
    """Cutoff + per-subset capped postings + probe/within-delta pair
    union + est>=tau classification, all replayed in DuckDB."""
    return f"""
    with {_mh_sig_sql()},
    {_mh_bands_sql()},
    cutoff as (
      select cast(floor(min(doc_id)
                        + {_INCR_DEDUP_CUTOFF_FRAC} * (max(doc_id) - min(doc_id)))
                  as bigint) as c
      from documents
    ),
    cpost as (
      select doc_id, band_sig from bands, cutoff where doc_id < c
      qualify count(*) over (partition by band_sig) <= {_MH_BUCKET_CAP}
    ),
    dpost as (
      select doc_id, band_sig from bands, cutoff where doc_id >= c
      qualify count(*) over (partition by band_sig) <= {_MH_BUCKET_CAP}
    ),
    cand as (
      select a.doc_id as doc_a, b.doc_id as doc_b
      from cpost a join dpost b using (band_sig)
      union
      select a.doc_id, b.doc_id
      from dpost a join dpost b using (band_sig)
      where a.doc_id < b.doc_id
    ),
    flagged as (
      select distinct cd.doc_b as doc_id, (cd.doc_a < cutoff.c) as from_corpus
      from cand cd
      join sigs sa on sa.doc_id = cd.doc_a
      join sigs sb on sb.doc_id = cd.doc_b
      cross join cutoff
      where {_mh_est_sql('sa', 'sb')} >= {_INCR_MINHASH_TAU}
    ),
    marks as (
      select doc_id,
             max(case when from_corpus then 1 else 0 end) as k,
             max(case when not from_corpus then 1 else 0 end) as w
      from flagged group by doc_id
    )
    select d.doc_id,
           (coalesce(m.k, 0) = 0 and coalesce(m.w, 0) = 0) as is_new_unique,
           coalesce(m.k, 0) = 1 as near_dup_of_corpus,
           coalesce(m.w, 0) = 1 as near_dup_within_delta
    from (select doc_id from documents, cutoff where doc_id >= c) d
    left join marks m using (doc_id)
    """


@query(
    "dedup_incremental_minhash",
    oracle=_incremental_minhash_oracle(),
    tags=("dedup", "lsh", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Classify each delta document by NEAR-duplication (MinHash-LSH):
    near-dup of the standing corpus, near-dup within the delta (the
    smallest-id member of a delta group stays new), or new-unique.

    HASH-CHECKED end to end since the minhash family moved to the
    cross-engine construction (see the _K block comment): the oracle
    replays the cutoff, the per-subset capped posting lists, the
    probe and within-delta pair streams, and the est>=tau
    classification. The ``recall_dedup_incremental_minhash`` gate
    additionally requires every exact capped-shingle Jaccard>=0.2
    pair involving a delta doc to surface as a candidate pair here.

    100 TB shape: the corpus contributes only its band posting lists
    (maintained at-rest; kilobytes per bucket), the delta's band keys
    probe them with one equi-join on (band, band_sig), and the
    within-batch pass blocks only delta rows — per batch nothing over
    the standing corpus is re-read or re-hashed. Pair expansion
    streams through chained generators exactly as ``dedup_near``.
    """
    sig = _minhash_sig_cached(spark, sf)
    cutoff = _incr_cutoff(sig)
    delta_docs = (
        sig.select("doc_id")
        .crossJoin(F.broadcast(cutoff))
        .where(F.col("doc_id") >= F.col("c"))
        .select("doc_id", "c")
    )
    pairs = _incremental_minhash_pairs(spark, sf).where(
        F.col("est_jaccard") >= _INCR_MINHASH_TAU
    )
    # doc_a < doc_b always, and corpus ids < cutoff <= delta ids: a
    # pair is corpus-vs-delta iff doc_a < cutoff, delta-vs-delta
    # otherwise — and in both cases doc_b is the flagged delta doc
    # (within a delta group the smallest id never appears as doc_b
    # first... it does appear as doc_a only, so it stays new).
    flagged = pairs.crossJoin(F.broadcast(cutoff)).select(
        F.col("doc_b").alias("doc_id"),
        (F.col("doc_a") < F.col("c")).alias("from_corpus"),
    )
    marks = flagged.groupBy("doc_id").agg(
        F.max(F.when(F.col("from_corpus"), 1).otherwise(0)).alias("k"),
        F.max(F.when(~F.col("from_corpus"), 1).otherwise(0)).alias("w"),
    )
    return (
        delta_docs.join(marks, "doc_id", "left")
        .select(
            "doc_id",
            (
                (F.coalesce(F.col("k"), F.lit(0)) == 0)
                & (F.coalesce(F.col("w"), F.lit(0)) == 0)
            ).alias("is_new_unique"),
            (F.coalesce(F.col("k"), F.lit(0)) == 1).alias("near_dup_of_corpus"),
            (F.coalesce(F.col("w"), F.lit(0)) == 1).alias("near_dup_within_delta"),
        )
    )


# N-family: first-occurrence shingle novelty — per document, the
# fraction of its distinct shingles that no EARLIER document (smaller
# doc_id = earlier in corpus order) contains. The marginal-new-content
# score a crawl/ingestion pipeline uses to rank sources ("this feed is
# 90% boilerplate we already have") and to cut off scraping when
# novelty collapses; near-dups score ~0 without any pair expansion.
@query(
    "doc_novelty",
    oracle=r"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    first_occ as (select shingle, min(doc_id) as doc_id from sh group by shingle),
    novel as (select doc_id, cast(count(*) as bigint) as n_novel from first_occ group by doc_id),
    sizes as (select doc_id, cast(count(*) as bigint) as n_sh from sh group by doc_id)
    select s.doc_id, s.n_sh, coalesce(n.n_novel, cast(0 as bigint)) as n_novel,
           cast(coalesce(n.n_novel, cast(0 as bigint)) as double) / s.n_sh as novelty
    from sizes s left join novel n on s.doc_id = n.doc_id
    """,
    tags=("dedup", "text", "curation"),
)
def doc_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc novelty = |shingles first seen in this doc| / |shingles|.

    Unlike the pair-based dedup family this never expands pairs at
    all: ONE shingle-keyed map-side-combined aggregate takes each
    shingle to its minimum doc_id (the shuffle carries one row per
    distinct shingle per task — hot boilerplate shingles COMBINE
    instead of exploding, so no df cap is needed), then one doc-keyed
    count of that first-occurrence stream, joined against the per-doc
    shingle counts (both doc-keyed, co-partitioned). Cost is linear in
    corpus shingle mass at any scale.

    Shingles are hashed to longs (:func:`shingle_hashes`) while the
    oracle keeps strings — identical counts absent 64-bit collisions,
    same argument as :func:`dedup_ngram_jaccard`.
    """
    d = split_words(spark, sf).select("doc_id", shingle_hashes().alias("shingles"))
    sh = _explode_shingles(d)
    first_occ = sh.groupBy("shingle").agg(F.min("doc_id").alias("doc_id"))
    novel = first_occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_novel"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return sizes.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_sh",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        (
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).cast("double")
            / F.col("n_sh")
        ).alias("novelty"),
    )


# Cross-corpus boilerplate scoring: the complement of the hot-shingle
# DF CAP. Dedup DROPS high-document-frequency shingles as noise; a
# curation pipeline also wants to MEASURE them — per document, how
# much of its content is corpus boilerplate (nav bars, license
# footers, templated headers) — because a doc that is mostly
# boilerplate is a removal candidate even when it duplicates nothing.
_BOILER_DF = 5


@query(
    "text_boilerplate",
    oracle=rf"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
        ))) as shingle
      from documents
    ),
    boiler as (
      select shingle from sh group by shingle having count(*) >= {_BOILER_DF}
    ),
    per_doc as (
      select s.doc_id,
             cast(count(*) as bigint) as n_sh,
             cast(count(*) filter (where b.shingle is not null) as bigint) as n_boiler
      from sh s left join boiler b on s.shingle = b.shingle
      group by s.doc_id
    )
    select doc_id, n_sh, n_boiler,
           cast(n_boiler as double) / n_sh as boiler_frac
    from per_doc
    """,
    tags=("dedup", "text", "curation"),
)
def text_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc boilerplate fraction: share of distinct shingles whose
    corpus document frequency >= {df} (shared templated content).

    100 TB shape: the DF statistic is the same map-side-combined
    aggregate drop_hot_shingles runs; the boilerplate shingle set is
    TINY by construction (<= total_occurrences/df rows), so the
    per-doc attribution is a BROADCAST semi-flag join against the
    exploded rows — the corpus shingle stream never shuffles for it —
    followed by one doc-keyed count. Linear, two aggregates, zero
    wide shuffles. Shingles are hashed longs (oracle keeps strings —
    same collision argument as dedup_ngram_jaccard).
    """
    d = split_words(spark, sf).select("doc_id", shingle_hashes().alias("shingles"))
    sh = _explode_shingles(d)
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _BOILER_DF)
        .select("shingle", F.lit(True).alias("is_boiler"))
    )
    flagged = sh.join(F.broadcast(boiler), "shingle", "left")
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.count(F.when(F.col("is_boiler"), 1)).alias("n_boiler"),
    )
    return per_doc.select(
        "doc_id",
        "n_sh",
        "n_boiler",
        (F.col("n_boiler").cast("double") / F.col("n_sh")).alias("boiler_frac"),
    )


# Cross-doc VERBATIM span detection — the exact-substring dedup of
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better"): near-dup scoring (Jaccard/MinHash above) measures bag
# overlap, but memorization risk comes from long VERBATIM runs, which
# survive even when overall similarity is low. Anchor on rare 8-gram
# matches, then grow each match diagonal into its maximal common run.
_SPAN_GRAM = 8
_SPAN_MIN_TOKENS = 12   # report runs strictly longer than the anchor
_SPAN_DF_CAP = 1000     # posting-list cap, same policy as ngram_jaccard


# Shared CTE chain for the span family: tokenize -> anchor grams ->
# df-capped posting lists -> pair matches -> diagonal islands -> runs
# (with each run's start position on BOTH sides).
_SPAN_CTES = f"""
    toks as (
      select doc_id, regexp_split_to_array(coalesce(text, ''), ' ') as ws
      from documents
    ),
    grams as (
      select doc_id, i as pos,
             md5(array_to_string(ws[i:i+{_SPAN_GRAM - 1}], ' ')) as g
      from toks,
           unnest(generate_series(1, greatest(len(ws) - {_SPAN_GRAM - 1}, 0))) as t(i)
    ),
    df as (
      select g from grams
      group by g having count(distinct doc_id) between 2 and {_SPAN_DF_CAP}
    ),
    posting as (select doc_id, pos, grams.g from grams join df using (g)),
    matches as (
      select distinct a.doc_id as doc_a, b.doc_id as doc_b, a.pos as pa, b.pos as pb
      from posting a join posting b on a.g = b.g and a.doc_id < b.doc_id
    ),
    islands as (
      select doc_a, doc_b, pa,
             pa - row_number() over (partition by doc_a, doc_b, pa - pb
                                     order by pa) as isl,
             pa - pb as diag
      from matches
    ),
    runs as (
      select doc_a, doc_b, diag,
             cast(count(*) + {_SPAN_GRAM - 1} as bigint) as span_tokens,
             min(pa) as start_a
      from islands group by doc_a, doc_b, diag, isl
    )
"""


@query(
    "dedup_verbatim_spans",
    oracle=f"""
    with {_SPAN_CTES}
    select doc_a, doc_b, max(span_tokens) as max_span_tokens,
           cast(count(*) as bigint) as n_spans
    from runs group by doc_a, doc_b
    having max(span_tokens) >= {_SPAN_MIN_TOKENS}
    """,
    tags=("dedup", "text", "spans"),
)
def dedup_verbatim_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Longest verbatim token run per document pair: hash every
    {gram}-gram, keep grams shared by 2..{cap} docs (rare-anchor
    posting lists — hot boilerplate grams are capped exactly like the
    Jaccard family), join postings into (pair, pos_a, pos_b) matches,
    and collapse each match DIAGONAL (pa - pb constant) into maximal
    consecutive runs with the gaps-and-islands trick: within a
    diagonal, pa - row_number() is constant exactly on consecutive
    anchors. A run of L anchors is a verbatim span of L + {gram} - 1
    tokens; pairs report their longest span and span count.

    100 TB shape: linear in corpus tokens up to the posting join,
    whose fan-out is bounded by the df cap (no N^2 — unrelated docs
    never pair); the islands windows run on MATCH rows (pair-anchor
    tuples, tiny next to the corpus) partitioned by pair+diagonal, so
    no single-partition sort anywhere. At petabyte scale the md5
    anchor would be xxhash64 (8 bytes vs 32 on the wire); md5 here
    keeps the oracle engine-exact. This is the suffix-array
    exact-substring dedup result computed with joins: anchors find
    every shared window >= {gram} tokens, and run-growing recovers the
    full span without materializing suffixes.
    """
    _, runs = _span_runs(spark, sf)
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_tokens").alias("max_span_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .where(F.col("max_span_tokens") >= _SPAN_MIN_TOKENS)
    )


def _span_runs(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    """(toks, runs): tokenized documents and the maximal verbatim runs
    per pair-diagonal — runs carry span_tokens and start_a (the run's
    first token position in doc_a; doc_b's start is start_a - diag).
    See dedup_verbatim_spans for the shape argument."""
    toks = t(spark, sf, "documents").select(
        "doc_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("ws")
    )
    n = F.size("ws")
    gram_structs = F.when(
        n >= _SPAN_GRAM,
        F.transform(
            F.sequence(F.lit(1), n - (_SPAN_GRAM - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice("ws", i, _SPAN_GRAM))).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
    grams = (
        toks.select("doc_id", F.explode_outer(gram_structs).alias("s"))
        .where(F.col("s").isNotNull())
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )
    df = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("ndoc"))
        .where(F.col("ndoc").between(2, _SPAN_DF_CAP))
        .select("g")
    )
    posting = grams.join(df, "g")
    a = posting.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = posting.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    matches = (
        a.join(b, (a["g"] == b["g"]) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
    )
    from pyspark.sql import Window

    diag = (F.col("pa") - F.col("pb")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = matches.select("doc_a", "doc_b", "pa", diag).withColumn(
        "isl", F.col("pa") - F.row_number().over(w)
    )
    runs = islands.groupBy("doc_a", "doc_b", "diag", "isl").agg(
        (F.count(F.lit(1)) + (_SPAN_GRAM - 1)).cast("long").alias("span_tokens"),
        F.min("pa").alias("start_a"),
    )
    return toks, runs


@query(
    "dedup_span_removal",
    oracle=f"""
    with {_SPAN_CTES},
    cov as (
      select distinct doc_b as doc_id, pos
      from runs,
           unnest(generate_series(start_a - diag,
                                  start_a - diag + span_tokens - 1)) as c(pos)
      where span_tokens >= {_SPAN_MIN_TOKENS}
    ),
    positions as (
      select doc_id, i as pos, ws[i] as tok
      from toks, unnest(generate_series(1, len(ws))) as t(i)
    ),
    kept as (
      select p.doc_id, p.pos, p.tok
      from positions p left join cov c on c.doc_id = p.doc_id and c.pos = p.pos
      where c.pos is null
    )
    select t.doc_id,
           cast(len(t.ws) as bigint) as n_tokens,
           cast(len(t.ws) - count(k.pos) as bigint) as n_removed,
           md5(coalesce(string_agg(k.tok, ' ' order by k.pos), '')) as fingerprint
    from toks t left join kept k on k.doc_id = t.doc_id
    group by t.doc_id, len(t.ws)
    """,
    tags=("dedup", "text", "spans", "curation"),
)
def dedup_span_removal(spark: SparkSession, sf: str) -> DataFrame:
    """The APPLY step of exact-substring dedup (Lee et al. 2022):
    strip every verbatim run of >= {min} tokens from the HIGHER-id
    document of each pair (the lower id stays canonical, exactly the
    keep-lowest policy of the exact/MinHash family), and fingerprint
    the cleaned text. Detection is dedup_verbatim_spans' run table;
    removal is interval masking: collect each doc's covered intervals,
    then keep tokens whose position falls in none of them.

    100 TB shape: the run table is pair-sized (tiny next to the
    corpus) and collapses to per-doc interval LISTS before touching
    documents again, so the rewrite is ONE doc-keyed join plus a
    codegen lambda mask over the token array. That join is the one
    place the corpus text moves: the interval side is doc-bounded (too
    big to broadcast safely at corpus scale), so the plan is a doc-
    keyed shuffle join — with the corpus at rest bucketed by doc_id
    (the layout the incremental-dedup family already assumes) it
    becomes co-located and the text never crosses the wire; unbucketed
    it costs one corpus shuffle, the same order as the rewrite's own
    output write. The per-token exists() scan over a doc's intervals
    is O(tokens x intervals) with intervals per doc small by
    construction (spans are >= {min} tokens, so a doc holds at most
    len/{min} disjoint covered regions).
    """
    toks, runs = _span_runs(spark, sf)
    start_b = F.col("start_a") - F.col("diag")
    intervals = (
        runs.where(F.col("span_tokens") >= _SPAN_MIN_TOKENS)
        .select(
            F.col("doc_b").alias("doc_id"),
            F.struct(
                start_b.cast("long").alias("s"),
                (start_b + F.col("span_tokens") - 1).cast("long").alias("e"),
            ).alias("iv"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list("iv").alias("ivs"))
    )
    ivs = F.coalesce(F.col("ivs"), F.array().cast("array<struct<s:bigint,e:bigint>>"))
    covered = lambda i: F.exists(  # noqa: E731 — position i is 1-based
        ivs, lambda r: (i >= r["s"]) & (i <= r["e"])
    )
    kept = F.filter(F.col("ws"), lambda x, i: ~covered(i + 1))
    return toks.join(intervals, "doc_id", "left").select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("fingerprint"),
    )


def _cluster_report_oracle() -> str:
    from parquet_processor_spark.registry import _ORACLES

    return rf"""
    with cs as (
      select l.cluster_id,
             count(*) as sz,
             cast(sum(case when l.is_dup then d.n_chars else 0 end) as bigint)
               as chars_rm
      from ( {_ORACLES['dedup_connected']} ) l
      join documents d on l.doc_id = d.doc_id
      group by l.cluster_id
    )
    select cast(sz as bigint) as cluster_size,
           cast(count(*) as bigint) as n_clusters,
           cast(sum(sz) as bigint) as n_docs,
           cast(sum(case when sz > 1 then sz - 1 else 0 end) as bigint) as n_dups,
           cast(sum(chars_rm) as bigint) as chars_removed
    from cs group by sz
    """


@query("dedup_cluster_report", oracle=_cluster_report_oracle(), tags=("dedup", "report"))
def dedup_cluster_report(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup REPORT artifact
    (what Dolma/RedPajama publish alongside the deduped corpus): one
    row per cluster size with how many clusters, docs, removable dups,
    and removable characters it accounts for. The "how much did dedup
    buy" answer comes straight off this table.

    100 TB shape: rides the dedup_connected closure unchanged (the
    expensive part, already O(dup-graph) per round); the report itself
    is two map-side-combined aggregates over doc-count rows — cluster
    sizes, then the size histogram — nothing corpus-mass beyond the
    closure's own single documents pass (n_chars joins by doc_id).
    """
    base = dedup_connected(spark, sf)
    docs = t(spark, sf, "documents").select("doc_id", "n_chars")
    cs = (
        base.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum(F.when(F.col("is_dup"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_rm"),
        )
    )
    return (
        cs.groupBy(F.col("sz").cast("long").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("sz") > 1, F.col("sz") - 1).otherwise(0))
            .cast("long")
            .alias("n_dups"),
            F.sum("chars_rm").cast("long").alias("chars_removed"),
        )
    )


# Span-level benchmark decontamination — the Lee et al. 2022 exact-
# substring test applied the way labs actually decontaminate: a
# training doc is flagged when it shares a verbatim token run >=
# {_SPAN_MIN_TOKENS} with any held-out benchmark doc (the same %50
# benchmark slice as curation_contamination, whose n-gram BAG overlap
# misses reordered text and over-fires on topical overlap — the span
# test is the memorization-faithful criterion).
@query(
    "curation_contamination_spans",
    oracle=f"""
    with {_SPAN_CTES},
    pair_spans as (
      select doc_a, doc_b, max(span_tokens) as max_span
      from runs group by doc_a, doc_b
      having max(span_tokens) >= {_SPAN_MIN_TOKENS}
    ),
    crossing as (
      select case when doc_a % 50 = 0 then doc_b else doc_a end as train_id,
             case when doc_a % 50 = 0 then doc_a else doc_b end as bench_id,
             max_span
      from pair_spans
      where (doc_a % 50 = 0) <> (doc_b % 50 = 0)
    )
    select train_id,
           cast(min(bench_id) as bigint) as bench_id,
           cast(max(max_span) as bigint) as max_span_tokens,
           cast(count(*) as bigint) as n_bench_matches
    from crossing group by train_id
    """,
    tags=("curation", "contamination", "spans"),
)
def curation_contamination_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Training docs sharing a long verbatim run with the benchmark.

    100 TB shape: rides the dedup_verbatim_spans pair machinery
    unchanged (rare-anchor blocking, df-capped posting lists, islands
    window on pair-diagonal keys); the bench/train split is a modulo
    flag evaluated on the pair rows, so decontamination costs nothing
    beyond the span scan a dedup pass already runs. In production the
    benchmark side is a small fixed corpus: the anchor join's bench
    side collapses to a broadcast and only training-side anchors probe
    it.
    """
    pairs = dedup_verbatim_spans(spark, sf)
    a_bench = F.col("doc_a") % 50 == 0
    b_bench = F.col("doc_b") % 50 == 0
    crossing = pairs.where(a_bench != b_bench).select(
        F.when(a_bench, F.col("doc_b")).otherwise(F.col("doc_a")).alias("train_id"),
        F.when(a_bench, F.col("doc_a")).otherwise(F.col("doc_b")).alias("bench_id"),
        F.col("max_span_tokens").alias("max_span"),
    )
    return crossing.groupBy("train_id").agg(
        F.min("bench_id").cast("long").alias("bench_id"),
        F.max("max_span").cast("long").alias("max_span_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_bench_matches"),
    )


# URL canonicalization dedup — the FIRST dedup every web-crawl
# pipeline runs, before any text hashing: the same page arrives under
# scheme/host case variants, tracking parameters (utm_*, ref),
# fragments, and trailing slashes. The fixture has no URL column, so
# the operator derives one deterministically per document (source ->
# host, doc_id mod _URL_PAGES -> page path => real cross-doc URL
# duplicates) and injects the variant noise by doc_id mod 3; the
# oracle replays the derivation and the canonicalizer (the audio-
# injection precedent). Canonical form: lowercase scheme+host, path
# without the trailing slash, fragment dropped, utm_*/ref params
# removed, surviving params sorted — all regexp/array primitives both
# engines share.
_URL_PAGES = 200


def _raw_url() -> F.Column:
    base = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % _URL_PAGES).cast("string"),
    )
    m = F.col("doc_id") % 3
    return (
        F.when(m == 0, F.concat(F.upper(base), F.lit("?utm_source=feed&b=2&ref=x&a=1")))
        .when(m == 1, F.concat(base, F.lit("/?a=1&b=2#frag")))
        .otherwise(F.concat(base, F.lit("?b=2&a=1")))
    )


def _canonical_url(url: F.Column) -> F.Column:
    # split off fragment, then query, lowercase the scheme://host part
    no_frag = F.regexp_replace(url, r"#.*$", "")
    path_part = F.regexp_replace(F.regexp_extract(no_frag, r"^([^?]*)", 1), r"/$", "")
    host = F.lower(F.regexp_extract(path_part, r"^(https?://[^/]*)", 1))
    path = F.regexp_replace(path_part, r"^https?://[^/]*", "")
    qs = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != "") & ~p.rlike("^(utm_[^=]*|ref)="),
            )
        ),
        "&",
    )
    return F.concat(
        host, F.lower(path), F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept))
    )


_URL_CANON_SQL = f"""
    raw as (
      select doc_id,
             case
               when doc_id % 3 = 0 then upper('https://' || source || '.example.com/page/'
                    || cast(doc_id % {_URL_PAGES} as varchar)) || '?utm_source=feed&b=2&ref=x&a=1'
               when doc_id % 3 = 1 then 'https://' || source || '.example.com/page/'
                    || cast(doc_id % {_URL_PAGES} as varchar) || '/?a=1&b=2#frag'
               else 'https://' || source || '.example.com/page/'
                    || cast(doc_id % {_URL_PAGES} as varchar) || '?b=2&a=1'
             end as url
      from documents
    ),
    canon as (
      select doc_id, url,
        lower(regexp_extract(regexp_replace(regexp_extract(regexp_replace(url, '#.*$', ''), '^([^?]*)', 1), '/$', ''), '^(https?://[^/]*)', 1))
        || lower(regexp_replace(regexp_replace(regexp_extract(regexp_replace(url, '#.*$', ''), '^([^?]*)', 1), '/$', ''), '^https?://[^/]*', ''))
        || case when array_to_string(list_sort(list_filter(
                  regexp_split_to_array(regexp_extract(regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1), '&'),
                  p -> p <> '' and not regexp_matches(p, '^(utm_[^=]*|ref)='))), '&') = ''
                then ''
                else '?' || array_to_string(list_sort(list_filter(
                  regexp_split_to_array(regexp_extract(regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1), '&'),
                  p -> p <> '' and not regexp_matches(p, '^(utm_[^=]*|ref)='))), '&')
           end as canonical_url
      from raw
    )
"""


@query(
    "dedup_url",
    oracle=f"""
    with {_URL_CANON_SQL}
    select c.doc_id, c.canonical_url,
           min(c.doc_id) over (partition by c.canonical_url) as keep_id,
           c.doc_id > min(c.doc_id) over (partition by c.canonical_url) as is_dup
    from canon c
    """,
    tags=("dedup", "url", "curation"),
)
def dedup_url(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL dedup: normalize each document's (derived) URL —
    lowercase scheme/host+path, strip fragment and trailing slash,
    drop utm_*/ref tracking params, sort survivors — and keep the
    smallest doc_id per canonical form. The three injected variants of
    every page (upper-cased + tracking params / trailing slash +
    fragment / reordered params) all collapse to one canonical URL.

    100 TB shape: canonicalization is pure per-row string codegen
    beside the scan; the survivor rule is ONE window (or groupBy) on
    the canonical key — the cheapest dedup in the whole family, which
    is exactly why crawl pipelines run it first and cut the corpus
    before any content hashing.
    """
    from pyspark.sql import Window

    d = t(spark, sf, "documents").select("doc_id", "source")
    canon = d.select("doc_id", _canonical_url(_raw_url()).alias("canonical_url"))
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "canonical_url",
        F.min("doc_id").over(w).alias("keep_id"),
        (F.col("doc_id") > F.min("doc_id").over(w)).alias("is_dup"),
    )


# N188: cross-source overlap matrix — the release-report diagnostic
# every multi-source corpus ships (Dolma/RedPajama overlap tables):
# for every ordered source pair (a, b), the fraction of a's distinct
# 3-gram shingles that also appear in b. Within-pair duplication is
# N2's job; this is the BETWEEN-SOURCES contamination/overlap view
# that decides whether two "different" crawls are really one.
@query(
    "report_source_overlap",
    oracle=rf"""
    with sh as (
      select distinct d.source,
        unnest(list_distinct(
          list_transform(
            generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
            i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
          ))) as shingle
      from documents d
    ),
    hashed as (
      select source, ('0x' || substr(md5(shingle), 1, 15))::bigint as h from sh
    ),
    capped as (
      select source, h from hashed
      qualify count(*) over (partition by h) <= {_SHINGLE_DF_CAP}
    ),
    tot as (select source, cast(count(*) as bigint) as n_shingles from capped group by source),
    hits as (
      select a.source as source_a, b.source as source_b,
             cast(count(distinct a.h) as bigint) as n_shared
      from capped a join capped b on a.h = b.h and a.source <> b.source
      group by a.source, b.source
    )
    select t1.source as source_a, t2.source as source_b,
           t1.n_shingles as n_shingles_a,
           coalesce(h.n_shared, 0) as n_shared,
           cast(coalesce(h.n_shared, 0) as double) / t1.n_shingles as overlap_frac
    from tot t1
    join tot t2 on t1.source <> t2.source
    left join hits h on h.source_a = t1.source and h.source_b = t2.source
    """,
    tags=("dedup", "report", "curation"),
)
def report_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-pair shingle overlap fractions between document sources.

    100 TB shape: the corpus collapses FIRST to distinct
    (source, shingle-hash) pairs (map-side-combined distinct — the
    only pass that touches text), hot shingles past _SHINGLE_DF_CAP
    drop before the pair join (a stop-phrase shared by every source
    carries no overlap signal and is the only way this join grows
    superlinearly), and the matrix itself is |sources|² rows. The
    md5-60bit hash makes the whole report hash-checkable.
    Determinism: counts exact; one division per pair row.
    """
    w = Window.partitionBy("h")
    sh = (
        split_words(spark, sf)
        .join(
            t(spark, sf, "documents").select("doc_id", "source"), "doc_id"
        )
        .select("source", F.explode_outer(shingle_hashes_md5()).alias("h"))
        .where(F.col("h").isNotNull())
        .select("source", "h")
        .distinct()
        .withColumn("df", F.count(F.lit(1)).over(w))
        .where(F.col("df") <= _SHINGLE_DF_CAP)
        .select("source", "h")
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), F.col("h").alias("hb"))
    hits = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("source_a") != F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("h").cast("long").alias("n_shared"))
    )
    t1 = tot.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("n_shingles_a"))
    t2 = tot.select(F.col("source").alias("source_b"))
    return (
        t1.crossJoin(t2)
        .where(F.col("source_a") != F.col("source_b"))
        .join(hits, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_shingles_a",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (
                F.coalesce("n_shared", F.lit(0)).cast("double") / F.col("n_shingles_a")
            ).alias("overlap_frac"),
        )
    )


# N205: exact set-similarity join with PREFIX FILTERING (Chaudhuri et
# al. 2006 SSJoin / Xiao et al. 2008 PPJoin): every pair with Jaccard
# >= tau must share at least one token in its (n - ceil(tau*n) + 1)-
# token prefix under ANY global token order, so joining on prefix
# tokens alone is a LOSSLESS pruning — unlike the df-capped posting
# lists of dedup_ngram_jaccard (bounded-but-approximate), this is the
# exact all-pairs threshold join, and the oracle is the brute-force
# shingle self-join it must equal row for row.
_SETSIM_NUM, _SETSIM_DEN = 1, 2  # Jaccard >= 1/2


@query(
    "join_set_similarity",
    oracle=rf"""
    with sh as (
      select doc_id, unnest(list_distinct(
        list_transform(
          generate_series(1, greatest(len(regexp_split_to_array(text, '\s+')) - 2, 1)),
          i -> ('0x' || substr(md5(
                 array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')
               ), 1, 15))::bigint
        ))) as h
      from documents
    ),
    sizes as (select doc_id, count(*) as n from sh group by doc_id),
    pairs as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_common
      from sh a join sh b on a.h = b.h and a.doc_id < b.doc_id
      group by 1, 2
    )
    select p.doc_a, p.doc_b,
           cast(p.n_common as bigint) as n_common,
           cast(p.n_common as double) / (sa.n + sb.n - p.n_common) as jaccard
    from pairs p
      join sizes sa on p.doc_a = sa.doc_id
      join sizes sb on p.doc_b = sb.doc_id
    where {_SETSIM_DEN} * p.n_common >= {_SETSIM_NUM} * (sa.n + sb.n - p.n_common)
    """,
    tags=("join", "similarity", "prefix-filter", "dedup"),
)
def join_set_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """All document pairs with shingle Jaccard >= {num}/{den}, found
    EXACTLY via prefix filtering: tokens rank rarest-first (global
    (df, h) order), each doc keeps only its first n - ceil(tau*n) + 1
    tokens, and candidate pairs come from the PREFIX self-join — every
    qualifying pair provably shares a prefix token, so the verified
    output equals the brute-force join bit for bit.

    100 TB shape: the candidate join touches prefix tokens only
    (a (1-tau) fraction of the corpus, rarest tokens first — exactly
    the tokens with the SHORTEST posting lists, which is why
    rarest-first is the canonical order); intersection counting is
    candidate-driven (two narrow hash joins), never all-pairs; the
    threshold test is exact integer arithmetic ({den}*common >=
    {num}*union) with one final double division for the reported
    score. The per-doc ranking window partitions by doc_id — bounded
    by doc size, never corpus-mass.
    """.format(num=_SETSIM_NUM, den=_SETSIM_DEN)
    from pyspark.sql import Window

    # r14 (guide §2.4 — remove duplicated subtrees): the shingle-hash
    # relation feeds FIVE consumers (sizes, the df statistic, the
    # ranked prefix, and both sides of the intersection count); the
    # unshared subtree re-ran the split + md5 pass per consumer
    # (~0.4 s each at sf0.1). Materialize it once, spread across the
    # cores (the check-SF parquet is one row group, which would pin
    # every downstream consumer to one task), and hash-key the spread
    # by doc_id so the per-doc aggregate and the prefix window reuse
    # the partitioning. At 100 TB this is the inverted index every
    # prefix-filter system materializes before probing.
    sh = (
        split_words(spark, sf)
        .select("doc_id", F.explode_outer(shingle_hashes_md5()).alias("h"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .localCheckpoint(eager=True)
    )
    # r15 (guide §2.3 — shuffle keys and metadata, not exploded rows):
    # the per-doc shingle INVENTORY (sorted hash array + size) is the
    # verification payload, materialized once. The old verify stage
    # re-joined each candidate pair against the exploded shingle
    # relation TWICE and group-counted matches — 409k pairs x ~130
    # shingles/doc ≈ 53M rows through two keyed exchanges and a
    # pair-keyed aggregate (measured 2.8 s of the query's ~5 s at
    # sf0.1). PPJoin's verify step instead scores each candidate with
    # both token lists in hand: attach the two arrays by doc id and
    # count the overlap map-side — no per-shingle row ever leaves a
    # doc. n_common = |hs_a ∩ hs_b| equals the old join-count under
    # the md5-60bit injectivity the whole shingle family already
    # assumes (a within-doc hash collision would double-count in BOTH
    # the old shape and the DuckDB oracle identically — and would
    # break every other md5-keyed operator first).
    docs = (
        sh.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("h")).alias("hs"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .localCheckpoint(eager=True)  # eager-by-design: one row per doc; read by the rank join AND both verify sides
    )
    sizes = docs.select("doc_id", "n")
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("dfh"))
    w = Window.partitionBy("doc_id").orderBy("dfh", "h")
    ranked = (
        sh.join(dfreq, "h")
        .select("doc_id", "h", F.row_number().over(w).alias("rk"))
        .join(sizes, "doc_id")
    )
    # prefix length p = n - ceil(tau*n) + 1, ceil spelled in integers
    p = (
        F.col("n")
        - F.expr(f"(({_SETSIM_NUM} * n) + {_SETSIM_DEN} - 1) div {_SETSIM_DEN}")
        + 1
    )
    pref = ranked.where(F.col("rk") <= p).select("doc_id", "h")
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    da = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("n_a")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("n_b")
    )
    scored = (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("long").alias("n_common"),
            "n_a",
            "n_b",
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return scored.where(
        F.lit(_SETSIM_DEN) * F.col("n_common") >= F.lit(_SETSIM_NUM) * union
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        (F.col("n_common").cast("double") / union).alias("jaccard"),
    )


# N222: bounded set-similarity verification — the PRODUCTION half of
# the N205 story. join_set_similarity is the exact all-pairs threshold
# join (lossless prefix filter, brute-force oracle); its honest scale
# boundary (SCALE.md) is that a duplicate-saturated corpus makes the
# candidate set itself quadratic, because exactness over such input IS
# quadratic work. This operator pins the bounded contract in code: the
# candidate set comes from the df-capped MinHash-LSH bands (the
# dedup_near machinery — per-bucket cap, linear in corpus size BY
# CONSTRUCTION), and only those candidates are verified with the exact
# shingle-intersection Jaccard. Recall < 1 by design (exactly the LSH
# family's recall, gated by recall_dedup_near); per-pair verification
# cost is bounded by doc size. This is the verify stage every
# production near-dup pipeline runs between banding and clustering
# (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
# Better" — cluster on verified pairs, not raw band collisions).
@query(
    "join_set_similarity_verify",
    oracle=f"""
    with {_mh_sig_sql()},
    {_mh_bands_sql()},
    {_mh_post_sql()},
    cand as (
      select distinct a.doc_id as doc_a, b.doc_id as doc_b
      from post a join post b using (band_sig)
      where a.doc_id < b.doc_id
    ),
    sizes as (select doc_id, count(*) as n from hashed group by doc_id),
    common as (
      select c.doc_a, c.doc_b, count(*) as n_common
      from cand c
      join hashed x on x.doc_id = c.doc_a
      join hashed y on y.doc_id = c.doc_b and y.h = x.h
      group by 1, 2
    )
    select m.doc_a, m.doc_b,
           cast(m.n_common as bigint) as n_common,
           cast(m.n_common as double) / (sa.n + sb.n - m.n_common) as jaccard
    from common m
      join sizes sa on sa.doc_id = m.doc_a
      join sizes sb on sb.doc_id = m.doc_b
    where {_SETSIM_DEN} * m.n_common >= {_SETSIM_NUM} * (sa.n + sb.n - m.n_common)
    """,
    tags=("join", "similarity", "lsh", "dedup", "verify"),
)
def join_set_similarity_verify(spark: SparkSession, sf: str) -> DataFrame:
    """Document pairs with EXACT shingle Jaccard >= {num}/{den}, but
    candidates restricted to MinHash-LSH band collisions (df-capped) —
    the linear-scale production variant of :func:`join_set_similarity`.

    100 TB shape: candidate generation is the dedup_near pipeline
    minus the signatures (8-byte band keys through one capped window +
    collect_list exchange, pairs from sorted in-bucket suffix
    expansion — never a self-join); verification is candidate-driven
    (two narrow hash joins on doc_id against the shingle-hash
    relation), so total cost is O(corpus + |candidates| * doc_size).
    The est-Jaccard of dedup_near is replaced by the TRUE Jaccard here;
    downstream clustering (dedup_connected_lsh) can consume these
    verified edges unchanged.
    """.format(num=_SETSIM_NUM, den=_SETSIM_DEN)
    sig = _minhash_sig_cached(spark, sf)
    bands = _band_rows(sig.select("doc_id", "sig")).select("doc_id", "band", "band_sig")
    # narrow capped blocks: same window-cap + collect_list discipline
    # as _capped_band_blocks, but doc ids only — the verify stage
    # never needs the signatures, so the exchange carries 8-byte ids
    w = Window.partitionBy("band", "band_sig")
    blocks = (
        bands.withColumn("df", F.count(F.lit(1)).over(w))
        .where(F.col("df") <= _MH_BUCKET_CAP)
        .groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") >= 2)
    )
    cand = (
        blocks.select(F.posexplode("docs").alias("i", "doc_a"), "docs")
        .select(
            "doc_a",
            F.explode(F.slice("docs", F.col("i") + 2, F.size("docs"))).alias("doc_b"),
        )
        .distinct()
    )
    # r14: one materialized, core-spread shingle relation for the three
    # consumers (sizes + both intersection sides) — see
    # join_set_similarity for the rationale
    # r15: same PPJoin-style verify as join_set_similarity — the per-doc
    # sorted shingle array is the verification payload (one row per
    # doc), and each candidate pair scores map-side via array_intersect
    # instead of two candidate×shingle keyed exchanges plus a
    # pair-keyed aggregate. array_distinct in shingle_hashes_md5 makes
    # (doc_id, h) strictly unique, so |hs_a ∩ hs_b| == the old
    # join-count exactly. See join_set_similarity for the full note.
    docs = (
        split_words(spark, sf)
        .select("doc_id", F.explode_outer(shingle_hashes_md5()).alias("h"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("h")).alias("hs"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .localCheckpoint(eager=True)  # eager-by-design: one row per doc; read by both verify sides
    )
    da = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("n_a")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("n_b")
    )
    scored = (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("long").alias("n_common"),
            "n_a",
            "n_b",
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return scored.where(
        F.lit(_SETSIM_DEN) * F.col("n_common") >= F.lit(_SETSIM_NUM) * union
    ).select(
        "doc_a",
        "doc_b",
        "n_common",
        (F.col("n_common").cast("double") / union).alias("jaccard"),
    )
