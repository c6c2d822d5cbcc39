"""Exact distributed ntile without a global sort — the binned
integer-rank algebra behind the model-eval / corpus-bucketing family
(agg_auc, agg_calibration, agg_decile_lift, quality_ccnet_buckets).

``ntile(K) over (order by ...)`` with an empty partition spec compiles
to ONE task sorting the whole spine — fine on a collapsed value domain,
a straggler/OOM when the spine is entity- or corpus-mass (1e8+ rows at
100 TB). This module replaces that plan with exact multi-level rank
SELECTION (the classic distributed order-statistics recipe):

  1. a DATA-INDEPENDENT order-preserving log-bucket histogram over the
     key narrows each ntile boundary rank to one bucket (+ residual
     rank) in a single map-side-combined pass — no separate min/max
     job, and the histogram doubles as the COUNT(*) job;
  2. boundary buckets holding several distinct key values narrow once
     more through fixed-width sub-bins (bucket range known from pass
     1), then collapse to exact per-key classes — the class window
     runs per sub-bin, bounded by the sub-bin's class count;
  3. ties are split by the unique id: an id-range histogram within the
     boundary class, then a row_number over the single narrowed
     (class, id-bin) cell — partition size ~ class/|bins|.

The K-1 cut rows that come back are catalog state (driver-side list,
eager by design) feeding a LITERAL comparison expression, so bin
assignment happens in whole-stage codegen beside the scan with zero
extra shuffles, and the per-bin aggregate is map-side combined. Every
level's shuffle is bounded by populated-bucket counts — nothing
entity-mass ever funnels through one task. Integer-score spines
(view counts, ratings) resolve in 1-3 small jobs because small ints
occupy distinct log-buckets; double-score spines add the sub-bin
round.

The log-bucket uses log2 — a transcendental, which this repo bans
from ORACLE-CHECKED values — but here it only PARTITIONS the order:
monotonicity survives float error because the mantissa step is
clamped to [32, 63] (an off-by-one exponent merges two adjacent
buckets instead of reordering them), and the exact math all happens
on the integer counts and exact key values collected from the
histogram. Cross-engine agreement is not required for internal
narrowing — only for the final cut rows, which are exact row values.

Exactness: bin membership is a pure function of the row's position in
the total order (nf, okey, oid) — nf (0/1) encodes NULLS LAST, okey is
the (possibly negated, for DESC) sort key, oid a unique tiebreaker —
and the cut at ntile boundary rank B_k is the exact (nf, okey, oid) of
the row AT that rank, so ``1 + sum_k [row > cut_k]`` reproduces
ntile(K)'s assignment bit-for-bit, ties and short inputs included.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ntile_boundary_ranks(n: int, n_bins: int) -> list[int]:
    """The global 1-based rank of the LAST row of each of the first
    n_bins-1 ntile bins (Spark/DuckDB semantics: first n % n_bins bins
    get one extra row). Duplicates appear when n < n_bins (empty tail
    bins) — keep them: the assignment sum needs all K-1 cuts."""
    base, rem = divmod(n, n_bins)
    return [base * k + min(k, rem) for k in range(1, n_bins)]


def _or(conds: list[Column]) -> Column:
    return reduce(lambda a, b: a | b, conds)


def log_bucket(okey: Column) -> Column:
    """Order-preserving data-independent bucket id for a double key:
    signed (exponent, 5-bit mantissa slice). Clamping m to [32, 63]
    makes the mapping monotone NON-DECREASING even when floor(log2)
    rounds across a power-of-two boundary (adjacent buckets merge,
    never reorder). Positive keys land in [832, ~68k], negatives in
    the mirrored negative range, zero at 0."""
    a = F.abs(okey)
    e = F.floor(F.log2(a))
    m = F.greatest(F.lit(32), F.least(F.lit(63), F.floor(a / F.pow(F.lit(2.0), e) * 32)))
    mag = ((e + 1100) * 32 + m).cast("long")
    return (
        F.when(okey == 0, F.lit(0))
        .when(okey > 0, mag)
        .otherwise(-mag)
        .cast("long")
    )


def _resolve(
    cuts: dict,
    tie_classes: dict,
    tr: int,
    rr: int,
    row,
) -> None:
    """A boundary rank has narrowed to one exact (nf, okey) class with
    residual rr: residual 1 / cnt short-circuit to the class's min /
    max oid; interior residuals queue for the level-3 tie split."""
    key = (int(row["nf"]), float(row["k_lo"]))
    if rr <= 1:
        cuts[tr] = (key[0], key[1], int(row["o_lo"]))
    elif rr == int(row["cnt"]):
        cuts[tr] = (key[0], key[1], int(row["o_hi"]))
    else:
        ent = tie_classes.setdefault(
            key,
            {
                "ci": len(tie_classes),
                "lo": int(row["o_lo"]),
                "hi": int(row["o_hi"]),
                "targets": [],
            },
        )
        ent["targets"].append((tr, rr))


def exact_ntile_cuts(
    spine: DataFrame, n_bins: int, num_buckets: int = 4096
) -> list[tuple[int, float, int]]:
    """Exact ntile(n_bins) cut rows over ``spine`` ordered by
    (nf ASC, okey ASC, oid ASC).

    spine columns: ``nf`` int (0 = normal, 1 = sorts last — the NULLS
    LAST class; okey must be non-null, callers fill 0.0), ``okey``
    double (negate for DESC), ``oid`` long (unique tiebreaker).

    Returns [(nf, okey, oid)] * (n_bins - 1): element k-1 is the exact
    row at ntile boundary rank B_k. Empty spine -> []. The selection
    jobs collect only histogram/control rows, never data rows in bulk.
    Callers should pass a localCheckpoint()ed spine: the narrowing
    runs 1-3 small jobs over it (histogram; fused
    sub-bin+class refine for double keys; fused tie split).
    """
    lb = log_bucket(F.col("okey"))
    agg_cols = [
        F.count(F.lit(1)).alias("cnt"),
        F.min("okey").alias("k_lo"),
        F.max("okey").alias("k_hi"),
        F.min("oid").alias("o_lo"),
        F.max("oid").alias("o_hi"),
    ]
    # Pass 1: log-bucket histogram — one map-side-combined aggregate,
    # doubles as the COUNT(*) pass (no separate stats job).
    hist = sorted(
        ((int(r["nf"]), int(r["b"])), r)
        for r in spine.groupBy("nf", lb.alias("b"))
        .agg(*agg_cols)
        .collect()  # eager-by-design: populated log-bucket control rows
    )
    n = sum(int(r["cnt"]) for _, r in hist)
    if n == 0:
        return []
    ranks = ntile_boundary_ranks(n, n_bins)
    targets = sorted({r for r in ranks if r > 0})
    if not targets:
        return []

    # Walk the histogram once: (target_rank, bucket_row, residual).
    located: list[tuple[int, object, int]] = []
    cum = 0
    it = iter(hist)
    (_, row), c = (nxt := next(it)), int(nxt[1]["cnt"])
    for tr in targets:
        while cum + c < tr:
            cum += c
            (_, row), c = (nxt := next(it)), int(nxt[1]["cnt"])
        located.append((tr, row, tr - cum))

    cuts: dict[int, tuple[int, float, int]] = {}
    tie_classes: dict[tuple[int, float], dict] = {}
    # Buckets that hold a single exact key value resolve immediately;
    # multi-value buckets queue for the sub-bin refinement round.
    refine: list[tuple[int, object, int]] = []
    for tr, row, rr in located:
        if row["k_lo"] == row["k_hi"]:
            _resolve(cuts, tie_classes, tr, rr, row)
        else:
            refine.append((tr, row, rr))

    if refine:
        # Pass 2a: fixed-width sub-bins inside each multi-value boundary
        # bucket (range known from pass 1), tagged with the bucket's
        # refine index so same-nf buckets can't collide. One histogram
        # job (<= |refine buckets| * num_buckets control rows).
        buckets: list[tuple[object, float, float]] = []
        seen: set[tuple[int, float, float]] = set()
        for tr, row, rr in refine:
            k = (int(row["nf"]), float(row["k_lo"]), float(row["k_hi"]))
            if k not in seen:
                seen.add(k)
                buckets.append((row, k[1], k[2]))
        bi_expr, sb_expr = None, None
        for bi, (row, blo, bhi) in enumerate(buckets):
            cond = (
                (F.col("nf") == int(row["nf"]))
                & (F.col("okey") >= blo)
                & (F.col("okey") <= bhi)
            )
            e = F.least(
                F.floor((F.col("okey") - F.lit(blo)) / F.lit(bhi - blo) * num_buckets),
                F.lit(num_buckets - 1),
            )
            bi_expr = F.when(cond, bi) if bi_expr is None else bi_expr.when(cond, bi)
            sb_expr = F.when(cond, e) if sb_expr is None else sb_expr.when(cond, e)
        tagged = (
            spine.withColumn("_bi", bi_expr)
            .where(F.col("_bi").isNotNull())
            .withColumn("_sb", sb_expr.cast("int"))
        )
        # ONE fused job: sub-bin totals (tiny, cum per bucket) broadcast
        # back onto the exact per-key class rollup, so a class's
        # BUCKET-relative start = sub-bin cum + in-sub-bin class cum and
        # the boundary class filters directly against the literal
        # residual. The class window runs PER (bucket, sub-bin) —
        # partition bounded by the sub-bin's class count.
        wsb = (
            Window.partitionBy("_bi")
            .orderBy("_sb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        sbh = (
            tagged.groupBy("_bi", "_sb")
            .agg(F.count(F.lit(1)).alias("_sbc"))
            .withColumn("sb_cum", F.coalesce(F.sum("_sbc").over(wsb), F.lit(0)))
            .drop("_sbc")
        )
        wc = (
            Window.partitionBy("_bi", "_sb")
            .orderBy("okey")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cls = (
            tagged.groupBy("nf", "_bi", "_sb", "okey")
            .agg(*agg_cols)
            .withColumn("c_cum", F.coalesce(F.sum("cnt").over(wc), F.lit(0)))
            .join(F.broadcast(sbh), ["_bi", "_sb"])
            .withColumn("cum", F.col("sb_cum") + F.col("c_cum"))
        )
        bi_of = {
            (int(r["nf"]), float(r["k_lo"]), float(r["k_hi"])): bi
            for bi, (r, _lo, _hi) in enumerate(buckets)
        }
        sel = cls.where(
            _or(
                [
                    (F.col("_bi") == bi_of[(int(row["nf"]), float(row["k_lo"]), float(row["k_hi"]))])
                    & (F.col("cum") < rr)
                    & (rr <= F.col("cum") + F.col("cnt"))
                    for tr, row, rr in refine
                ]
            )
        ).collect()  # eager-by-design: one boundary-class row per refine target
        for tr, row, rr in refine:
            bi = bi_of[(int(row["nf"]), float(row["k_lo"]), float(row["k_hi"]))]
            x = next(
                y
                for y in sel
                if int(y["_bi"]) == bi
                and int(y["cum"]) < rr <= int(y["cum"]) + int(y["cnt"])
            )
            _resolve(cuts, tie_classes, tr, rr - int(x["cum"]), x)

    if tie_classes:
        # Pass 3: split each tie class by oid — id-range histogram per
        # class, then an exact rank over the narrowed (class, id-bin)
        # cells (partition ~ class/num_buckets rows each).
        ci_expr, ob_expr = None, None
        for (nf_v, ok_v), ent in tie_classes.items():
            cond = (F.col("nf") == nf_v) & (F.col("okey") == ok_v)
            e = F.floor(
                (F.col("oid") - ent["lo"])
                * F.lit(num_buckets)
                / F.lit(ent["hi"] - ent["lo"] + 1)
            )
            ci_expr = F.when(cond, ent["ci"]) if ci_expr is None else ci_expr.when(cond, ent["ci"])
            ob_expr = F.when(cond, e) if ob_expr is None else ob_expr.when(cond, e)
        tagged = (
            spine.withColumn("_ci", ci_expr)
            .where(F.col("_ci").isNotNull())
            .withColumn("_ob", ob_expr.cast("int"))
        )
        # ONE fused job: per-(class, id-bin) totals (tiny, cum per
        # class) broadcast back onto the rows, so a row's CLASS-
        # relative rank = bin cum + row_number within its bin and the
        # cut row filters directly against the literal residual. The
        # row_number window runs per (class, id-bin) — partition
        # ~ class/num_buckets rows.
        wo = (
            Window.partitionBy("_ci")
            .orderBy("_ob")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        oh = (
            tagged.groupBy("_ci", "_ob")
            .agg(F.count(F.lit(1)).alias("_obc"))
            .withColumn("cum", F.coalesce(F.sum("_obc").over(wo), F.lit(0)))
            .drop("_obc")
        )
        all_rr = [
            (ent["ci"], rr) for ent in tie_classes.values() for _, rr in ent["targets"]
        ]
        wr = Window.partitionBy("_ci", "_ob").orderBy("oid")
        rows = (
            tagged.join(F.broadcast(oh), ["_ci", "_ob"])
            .withColumn("_rk", F.col("cum") + F.row_number().over(wr))
            .where(_or([(F.col("_ci") == ci) & (F.col("_rk") == rr) for ci, rr in all_rr]))
            .select("_ci", "_rk", "oid")
            .collect()  # eager-by-design: exactly one row per tie boundary
        )
        oid_at = {(int(r["_ci"]), int(r["_rk"])): int(r["oid"]) for r in rows}
        by_ci = {ent["ci"]: key for key, ent in tie_classes.items()}
        for ent in tie_classes.values():
            nf_v, ok_v = by_ci[ent["ci"]]
            for tr, rr in ent["targets"]:
                cuts[tr] = (nf_v, ok_v, oid_at[(ent["ci"], rr)])

    return [cuts[r] for r in ranks]


def ntile_assign(
    cuts: list[tuple[int, float, int]],
    nf: Column,
    okey: Column,
    oid: Column,
) -> Column:
    """Bin id (1-based int) from the literal cut list: 1 + number of
    cuts STRICTLY below this row in (nf, okey, oid) order. Pure
    codegen beside the scan — no join, no shuffle, no window."""
    b: Column = F.lit(1)
    for cnf, cok, cid in cuts:
        gt = (nf > F.lit(cnf)) | (
            (nf == F.lit(cnf))
            & ((okey > F.lit(cok)) | ((okey == F.lit(cok)) & (oid > F.lit(cid))))
        )
        b = b + F.when(gt, 1).otherwise(0)
    return b.cast("int")
