"""Duplicate-SPARSE replicated documents fixture — the N222 linearity
contract's input (SCALE.md "join_set_similarity_verify on
duplicate-SPARSE decades").

Replicate a documents table R times with every word prefixed by a
per-replica token (`r{i}` namespaces), so NO shingle survives across
replicas: the corpus grows a decade per tier while the per-replica
true-pair structure stays constant. This is the regime the bounded
candidate-generation contract targets (discovery dedup has already
collapsed dense clusters), so verified pairs must scale EXACTLY with
the replica count.

Formerly an ad-hoc /tmp recipe in SCALE.md; now shared by the x10/x100
soak and the CI linearity pytest
(tests/test_dedup_vector.py::test_set_similarity_verify_pairs_linear_on_dup_sparse).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_dup_sparse(
    spark: SparkSession,
    src_sf: str,
    dst_dir: str,
    replicas: int,
    id_offset: int = 10_000_000,
) -> str:
    """Write ``dst_dir/documents.parquet`` = ``src_sf`` documents
    replicated ``replicas`` times under disjoint doc-id ranges and
    disjoint per-replica word namespaces. Returns ``dst_dir`` (usable
    as an sf dir by any documents-only query)."""
    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    out: DataFrame | None = None
    for i in range(replicas):
        part = docs.select(
            (F.col("doc_id") + F.lit(i * id_offset)).cast("long").alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        out = part if out is None else out.unionByName(part)
    assert out is not None, "replicas must be >= 1"
    out.write.mode("overwrite").parquet(os.path.join(dst_dir, "documents.parquet"))
    return dst_dir
