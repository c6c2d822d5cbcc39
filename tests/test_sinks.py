"""Sink-protocol contract tests: crash behavior of the versioned
snapshot commit (the pointer-file protocol sink_versioned_snapshots
publishes with) and the training-shard layout contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parquet_processor_spark.ops.roundtrip import (
    current_snapshot_version,
    publish_snapshot,
)
from parquet_processor_spark.tables import t

from .conftest import SF_SMALL


def test_crashed_writer_never_tears_the_current_snapshot(spark, tmp_path):
    # A writer that dies AFTER writing snap-3/ but BEFORE flipping the
    # pointer must leave readers on a complete version 2 — the whole
    # point of flipping the pointer last.
    root = str(tmp_path)
    orders = t(spark, SF_SMALL, "orders")
    publish_snapshot(orders.limit(10), root, 1)
    publish_snapshot(orders.limit(25), root, 2)
    # simulate the crash: data written, pointer flip never happened
    orders.limit(40).write.mode("overwrite").parquet(os.path.join(root, "snap-3"))
    assert current_snapshot_version(root) == 2
    cur = spark.read.parquet(os.path.join(root, f"snap-{current_snapshot_version(root)}"))
    assert cur.count() == 25
    # time travel to v1 still works; the stranded v3 dir is vacuumable
    assert spark.read.parquet(os.path.join(root, "snap-1")).count() == 10


def test_crashed_pointer_tmp_is_ignored(spark, tmp_path):
    # A crash BETWEEN writing _CURRENT.tmp and os.replace leaves the
    # tmp file behind; readers must still resolve the committed pointer.
    root = str(tmp_path)
    orders = t(spark, SF_SMALL, "orders")
    publish_snapshot(orders.limit(10), root, 1)
    with open(os.path.join(root, "_CURRENT.tmp"), "w") as fh:
        fh.write("9")  # torn writer's leftover
    assert current_snapshot_version(root) == 1


def test_shard_assignment_is_a_pure_function_of_doc_id(spark):
    # Re-running the shard query must produce the identical manifest —
    # no rand(), no partition-count dependence.
    from parquet_processor_spark.registry import all_queries

    q = all_queries()["sink_training_shards"]
    a = {r["shard"]: (r["n_docs"], r["min_hash"], r["first_doc"]) for r in q(spark, SF_SMALL).collect()}
    b = {r["shard"]: (r["n_docs"], r["min_hash"], r["first_doc"]) for r in q(spark, SF_SMALL).collect()}
    assert a == b and len(a) == 16
