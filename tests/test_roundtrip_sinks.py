

def test_targeted_delete_audit_is_internally_consistent(spark, sf_dir):
    # N168: the right-to-be-forgotten rewrite must (a) delete every
    # target row (zero visible after — verified by the op's own
    # re-read), (b) leave every untouched partition's file listing
    # byte-stable, and (c) keep the count ledger additive.
    from parquet_processor_spark.registry import all_queries

    r = all_queries()["sink_targeted_delete"](spark, sf_dir).collect()[0]
    assert r["targets_remaining"] == 0
    assert r["untouched_intact"] is True
    assert r["rows_after"] == r["rows_before"] - r["rows_deleted"]
    assert r["rows_deleted"] > 0  # the md5 sample picks ~1% of customers
    assert 0 < r["n_partitions_rewritten"] <= r["n_partitions"]


def test_targeted_delete_empty_table_is_vacuous(spark, tmp_path):
    from parquet_processor_spark.registry import all_queries
    from parquet_processor_spark.tables import TABLES, t as _t

    d = tmp_path / "empty"
    d.mkdir()
    for tab in TABLES:
        _t(spark, "/root/testdata/sf0.001", tab).limit(0).write.mode("overwrite").parquet(
            str(d / f"{tab}.parquet")
        )
    r = all_queries()["sink_targeted_delete"](spark, str(d)).collect()[0]
    assert r["rows_before"] == 0 and r["untouched_intact"] is True
