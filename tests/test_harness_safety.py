"""Harness-safety gate: external correctness harnesses canonicalize
query results with pandas sorts/hashes, where an array/map cell is
unhashable (`TypeError: unhashable type: 'list'`) and a struct cell
renders engine-specifically (Row vs dict). Every registered query must
therefore emit only scalar (atomic or binary) top-level columns —
serialize (to_json / concat_ws) or explode anything nested.
"""

from __future__ import annotations

COMPLEX = ("array", "map", "struct")


def test_no_query_emits_complex_typed_columns(spark, sf_dir):
    from parquet_processor_spark.registry import all_queries

    offenders = {}
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.typeName() in COMPLEX
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"queries emitting complex-typed columns: {offenders}"


def test_check_priority_names_are_registered():
    from parquet_processor_spark.registry import _CHECK_PRIORITY, all_queries

    names = all_queries()
    assert len(set(_CHECK_PRIORITY)) == len(_CHECK_PRIORITY), "duplicate priority entries"
    missing = [n for n in _CHECK_PRIORITY if n not in names]
    assert not missing, f"priority list names unknown queries: {missing}"
    # the catalog must actually lead with the priority list
    assert list(names)[: len(_CHECK_PRIORITY)] == list(_CHECK_PRIORITY)
