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
