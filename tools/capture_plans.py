"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
artifact: the judge reads these instead of running Spark).

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

With no query names, captures the full bench HEADLINE set. Example:
    python tools/capture_plans.py r14 before
    python tools/capture_plans.py r14 after q9_product_profit
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from parquet_processor_spark.registry import all_queries  # noqa: E402
from parquet_processor_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
