"""Time individual registered queries with the bench methodology
(noop sink, warm pass first, median of N) — the per-query iteration
loop for optimization work without running the whole bench.

Usage:
    python tools/time_query.py [-n PASSES] <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_processor_spark.registry import all_queries  # noqa: E402
from parquet_processor_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run_once(name: str, d: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args:
        spark.sparkContext.setJobDescription(name)
        run_once(name, warm_dir)  # codegen warm-up
        run_once(name, sf_dir)  # target-SF warm pass
        ts = [run_once(name, sf_dir) for _ in range(n)]
        s = sorted(ts)
        med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
        print(
            f"{name:36s} med={med:7.3f}  min={min(ts):7.3f}  max={max(ts):7.3f}  "
            f"all={[round(x, 3) for x in ts]}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
