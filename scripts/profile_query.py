#!/usr/bin/env python
"""Per-query optimization profiler (guide §1): time a named registry
query in isolation with the same methodology as bench.py (collect(),
cache-clear between runs), plus:

  * min/median of N runs,
  * Spark job count attributed via setJobGroup (driver-side loops and
    hidden actions show up as job count, not just wall),
  * optional `.explain("formatted")` dump to plans/r12/<q>_<tag>.txt,
  * optional noop-sink timing (--noop) to exclude driver collect cost.

Usage:
  python scripts/profile_query.py q_foo q_bar --runs 3 --plan before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dumpty_spark.queries import REGISTRY  # noqa: E402
from dumpty_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan", default=None, help="tag: write plans/r12/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="time noop sink instead of collect")
    ap.add_argument("--warm-caches", action="store_true",
                    help="prebuild shared caches first (bench-equivalent warm state)")
    args = ap.parse_args()

    spark = get_session("dumpty-spark-profile")
    sc = spark.sparkContext

    # warmup identical to bench.py
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        REGISTRY["q01_pricing_summary"].fn(spark, warm_dir).collect()
        REGISTRY["q_pandas_scalar_udf"].fn(spark, warm_dir).collect()
    if args.warm_caches:
        import bench
        bench.prebuild_shared_caches(spark, args.sf_dir)

    results = {}
    for name in args.names:
        spec = REGISTRY[name]
        if args.plan:
            os.makedirs("plans/r12", exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            plan_txt = df._jdf.queryExecution().explainString(
                sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r12/{name}_{args.plan}.txt", "w") as fh:
                fh.write(plan_txt)
            spark.catalog.clearCache()
        times = []
        jobs = []
        for i in range(args.runs):
            sc.setJobGroup(f"prof:{name}:{i}", name)
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.perf_counter() - t0, 4))
            ids = sc.statusTracker().getJobIdsForGroup(f"prof:{name}:{i}")
            jobs.append(len(ids))
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
            sc._jvm.System.gc()
        results[name] = {"times": times, "min": min(times), "jobs": jobs}
        print(f"{name}: min {min(times):.3f}s runs {times} jobs {jobs}", file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
