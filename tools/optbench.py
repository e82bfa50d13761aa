"""Per-query optimization measurement harness (r14 optimization round).

For each named query: time fn(spark, sf_dir) construction (which includes
any eager actions the builder fires — threshold collects, ml fits,
checkpoints) separately from the final noop-sink execution (guide §1.4),
and optionally dump .explain("formatted") to a file.

Usage:
    python tools/optbench.py q1 q2 ...            # time construction+exec
    python tools/optbench.py --plans DIR q1 ...   # also write DIR/<q>.txt
    python tools/optbench.py --passes 2 q1 ...    # min over N passes
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from big_data_elt_pipeline_spark.plans import queries as Q
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("optbench")
    registry = Q.spark_queries()
    # warm JVM + parquet footers
    registry["kpis"](spark, args.sf_dir).collect()
    jsc = spark.sparkContext._jsc

    for name in args.queries:
        fn = registry[name]
        best = None
        for p in range(args.passes):
            pinned_before = set(jsc.getPersistentRDDs().keySet().toArray())
            spark.sparkContext.setJobDescription(f"{name}#p{p}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if args.plans and p == 0:
                os.makedirs(args.plans, exist_ok=True)
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            reg = jsc.getPersistentRDDs()
            for rid in set(reg.keySet().toArray()) - pinned_before:
                rdd = reg.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)
            spark.catalog.clearCache()
            cur = (t1 - t0, t2 - t1, t2 - t0)
            print(f"{name} pass{p}: build={cur[0]:.2f}s exec={cur[1]:.2f}s "
                  f"total={cur[2]:.2f}s", flush=True)
            if best is None or cur[2] < best[2]:
                best = cur
        print(f"{name} BEST: build={best[0]:.2f}s exec={best[1]:.2f}s "
              f"total={best[2]:.2f}s", flush=True)


if __name__ == "__main__":
    main()
