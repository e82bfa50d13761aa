"""Round-6 diagnosis of the r05 `pipeline_gold` bench regression
(8.48 s r04 -> 20.35 s r05 min-of-2 at sf0.1, pipeline.py unchanged).

Two hypotheses from VERDICT.md r5:
  (a) host I/O noise that min-of-2 failed to damp;
  (b) state accumulated by the much heavier r5 query suite that runs
      BEFORE the pipeline inside bench.py (JVM old-gen pressure, shuffle
      spill files, page-cache eviction) — the session pins themselves were
      test-only and identical to r4.

Protocol: 5 cold-ish runs of the medallion pipeline in a fresh session
(nothing else executed first), then 5 runs after a heavy prefix that
replays the expensive bench queries. Prints one short JSON line per run
and a final summary with mean/min/max/stdev per condition.

Usage: python tools/diagnose_gold.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_elt_pipeline_spark import pipeline as P  # noqa: E402
from big_data_elt_pipeline_spark.session import get_spark  # noqa: E402
from big_data_elt_pipeline_spark.sources import tpch  # noqa: E402

HEAVY_PREFIX = [
    "dedup_minhash", "dedup_clusters", "dedup_incremental_minhash",
    "dedup_winnow", "training_mixture", "ann_topk", "tpch_q18", "tpch_q5",
]


def run_pipeline_once(spark, sf_dir: str, tag: str, run: int) -> dict[str, float]:
    tmp = tempfile.mkdtemp(prefix="diag_lake_")
    try:
        clients = tpch.clients_df(spark, sf_dir)
        achats = tpch.achats_df(spark, sf_dir)
        clients.write.mode("overwrite").option("header", True).csv(f"{tmp}/sources/clients.csv")
        (achats.write.mode("overwrite").option("header", True)
         .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
         .csv(f"{tmp}/sources/achats.csv"))
        result = P.run_medallion(
            spark, f"{tmp}/sources", f"{tmp}/lake",
            min_date="1990-01-01", max_amount=1e9, count_rows=False,
        )
        secs = result["seconds"]
        print(json.dumps({"cond": tag, "run": run, **secs}), flush=True)
        return secs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("diagnose_gold")

    fresh = [run_pipeline_once(spark, sf_dir, "fresh", i)["gold"] for i in range(5)]

    from big_data_elt_pipeline_spark.plans import queries as Q
    registry = Q.spark_queries()
    t0 = time.perf_counter()
    for name in HEAVY_PREFIX:
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(json.dumps({"cond": "prefix", "sec": round(time.perf_counter() - t0, 2)}),
          flush=True)

    after = [run_pipeline_once(spark, sf_dir, "after_suite", i)["gold"] for i in range(5)]

    def stats(xs):
        return {"min": round(min(xs), 2), "max": round(max(xs), 2),
                "mean": round(statistics.mean(xs), 2),
                "stdev": round(statistics.stdev(xs), 2)}

    print(json.dumps({"gold_fresh": stats(fresh), "gold_after_suite": stats(after)}),
          flush=True)


if __name__ == "__main__":
    main()
