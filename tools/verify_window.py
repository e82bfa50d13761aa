"""Driver-style differential simulation of the registered queries.

Runs each query on a BARE local[32] session (the driver passes its own
unconfigured session — session.py's tuning must never be load-bearing
for correctness) and compares against its DuckDB oracle with the exact
harness the tests use. Default scope is the 50-slot gate window (what
CORRECTNESS_r{N}.json will grade); ``--all`` sweeps the whole registry
(the end-of-round insurance run).

Usage:
    python tools/verify_window.py [--sf /root/testdata/sf0.01] [--all]
    python tools/verify_window.py --names stream_ann_probe,ann_index_audit

Exit code 0 iff every checked query is green (oracle-exact, or executed
with rows >= 0 for documented rows-only queries).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="sweep the full registry, not just the gate window")
    ap.add_argument("--names", default="",
                    help="comma-separated subset to check")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    from big_data_elt_pipeline_spark.plans import queries as Q
    from big_data_elt_pipeline_spark.plans.compare import (
        diff_frames,
        duckdb_connection,
    )

    con = duckdb_connection(args.sf)
    registry = Q.spark_queries()
    if args.names:
        names = [n for n in args.names.split(",") if n]
    else:
        names = list(registry)
        if not args.all:
            names = names[:Q.GATE_LIMIT]
    bad = 0
    t0 = time.time()
    for i, name in enumerate(names):
        sql = Q.oracle_queries().get(name)
        try:
            spdf = registry[name](spark, args.sf).toPandas()
            if sql is None:
                print(f"{i + 1}/{len(names)} {name}: ROWS-ONLY rows={len(spdf)}",
                      flush=True)
                continue
            problems = diff_frames(spdf, con.execute(sql).fetchdf())
            if problems:
                bad += 1
            print(f"{i + 1}/{len(names)} {name}: "
                  f"{'OK' if not problems else 'FAIL ' + ' | '.join(problems)}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — a crashed query is a red row
            bad += 1
            print(f"{i + 1}/{len(names)} {name}: ERR {type(ex).__name__}: {ex}",
                  flush=True)
    print(f"DONE n={len(names)} bad={bad} elapsed={time.time() - t0:.0f}s",
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
