"""Standalone runner for the BM25 build/probe scale pin -> BM25PIN.json.

The r13 persisted text index (operators/text_index.py) exists because
the ad-hoc ``bm25_topk`` recomputes tf/df/avgdl from the full corpus on
every call — the per-call serving bug IVFPIN.json documented for
vectors. This records the machine-checkable evidence next to
IVFPIN.json: the ad-hoc wall tracks the corpus while the stored-index
probe tracks the (constant) candidate set, with the postings
file-skipping audit showing why.

Usage: python tools/bm25pin.py [--factors 16,64] [--sf /root/testdata/sf0.1]
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
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BM25PIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import bm25_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("bm25pin")
    t0 = time.time()
    pts = bm25_scale_pin(spark, args.sf, factors=factors,
                         progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = -1.0
    # derive the claim from the measured points (the ivfpin discipline) so
    # a re-run preserves the quantitative story instead of hand-edits
    f1, f2 = factors[0], factors[-1]
    fx = f2 // f1
    claim = f"{fx}x corpus:"
    a1, a2 = pts.get(f"bm25pin_adhoc_x{f1}"), pts.get(f"bm25pin_adhoc_x{f2}")
    if a1 and a2:
        claim += f" ad-hoc bm25_topk wall {a2 / a1:.2f}x (corpus-tracking)"
    p1, p2 = pts.get(f"bm25pin_probe_x{f1}"), pts.get(f"bm25pin_probe_x{f2}")
    if p1 and p2:
        claim += f"; stored-index probe {p2 / p1:.2f}x"
        if a2:
            claim += f" = {p2 / a2:.0%} of the one-shot wall per query batch"
    k2, t2 = pts.get(f"bm25pin_x{f2}_kept_files"), pts.get(f"bm25pin_x{f2}_total_files")
    if k2 is not None and t2:
        claim += (f"; term-range stats keep {k2:.0f}/{t2:.0f} postings "
                  f"files for the probe vocabulary at x{f2}")
    b2 = pts.get(f"bm25pin_build_x{f2}")
    if b2 is not None:
        claim += (f"; the {b2:.0f}s build is the one-time price the index "
                  "amortizes (operators/text_index)")
    doc = {
        "what": ("bm25_topk (ad-hoc, full corpus-stats recompute per call) "
                 "vs build_text_index + bm25_index_probe wall seconds on "
                 "the salted scaled corpus; *_kept/_total_files audit the "
                 "manifest term-range file skipping the clustered layout "
                 "buys"),
        "claim": claim,
        "sf_dir": args.sf,
        "factors": list(factors),
        "points": pts,
        "elapsed_s": round(time.time() - t0, 1),
        "host_load1": load1,
        "measurement": "min of 2 after one untimed warm-up at the first factor",
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
