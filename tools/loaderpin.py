"""Standalone runner for the training-loader scale pin -> LOADERPIN.json.

The loader chain (shard export -> pruned read -> token-level sequence
packing -> per-epoch order) rides the 256-bucket two-level prefix sum;
this records the machine-checkable evidence next to KNNPIN/IVFPIN: wall
for 4x the corpus stays ~linear for both ``pack_sequences`` and
``epoch_shuffle`` while the audit shows the single global window's
fan-in flat at <= 256 rows at every factor.

Usage: python tools/loaderpin.py [--factors 16,64] [--sf /root/testdata/sf0.1]
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
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "LOADERPIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import loader_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("loaderpin")
    t0 = time.time()
    pts = loader_scale_pin(spark, args.sf, factors=factors,
                           progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    # claim derived from the measured points (the ivfpin discipline:
    # re-running never overwrites the quantitative story)
    f1, f2 = factors[0], factors[-1]
    fx = f2 // f1
    r1, r2 = pts.get(f"loaderpin_x{f1}_rows"), pts.get(f"loaderpin_x{f2}_rows")
    claim = f"~linear loader chain: {fx}x corpus ({r1:.0f} -> {r2:.0f} rows)"
    for name in ("pack", "epoch"):
        w1, w2 = pts.get(f"loaderpin_{name}_x{f1}"), pts.get(f"loaderpin_{name}_x{f2}")
        if w1 and w2:
            claim += f"; {name} wall {w2 / w1:.2f}x"
    b1, b2 = (pts.get(f"loaderpin_x{f1}_window_rows"),
              pts.get(f"loaderpin_x{f2}_window_rows"))
    if b1 and b2:
        claim += (f"; global-window fan-in flat at {b1:.0f} -> {b2:.0f} rows "
                  "(<= 256 buckets by construction — the only "
                  "non-distributed step never grows with the corpus)")

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = -1.0
    doc = {
        "what": ("pack_sequences / epoch_shuffle wall seconds on the "
                 "scaled documents corpus; *_window_rows audits the "
                 "256-bucket prefix sum's global fan-in, *_out_rows the "
                 "operator fan-out"),
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
