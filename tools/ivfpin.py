"""Standalone runner for the IVF auto-cells scale pin -> IVFPIN.json.

The r11 auto_cells change derives the IVF coarse-quantizer cell count
from the corpus (sqrt balance); this records the machine-checkable
evidence next to KNNPIN.json: wall time for 4x the corpus at the AUTO
default stays ~linear while the artifact shows the derived count and
the probed-row audit turning with the corpus.

Usage: python tools/ivfpin.py [--factors 64,256] [--sf /root/testdata/sf0.1]
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
    ap.add_argument("--factors", default="64,256")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "IVFPIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import ivf_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("ivfpin")
    t0 = time.time()
    pts = ivf_scale_pin(spark, args.sf, factors=factors,
                        progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = -1.0
    # derive the claim from the measured points so a re-run preserves the
    # quantitative story instead of overwriting hand-edits (r11 advice):
    # the probed-row ratio, the one-shot wall ratio with its cells-
    # doubling attribution when the power-of-two boundary was crossed,
    # and the build/probe split the persisted index buys
    f1, f2 = factors[0], factors[-1]
    fx = f2 // f1
    claim = f"sublinear scan at the auto default ({fx}x corpus"
    pr1, pr2 = pts.get(f"ivfpin_x{f1}_probed_rows"), pts.get(f"ivfpin_x{f2}_probed_rows")
    if pr1 and pr2:
        claim += (f" => {pr2 / pr1:.2f}x probed rows — the *_probed_rows "
                  f"audit; a fixed cell count would pay {fx}x")
    w1, w2 = pts.get(f"ivfpin_ivfpq_x{f1}"), pts.get(f"ivfpin_ivfpq_x{f2}")
    if w1 and w2:
        claim += f"); one-shot wall {w2 / w1:.2f}x, encode-dominated"
        c1, c2 = pts.get(f"ivfpin_x{f1}_cells"), pts.get(f"ivfpin_x{f2}_cells")
        if c1 and c2 and c2 > c1:
            claim += (f" (the {c1:.0f}->{c2:.0f} cells doubling adds "
                      f"{c2 / c1:.0f}x per-vector assignment work exactly "
                      "at the power-of-two boundary; both components grow "
                      "~sqrt(n) asymptotically)")
    b2, p2 = pts.get(f"ivfpin_build_x{f2}"), pts.get(f"ivfpin_probe_x{f2}")
    if b2 and p2 and w2:
        claim += (f"; build-once/probe-many splits that wall into a "
                  f"{b2:.0f}s one-time build + {p2:.1f}s stored-index "
                  f"probe ({p2 / w2:.0%} of the one-shot wall per query "
                  "batch — operators/ann_index)")
    doc = {
        "what": ("ivfpq_topk wall seconds at the CORPUS-DERIVED cell count "
                 "(similarity.auto_cells sqrt balance) on the ±1-masked "
                 "scaled corpus; *_cells shows the knob turning, "
                 "*_probed_rows audits the scan the knob buys; "
                 "*_build/*_probe split the wall across the persisted "
                 "index (ann_index.build_ivfpq_index / ivfpq_probe)"),
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
