"""Standalone runner for the in-place-update scale pin -> UPDATEPIN.json.

IVFPIN/BM25PIN/HYBRIDPIN pin the stored-index PROBES; this pins the r14
MUTATION composites (``update_text_documents`` / ``update_index_vectors``):
a fixed 8-id revision batch must cost a flat, delta-sized wall at x16 and
x64 — versus the corpus-tracking full rebuild that is the only
alternative without them — and the probe-after-update must stay flat
(mutation must not degrade the served plan).

Usage: python tools/updatepin.py [--factors 16,64] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def derive_claim(pts: dict, factors: tuple) -> str:
    """Claim text derived from the measured points (the ivfpin
    discipline) so a re-run preserves the quantitative story instead of
    hand-edits."""
    f1, f2 = factors[0], factors[-1]
    fx = f2 // f1
    claim = f"{fx}x corpus, fixed 8-id revision batch:"
    tu1, tu2 = (pts.get(f"updatepin_text_update_x{f1}"),
                pts.get(f"updatepin_text_update_x{f2}"))
    tb2 = pts.get(f"updatepin_text_build_x{f2}")
    if tu1 and tu2:
        claim += f" text update wall {tu2 / tu1:.2f}x"
        if tb2:
            claim += (f" = {tu2 / tb2:.0%} of the corpus-tracking rebuild "
                      f"({tb2:.0f}s at x{f2})")
    au1, au2 = (pts.get(f"updatepin_ann_update_x{f1}"),
                pts.get(f"updatepin_ann_update_x{f2}"))
    ab2 = pts.get(f"updatepin_ann_build_x{f2}")
    if au1 and au2:
        claim += f"; vector update wall {au2 / au1:.2f}x"
        if ab2:
            claim += f" = {au2 / ab2:.0%} of the rebuild ({ab2:.0f}s)"
    tp1, tp2 = (pts.get(f"updatepin_text_probe_x{f1}"),
                pts.get(f"updatepin_text_probe_x{f2}"))
    ap1, ap2 = (pts.get(f"updatepin_ann_probe_x{f1}"),
                pts.get(f"updatepin_ann_probe_x{f2}"))
    if tp1 and tp2 and ap1 and ap2:
        claim += (f"; probes after three successive updates stay flat "
                  f"(text {tp2 / tp1:.2f}x, ANN {ap2 / ap1:.2f}x) — "
                  "generation-scoped tombstones cost the probe a "
                  "delta-sized anti-join, not a corpus pass")
    tb1 = pts.get(f"updatepin_text_build_x{f1}")
    ab1 = pts.get(f"updatepin_ann_build_x{f1}")
    if tb1 and tb2 and ab1 and ab2:
        claim += (f"; the rebuild alternative tracks the corpus "
                  f"(text {tb2 / tb1:.2f}x, ANN {ab2 / ab1:.2f}x for "
                  f"{fx}x the data)")
    return claim


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="16,64")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "UPDATEPIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import update_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("updatepin")
    t0 = time.time()
    pts = update_scale_pin(spark, args.sf, factors=factors,
                           progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = -1.0
    claim = derive_claim(pts, factors)
    doc = {
        "what": ("fixed 8-id in-place revision (update_text_documents / "
                 "update_index_vectors) + probe-after-update wall seconds "
                 "on the salted/±1-masked scaled corpora, vs the one-time "
                 "index builds = the full-rebuild alternative; "
                 "*_n_updated audit that every timed update replaced "
                 "exactly the 8 live victims"),
        "claim": claim,
        "sf_dir": args.sf,
        "factors": list(factors),
        "points": pts,
        "elapsed_s": round(time.time() - t0, 1),
        "host_load1": load1,
        "measurement": ("min of 2 after one untimed warm-up at the first "
                        "factor; session's first lakehouse build untimed"),
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
