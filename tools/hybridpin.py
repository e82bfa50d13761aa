"""Standalone runner for the hybrid-serving scale pin -> HYBRIDPIN.json.

BM25PIN pins the lexical leg and IVFPIN the vector leg; this pins their
COMPOSITION (r13 verdict #7): the ``hybrid_index_topk`` plan — stored
BM25 probe + stored IVF-PQ ADC probe, RRF-fused — against the ad-hoc
hybrid twin that re-tokenizes the corpus for BM25 stats AND re-encodes
it for PQ codes on every call. The fused probe must inherit both legs'
flatness: its wall tracks the constant query/candidate load while the
ad-hoc twin tracks the corpus.

Usage: python tools/hybridpin.py [--factors 16,64] [--sf /root/testdata/sf0.1]
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
    claim = f"{fx}x corpus:"
    a1, a2 = pts.get(f"hybridpin_adhoc_x{f1}"), pts.get(f"hybridpin_adhoc_x{f2}")
    if a1 and a2:
        claim += (f" ad-hoc hybrid (tokenize + re-encode per call) wall "
                  f"{a2 / a1:.2f}x (corpus-tracking)")
    p1, p2 = pts.get(f"hybridpin_probe_x{f1}"), pts.get(f"hybridpin_probe_x{f2}")
    if p1 and p2:
        claim += f"; fused stored-index probe {p2 / p1:.2f}x"
        if a2:
            claim += f" = {p2 / a2:.0%} of the one-shot wall per query batch"
    k2, t2 = (pts.get(f"hybridpin_x{f2}_kept_files"),
              pts.get(f"hybridpin_x{f2}_total_files"))
    if k2 is not None and t2:
        if k2 >= t2:
            # doc-as-query probes carry a large vocabulary (8 whole
            # documents), so the term-RANGE file skip is vacuous BY
            # DESIGN here — the row-level term equi-join inside kept
            # files (and the vector leg's cell pruning) carry the
            # flatness; BM25PIN pins the short-query file-skip case
            claim += (f"; lexical leg keeps {k2:.0f}/{t2:.0f} postings "
                      f"files at x{f2} — doc-as-query vocabulary spans "
                      "every term range (file skip vacuous by design; "
                      "row-level term pruning + the vector leg's cell "
                      "pruning carry the flatness; BM25PIN pins the "
                      "short-query file-skip case)")
        else:
            claim += (f"; term-range stats keep {k2:.0f}/{t2:.0f} "
                      f"postings files for the lexical leg at x{f2} "
                      "(the vector leg's cell pruning rides inside the "
                      "probe wall, IVFPIN's audit shape)")
    b2 = pts.get(f"hybridpin_text_build_x{f2}")
    c2 = pts.get(f"hybridpin_ann_build_x{f2}")
    if b2 is not None and c2 is not None:
        claim += (f"; the {b2:.0f}s text + {c2:.0f}s ANN builds are the "
                  "one-time price both indexes amortize")
    return claim


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="16,64")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "HYBRIDPIN.json"))
    args = ap.parse_args()
    factors = tuple(int(x) for x in args.factors.split(",") if x)

    from big_data_elt_pipeline_spark.plans.scale_bench import hybrid_scale_pin
    from big_data_elt_pipeline_spark.session import get_spark

    spark = get_spark("hybridpin")
    t0 = time.time()
    pts = hybrid_scale_pin(spark, args.sf, factors=factors,
                           progress=lambda k, v: print(f"{k}: {v:.2f}s", flush=True))

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = -1.0
    claim = derive_claim(pts, factors)
    doc = {
        "what": ("ad-hoc hybrid (bm25_topk + per-call ivfpq_topk + RRF) vs "
                 "build both indexes + the hybrid_index_topk fused probe "
                 "(bm25_index_probe + ivfpq_probe + RRF) wall seconds on "
                 "the salted/±1-masked scaled corpora; *_kept/_total_files "
                 "audit the lexical leg's manifest term-range skipping"),
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
