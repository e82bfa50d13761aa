"""A/B: skew-safe survivor selection (groupBy-min-struct + join-back) vs
the rejected rank-1 window form, on the NO-SKEW sf0.1 corpus — r8 verdict
#4: quantify the insurance premium the skew-safe form pays on benign data,
to sit in BENCH_NOTES.md next to the hot-key exhibit's 2.1x win.

Interleaved min-of-2 per (operator, form) — the bench discipline: a host
stall must recur at the same offset ~minutes apart to corrupt a min.
Prints one JSON line; paste the numbers into BENCH_NOTES.md.

Run: python tools/ab_survivor_forms.py  [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_elt_pipeline_spark.operators import dedup as DD  # noqa: E402
from big_data_elt_pipeline_spark.session import get_spark  # noqa: E402
from big_data_elt_pipeline_spark.sources.tpch import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_survivor")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    forms = {
        "agg": DD._non_survivor_windows,
        "window": DD._non_survivor_windows_window_form,
    }

    def substrings(form):
        wins = DD.window_table(
            docs, "doc_id", "text", DD.SUBSTR_WINDOW_TOKENS, 1
        )
        return DD._merge_spans(form(wins), DD.SUBSTR_WINDOW_TOKENS, 1)

    def span_removal(form):
        return DD._apply_spans(docs, substrings(form), "doc_id", "text")

    ops = {"dedup_substrings": substrings, "dedup_span_removal": span_removal}

    # untimed warm-up (codegen + footers off the clock), one per op
    for op_fn in ops.values():
        op_fn(forms["agg"]).write.format("noop").mode("overwrite").save()

    raw: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for _pass in range(2):
        for op_name, op_fn in ops.items():
            for form_name, form in forms.items():
                t0 = time.perf_counter()
                df = op_fn(form)
                n = df.count()
                dt = time.perf_counter() - t0
                key = f"{op_name}_{form_name}"
                raw.setdefault(key, []).append(round(dt, 3))
                rows[key] = n
                print(json.dumps({"q": key, "sec": round(dt, 3)}), flush=True)
    out = {k: min(v) for k, v in raw.items()}
    premium = {
        op: round(out[f"{op}_agg"] / out[f"{op}_window"], 3) for op in ops
    }
    print(json.dumps({
        "sf_dir": sf_dir, "min_of_2": out, "raw": raw, "rows": rows,
        "agg_over_window_premium": premium,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
