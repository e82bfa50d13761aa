"""Pin the bench headline tail contract (r14 verdict #3).

The driver keeps the LAST 2000 chars of stdout and diffs the parsed
headline's ``queries`` map round-over-round. When the suite outgrew the
window, cheapest-first shedding removed entries the driver tracked last
round, which its diff then reported as phantom ``dropped_from_bench``.
The fix: entries present in the previous round's parsed headline (the
newest committed BENCH_r*.json) keep their seats; only diff-invisible
entries shed. These tests drive ``bench._emit`` directly on synthetic
timing maps — no Spark session involved.
"""

from __future__ import annotations

import importlib
import io
import json
import sys

import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    """A bench module instance whose repo dir is an isolated tmp copy —
    _emit writes BENCH_LOCAL.json next to bench.py, which must never
    clobber the committed baseline during tests."""
    import shutil
    import big_data_elt_pipeline_spark as pkg
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    shutil.copy(os.path.join(repo, "bench.py"), tmp_path / "bench.py")
    prev = {
        "parsed": {
            "queries": {"expensive_tracked": 9.9, "cheap_tracked": 0.3}
        }
    }
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(prev))
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    yield mod
    sys.modules.pop("bench", None)


def _emit_headline(mod, timings: dict) -> dict:
    mod._STATE.update(
        {"timings": dict(timings), "sf": 0.1, "emitted": False,
         "extras": {}, "raw": {}, "host_load": {}, "scale_full": {},
         "shed": []}
    )
    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        mod._emit()
    finally:
        sys.stdout = old
    lines = cap.getvalue().strip().split("\n")
    assert len(lines[-1]) <= 1690
    return json.loads(lines[-1])


def test_prev_headline_names_reads_newest_artifact(bench_mod):
    assert bench_mod._prev_headline_names() == {
        "expensive_tracked", "cheap_tracked"
    }


def test_small_suite_keeps_everything(bench_mod):
    head = _emit_headline(bench_mod, {"a": 1.0, "b": 2.0})
    assert set(head["queries"]) == {"a", "b"}
    assert "qdr" not in head


def test_shedding_protects_prev_round_entries(bench_mod):
    # enough long-named entries to force shedding past the 1690-char cap
    timings = {f"synthetic_query_with_a_long_name_{i:03d}": 0.5 + i * 0.01
               for i in range(80)}
    timings["expensive_tracked"] = 9.9
    timings["cheap_tracked"] = 0.3  # cheapest of all — still protected
    head = _emit_headline(bench_mod, timings)
    assert head["qdr"] > 0
    # every previous-round name survives even though cheap_tracked is the
    # cheapest entry in the whole map
    assert "cheap_tracked" in head["queries"]
    assert "expensive_tracked" in head["queries"]
    # shedding took diff-invisible entries, cheapest first
    shed = set(timings) - set(head["queries"])
    assert shed and all(n.startswith("synthetic_") for n in shed)
    kept_synth = [v for k, v in head["queries"].items()
                  if k.startswith("synthetic_")]
    if kept_synth:
        # cheapest-first within the expendable class, at the 1-dp
        # resolution the shed decision actually uses (ties break by name)
        assert min(kept_synth) >= max(
            round(timings[n], 1) for n in shed
        ) - 0.1
