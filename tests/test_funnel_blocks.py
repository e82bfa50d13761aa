"""Ordered funnel (operators/funnel.py) and block-level dedup
(dedup.block_dedup) on hand-checkable fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators.dedup import block_dedup
from big_data_elt_pipeline_spark.operators.funnel import funnel


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1: full ordered funnel
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE click -> reaches click, not purchase
        (2, _ts(0), "view"), (2, _ts(2), "click"), (2, _ts(1), "purchase"),
        # u3: view only
        (3, _ts(0), "view"),
        # u4: click/purchase but never viewed -> not in funnel at all
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
        # u5: simultaneous view+click (strict > excludes the click)
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order(ev):
    out = {r.stage: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 4          # u1 u2 u3 u5
    assert out["click"].n_users == 2         # u1 u2 (u5's click is not strictly after)
    assert out["purchase"].n_users == 1      # u1 only (u2's purchase precedes click)
    assert out["view"].conversion == 1.0
    assert out["click"].conversion == pytest.approx(0.5)
    assert [r.stage_idx for r in funnel(ev, ["view", "click", "purchase"]).collect()] == [0, 1, 2]


def test_funnel_requires_two_stages(ev):
    with pytest.raises(ValueError, match="at least two"):
        funnel(ev, ["view"])


def test_block_dedup_removes_repeats(spark):
    a = " ".join(f"w{i}" for i in range(64))            # blocks A0 A1
    b = " ".join(f"w{i}" for i in range(32)) + " " + " ".join(f"x{i}" for i in range(32))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, a)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in block_dedup(docs, block_tokens=32).collect()}
    assert out[1].n_blocks == 2 and out[1].kept_blocks == 2      # first copy keeps all
    assert out[2].n_blocks == 2 and out[2].kept_blocks == 1      # shares block A0
    assert out[3].n_blocks == 2 and out[3].kept_blocks == 0      # exact dup of doc 1
    assert out[3].retained_ratio == 0.0 and out[2].retained_ratio == 0.5


def test_block_dedup_short_doc_single_block(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "a b c")], "doc_id long, text string")
    out = {r.doc_id: r for r in block_dedup(docs, block_tokens=32).collect()}
    assert out[1].n_blocks == 1 and out[1].kept_blocks == 1
    assert out[2].kept_blocks == 0


def test_block_dedup_empty_doc_emits_no_row(spark):
    # sequence(0, -1) steps DOWNWARD in Spark — an unguarded plan would
    # fabricate two md5("") phantom blocks per empty doc; the SQL oracle's
    # range(0, 0) emits none. Empty/whitespace-only docs must vanish.
    docs = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in block_dedup(docs, block_tokens=32).collect()}
    assert set(out) == {3}
    assert out[3].n_blocks == 1 and out[3].kept_blocks == 1


def test_funnel_zero_stage_conversion_is_null(spark):
    # once a stage hits 0 users, later conversions are 0/0 — pinned to
    # NULL (not a non-ANSI silent null, not an ANSI error)
    rows = [(1, _ts(0), "view"), (2, _ts(1), "view")]
    ev0 = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r for r in funnel(ev0, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 2 and out["view"].conversion == 1.0
    assert out["click"].n_users == 0 and out["click"].conversion == 0.0
    assert out["purchase"].n_users == 0 and out["purchase"].conversion is None
