"""Round-10 operators: unigram-LM tokenizer family + the BPE oracle
precondition guard.

The unigram tests pin the relational Viterbi DP against an IMPERATIVE
Python twin (the same strategy as the BPE pin in test_round8_ops): seed
counts, one hard-EM round, and per-word best paths must agree exactly,
including the (neg_score, path) tie-break order.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------
# imperative twin of operators/tokenizer.py unigram machinery
# --------------------------------------------------------------------------

def _imp_seed(words: dict[str, int], max_piece: int, top: int):
    cnt: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for k in range(1, max_piece + 1):
                if i + k <= len(w):
                    cnt[w[i : i + k]] += f
    vocab = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:top]
    vocab.update(dict(multi))
    tot = sum(vocab.values())
    return vocab, {p: round(math.log(c / tot), 6) for p, c in vocab.items()}


def _imp_viterbi(word: str, logp: dict[str, float], max_piece: int):
    """Best (neg_score, path) via the same total order the engines use:
    DECIMAL(…,6) neg-score sum first, path string second."""
    best = {0: (Decimal(0), "")}
    for j in range(1, len(word) + 1):
        cands = []
        for k in range(1, min(max_piece, j) + 1):
            piece = word[j - k : j]
            if piece in logp and (j - k) in best:
                ns = best[j - k][0] + Decimal(str(-logp[piece]))
                prev = best[j - k][1]
                cands.append((ns, piece if prev == "" else prev + "\x1f" + piece))
        if cands:
            best[j] = min(cands)
    return best.get(len(word))


def _imp_train(words: dict[str, int], max_piece: int, top: int):
    vocab, logp = _imp_seed(words, max_piece, top)
    vcnt: Counter = Counter()
    for w, f in words.items():
        hit = _imp_viterbi(w, logp, max_piece)
        assert hit is not None  # single chars guarantee coverage
        for piece in hit[1].split("\x1f"):
            vcnt[piece] += f
    t, v = sum(vcnt.values()), len(vocab)
    final = {
        p: (vocab[p], vcnt.get(p, 0), round(math.log((vcnt.get(p, 0) + 1) / (t + v)), 6))
        for p in vocab
    }
    return final, logp


def _corpus_words(spark, max_word: int) -> dict[str, int]:
    from big_data_elt_pipeline_spark.functions.text import tokens

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= max_word))
        .groupBy("w")
        .count()
        .collect()
    )
    return {r["w"]: r["count"] for r in rows}


def test_unigram_train_matches_imperative_twin(spark):
    from big_data_elt_pipeline_spark.operators import tokenizer as TK

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    final, _ = TK.unigram_train(docs)
    got = {
        r["piece"]: (r["seed_count"], r["viterbi_count"], r["logp"])
        for r in final.collect()
    }
    words = _corpus_words(spark, TK.UNI_MAX_WORD)
    want, _ = _imp_train(words, TK.UNI_MAX_PIECE, TK.UNI_VOCAB_TOP)
    assert got == want


def test_unigram_viterbi_paths_match_imperative_twin(spark):
    """Per-word best paths (not just counts) agree, including ties."""
    from big_data_elt_pipeline_spark.operators import tokenizer as TK

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    seed = TK.unigram_seed_vocab(docs)
    wordsdf = TK._uni_words(docs, "text")
    seg = TK._uni_viterbi(wordsdf, seed)
    got = {r["word"]: r["path"] for r in seg.collect()}
    words = _corpus_words(spark, TK.UNI_MAX_WORD)
    _, logp = _imp_seed(words, TK.UNI_MAX_PIECE, TK.UNI_VOCAB_TOP)
    for w in words:
        assert got[w] == _imp_viterbi(w, logp, TK.UNI_MAX_PIECE)[1], w


def test_unigram_unk_fallback_counts_overlong_words(spark):
    """Words longer than UNI_MAX_WORD segment as one <unk> piece and are
    counted in n_unk — the documented fallback path (the fixture corpus
    has no such words, so pin it on a synthetic one)."""
    from big_data_elt_pipeline_spark.operators import tokenizer as TK

    long_w = "x" * (TK.UNI_MAX_WORD + 5)
    docs = spark.createDataFrame(
        [(1, f"ab ab {long_w}"), (2, "ab cd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in TK.unigram_doc_tokens(docs).collect()}
    assert out[1]["n_words"] == 3 and out[1]["n_unk"] == 1
    # 'ab'/'cd' each Viterbi-segment as the whole-word piece (one piece
    # beats two chars on summed logp), and the unk word adds exactly one
    assert out[1]["n_pieces"] == 3
    assert out[2]["n_pieces"] == 2 and out[2]["n_unk"] == 0


def test_unigram_segment_piece_counts_reconcile(spark):
    """sum(n_pieces) over docs == sum over words of freq * pieces(word):
    the doc-level rollup is exactly the word-level segmentation applied
    through the doc-word join."""
    from big_data_elt_pipeline_spark.operators import tokenizer as TK

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per_doc = TK.unigram_doc_tokens(docs)
    total_doc = per_doc.agg(F.sum("n_pieces")).first()[0]
    final, _ = TK.unigram_train(docs)
    seg = TK._uni_viterbi(
        TK._uni_words(docs, "text"), final.localCheckpoint(eager=False)
    )
    total_word = seg.agg(F.sum(F.col("freq") * F.col("n_pieces"))).first()[0]
    assert total_doc == total_word


# --------------------------------------------------------------------------
# BPE oracle precondition (r9 verdict #3): the unrolled oracle SQL has no
# empty-winner guard, so it silently requires merge depth > round count on
# every gate corpus. Pin that precondition with an imperative BPE twin —
# if a future fixture regeneration shrinks the corpus vocabulary enough to
# converge early, this fails BEFORE the oracle silently diverges.
# --------------------------------------------------------------------------

def _imp_bpe_depth(words: dict[str, int], limit: int) -> int:
    syms = {w: [*w, "</w>"] for w in words}
    for r in range(limit):
        pairs: Counter = Counter()
        for w, f in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            return r
        (la, rb), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in words:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == la and s[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return limit


# --------------------------------------------------------------------------
# deterministic shard export (operators/sharding.py)
# --------------------------------------------------------------------------

def test_shard_export_replays_byte_identically(spark, tmp_path):
    """Exporting the same corpus twice yields identical shard membership
    AND identical manifest content hashes — the replayability contract a
    resumable training run depends on."""
    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    outs = []
    for i in (1, 2):
        path, _ = SH.export_shards(docs, str(tmp_path / f"run{i}"))
        shards = spark.read.parquet(f"{path}/shards")
        manifest = spark.read.parquet(f"{path}/_manifest")
        members = sorted(
            (r["shard_id"], r["doc_id"], r["pos_in_shard"])
            for r in shards.select("shard_id", "doc_id", "pos_in_shard").collect()
        )
        mrows = sorted(tuple(r) for r in manifest.collect())
        outs.append((members, mrows))
    assert outs[0] == outs[1]


def test_shard_manifest_hash_is_order_and_content_sensitive(spark):
    """Perturbing one document's text changes exactly that shard's
    content hash (and nothing else's); membership stays fixed because
    assignment depends only on doc_id and token counts."""
    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    base = {r["shard_id"]: r["content_hash"] for r in SH.shard_manifest(docs).collect()}
    victim = docs.orderBy("doc_id").first()["doc_id"]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    mut = {r["shard_id"]: r["content_hash"] for r in SH.shard_manifest(mutated).collect()}
    changed = [s for s in base if base[s] != mut.get(s)]
    assert len(changed) == 1
    # token count unchanged ('!' glues to the last token), so membership
    # and every other shard's hash stay put
    assert set(base) == set(mut)


def test_shard_assignment_equals_global_prefix_sum(spark):
    """The two-level bucketed prefix sum must equal the naive global
    running sum exactly (integer associativity) — pinned directly rather
    than only through the DuckDB oracle."""
    from big_data_elt_pipeline_spark.functions.text import token_count
    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["shard_id"])
        for r in SH.shard_assignment(docs).collect()
    }
    rows = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
        token_count(F.col("text")).alias("n"),
    ).collect()
    cum = 0
    for r in sorted(rows, key=lambda r: (r["okey"], r["doc_id"])):
        cum += r["n"]
        assert got[r["doc_id"]] == (cum, (cum - 1) // SH.SHARD_TOKEN_BUDGET)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bpe_merge_depth_exceeds_oracle_round_count(spark, sf):
    from big_data_elt_pipeline_spark.functions.text import tokens
    from big_data_elt_pipeline_spark.plans.curation_queries import _BPE_ROUNDS

    rows = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    words = {r["w"]: r["count"] for r in rows}
    depth = _imp_bpe_depth(words, _BPE_ROUNDS + 1)
    assert depth > _BPE_ROUNDS, (
        f"corpus {sf} exhausts the BPE pair space after {depth} merges but the "
        f"unrolled oracle runs {_BPE_ROUNDS} rounds unguarded — regenerate the "
        "oracle with an empty-winner guard or deepen the fixture"
    )
