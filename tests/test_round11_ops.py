"""Round-11 operator contracts: corpus-derived sign-bucket widths (the r10
verdict's one weak mark — fixed ``n_bits`` defaults made the bucketed ANN
family quadratic at scale), plus the ADVICE-pinned preconditions."""

import math

import pytest

from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------
# auto_bits: the threshold-count derivation must equal the textbook
# clamp(ceil(log2(n / target)), lo, hi) everywhere — including the exact
# power-of-two boundaries where a libm log2 could flip the ceil.
# --------------------------------------------------------------------------

def _reference_bits(n, target, lo, hi):
    if n <= 0:
        return lo
    # exact integer form of ceil(log2(n / target)): smallest b with
    # target * 2^b >= n
    b = 0
    while target * (1 << b) < n:
        b += 1
    return max(lo, min(hi, b))


def test_auto_bits_equals_clamped_ceil_log2():
    from big_data_elt_pipeline_spark.operators.similarity import auto_bits

    for target in (1, 2, 32, 256):
        for n in list(range(1, 70)) + [
            500, 1000, 2000, 8000, 32000, 128000,
            10**6, 10**9, 10**12,
            # exact boundaries: n == target * 2^j and +-1
            *(target * (1 << j) + d for j in range(4, 25) for d in (-1, 0, 1)),
        ]:
            got = auto_bits(n, target)
            want = _reference_bits(n, target, 4, 24)
            assert got == want, (n, target, got, want)


def test_auto_bits_reproduces_fixture_widths():
    """The hand-tuned r10 widths fall out of the derivation at today's
    fixture sizes (so switching the gated queries to auto changed nothing
    at sf0.001/sf0.01)."""
    from big_data_elt_pipeline_spark.operators import similarity as S

    assert S.auto_bits(500, S.KNN_TARGET_BUCKET_ROWS) == 4       # knn_graph_mutual
    assert S.auto_bits(500, S.LSH_TARGET_BUCKET_ROWS) == 8       # ann_lsh_topk
    assert S.auto_bits(1000, S.NEARDUP_TARGET_BUCKET_ROWS) == 10  # embedding_neardup emb2


def test_auto_bits_holds_pair_space_linear():
    """The property the r10 pin showed the fixed default lacks: growing the
    corpus 4x grows the expected pair space ~4x (not 16x), because the
    derivation adds 2 bits per 4x — until the hi clamp."""
    from big_data_elt_pipeline_spark.operators.similarity import auto_bits

    for target in (1, 32):
        prev = None
        for n in (32_000, 128_000, 512_000, 2_048_000):
            b = auto_bits(n, target)
            pairs = n * n / (1 << b)
            if prev is not None:
                assert pairs / prev <= 4.5, (n, target, pairs, prev)
            prev = pairs


def test_auto_bits_max_dim_cap():
    from big_data_elt_pipeline_spark.operators.similarity import auto_bits

    # a 6-dim embedding can never bucket on more than 6 components
    assert auto_bits(10**9, 1, max_dim=6) == 6
    # cap below lo clamps to lo (degenerate but defined)
    assert auto_bits(10**9, 1, max_dim=2) == 4


def test_derive_bits_matches_python_derivation(spark):
    from big_data_elt_pipeline_spark.operators import similarity as S
    from big_data_elt_pipeline_spark.sources.tpch import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    assert S.derive_bits(emb, S.KNN_TARGET_BUCKET_ROWS) == S.auto_bits(
        n, S.KNN_TARGET_BUCKET_ROWS, max_dim=64
    )
    assert S.derive_bits(emb, S.LSH_TARGET_BUCKET_ROWS) == S.auto_bits(
        n, S.LSH_TARGET_BUCKET_ROWS, max_dim=64
    )


def test_knn_graph_auto_equals_explicit_derived(spark):
    """knn_graph() with the auto default is the SAME relation as passing
    the derived width explicitly — auto is a default, not a new algorithm."""
    from big_data_elt_pipeline_spark.operators import similarity as S
    from big_data_elt_pipeline_spark.sources.tpch import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")
    bits = S.derive_bits(emb, S.KNN_TARGET_BUCKET_ROWS)
    auto = {tuple(r) for r in S.knn_graph(emb, k=3).collect()}
    explicit = {tuple(r) for r in S.knn_graph(emb, k=3, n_bits=bits).collect()}
    assert auto == explicit and len(auto) > 0


# --------------------------------------------------------------------------
# epoch_shuffle: deterministic per-epoch training order
# --------------------------------------------------------------------------

def test_epoch_order_is_distinct_permutation_per_epoch(spark):
    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    n = docs.count()
    e0 = {r["doc_id"]: r["pos"] for r in SH.epoch_order(docs, 0).collect()}
    e1 = {r["doc_id"]: r["pos"] for r in SH.epoch_order(docs, 1).collect()}
    # dense 1..n permutation over the same id set, per epoch
    assert set(e0.values()) == set(range(1, n + 1)) == set(e1.values())
    assert set(e0) == set(e1)
    # epochs produce genuinely different orders (hash re-key works)
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > n * 0.9, moved
    # deterministic re-evaluation
    again = {r["doc_id"]: r["pos"] for r in SH.epoch_order(docs, 0).collect()}
    assert again == e0


# --------------------------------------------------------------------------
# PQ/ADC ANN (Jégou et al. 2011)
# --------------------------------------------------------------------------

def test_pq_codes_domain_and_determinism(spark):
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    books = S.pq_codebooks(emb, 16)
    cids = {c["cid"] for c in books.head()["__cents"]}
    assert len(cids) == 16
    codes = S.pq_encode(emb, books, m=8, dsub=8).collect()
    n = emb.count()
    assert len(codes) == n * 8  # one code per (vector, subspace)
    assert {r["j"] for r in codes} == set(range(8))
    assert {r["code"] for r in codes} <= cids  # codes come from the codebook
    # a sampled codebook vector's own best code in every subspace is itself
    by = {}
    for r in codes:
        by.setdefault(r["vec_id"], {})[r["j"]] = r["code"]
    for cid in cids:
        assert all(code == cid for code in by[cid].values()), (cid, by[cid])
    # deterministic re-evaluation
    again = S.pq_encode(emb, books, m=8, dsub=8).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))


def test_pq_topk_beats_random_recall(spark):
    """ADC over 8-byte codes must preserve real neighborhood structure:
    recall@5 vs exact L2 brute force well above the ~1% random baseline."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 16)
    pq = S.pq_topk(emb, queries, k=5)
    got = {(r["query_id"], r["vec_id"]) for r in pq.collect()}
    # exact L2 truth via the cosine brute force won't do — compute L2 here
    import numpy as np

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    truth = set()
    for q in range(16):
        qi = np.where(ids == q)[0][0]
        d = ((X - X[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        for j in np.argsort(d, kind="stable")[:5]:
            truth.add((q, int(ids[j])))
    recall = len(got & truth) / len(truth)
    # measured 0.1375 on this fixture — the synthetic near-uniform
    # embeddings are PQ's worst case (no cluster structure for 16 sampled
    # codebook entries to exploit); the floor asserts structure survives
    # quantization: random top-5 would score 5/499 ~ 1%
    assert recall >= 0.05, recall
    # every query produced exactly k ranked rows
    from collections import Counter

    per = Counter(q for q, _ in got)
    assert all(v == 5 for v in per.values()) and len(per) == 16


# --------------------------------------------------------------------------
# pack_sequences: token-level contiguous packing (GPT-style)
# --------------------------------------------------------------------------

def test_pack_sequences_invariants(spark):
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.functions.text import token_count
    from big_data_elt_pipeline_spark.operators import sharding as SH

    L = 256
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    seg = SH.pack_training_sequences(docs, seq_len=L).collect()

    # every sequence is exactly full except possibly the last
    by_seq = {}
    for r in seg:
        by_seq.setdefault(r["seq_id"], []).append(r)
    last = max(by_seq)
    for k, rows in by_seq.items():
        total = sum(r["length"] for r in rows)
        assert total == L or (k == last and 0 < total <= L), (k, total)
        # segments tile [0, total) without gaps or overlaps
        rows.sort(key=lambda r: r["seq_offset"])
        pos = 0
        for r in rows:
            assert r["seq_offset"] == pos and r["length"] > 0
            pos += r["length"]

    # per-document: segments tile the document's tokens in order, with
    # exactly one start flag and one end flag
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    by_doc = {}
    for r in seg:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["doc_offset"])
        assert sum(r["length"] for r in rows) == toks[d]
        assert sum(r["is_doc_start"] for r in rows) == 1 and rows[0]["is_doc_start"]
        assert sum(r["is_doc_end"] for r in rows) == 1 and rows[-1]["is_doc_end"]
        pos = 0
        for r in rows:
            assert r["doc_offset"] == pos
            pos += r["length"]
    # zero-token docs carry no segments; every tokenful doc is packed
    assert set(by_doc) == {d for d, n in toks.items() if n > 0}


# --------------------------------------------------------------------------
# shard_pruned_read: the training-loader read path (r10 verdict #5)
# --------------------------------------------------------------------------

def test_shard_pruned_read_prunes_partitions_and_verifies(spark, tmp_path):
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    SH.export_shards(docs, str(tmp_path), budget=2048)
    out = SH.read_shard_verified(spark, str(tmp_path), 1)
    # the shards scan must prune on the partition column, not filter rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan and "shard_id" in plan
    row = out.head()
    assert row["manifest_match"] and row["n_docs"] > 0
    # cross-check against the manifest relation itself
    m = (
        spark.read.parquet(f"{tmp_path}/_manifest")
        .filter(F.col("shard_id") == 1)
        .head()
    )
    assert row["content_hash"] == m["content_hash"]
    assert row["n_tokens"] == m["n_tokens"]


def test_shard_pruned_read_detects_tampering(spark, tmp_path):
    """Dropping one document from a shard after export must flip
    manifest_match (count, boundary keys unchanged-or-not — the content
    hash alone is enough)."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import sharding as SH

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    SH.export_shards(docs, str(tmp_path), budget=2048)
    shard_dir = f"{tmp_path}/shards/shard_id=1"
    kept = spark.read.parquet(shard_dir)
    victim = kept.orderBy("okey").select("doc_id").head()["doc_id"]
    tampered = kept.filter(F.col("doc_id") != victim).collect()
    spark.createDataFrame(tampered, kept.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(shard_dir)
    row = SH.read_shard_verified(spark, str(tmp_path), 1).head()
    assert not row["manifest_match"]


# --------------------------------------------------------------------------
# ADVICE r10 pins
# --------------------------------------------------------------------------

def test_shard_division_is_long_arithmetic(spark):
    """ADVICE r10 (sharding.py): shard_id must use integer division, not
    floor(double-div) — past 2^53 the long->double conversion can round a
    cumulative token count across a shard boundary. Pin the expression the
    operators now use against Python's exact // at the danger boundary."""
    budget = 2048
    danger = [
        2**53 - 1, 2**53, 2**53 + 1, 2**53 + 2,
        # a value where float(x) rounds UP across a multiple of budget:
        # (x-1)/budget in double != (x-1)//budget exactly
        (2**53 // budget) * budget + budget, 2**62 + budget - 1,
    ]
    df = spark.createDataFrame([(x,) for x in danger], "cum_tokens long")
    got = {
        r["cum_tokens"]: r["shard"]
        for r in df.selectExpr(
            "cum_tokens", f"CAST((cum_tokens - 1) div {budget} AS BIGINT) AS shard"
        ).collect()
    }
    for x in danger:
        assert got[x] == (x - 1) // budget, (x, got[x], (x - 1) // budget)


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_unigram_bench_round_count_covers_every_fixture_word(spark, sf):
    """ADVICE r10 (bench.py): SPARK_GRAFT_BENCH_ITERS_UNIGRAM=8 claims the
    8-round bench values equal the full-12-round oracle. That rests on NO
    fixture word being 9-12 chars long (the override also tightens the
    _uni_words length filter, which would change vocabulary membership).
    Pin the precondition the way the BPE depth test pins _BPE_ROUNDS — if
    a testdata regeneration introduces longer words, this fails loudly
    instead of silently invalidating the bench-equals-oracle claim."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.functions.text import tokens

    longest = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .agg(F.max(F.length("w")).alias("m"))
        .head()["m"]
    )
    assert longest <= 8, (
        f"corpus {sf} has a {longest}-char word: the bench unigram override "
        "(8 DP rounds) no longer equals the 12-round oracle — raise "
        "SPARK_GRAFT_BENCH_ITERS_UNIGRAM or drop the override"
    )


def test_derive_bits_short_vectors_capped(spark):
    """Vectors shorter than the uncapped width: the min-length cap keeps
    sign_bucket from indexing past the array (ANSI element_at would
    raise)."""
    from big_data_elt_pipeline_spark.operators import similarity as S

    rows = [(i, [float(i % 7 - 3)] * 6) for i in range(4000)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    # uncapped: 4000 rows at target 1 -> 12 bits; dim 6 caps it to 6
    assert S.derive_bits(df, 1) == 6
    out = S.embedding_neardup(df, threshold=0.999)
    assert out.count() > 0  # plan executes without ANSI index errors


# --------------------------------------------------------------------------
# ivfpq_topk: IVF cell pruning x PQ/ADC scan (second-wave r11)
# --------------------------------------------------------------------------

def test_ivfpq_candidates_come_from_probed_cells(spark):
    """The pruning contract: every returned neighbor lives in one of the
    query's n_probe nearest cells (assignment replicated in numpy from the
    same deterministic centroid pick)."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 16)
    out = S.ivfpq_topk(emb, queries, k=5, n_cells=16, n_probe=4).collect()

    cents = S.fixed_centroid_cells(emb, 16).head()["__cents"]
    cell_ids = np.array([c["cell"] for c in cents])
    C = np.array([c["cvec"] for c in cents], dtype=np.float64)
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cos = (X @ C.T) / (
        np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
    )
    # ties to the lowest cell id: argsort on (-cos, cell_id)
    order = np.lexsort((cell_ids[None, :].repeat(len(X), 0), -cos), axis=1)
    assigned = {int(ids[i]): int(cell_ids[order[i, 0]]) for i in range(len(X))}
    probes = {
        int(ids[i]): {int(cell_ids[j]) for j in order[i, :4]}
        for i in range(len(X))
        if ids[i] < 16
    }
    for r in out:
        assert assigned[r["vec_id"]] in probes[r["query_id"]], (
            r["query_id"], r["vec_id"], assigned[r["vec_id"]],
        )


def test_ivfpq_agrees_with_pq_on_shared_pairs(spark):
    """Same ADC metric on both sides: any (query, neighbor) pair appearing
    in both the pruned and the full-scan top-5 carries the identical
    decimal-snapped distance; per query the pruned result holds exactly k
    ranked rows 1..k and is deterministic across runs."""
    from collections import Counter

    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 16)
    ivfpq = S.ivfpq_topk(emb, queries, k=5).collect()
    pq = S.pq_topk(emb, queries, k=5).collect()

    per = Counter(r["query_id"] for r in ivfpq)
    assert len(per) == 16 and all(v == 5 for v in per.values())
    ranks = {(r["query_id"], r["rank"]) for r in ivfpq}
    assert len(ranks) == 80  # ranks are dense 1..5 per query

    full = {(r["query_id"], r["vec_id"]): r["adc_l2sq"] for r in pq}
    shared = 0
    for r in ivfpq:
        key = (r["query_id"], r["vec_id"])
        if key in full:
            shared += 1
            assert r["adc_l2sq"] == full[key], key
    assert shared > 0  # the prune keeps some true ADC winners

    again = S.ivfpq_topk(emb, queries, k=5).collect()
    assert sorted(map(tuple, ivfpq)) == sorted(map(tuple, again))


# --------------------------------------------------------------------------
# mmr_rerank: diversified top-k (third-wave r11)
# --------------------------------------------------------------------------

def test_mmr_first_pick_is_relevance_argmax_and_ranks_dense(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 4)
    out = S.mmr_rerank(emb, queries, k=5, n_cand=20).collect()

    per = Counter(r["query_id"] for r in out)
    assert len(per) == 4 and all(v == 5 for v in per.values())
    for q in per:
        picks = sorted(
            (r for r in out if r["query_id"] == q), key=lambda r: r["mmr_rank"]
        )
        assert [r["mmr_rank"] for r in picks] == [1, 2, 3, 4, 5]
        assert len({r["vec_id"] for r in picks}) == 5  # no repeats
        assert picks[0]["max_sim"] == 0.0
        # rank 1 is the plain relevance argmax
        assert picks[0]["relevance"] == max(r["relevance"] for r in picks)

    bf = S.brute_force_topk(emb, queries, k=1).collect()
    top1 = {(r["query_id"], r["vec_id"]) for r in bf}
    got1 = {(r["query_id"], r["vec_id"]) for r in out if r["mmr_rank"] == 1}
    assert got1 == top1


def test_mmr_accepts_ann_candidate_front_end(spark):
    """The r12 ``candidates`` hook: reranking an LSH candidate relation
    picks only from those candidates, and with the default brute-force
    candidates the explicit pass-through equals the built-in path."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 4)

    ann = S.lsh_topk(emb, queries, k=10)
    out = S.mmr_rerank(emb, queries, k=3, candidates=ann).collect()
    cand_pairs = {(r["query_id"], r["vec_id"]) for r in ann.collect()}
    assert out and all((r["query_id"], r["vec_id"]) in cand_pairs for r in out)

    bf = S.brute_force_topk(emb, queries, 20)
    explicit = S.mmr_rerank(emb, queries, k=5, candidates=bf).collect()
    builtin = S.mmr_rerank(emb, queries, k=5, n_cand=20).collect()
    assert sorted(map(tuple, explicit)) == sorted(map(tuple, builtin))


def test_mmr_skips_near_duplicate_of_first_pick(spark):
    """The property MMR exists for: a candidate nearly identical to the
    first selection loses rank 2 to a more distant one even though plain
    relevance would rank it second."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    # query 100 along e1; doc 2 is the plain-relevance runner-up but a
    # near-duplicate of first-pick doc 1 (cos ~ 0.99998); doc 3 is a hair
    # less relevant but angularly distant from doc 1 (cos ~ 0.9756)
    rows = [
        (100, [1.0, 0.0, 0.0]),
        (1, [0.92, 0.1, 0.0]),
        (2, [0.91, 0.1, 0.0]),
        (3, [0.9, -0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter(F.col("vec_id") == 100)
    # plain relevance would rank doc 2 second...
    bf = S.brute_force_topk(df, q, k=3).collect()
    assert [r["vec_id"] for r in sorted(bf, key=lambda r: r["rank"])] == [1, 2, 3]
    # ...MMR flips 2 and 3
    out = S.mmr_rerank(df, q, k=3, n_cand=3, lam=0.5).collect()
    by_rank = {r["mmr_rank"]: r["vec_id"] for r in out}
    assert by_rank == {1: 1, 2: 3, 3: 2}, by_rank


def test_mmr_round_layouts_are_answer_identical(spark):
    """The adaptive per-query round layout (the default — rounds run one
    task per core) and the forced serial ``round_partitions=1`` layout
    return the SAME rows: partitioning never reorders the per-query
    windows, which carry explicit tie-breaks (the BENCH_r13 mmr fix's
    correctness pin)."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 6)
    adaptive = S.mmr_rerank(emb, queries, k=5, n_cand=20).collect()
    serial = S.mmr_rerank(
        emb, queries, k=5, n_cand=20, round_partitions=1
    ).collect()
    wide = S.mmr_rerank(
        emb, queries, k=5, n_cand=20, round_partitions=7
    ).collect()
    assert sorted(map(tuple, adaptive)) == sorted(map(tuple, serial))
    assert sorted(map(tuple, adaptive)) == sorted(map(tuple, wide))


# --------------------------------------------------------------------------
# quality_survivors: quality-aware dedup keep policy (third-wave r11)
# --------------------------------------------------------------------------

def test_quality_survivors_picks_best_member_not_min_id(spark):
    from big_data_elt_pipeline_spark.operators import dedup as DD

    good = ("the quick brown fox jumps over the lazy dog and then "
            "it runs far away to find some food for the long winter ") * 3
    docs = spark.createDataFrame(
        [(1, "x."), (2, good), (3, "y!!!!"), (9, "unclustered doc")],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id1 int, id2 int")
    out = DD.quality_survivors(docs, pairs).collect()
    assert len(out) == 1  # one transitive cluster; doc 9 has no pairs
    row = out[0]
    assert row["cluster_id"] == 1          # component min
    assert row["survivor_id"] == 2         # best quality, NOT min id
    assert row["cluster_size"] == 3
    assert bool(row["differs_from_min_id"]) is True


def test_quality_survivors_survivor_is_cluster_max_quality(spark):
    """On the real corpus: each survivor is a member of its cluster and
    carries the cluster-max quality (ties to the lowest id)."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.functions.text import quality_score
    from big_data_elt_pipeline_spark.operators import dedup as DD
    from big_data_elt_pipeline_spark.plans.text_queries import _docs2

    docs2 = _docs2(spark, SF_SMOKE)
    pairs = DD.minhash_dedup(docs2, threshold=0.5).select("id1", "id2")
    out = DD.quality_survivors(docs2, pairs)
    clusters = DD.neardup_clusters(pairs).select("doc_id", "cluster_id")
    q = docs2.select("doc_id", quality_score(F.col("text")).alias("quality"))
    mem = clusters.join(q, "doc_id")
    mx = mem.groupBy("cluster_id").agg(F.max("quality").alias("maxq"))
    joined = out.join(mx, "cluster_id").join(
        mem.withColumnRenamed("doc_id", "survivor_id"),
        ["cluster_id", "survivor_id"],
    )
    bad = joined.filter(
        (F.col("survivor_quality") != F.col("maxq"))
        | (F.col("quality") != F.col("survivor_quality"))
    ).count()
    assert bad == 0
    assert joined.count() == out.count()  # every survivor is a member


# --------------------------------------------------------------------------
# char_entropy: gibberish/binary quality signal (fifth-wave r11)
# --------------------------------------------------------------------------

def test_char_entropy_flags_junk_not_text(spark):
    import math

    from big_data_elt_pipeline_spark.operators.quality import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaaaaaaaaaa"),            # single symbol
            (2, "ababababababababababab"),              # two symbols, 1 bit
            (3, "The quick brown fox jumps over the lazy dog."),
            (4, "abcdefgh"),                            # uniform 8 -> 3 bits
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy_bits"] == 0.0 and bool(out[1]["low_entropy"])
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-5 and bool(out[2]["low_entropy"])
    assert out[3]["entropy_bits"] > 3.5 and not bool(out[3]["low_entropy"])
    assert abs(out[4]["entropy_bits"] - 3.0) < 1e-5
    assert out[1]["top_char_share"] == 1.0
    assert out[4]["top_char_share"] == 0.125
    # entropy can never exceed log2(alphabet size) (+ 6-dp quantization slack)
    for r in out.values():
        assert r["entropy_bits"] <= math.log2(r["n_distinct_chars"]) + 1e-4 or r["n_distinct_chars"] == 1


def test_char_entropy_corpus_sane(spark):
    """Real corpus: every doc is natural text — entropy in (2, 6.5] bits,
    top-char share below 0.5 (space/e domination stays partial)."""
    from big_data_elt_pipeline_spark.operators.quality import char_entropy

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = char_entropy(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 2.0 < r["entropy_bits"] <= 6.5, (r["doc_id"], r["entropy_bits"])
        assert 0.0 < r["top_char_share"] < 0.5
        assert not bool(r["low_entropy"])


# --------------------------------------------------------------------------
# auto_cells: corpus-derived IVF cell counts (the auto_bits discipline,
# one operator family over — a fixed n_cells makes the probed candidate
# set linear in corpus size)
# --------------------------------------------------------------------------

def test_auto_cells_equals_clamped_pow2_sqrt():
    import math

    from big_data_elt_pipeline_spark.operators import similarity as S

    t = S.TARGET_CELL_ROWS
    for n in [1, 10, 500, 5000, 8192, 8193, 50_000, 10**6, 10**9,
              t * 16, t * 16 + 1, t * 64, t * 64 + 1]:
        # textbook form: 2^ceil(b/2) with b = exact doubling count
        b = 0
        while t * (1 << b) < n and b < S._CELLS_DOUBLINGS:
            b += 1
        want = max(S.AUTO_CELLS_LO, min(S.AUTO_CELLS_HI, 1 << ((b + 1) // 2)))
        assert S.auto_cells(n) == want, (n, S.auto_cells(n), want)
    # the sqrt(n/target) balance: between the clamps, assignment work per
    # vector (= n_cells) and probed rows per query (= n_probe * n/n_cells)
    # both track ~sqrt(n) within the 2x power-of-two quantization
    for n in (2_000_000, 8_000_000, 32_000_000):
        c = S.auto_cells(n)
        root = math.sqrt(n / t)
        assert root / 2 <= c <= root * 2.1, (n, c, root)


def test_auto_cells_reproduces_fixture_counts(spark):
    """Both gate fixtures land on the lo clamp (500 and 5000 rows at
    target 512), so switching the IVF queries to auto changed no oracle
    value — the same invariant the auto-bits switch pinned."""
    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert S.derive_cells(emb) == 16


def test_ivfpq_auto_equals_explicit_derived(spark):
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 8)
    cells = S.derive_cells(emb)
    auto = {tuple(r) for r in S.ivfpq_topk(emb, q, k=5).collect()}
    explicit = {tuple(r) for r in S.ivfpq_topk(emb, q, k=5, n_cells=cells).collect()}
    assert auto == explicit and len(auto) == 40
