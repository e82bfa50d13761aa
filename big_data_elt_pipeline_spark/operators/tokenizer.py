"""BPE tokenizer training as relational algebra (beyond-reference surface).

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") is the tokenizer-training loop of every
modern LLM data pipeline: repeatedly find the most frequent adjacent
symbol pair in the corpus vocabulary and merge it. Reference
implementations are imperative (a Python dict of pair counts and in-place
list surgery); this one is a fixed number of PURELY RELATIONAL rounds, so
the learned merge table is value-hashable cross-engine and the working
set is never driver-side.

The non-trivial part is the merge itself: BPE applies a chosen pair
GREEDILY LEFT-TO-RIGHT WITHOUT OVERLAP within each word ("aaaa" under
pair (a,a) becomes "aa aa", not three overlapping merges). The greedy
scan is per-word with bounded state, so it runs as a single fold
expression over the word's symbol ARRAY (``_apply_merge``): the scan
holds one symbol; held == left and next == right merge (and the merged
symbol, held, can never re-match as the left side within the round —
exactly the "right half is consumed" non-overlap rule).

Scale shape: everything runs on the (word, freq) VOCABULARY relation, not
the corpus — the corpus is touched once by the word-count aggregation
(partial-aggregated groupBy, the classic wordcount). The state is one
row per word (word, freq, syms array). Per training round: one bounded
groupBy over the pair space (adjacency read off the array for free — a
zip of the array with its own tail), one LIMIT-1 top-row (deterministic
(count desc, pair asc) total order), and a map-side fold + checkpointed
state refresh — no window shuffles anywhere. Segmentation replays the
whole merge table as one nested fold (merge table outer, per-merge scan
inner) in a single projection per distinct word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions.text import tokens

BPE_ROUNDS = 8
BPE_EOW = "</w>"


def bpe_train(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
) -> DataFrame:
    """The merge table of ``bpe_train_state`` (the common entry point)."""
    merges, _ = bpe_train_state(docs, rounds, text_col)
    return merges


def bpe_train_state(
    docs: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(merge table, final symbol relation): the BPE merge table —
    (merge_round, left_sym, right_sym, merged, pair_count) — after
    ``rounds`` merges over the whitespace-token vocabulary of ``docs``,
    plus the post-merge (word, freq, p, sym) state (the tokenized
    vocabulary, e.g. for a learned-piece corpus histogram).
    Initial symbols are the word's characters plus a terminal ``</w>``
    marker (so merges can learn word-final units, per Sennrich et al.);
    pair counts are frequency-weighted by word occurrence counts; the
    round's winner is the (count desc, left asc, right asc) total-order
    maximum, so the table is deterministic everywhere.
    """
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # ARRAY-FORM state (r14 optimization, guide §2.3/§2.4): the working
    # relation is (word, freq, syms ARRAY) — one row per word instead of
    # one per symbol. The pair census reads adjacency for free (zip of
    # the array with its own tail: identical pairs to the former
    # (sym, next_sym) rows), and the merge application is a map-side
    # fold (``_apply_merge``), so each round is ONE exchange (the census
    # groupBy) + a projection + the checkpoint — the exploded form paid
    # two whole-relation window shuffles per round on ~7x the rows.
    syms = words.select(
        "word", "freq", _char_syms(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)

    merge_rows = []
    for r in range(1, rounds + 1):
        best = (
            syms.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("la"), b.alias("rb")),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.la").alias("la"), F.col("pr.rb").alias("rb"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "la", "rb")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        # pair space exhausted (every word fully merged) — an empty winner
        # would wipe ``syms`` through the crossJoin below; stop at the
        # converged state instead. (The unrolled oracle SQL has no such
        # guard: its round count must stay below the corpus's merge depth,
        # which every gate corpus satisfies by construction.)
        if best.isEmpty():
            break
        merge_rows.append(
            best.select(
                F.lit(r).alias("merge_round"),
                F.col("la").alias("left_sym"),
                F.col("rb").alias("right_sym"),
                F.concat("la", "rb").alias("merged"),
                F.col("cnt").cast("long").alias("pair_count"),
            )
        )
        syms = (
            syms.crossJoin(F.broadcast(best.select("la", "rb")))
            .select(
                "word",
                "freq",
                _apply_merge(F.col("syms"), F.col("la"), F.col("rb")).alias(
                    "syms"
                ),
            )
            .localCheckpoint(eager=True)
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    final = syms.select(
        "word", "freq", F.posexplode("syms").alias("p", "sym")
    )
    return out, final


def _char_syms(word):
    """The initial symbol array of a word: its characters + ``</w>``."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(BPE_EOW)),
    )


def _apply_merge(arr, la, rb):
    """Greedy non-overlapping left-to-right application of merge
    (``la``, ``rb``) to a symbol array, as ONE fold expression.

    The scan carries (out, lst): if the held symbol is ``la`` and the
    next is ``rb`` they merge (the merged symbol is held — it can never
    re-match as ``la`` because ``la || rb != la`` for non-empty ``rb``,
    which is exactly the "right half is consumed" parity rule);
    otherwise the held symbol is emitted. This reproduces the island-
    parity semantics the former window chain computed (a run of k
    consecutive matches merges at offsets 0, 2, 4, ... — here the merge
    at offset 0 consumes offset 1's left symbol, making offset 1 a
    non-match, and so on by induction). ``slice(arr, 1, 0)`` is the
    correctly-typed empty array."""
    init = F.struct(
        F.slice(arr, 1, 0).alias("out"), F.lit(None).cast("string").alias("lst")
    )

    def _step(acc, s):
        return F.when(
            acc["lst"].isNotNull() & (acc["lst"] == la) & (s == rb),
            F.struct(acc["out"].alias("out"), F.concat(la, rb).alias("lst")),
        ).otherwise(
            F.struct(
                F.when(
                    acc["lst"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["lst"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("lst"),
            )
        )

    return F.aggregate(
        arr,
        init,
        _step,
        lambda acc: F.when(
            acc["lst"].isNotNull(), F.concat(acc["out"], F.array(acc["lst"]))
        ).otherwise(acc["out"]),
    )


def bpe_segment(
    docs: DataFrame,
    merge_list: list[tuple[int, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, word, pieces): apply a learned merge table to segment each
    distinct word of ``docs`` — replays the merges IN TRAINING ORDER
    (standard BPE inference) with the same island-parity relational merge
    as training, then reassembles per-word piece arrays. ``merge_list``
    is (round, left, right) tuples — the trained model is
    tokenizer-config-sized (tens of thousands of rows at most), i.e. a
    hyperparameter, so it arrives as plain Python rather than a
    DataFrame; the operator itself stays collect-free."""
    ordered = sorted(merge_list)
    words = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    vocab = words.select("word").distinct()
    # the whole merge replay is ONE fold over the (literal) merge table
    # with the per-merge greedy application as the inner fold — a single
    # map-side projection per distinct word, no rounds, no checkpoints
    # (r14 optimization; the former form paid one checkpointed window
    # round PER MERGE). The lambda binds each merge's (la, rb) once, so
    # the expression tree is constant-size in the merge count.
    if ordered:
        merges_arr = F.array(
            *[
                F.struct(F.lit(la).alias("la"), F.lit(rb).alias("rb"))
                for _, la, rb in ordered
            ]
        )
        seg = F.aggregate(
            merges_arr,
            _char_syms(F.col("word")),
            lambda acc, m: _apply_merge(acc, m["la"], m["rb"]),
        )
    else:
        seg = _char_syms(F.col("word"))
    pieces = vocab.select("word", seg.alias("pieces"))
    return words.join(pieces, "word").select(id_col, "word", "pieces")


# --------------------------------------------------------------------------
# Unigram-LM (SentencePiece-class) segmentation — the second tokenizer
# family (Kudo 2018, "Subword Regularization: Improving Neural Network
# Translation Models with Multiple Subword Candidates"). BPE is greedy
# bottom-up merging; the unigram model instead scores every segmentation
# of a word by the sum of per-piece log-probabilities and keeps the
# Viterbi-best path. Reference implementations run an imperative
# forward DP per word; here the DP is UNROLLED RELATIONAL ROUNDS over the
# end-position axis — round j computes the best path ending at character
# j for EVERY word at once (one bounded join + one min-struct survivor),
# so the trained table and the segmentation are value-hashable
# cross-engine and nothing ever leaves the cluster.
#
# Scale shape: everything after the wordcount runs on the VOCABULARY
# relation (distinct words), exactly like BPE above — the corpus is
# touched once. The candidate relation (word, start, piece) is bounded by
# |vocab| * max_word_len * max_piece_len; each DP round joins the
# frontier (<= |vocab| rows) to the candidates ending at that position
# and keeps one survivor per word via min(struct(neg_score, path)) — the
# skew-safe argmin idiom, no hot keys because partitions are per-word.
# --------------------------------------------------------------------------

UNI_MAX_PIECE = 4    # max piece length considered by the seed vocabulary
UNI_MAX_WORD = 12    # DP rounds; words longer than this segment as <unk>
UNI_VOCAB_TOP = 32   # multi-char pieces kept by the seed cut
UNI_SEP = "\x1f"     # path separator (unit separator; never in tokens)


def _uni_words(docs: DataFrame, text_col: str, max_word: int = UNI_MAX_WORD) -> DataFrame:
    """(word, freq) for words short enough to segment (<= UNI_MAX_WORD);
    longer words are the documented <unk> path."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= max_word))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _uni_candidates(words: DataFrame) -> DataFrame:
    """(word, freq, start, piece): every substring of every vocabulary
    word with length 1..UNI_MAX_PIECE — the shared relation both the seed
    counts and the DP rounds read. Bounded by
    |vocab| * UNI_MAX_WORD * UNI_MAX_PIECE rows."""
    return words.select(
        "word",
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.length("word") - 1),
                    lambda s: F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(UNI_MAX_PIECE)),
                            lambda k: F.struct(
                                s.alias("start"),
                                F.substr(
                                    F.col("word"), s + 1, k
                                ).alias("piece"),
                                k.alias("klen"),
                            ),
                        ),
                        lambda st: st.start + st.klen <= F.length("word"),
                    ),
                )
            )
        ).alias("c"),
    ).select("word", "freq", F.col("c.start").alias("start"), F.col("c.piece").alias("piece"))


def unigram_seed_vocab(
    docs: DataFrame, text_col: str = "text", max_word: int = UNI_MAX_WORD
) -> DataFrame:
    """(piece, seed_count, logp): the seed unigram vocabulary — ALL single
    characters (coverage guarantee: every word stays segmentable after
    pruning, the SentencePiece invariant) plus the top UNI_VOCAB_TOP
    multi-character substrings by frequency-weighted occurrence count
    (the suffix-array seed approximation of Kudo 2018 §3.2, as one
    substring-explode + wordcount-shaped groupBy). logp = round(ln(count /
    total), 6) — the snapped-transcendental idiom (BM25/source_mixture
    discipline), so both engines hold byte-identical doubles.

    The multi-char cut is orderBy(count desc, piece asc).limit(K) —
    Spark's distributed TakeOrderedAndProject, never a global sort."""
    return _seed_from_words(_uni_words(docs, text_col, max_word))


def _seed_from_words(words: DataFrame) -> DataFrame:
    """``unigram_seed_vocab`` over a prebuilt (word, freq) relation — the
    composed operators checkpoint ONE words relation and feed it to the
    seed count, the EM pass and the final segmentation, so the corpus
    wordcount runs once instead of once per stage (the lm_scores
    one-corpus-scan discipline)."""
    cand = _uni_candidates(words)
    counts = cand.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("seed_count")
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("seed_count"), F.asc("piece"))
        .limit(UNI_VOCAB_TOP)
    )
    vocab = chars.unionAll(multi)
    tot = F.broadcast(vocab.agg(F.sum("seed_count").cast("long").alias("t")))
    return vocab.crossJoin(tot).select(
        "piece",
        "seed_count",
        F.round(
            F.log(F.col("seed_count").cast("double") / F.col("t").cast("double")),
            6,
        ).alias("logp"),
    )


def _uni_viterbi(words: DataFrame, vocab: DataFrame, max_word: int = UNI_MAX_WORD) -> DataFrame:
    """(word, freq, path, n_pieces): Viterbi-best segmentation of every
    vocabulary word under ``vocab`` (piece, logp) — the forward DP as ONE
    map-side ``aggregate`` expression per word against the broadcast
    (piece -> neg_logp) map (r14 optimization, guide §1.2/§2.4): the DP
    is per-word with bounded state (<= UNI_MAX_WORD positions), so
    nothing about it needs a shuffle — the former form unrolled it as
    UNI_MAX_WORD checkpointed relational rounds (12 barrier jobs, ~3
    exchanges each, per call) where this one is a single projection,
    embarrassingly parallel at any corpus size.

    Arithmetic is unchanged: position j keeps the minimum
    (neg_score, path) struct over the <= UNI_MAX_PIECE ways of reaching
    it — neg_score a DECIMAL(25,6) sum of 6-dp logp values (exact,
    associative) and the path string breaking exact ties, so the
    survivor is the same total-order argmin the round form produced
    (``array_min`` skips the NULL candidates exactly as the join
    dropped vocab-missing pieces). A word whose final position is
    unreachable is dropped, as before. ``max_word`` stays in the
    signature for callers that bound the words relation themselves."""
    vmap = F.broadcast(
        vocab.groupBy().agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "piece",
                            (
                                F.lit(0).cast("decimal(25,6)")
                                - F.round("logp", 6).cast("decimal(25,6)")
                            ).alias("w"),
                        )
                    )
                )
            ).alias("vm")
        )
    )
    word = F.col("word")
    zero = F.struct(
        F.lit(0).cast("decimal(25,6)").alias("ns"), F.lit("").alias("path")
    )

    def _step(acc, j):
        def _cand(k):
            prev = F.element_at(acc, (j - k + F.lit(1)).cast("int"))
            piece = word.substr(j - k + F.lit(1), k)
            w = F.element_at(F.col("vm"), piece)
            return F.when(
                prev.isNotNull() & w.isNotNull(),
                F.struct(
                    (prev["ns"] + w).cast("decimal(25,6)").alias("ns"),
                    F.when(prev["path"] == "", piece)
                    .otherwise(F.concat(prev["path"], F.lit(UNI_SEP), piece))
                    .alias("path"),
                ),
            )

        best = F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.least(j, F.lit(UNI_MAX_PIECE))), _cand
            )
        )
        return F.concat(acc, F.array(best))

    dp = words.crossJoin(vmap).select(
        "word",
        "freq",
        F.element_at(
            F.aggregate(
                F.sequence(F.lit(1), F.length("word")), F.array(zero), _step
            ),
            F.length("word") + F.lit(1),
        ).alias("fin"),
    )
    return dp.filter(F.col("fin").isNotNull()).select(
        "word",
        "freq",
        F.col("fin.path").alias("path"),
        F.size(F.split("fin.path", UNI_SEP)).cast("long").alias("n_pieces"),
    )


def unigram_train(
    docs: DataFrame, text_col: str = "text", max_word: int = UNI_MAX_WORD
) -> tuple[DataFrame, DataFrame]:
    """(final vocab, seed vocab): one hard-EM (Viterbi) re-estimation round
    over the seed unigram vocabulary — the bounded-round variant of Kudo
    2018's EM loop (expected counts replaced by Viterbi-path counts, the
    standard hard-EM approximation; rounds are bounded exactly like the
    kmeans/logreg/pca trainers here). Final probabilities are add-one
    smoothed over the WHOLE vocabulary — ln((viterbi_count + 1) /
    (total + |vocab|)) — so pieces the Viterbi pass never used (including
    the coverage-guarantee single characters) keep a finite, deterministic
    log-prob instead of ln(0).

    Returns (piece, seed_count, viterbi_count, logp) ordered by piece."""
    words = _uni_words(docs, text_col, max_word).localCheckpoint(eager=False)
    return _train_from_words(words, max_word)


def _train_from_words(
    words: DataFrame, max_word: int = UNI_MAX_WORD
) -> tuple[DataFrame, DataFrame]:
    """``unigram_train`` over a prebuilt (ideally checkpointed) words
    relation — seed counts, the EM Viterbi pass and the re-estimation all
    read the SAME relation, so composers pay one corpus wordcount."""
    seed = _seed_from_words(words).localCheckpoint(eager=False)
    seg = _uni_viterbi(words, seed, max_word)
    vcounts = (
        seg.select("freq", F.explode(F.split("path", UNI_SEP)).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("viterbi_count"))
    )
    smoothed = seed.join(vcounts, "piece", "left").select(
        "piece",
        "seed_count",
        F.coalesce("viterbi_count", F.lit(0)).cast("long").alias("viterbi_count"),
    ).localCheckpoint(eager=False)
    tot = F.broadcast(
        smoothed.agg(
            F.sum("viterbi_count").cast("long").alias("t"),
            F.count(F.lit(1)).cast("long").alias("v"),
        )
    )
    final = smoothed.crossJoin(tot).select(
        "piece",
        "seed_count",
        "viterbi_count",
        F.round(
            F.log(
                (F.col("viterbi_count") + F.lit(1)).cast("double")
                / (F.col("t") + F.col("v")).cast("double")
            ),
            6,
        ).alias("logp"),
    )
    return final, seed


def unigram_doc_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word: int = UNI_MAX_WORD,
) -> DataFrame:
    """(doc_id, n_words, n_pieces, n_unk, pieces_per_word): per-document
    token counts under the TRAINED unigram model — train (seed + one
    Viterbi-EM round), then segment every distinct corpus word under the
    final log-probs and join the per-word piece counts back to the doc
    word relation (the ``bpe_doc_tokens`` apply-side shape). Words longer
    than UNI_MAX_WORD segment as one ``<unk>`` piece — the documented
    fallback, counted separately so the audit can see it."""
    uwords = _uni_words(docs, text_col, max_word).localCheckpoint(eager=False)
    final, _ = _train_from_words(uwords, max_word)
    final = final.localCheckpoint(eager=False)
    seg = _uni_viterbi(uwords, final, max_word).select("word", "n_pieces")
    words = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    per = words.join(F.broadcast(seg), "word", "left").select(
        id_col,
        F.coalesce("n_pieces", F.lit(1)).cast("long").alias("np"),
        F.when(F.col("n_pieces").isNull(), 1).otherwise(0).cast("long").alias("unk"),
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("np").cast("long").alias("n_pieces"),
            F.sum("unk").cast("long").alias("n_unk"),
        )
        .select(
            id_col,
            "n_words",
            "n_pieces",
            "n_unk",
            (F.col("n_pieces").cast("double") / F.col("n_words").cast("double"))
            .alias("pieces_per_word"),
        )
        .orderBy(id_col)
    )
