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
pair (a,a) becomes "aa aa", not three overlapping merges). That greedy
scan looks inherently sequential, but it is exactly a gaps-and-islands
problem: mark every position where (sym, next_sym) matches the pair;
consecutive match positions form an island; within an island starting at
s, the greedy scan applies the merge at s, s+2, s+4, ... — i.e. a match
at position p is applied iff (p - island_start) is even. Islands are the
standard (p - row_number) grouping, so one window + one parity filter
reproduces the sequential semantics.

Scale shape: everything runs on the (word, freq) VOCABULARY relation, not
the corpus — the corpus is touched once by the word-count aggregation
(partial-aggregated groupBy, the classic wordcount). Per round: one
bounded groupBy over the pair space, one LIMIT-1 top-row (deterministic
(count desc, pair asc) total order), two vocabulary-partitioned windows
(per-word partitions, bounded by word length — no hot keys), and a
checkpointed symbol-relation refresh. Positions are renumbered DENSE
(row_number() - 1) after every merge: the island-parity filter and the
"consumed slot = p + 1" deletion are both position ARITHMETIC, so they
are only correct when adjacency means p + 1 — a sparse-position variant
mis-groups overlap chains once a merged symbol sits two slots from its
neighbor (see the inline comment at the merge step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    # (word, freq, p, sym): p in [0, len]; p == len is the </w> marker
    syms = words.select(
        "word",
        "freq",
        F.posexplode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.substr(F.col("word"), i, F.lit(1)),
                ),
                F.array(F.lit(BPE_EOW)),
            )
        ).alias("p", "sym"),
    ).localCheckpoint(eager=True)

    wv = Window.partitionBy("word").orderBy("p")
    merge_rows = []
    for r in range(1, rounds + 1):
        withnext = syms.withColumn("nx", F.lead("sym").over(wv))
        best = (
            withnext.filter(F.col("nx").isNotNull())
            .groupBy(F.col("sym").alias("la"), F.col("nx").alias("rb"))
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
        # greedy non-overlapping application via island parity
        mt = (
            withnext.crossJoin(F.broadcast(best))
            .filter((F.col("sym") == F.col("la")) & (F.col("nx") == F.col("rb")))
            .select("word", "p")
        )
        isl = mt.withColumn("grp", F.col("p") - F.row_number().over(wv))
        ap = (
            isl.withColumn(
                "s0", F.min("p").over(Window.partitionBy("word", "grp"))
            )
            .filter((F.col("p") - F.col("s0")) % 2 == 0)
            .select("word", "p", F.lit(True).alias("m"))
        )
        consumed = ap.select("word", (F.col("p") + 1).alias("p"),
                             F.lit(True).alias("c"))
        # positions are renumbered dense after every merge: a consumed
        # slot is "the next position", and island parity means
        # "consecutive matches" — both are position ARITHMETIC, so they
        # are only correct when adjacency is p+1. (A sparse-position
        # variant mis-groups overlap chains once a merged symbol sits
        # next to a symbol two slots away — caught by the oracle, which
        # learned an impossible (x</w>, </w>) cross-marker merge.)
        syms = (
            syms.join(ap, ["word", "p"], "left")
            .join(consumed, ["word", "p"], "left")
            .filter(F.col("c").isNull())
            .crossJoin(F.broadcast(best.select("la", "rb")))
            .select(
                "word",
                "freq",
                "p",
                F.when(F.col("m"), F.concat("la", "rb"))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .withColumn("p", F.row_number().over(wv) - F.lit(1))
            .localCheckpoint(eager=True)
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out, syms


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
    syms = vocab.select(
        "word",
        F.posexplode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.substr(F.col("word"), i, F.lit(1)),
                ),
                F.array(F.lit(BPE_EOW)),
            )
        ).alias("p", "sym"),
    ).localCheckpoint(eager=True)
    wv = Window.partitionBy("word").orderBy("p")
    for _, la, rb in ordered:
        withnext = syms.withColumn("nx", F.lead("sym").over(wv))
        mt = withnext.filter(
            (F.col("sym") == F.lit(la)) & (F.col("nx") == F.lit(rb))
        ).select("word", "p")
        isl = mt.withColumn("grp", F.col("p") - F.row_number().over(wv))
        ap = (
            isl.withColumn(
                "s0", F.min("p").over(Window.partitionBy("word", "grp"))
            )
            .filter((F.col("p") - F.col("s0")) % 2 == 0)
            .select("word", "p", F.lit(True).alias("m"))
        )
        consumed = ap.select("word", (F.col("p") + 1).alias("p"),
                             F.lit(True).alias("c"))
        syms = (
            syms.join(ap, ["word", "p"], "left")
            .join(consumed, ["word", "p"], "left")
            .filter(F.col("c").isNull())
            .select(
                "word",
                "p",
                F.when(F.col("m"), F.lit(la + rb)).otherwise(F.col("sym")).alias(
                    "sym"
                ),
            )
            .withColumn("p", F.row_number().over(wv) - F.lit(1))
            .localCheckpoint(eager=True)
        )
    pieces = syms.groupBy("word").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("p", "sym"))), lambda s: s.sym
        ).alias("pieces")
    )
    return words.join(pieces, "word").select(id_col, "word", "pieces")
