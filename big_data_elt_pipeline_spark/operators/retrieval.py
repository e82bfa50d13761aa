"""BM25 ranked retrieval over the documents corpus — the lexical-search
half of a training-data pipeline (near-dup finds copies; BM25 finds the
documents ABOUT something: contamination probes, topic audits, targeted
curation pulls).

Spark-first shape (all Catalyst, zero UDFs):
- tokenize = ``split(lower(text), '[^a-z]+')`` + explode — one map-only
  pass producing the (doc, term) long relation;
- term frequencies / doc lengths / document frequencies are three
  aggregations over that relation, each map-side-partial;
- corpus scalars (N, avgdl) ride a single-row broadcast join — they never
  leave the JVM (no ``.collect()`` round-trip);
- query terms are a broadcast dimension: scoring is ONE equi-join from
  the posting relation to the query terms, then a per-(query, doc)
  aggregation and a windowed top-k. At 100 TB the only big shuffle is the
  groupBy(doc_id, term) — everything downstream of the posting list is
  candidate-sized (docs sharing at least one query term).

Determinism contract: every per-term score contribution is quantized to
1e-6 and summed as DECIMAL — floating-point addition is not associative,
so an unquantized double sum would depend on partitioning; the quantized
decimal sum is EXACTLY associative, making scores bit-stable under any
cluster layout (and lining up with the DuckDB oracle, whose ``ln`` differs
from the JVM's in the last ulp — measured, see tests/test_retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z]+"


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) relation: lowercase, split on non-letter runs, drop
    empties. Map-only (explode is a generator, not a shuffle)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``docs``: (doc_id, text); ``queries``: (query_id, query_text) —
    dimension-sized (a probe set, not a second corpus). Returns
    (query_id, rank, doc_id, score) with the deterministic tie-break
    (score desc, doc_id asc).

    BM25 with the standard Robertson idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    (non-negative variant); repeated query terms count once (unweighted
    query side — the common choice for short probe queries).
    """
    tokens = tokenize(docs, "doc_id", "text")
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl and df both derive from tf, not from the raw token relation: the
    # rollups shuffle |doc x distinct-term| rows instead of every token
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )

    qterms = (
        tokenize(queries, "query_id", "query_text").distinct()
    )

    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    tf_factor = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contribution = F.round(F.col("idf") * tf_factor, 6).cast("decimal(25,6)")

    # df/idf restricted to QUERY terms before anything touches the posting
    # relation: idf_tbl is |query vocab| rows (tiny) regardless of corpus
    # vocabulary size, and it carries avgdl so no second scalar join
    idf_tbl = (
        dfreq.join(F.broadcast(qterms.select("term").distinct()), "term")
        .crossJoin(F.broadcast(corpus))
        .select("term", idf.alias("idf"), "avgdl")
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")  # candidate postings only
        .join(F.broadcast(idf_tbl), "term")
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contribution).cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    k: int = 10,
    c: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_cols: tuple[str, str] = ("lex_rank", "vec_rank"),
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al. 2009):
    ``rrf = Σ 1/(c + rank)`` over the lists an id appears in, top-``k`` per
    query by (rrf desc, id asc).

    ``lex`` and ``vec`` are (query_id, id, rank) relations — e.g. BM25 and
    embedding-cosine retrieval depths. A full outer join on (query, id)
    keeps ids present in only one list (the other contributes 0); the two
    reciprocal terms are exact IEEE divisions summed in a fixed order, so
    fusion scores are bit-identical across engines.

    Scale shape: both inputs are |queries| × depth rows (bounded, tiny
    next to any corpus); the join and the top-k window both key on
    query_id — one bounded exchange end to end.
    """
    lr, vr = rank_cols
    left = lex.select(query_id_col, id_col, F.col("rank").alias(lr))
    right = vec.select(query_id_col, id_col, F.col("rank").alias(vr))
    fused = (
        left.join(right, [query_id_col, id_col], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col(lr)), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col(vr)), F.lit(0.0)),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, lr, vr, "rrf_score", "rank")
        .orderBy(query_id_col, "rank")
    )
