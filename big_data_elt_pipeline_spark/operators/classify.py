"""Distributed text classification as relational algebra: multinomial
Naive Bayes over hashed n-gram features.

Beyond-reference surface — the fastText-style quality/language classifier
every large corpus pipeline trains on a labeled split and sweeps over the
rest (CCNet's language filter, GPT-3's WebText-quality classifier). The
deliberate design point: Naive Bayes training IS counting, so both
training and inference stay inside the relational engine — no driver-side
model object, no pyspark.ml iterative job — and, with the repo's
log-snap + exact-DECIMAL discipline, the trained model and every
prediction are bit-identical across engines and partitionings (a
gradient-descent classifier can never be value-hashed; this one can).

Scale shape:
- training = one partial-aggregated groupBy over (class, bucket) — at
  most |classes| * buckets rows leave each partition regardless of corpus
  size — plus a |classes|-row prior table. Model <= |classes| * buckets
  rows -> broadcast.
- inference = explode features (generator), one broadcast join against
  the model, one doc-keyed aggregation, one bounded per-doc argmax
  (|classes| rows per doc). No shuffle grows faster than the corpus
  itself.

Citation: reference repo has no classifier; this follows multinomial NB
with Lidstone smoothing (Manning, Raghavan & Schütze, IIR §13.2),
re-expressed as DataFrame algebra. alpha defaults to 0.01, NOT Laplace's
1: with hashed buckets B comparable to a small class's token total,
add-one smoothing inflates every shared-feature likelihood ratio toward
the LARGEST class (measured ~0.4 nats per feature on the test corpus —
enough to swamp any genuine signal and collapse NB to the majority-class
predictor); at alpha=0.01 the distortion is ~0.007 nats per feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NB_BUCKETS = 4096
NB_ALPHA = 0.01


def nb_train(
    train: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = NB_BUCKETS,
    alpha: float = NB_ALPHA,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with Lidstone smoothing on hashed bigram counts.

    Returns ``(classes, model)``:
    - ``classes``: (label, log_prior, default_lp, tot) — one row per
      class; ``default_lp`` is the smoothed log-likelihood of a bucket
      the class never saw (ln(alpha/(tot+alpha*buckets)), snapped to 6
      decimals).
    - ``model``: (label, b, lp) — snapped per-(class, bucket)
      log-likelihoods; <= |classes| * buckets rows.

    Cross-engine exactness: ``alpha*buckets`` is computed ONCE in Python
    and injected as the same double literal on both sides.
    """
    ab = float(alpha) * buckets
    from big_data_elt_pipeline_spark.operators.sampling import _hashed_feats

    feats = _hashed_feats(train, id_col, text_col, 2, buckets).join(
        train.select(id_col, label_col), id_col
    )
    cls = (
        feats.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("tot"))
        .crossJoin(
            F.broadcast(
                feats.agg(F.count(F.lit(1)).alias("grand"))
            )
        )
        .select(
            F.col(label_col).alias("label"),
            F.round(
                F.log(F.col("tot").cast("double") / F.col("grand").cast("double")), 6
            ).alias("log_prior"),
            F.round(
                F.log(
                    F.lit(float(alpha))
                    / (F.col("tot").cast("double") + F.lit(ab))
                ),
                6,
            ).alias("default_lp"),
            "tot",
        )
    )
    model = (
        feats.groupBy(label_col, "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(cls), F.col(label_col) == F.col("label"))
        .select(
            "label",
            "b",
            F.round(
                F.log(
                    (F.col("cnt").cast("double") + F.lit(float(alpha)))
                    / (F.col("tot").cast("double") + F.lit(ab))
                ),
                6,
            ).alias("lp"),
        )
    )
    return cls, model


def nb_predict(
    docs: DataFrame,
    classes: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = NB_BUCKETS,
) -> DataFrame:
    """(id, predicted, score): argmax-class per document. Per-feature
    log-likelihoods are snapped doubles accumulated as DECIMAL(25,6)
    (exact, order-free); the argmax tie-break is (score desc, label asc)
    — a total order, so the prediction is deterministic everywhere.

    The argmax is ``min(struct(-score, label))`` — a partial-aggregated
    groupBy, not a row_number window: one exchange instead of two, and
    hot keys collapse map-side (the r7-verdict survivor-selection
    discipline), though here the group is bounded at |classes| rows."""
    from big_data_elt_pipeline_spark.operators.sampling import _hashed_feats

    feats = _hashed_feats(docs, id_col, text_col, 2, buckets)
    scored = (
        feats.join(F.broadcast(classes.select("label", "default_lp")), F.lit(True))
        .join(
            F.broadcast(model),
            ["label", "b"],
            "left",
        )
        .select(
            id_col,
            "label",
            F.coalesce(F.col("lp"), F.col("default_lp"))
            .cast("decimal(25,6)")
            .alias("term"),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("term").alias("ll"))
        .join(F.broadcast(classes.select("label", "log_prior")), "label")
        .select(
            id_col,
            "label",
            (F.col("ll") + F.col("log_prior").cast("decimal(25,6)")).alias("score"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("label"))
            ).alias("w")
        )
        .select(
            id_col,
            F.col("w.label").alias("predicted"),
            (-F.col("w.ns")).cast("double").alias("score"),
        )
    )
