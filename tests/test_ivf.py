"""IVF ANN: deterministic under a fixed seed, recall above floor."""

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators.similarity import brute_force_topk, ivf_topk
from big_data_elt_pipeline_spark.sources.tpch import read_table
from tests.conftest import SF_SMOKE


def test_ivf_recall_and_determinism(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    bf = brute_force_topk(emb, q, k=5).toPandas()
    ivf = ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).toPandas()
    recall = bf.merge(ivf, on=["query_id", "vec_id"]).shape[0] / len(bf)
    assert recall >= 0.3  # random unit vectors: weak structure, modest floor
    ivf2 = ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).toPandas()
    key = ["query_id", "rank"]
    assert ivf.sort_values(key).reset_index(drop=True).equals(
        ivf2.sort_values(key).reset_index(drop=True)
    )


def test_ivf_probes_fraction_of_corpus(spark):
    """The candidate set is a fraction of the corpus (the point of IVF)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(emb, q, k=5, n_cells=16, n_probe=2)
    # with 2/16 cells probed, every query still fills its top-5
    pdf = out.toPandas()
    assert (pdf.groupby("query_id")["rank"].max() == 5).all()
