"""big_data_elt_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference ELT pipeline (BigZoo92/big-data-elt-pipeline,
surveyed in SURVEY.md): medallion bronze→silver→gold transformations over a
retail star schema, serving-layer rollups, scoring/segmentation, plus
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference does not have.

Design stance (SURVEY.md §7):
- One shared SparkSession (AQE on, UTC, tuned shuffle partitions).
- Central schemas; pure DataFrame→DataFrame operator functions.
- Catalyst does the optimizing; we declare plans, broadcast small dims,
  persist shared subplans, and keep everything inside whole-stage codegen.
- Canonical semantics follow the reference's pandas variant where its two
  implementations disagree (exact percentiles, deterministic dedup,
  true min-max normalization, both date bounds).
"""

__version__ = "0.1.0"

from big_data_elt_pipeline_spark.session import get_spark  # noqa: F401
