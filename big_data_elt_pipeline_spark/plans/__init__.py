"""Query registry: named DataFrame plans + equivalent ANSI-SQL oracles.

Importing ``queries`` here makes ANY entry into the package (including a
direct ``plans.<submodule>`` import) run the full registration +
gate-reorder sequence first — without this, importing a plan submodule
before ``plans.queries`` would leave it partially initialized when the
reorder's completeness check runs (circular tail-import hazard)."""

from big_data_elt_pipeline_spark.plans import queries  # noqa: F401
