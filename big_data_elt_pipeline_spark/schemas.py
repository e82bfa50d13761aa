"""Central schema registry.

The reference scatters four copies of its required-column contracts
(``flows/silver_transformation.py:12-13``, ``flows/gold_transformation.py:49-52``,
``flows_spark/silver_transformation_spark.py:21-24``); here they live once,
as explicit StructTypes (SURVEY.md §1.2-1.3). Explicit schemas also keep CSV
scans deterministic (no ``inferSchema`` sampling pass) and let parquet scans
prune columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# --- reference domain: canonical column types (SURVEY.md §1.2) -------------

CLIENTS_RAW = T.StructType(
    [
        T.StructField("id_client", T.StringType()),  # raw: coerce later
        T.StructField("nom", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("date_inscription", T.StringType()),
        T.StructField("pays", T.StringType()),
    ]
)

ACHATS_RAW = T.StructType(
    [
        T.StructField("id_achat", T.StringType()),
        T.StructField("id_client", T.StringType()),
        T.StructField("date_achat", T.StringType()),
        T.StructField("montant", T.StringType()),
        T.StructField("produit", T.StringType()),
    ]
)

CLIENTS_SILVER = T.StructType(
    [
        T.StructField("id_client", T.LongType(), False),
        T.StructField("nom", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("date_inscription", T.DateType()),
        T.StructField("pays", T.StringType()),
    ]
)

ACHATS_SILVER = T.StructType(
    [
        T.StructField("id_achat", T.LongType(), False),
        T.StructField("id_client", T.LongType(), False),
        T.StructField("date_achat", T.TimestampType()),
        T.StructField("montant", T.DoubleType()),
        T.StructField("produit", T.StringType()),
    ]
)

REQUIRED_CLIENT_COLS = [f.name for f in CLIENTS_SILVER.fields]
REQUIRED_ACHAT_COLS = [f.name for f in ACHATS_SILVER.fields]

# Golden gold-layer output contracts, ported from the reference's
# ``scripts/check_gold.py:7-46`` (FIXTURES.md "Expected gold output schemas").
GOLD_EXPECTED_COLUMNS: dict[str, list[str]] = {
    "fact_achats": ["id_achat", "id_client", "date_achat", "montant", "produit", "mois", "pays"],
    "dim_clients": [
        "id_client", "nom", "email", "pays", "date_inscription",
        "first_purchase", "last_purchase", "recency_days", "tenure_days",
        "total_orders", "total_spend",
    ],
    "client_features": [
        "id_client", "freq_12m", "monetary_12m", "monetary_avg_12m",
        "recency_days", "tenure_days", "product_diversity_12m",
    ],
    "client_scores": [
        "id_client", "prob_reachat_12m", "expected_value_12m",
        "value_at_risk_12m", "segment_label", "recency_days", "freq_12m",
        "monetary_12m",
    ],
    "segment_summary": ["segment_label", "expected_value_12m", "clients"],
    "ca_monthly": ["mois", "ca"],
    "ca_country": ["pays", "ca"],
    "ca_product": ["produit", "ca"],
    "cohort_first_purchase": ["first_purchase_month", "clients", "ca"],
    "daily": ["jour", "ca", "achats"],
    "weekly": ["semaine", "ca", "achats"],
    "distribution": ["bucket", "count"],
    "monthly_growth": ["mois", "ca", "prev_ca", "growth_abs", "growth_pct"],
}


def require_columns(df: DataFrame, cols: list[str], table: str) -> DataFrame:
    """Pre-flight schema contract (reference raises on missing columns,
    ``flows/silver_transformation.py:25-28``). Driver-side check on
    ``df.schema`` — no job is triggered."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{table}: missing required columns {missing}")
    return df
