"""Spark ML workloads (reference ``scripts/train_advisor.py`` re-expressed)."""
