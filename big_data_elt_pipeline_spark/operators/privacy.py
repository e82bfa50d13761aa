"""PII detection and redaction for training-data governance.

Beyond-reference surface: before text reaches a training mixture, emails /
phone numbers / IP addresses must be detected (for audit counts) and redacted
(for the shipped corpus). Everything here is pure Catalyst regexp expressions
(``regexp_count`` / ``regexp_replace``) — JVM-side, codegen-friendly, no
Python in the hot path, so the scan+scrub fuses into one whole-stage-codegen
pass over the corpus at 100 TB.

The regexes are deliberately restricted to constructs Java ``java.util.regex``
and RE2 (the DuckDB oracle engine) interpret identically: explicit ASCII
classes, bounded repetition, ``\\b`` word boundaries, non-capturing groups —
no lookbehind, no unicode classes. Parity is proven by the DuckDB oracle in
``plans/curation_queries.py`` (driver gate + local sweep).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered (pattern, replacement) — applied in this order so an email's
# host part is never half-eaten by the IP rule first.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

PII_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII hit counts (audit trail columns)."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_RULES
    }


def redact(col: Column) -> Column:
    """Replace every PII span with its typed placeholder, email → phone →
    ip order (rule order matters: see module docstring)."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out
