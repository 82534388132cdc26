"""PII scrubbing for training corpora (pure regex columns).

The standard pre-training redaction pass: emails, SSN-shaped ids, US
phone numbers, and IPv4 addresses are replaced with typed placeholder
tokens, with per-type match counts kept for audit. Patterns are
deliberately RE2-safe (no lookarounds, no backrefs) so Spark's Java regex
and DuckDB's RE2 agree match-for-match — the q_pii_scrub oracle depends
on that.

Replacement ORDER is fixed and semantic: SSN before phone (both are
digit-dash shapes; `\\d{3}-\\d{2}-\\d{4}` must claim its matches before
the phone pattern could partially overlap), email before IP (a host part
could contain a dotted quad). Counts are taken BEFORE any replacement so
each reflects the original text.

Real deployments layer NER models on top for names; that tier is
model-dependent and out of the deterministic engine (same ADR stance as
the marker/soffice extractors in README).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) in replacement order
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Adds ``out_col`` plus ``n_<type>`` count columns per PII type."""
    out = df
    for name, pattern, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pattern)).cast("bigint"),
        )
    scrubbed = F.col(text_col)
    for name, pattern, placeholder in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pattern, placeholder)
    return out.withColumn(out_col, scrubbed)
