"""PII detection and redaction for training-data curation.

Large-scale corpus pipelines scrub personally identifiable
information (emails, phone numbers, IP addresses) before training.
This module implements the scrub as pure ``regexp_count`` /
``regexp_replace`` expressions — JVM-side, whole-stage-codegen'd,
map-only (zero shuffle at any corpus size).

The patterns are deliberately restricted to syntax that means the
same thing in Java regex (Spark) and RE2 (DuckDB / Go scrubbers), so
the oracle differential can verify the redaction byte-for-byte:
no backreferences, no lookaround, ASCII classes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind -> (pattern, replacement token); order matters: emails are
# redacted before IPs so a dotted domain is never half-masked.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_email`` / ``n_phone`` / ``n_ipv4`` match counts.

    Counts are measured on the RAW text (before any masking) so the
    three counters are independent of redaction order.
    """
    out = df
    for kind, (pattern, _) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask every PII match with its typed token (``<EMAIL>`` etc.).

    Sequential ``regexp_replace`` in ``PII_PATTERNS`` order — a single
    projection, fused into one codegen stage by Catalyst.
    """
    expr = F.col(text_col)
    for _, (pattern, token) in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, pattern, token)
    return df.withColumn(out_col, expr)
