"""PII detection and redaction over text columns.

The training-data-pipeline counterpart of the reference's closed-vocabulary
frame screening: the reference decides per frame whether its id is in the
allowed dictionary and routes unknown payloads to a quarantine
representation (id3v2.go:374-396 keeps unknown frames as raw bytes rather
than text); here each document is screened against a fixed dictionary of
PII shapes and matched spans are rewritten to typed placeholders.

Everything is JVM-side regex (`regexp_count` / `regexp_replace` inside
whole-stage codegen) — no Python in the hot path. The patterns are written
in the common subset of Java regex (Spark) and RE2 (DuckDB/Go): no
backreferences, no lookaround, ASCII classes only — so the DuckDB oracle
replays them verbatim with the 'g' flag.

At 100 TB: pure per-row projection — no shuffle at all; the profile
aggregation that usually follows (counts by type) is a partial-aggregable
groupBy. Redaction order is FIXED (most-specific first) so overlapping
matches resolve identically in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered most-specific → least-specific: redaction applies in this order,
# so e.g. the 16-digit card pattern consumes its digits before the
# SSN/phone shapes could partially match inside it
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("cc16", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-type match counts (long, 0 for empty/null text)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return {name: F.regexp_count(c, F.lit(pat)).cast("long") for name, pat in PII_PATTERNS}


def redact(col: Column | str) -> Column:
    """Rewrite every match to ``<TYPE>`` placeholders, applying the
    patterns in PII_PATTERNS order (sequential rewrites: a later pattern
    sees the earlier placeholders, never the consumed spans)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def pii_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII profile: one count column per type, total, a has_pii
    flag, and the md5 of the redacted text (the cheap equality witness
    that redaction produced identical bytes in any engine)."""
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        "*",
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
        F.md5(redact(text_col)).alias("redacted_md5"),
    )
