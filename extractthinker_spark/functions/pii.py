"""PII detection/redaction expressions — pure Catalyst (JVM regex,
whole-stage codegen), the standard pre-training scrub pass a corpus
pipeline runs after quality gating.

Patterns are deliberately written in the Java-regex ∩ RE2 subset (no
backreferences, no lookaround) so the DuckDB oracle replays them
verbatim — the cross-engine contract the driver verifies value-level.
Application order is fixed (PII_PATTERNS order): email first (its
local part may contain digits a later number pattern would mangle),
then the number shapes from most to least specific.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (kind, pattern, replacement) in application order. Conservative by
# design: phone requires an international "+" prefix — bare digit runs
# are left alone (invoice numbers, quantities) rather than over-scrubbed.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("card", r"\b[0-9]{4}([ \-][0-9]{4}){3}\b", "[CARD]"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone",
     r"\+[0-9]{1,3}([ \-][0-9]{2,4}){0,2}[ \-][0-9]{3,7}\b", "[PHONE]"),
]


def scrub_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Redact PII in-place: each category's matches become its
    ``[KIND]`` token, applied in PII_PATTERNS order. ``kinds``
    restricts to a subset (same relative order)."""
    out = text
    for kind, pattern, token in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts over the ORIGINAL text (audit
    columns; counting after a prior category's replacement would
    undercount overlapping shapes non-deterministically)."""
    return {
        f"n_{kind}": F.regexp_count(text, F.lit(pattern)).cast("long")
        for kind, pattern, _ in PII_PATTERNS
    }


def pii_scrub_frame(df, key: str = "doc_id", text_col: str = "text"):
    """(key, scrubbed text, per-category counts, any_pii flag) — the
    operator form. Zero shuffles: one projection over the scan."""
    counts = pii_counts(F.col(text_col))
    any_pii = None
    for c in counts.values():
        any_pii = c > 0 if any_pii is None else (any_pii | (c > 0))
    return df.select(
        F.col(key).alias(key),
        scrub_pii(F.col(text_col)).alias("text_scrubbed"),
        *[c.alias(name) for name, c in counts.items()],
        any_pii.alias("any_pii"),
    )
