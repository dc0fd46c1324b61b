"""PII detection and redaction for training corpora.

Pretraining pipelines scrub emails, phone numbers, IPs, SSNs and card
numbers before anything ships to a trainer. Everything here is
``regexp_replace`` / ``regexp_count`` over patterns written in the
REGEX SUBSET JAVA AND RE2 SHARE — no backreferences, no lookaround — so
the Spark path (Java regex, whole-stage codegen) and the DuckDB oracle
(RE2) produce byte-identical redactions. Detection is a projection: zero
shuffles, linear in corpus bytes, and the replacement order is fixed
(longest/most-specific first) so counts are unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement) applied IN ORDER — card before phone so a
#: 16-digit run is never half-claimed by the phone pattern, email first so
#: its digits can't be claimed by anything else.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
)


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind, counted on the UNREDACTED text."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(text, F.lit(pattern))


def redact_pii(text: Column) -> Column:
    """Text with every PII_PATTERNS kind replaced, in declaration order."""
    out = text
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def duck_pii_count(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count` (RE2 evaluates the same pattern)."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    escaped = pattern.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{escaped}'))"


def duck_redact_pii(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` — identical order, global flag."""
    out = expr
    for _, pattern, replacement in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{replacement}', 'g')"
    return out
