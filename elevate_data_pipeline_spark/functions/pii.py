"""PII detection and masking for training-data curation.

Scrubbing personally identifiable information is a standard pass in an
LLM data pipeline (alongside quality filtering and dedup). The reference
has nothing comparable (SURVEY.md §2 — pure relational batch); this is
north-star scope.

Patterns are deliberately restricted to constructs with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, no backreferences/lookaround — so the DuckDB oracle
reproduces the masking byte-for-byte. At 100 TB the pass is a pure
per-row projection: no shuffle, whole-stage codegen, cost ∝ bytes
scanned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Engine-portable patterns (Java regex == RE2 for these constructs).
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b555-[0-9]{4}\\b"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"

_PATTERNS = (
    (EMAIL_RE, EMAIL_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
    (IPV4_RE, IP_TOKEN),
)


def count_matches(col: str, pattern: str) -> Column:
    """Number of pattern occurrences in the column (JVM-side)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(pattern), 0))


def pii_counts(col: str) -> dict[str, Column]:
    """Occurrence counts per PII class: emails, phones, IPv4s."""
    return {
        "n_emails": count_matches(col, EMAIL_RE),
        "n_phones": count_matches(col, PHONE_RE),
        "n_ips": count_matches(col, IPV4_RE),
    }


def mask_pii(col: str) -> Column:
    """Replace every PII match with its class token (email, phone, IP —
    applied in that fixed order, replace-all)."""
    out: Column = F.col(col)
    for pattern, token in _PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def mask_pii_sql(expr: str) -> str:
    """DuckDB expression equivalent to :func:`mask_pii` (RE2 needs the
    ``'g'`` flag for replace-all)."""
    out = expr
    for pattern, token in _PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out
