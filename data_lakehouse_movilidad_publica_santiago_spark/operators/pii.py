"""PII detection and redaction for training-data pipelines.

Scrubbing personally identifiable information (emails, IPv4
addresses, phone numbers) is a standard preprocessing pass before
text lands in a training corpus (the C4 / RefinedWeb recipe).  Both
operations here are pure Column expressions — Java-regex evaluated
JVM-side inside whole-stage codegen, no Python in the hot path — so
they map over 100 TB of documents as a narrow, shuffle-free stage.

Pattern portability: the patterns restrict themselves to the regex
subset shared by Java (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, non-capturing groups, ``\\b`` — no lookaround, no
backreferences — so the differential oracle replays them verbatim.
DuckDB's ``regexp_replace`` needs the explicit ``'g'`` flag to match
Spark's replace-all default (see ``analytics/corpus_gate.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters for redaction: emails first (their local part may
# contain digits a later pattern could nibble), then IPv4, then
# phones. The same order is replayed in the oracle SQL.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII pattern (bigint)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("bigint")


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its redaction token, applying the
    patterns in the canonical email → ipv4 → phone order."""
    out = col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], REDACTION_TOKENS[kind]
        )
    return out
