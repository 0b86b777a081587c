"""PII detection / redaction column functions (training-data
pipeline extension): emails, North-American phone numbers, IPv4
addresses.

A 100 TB pre-training pipeline scrubs PII before anything else ships;
this implements the standard regex tier (the cheap pass that runs on
every document — NER-model scrubbing is a separate, much more
expensive stage and out of scope, like the reference's disabled
stemmer).

Engine-exactness: the patterns use only syntax with identical
semantics in Java's regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, alternation, word boundaries. No
lookarounds (RE2 has none), no backreferences. Redaction replaces in a
FIXED order (emails, then phones, then IPv4) so overlapping matches
resolve identically on both engines.

Everything here is a column expression — codegen'd JVM regex, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local-part@domain.tld — deliberately simple (the curation tier wants
# recall on obvious emails, not RFC 5322)
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# NANP-ish: optional +1, separators -, ., space; (555) 123-4567 too
PHONE_RX = r"(\+1[-. ]?)?(\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ]?[0-9]{4}"
# dotted quad; \b keeps it from matching inside longer digit runs
IPV4_RX = r"\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b"

# redaction order is part of the contract (see module docstring)
REDACTIONS = (
    (EMAIL_RX, "<EMAIL>"),
    (PHONE_RX, "<PHONE>"),
    (IPV4_RX, "<IP>"),
)


def count_matches(col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of `pattern` in `col`."""
    # idx=0 = the whole match (PySpark defaults to group 1, which
    # errors on group-free patterns)
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact(col: Column) -> Column:
    """Apply all redactions in the fixed contract order."""
    out = col
    for rx, token in REDACTIONS:
        out = F.regexp_replace(out, rx, token)
    return out
