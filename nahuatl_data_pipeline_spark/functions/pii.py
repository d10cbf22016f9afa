"""PII detection and redaction as codegen regex expressions.

A mandatory curation stage for web-scale training corpora: emails,
phone numbers, and IP addresses are replaced with typed placeholder
tokens (the convention popularized by BigScience ROOTS / BigCode —
redact, don't drop, so surrounding text survives for training).

Everything here is `regexp_replace` / `regexp_count` — JVM-side,
whole-stage-codegen, no UDFs. The patterns are deliberately
RE2-compatible (no lookaround, no backreferences) so the SAME pattern
string runs identically in Java regex (Spark) and RE2-family engines
(DuckDB oracle, Go/Rust tooling): character classes, bounded repeats,
non-capturing groups only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.column import Column as _C

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish: +CC separator groups (strict enough to avoid eating
# ordinary digit runs; broaden per-corpus with evidence)
PHONE_PATTERN = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}(?:[ -][0-9]{2,4})?"
IPV4_PATTERN = r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def _col(c) -> Column:
    return c if isinstance(c, _C) else F.col(c)


def redact_pii(c) -> Column:
    """Text with all emails, phones, and IPv4s replaced by typed tokens.

    Email runs first: an address can embed digit runs and dotted quads
    that the later patterns would otherwise shred mid-token.
    """
    out = F.regexp_replace(_col(c), EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_PATTERN, IP_TOKEN)


def pii_counts(c) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) — counted on the ORIGINAL text, as
    longs. Count phones/IPs on the email-redacted text so a dotted quad
    or digit run inside an address is not double-counted."""
    col = _col(c)
    no_email = F.regexp_replace(col, EMAIL_PATTERN, EMAIL_TOKEN)
    return (
        F.regexp_count(col, F.lit(EMAIL_PATTERN)).cast("long"),
        F.regexp_count(no_email, F.lit(PHONE_PATTERN)).cast("long"),
        F.regexp_count(
            F.regexp_replace(no_email, PHONE_PATTERN, PHONE_TOKEN),
            F.lit(IPV4_PATTERN),
        ).cast("long"),
    )
