"""PII detection and redaction over text columns.

The reference pipeline extracts author emails as an identity feature
(``src/eutilities/string_utils.py:15`` — the X5 pattern) and otherwise
leaves contact strings in place; a training-data pipeline must do the
opposite: FIND personally-identifying spans and scrub them before the
text ships to a training set (the C4/Dolma/RedPajama hygiene step).

Both operators are single-scan native expressions — ``regexp_count``
for the per-class tallies and a fixed-order ``regexp_replace`` chain
for scrubbing — so at 100 TB they are embarrassingly parallel
codegen'd projections: no shuffle, no UDF, no driver state.

Cross-engine determinism: every pattern below avoids constructs whose
match semantics differ between Java's backtracking engine (Spark) and
RE2 (DuckDB) — no alternation whose branches can match at one
position, no lookaround, ASCII-only classes (both engines treat
``\\d``/``\\b`` as ASCII here).  The classes are mutually exclusive on
any input (digit-group shapes 4-4-4-4 / 3-2-4 / 3-3-4 cannot overlap
given the ``\\b`` anchors, emails require ``@``, IPs require dots), so
per-class counts on the ORIGINAL text are order-independent even
though redaction applies in one documented order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: class -> regex, in REDACTION ORDER (longest / most-specific digit
#: shapes first so a substring of an already-scrubbed span can never
#: re-match a later class).  Identical strings are embedded in the
#: DuckDB oracle (queries.py q59) — change them in lockstep.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ccard": r"\b\d{4}-\d{4}-\d{4}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-class PII span counts of one text column (independent, on
    the original text)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    }


def redact(text: Column | str, token_fmt: str = "<{name}>") -> Column:
    """Scrub every PII class from one text column, applying the
    patterns in ``PII_PATTERNS`` order.  The replacement token carries
    the class name (``<EMAIL>`` etc.) so downstream token statistics
    stay meaningful."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, token_fmt.format(name=name.upper()))
    return c


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII audit: one row per input row with per-class
    span counts, a total, and the redacted text.  Single codegen'd
    projection — the scan is the whole cost at any scale."""
    counts = pii_counts(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return df.select(
        F.col(id_col),
        *counts.values(),
        total.cast("long").alias("n_pii"),
        redact(text_col).alias("redacted"),
    )
