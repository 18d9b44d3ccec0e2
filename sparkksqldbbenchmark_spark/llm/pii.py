"""PII detection and redaction over document text — a standard
pretraining-curation stage (strip emails/phones/SSNs/IPs before a corpus
ships to training).

All regex work is built-in `regexp_replace` / `split` expressions — JVM
whole-stage-codegen, zero Python in the hot path, embarrassingly parallel
(per-row, no shuffle). At 100 TB this runs at scan speed.

Pattern dialect: the patterns below restrict themselves to the syntax
subset Java regex (Spark) and RE2 (the DuckDB oracle) implement
identically — character classes, bounded repetition, alternation, and
ASCII word boundaries. No lookaround, no backreferences (RE2 has
neither).

Match counting uses the split identity `count(pat) = size(split(s, pat,
-1)) - 1`; limit -1 keeps trailing empty fields in BOTH engines, so a
string ending in a match still counts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters: redaction applies the patterns in this sequence, and
# each class's count is measured on the text AS THE PRECEDING REDACTIONS
# LEFT IT. On ordinary text the patterns don't interact, but adversarial
# inputs can nest (an email whose domain contains an IPv4) or create new
# boundaries once a match is replaced — staged counting keeps the
# counts consistent with the actual output: total_pii always equals the
# number of <CLASS> tokens in the redacted text.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative char classes, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 3-2-4 digit groups (US SSN shape); \b keeps it off longer digit runs
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # 3-3-4 digit groups (US phone shape) — disjoint from the SSN shape
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    # dotted-quad IPv4 (loose: no 0-255 range check, matching common
    # scrubber practice — over-redaction is the safe direction)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text_col: str, pattern: str) -> F.Column:
    """Number of pattern matches in the column (split identity, see module
    docstring)."""
    return (F.size(F.split(F.col(text_col), pattern, -1)) - 1).cast("long")


def with_pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Add per-class PII match counts and a redacted text column where
    every match is replaced by its ``<CLASS>`` token.

    Counts are STAGED: each class counts its matches in the text as the
    preceding redactions left it (the same text its own replacement then
    runs on), so the per-class counts sum exactly to the replacement
    tokens present in ``out_col`` — the invariant an audit consumer
    needs. See module docstring for why independent counting diverges on
    adversarial inputs.
    """
    out = df
    current: F.Column = F.col(text_col)
    total = None
    for name, pat in PII_PATTERNS.items():
        cnt = (F.size(F.split(current, pat, -1)) - 1).cast("long")
        out = out.withColumn(f"{name}_count", cnt)
        current = F.regexp_replace(current, pat, f"<{name.upper()}>")
        c = F.col(f"{name}_count")
        total = c if total is None else total + c
    return out.withColumn(out_col, current).withColumn("total_pii", total)


def sql_pii_count(text_expr: str, pattern: str) -> str:
    """DuckDB match count over an arbitrary text expression (RE2 executes
    the same pattern)."""
    return (
        f"CAST(len(regexp_split_to_array({text_expr}, '{pattern}')) - 1"
        f" AS BIGINT)"
    )


def sql_pii_staged_counts(text_expr: str) -> list[tuple[str, str]]:
    """DuckDB twin of the STAGED counts in :func:`with_pii_scrub`:
    returns [(class, count_sql)] where each count runs over the text as
    the preceding redactions left it — generated from the same
    PII_PATTERNS walk so the two engines cannot drift."""
    cur = text_expr
    out = []
    for name, pat in PII_PATTERNS.items():
        out.append((name, sql_pii_count(cur, pat)))
        cur = f"regexp_replace({cur}, '{pat}', '<{name.upper()}>', 'g')"
    return out


def sql_pii_scrub(text_expr: str) -> str:
    """DuckDB twin of the redaction chain ('g' = replace all matches)."""
    red = text_expr
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return red
