"""PII detection and redaction for training corpora.

Deterministic regex scrubbing of the PII classes corpus pipelines
strip before training (emails, phone numbers, IPv4 addresses, SSN-like
ids, credit-card-like numbers).  Pure JVM ``regexp_replace`` /
``regexp_count`` chains — no Python per row, fully codegen.

These are the standard publicly-documented pattern classes (e.g. the
BigScience/ROOTS and FineWeb scrubbing steps); pattern recall is
necessarily heuristic — the tests pin exactly what each pattern does
and does not match, and ``pii_counts`` lets a pipeline audit match
volume before destructive redaction.

Patterns are applied in the declared order; replacement tokens are
stable strings (default ``<PII:EMAIL>`` etc.) so downstream token
counting and dedup see deterministic text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# order matters: emails before phones (a phone regex could eat digits
# inside an email's local part), cards before phones (16-digit runs)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # lookarounds (not \b) so "1.2.3.4.5" version strings don't yield a
    # partial "1.2.3.4" match
    ("IPV4", r"(?<![0-9.])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
             r"\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
             r"(?![0-9])(?!\.[0-9])"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("CARD", r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b|\b[0-9]{16}\b"),
    ("PHONE", r"(?<![0-9A-Za-z])(?:\+?[0-9]{1,3}[ .-]?)?"
              r"(?:\([0-9]{3}\)|[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}"
              r"(?![0-9])"),
)

_KINDS = tuple(k for k, _ in PII_PATTERNS)


def redact_pii(text: Column, kinds: tuple = _KINDS,
               token: str = "<PII:{kind}>") -> Column:
    """Text with every match of the selected PII classes replaced by
    the class token.  Classes apply in PII_PATTERNS order."""
    out = text
    for kind, pat in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, pat,
                                   token.format(kind=kind))
    return out


def pii_counts(text: Column, kinds: tuple = _KINDS) -> Column:
    """Map kind -> match count (audit signal; cheap to aggregate).

    Counts run each pattern on the ORIGINAL text, so overlapping classes
    can double-count relative to redact_pii (which rewrites in order —
    phone-like digits inside an email local part count for PHONE here
    but are consumed by the EMAIL redaction there).  Audit totals are an
    upper bound on redactions, not an exact ledger."""
    pairs = []
    for kind, pat in PII_PATTERNS:
        if kind in kinds:
            pairs.extend([F.lit(kind),
                          F.regexp_count(text, F.lit(pat))])
    return F.create_map(*pairs)


def scrub_documents(df: DataFrame, text_col: str = "text",
                    kinds: tuple = _KINDS,
                    audit: bool = True) -> DataFrame:
    """Redact ``text_col`` in place; with ``audit`` also append a
    ``pii_counts`` map column (computed on the ORIGINAL text) and a
    total ``pii_total`` for cheap filtering/metrics."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    if audit:
        counts = pii_counts(t, kinds)
        out = (out.withColumn("pii_counts", counts)
                  .withColumn(
                      "pii_total",
                      F.aggregate(F.map_values(F.col("pii_counts")),
                                  F.lit(0), lambda a, v: a + v)))
    return out.withColumn(text_col, redact_pii(t, kinds))
