"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting and
document fingerprinting over a documents table.  Hot paths are JVM-side
Spark SQL expressions (whole-stage codegen); only the rolling-hash
fingerprint needs a pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# language marker words (tiny n-gram-free heuristic; deterministic)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "pt": [" o ", " e ", " os "],
}


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences via length arithmetic (JVM-side)."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count (JVM-side regexp split)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


def lang_score(text: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    s = F.lit(0).cast("long")
    for m in LANG_MARKERS[lang]:
        s = s + occurrences(padded, m)
    return s


def lang_id(text: Column) -> Column:
    """argmax over marker-word counts; deterministic tiebreak by lang order."""
    scores = [(lang, lang_score(text, lang)) for lang in LANG_MARKERS]
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, sc in scores:  # first lang wins ties → iterate in order, strict >
        cond = sc > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, sc).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + alpha ratio + stopword signal.

    All components are exact integer/length arithmetic so an external SQL
    oracle reproduces them bit-for-bit.
    """
    n = F.length(text).cast("double")
    n_alpha = (F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))).cast("double")
    n_tok = token_count(text).cast("double")
    stop = lang_score(text, "en").cast("double")
    len_component = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    stop_component = F.least(F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0)) * 5.0,
                             F.lit(1.0))
    return (len_component * 0.3 + alpha_ratio * 0.4 + stop_component * 0.3)


@pandas_udf(LongType())
def doc_fingerprint(text: pd.Series) -> pd.Series:
    """64-bit polynomial rolling-hash fingerprint of the full text.

    Vectorized per batch: texts are encoded to a padded uint8 matrix and the
    Horner recurrence runs column-wise over the batch (loop length = max doc
    length, numpy ops over all docs at once).
    """
    vals = text.fillna("").to_numpy(dtype=object)
    enc = [v.encode("utf-8") for v in vals]
    if not enc:
        return pd.Series([], dtype=np.int64)
    maxlen = max((len(e) for e in enc), default=0)
    mat = np.zeros((len(enc), maxlen), dtype=np.uint64)
    mask = np.zeros((len(enc), maxlen), dtype=bool)
    for i, e in enumerate(enc):
        if e:
            mat[i, :len(e)] = np.frombuffer(e, dtype=np.uint8)
            mask[i, :len(e)] = True
    P = np.uint64(1099511628211)  # FNV-ish prime
    h = np.full(len(enc), 14695981039346656037, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = mask[:, j]
            h[m] = (h[m] * P) ^ mat[m, j]
    return pd.Series(h.view(np.int64))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (df.withColumn("n_tokens", token_count(t))
              .withColumn("lang_guess", lang_id(t))
              .withColumn("quality", quality_score(t))
              .withColumn("fingerprint", doc_fingerprint(t)))
