"""Gopher-style intra-document repetition metrics for quality filtering.

Implements the repetition signals of Rae et al. 2021 ("Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", table A1)
used by large-scale training-data pipelines to drop boilerplate-heavy
documents: duplicate line / paragraph fractions (count- and
character-weighted), the character fraction covered by the single most
frequent word n-gram (n = 2..4), and the character fraction covered by
duplicated word n-grams (n = 5..10).

The reference engine has no text pipeline; this extends the
LLM-data-pipeline operator surface mandated alongside SURVEY §2 (same
tier as textops.analysis / textops.dedup).

Exact metric definitions (deterministic, engine-portable — the pytest
oracle replays them in DuckDB and compares bit-exactly):

- unit extraction: lines split on ``\\n``, paragraphs on ``\\n{2,}``,
  both dropping whitespace-only units; words split on ``\\s+`` of the
  trimmed text; an n-gram is ``n`` consecutive words joined by one
  space.
- ``dup_{line,para}_frac``: instances beyond the first occurrence of a
  unit value, over total instances — ``Σ (cnt-1) / Σ cnt``.
- ``dup_{line,para}_char_frac``: the same, weighted by unit length —
  ``Σ (cnt-1)·len / Σ cnt·len``.
- ``top_{n}gram_char_frac``: ``cnt·len(gram) / length(text)`` of the
  most frequent n-gram (ties broken by lexicographically smallest
  gram), capped at 1.0.  Occurrences may overlap in the original text,
  so this is the standard counting approximation of Gopher's character
  coverage, not an exact positional cover.
- ``dup_{n}gram_char_frac``: ``Σ_{cnt≥2} cnt·len(gram) / length(text)``
  capped at 1.0 — an upper bound on the covered-character fraction
  (overlapping occurrences are counted per occurrence).

Scale design (the 100 TB shape): ONE generated union of (doc, kind,
unit) rows feeds ONE ``groupBy(doc, kind, unit)`` count (map-side
combinable; the heaviest key family is n-grams, whose cardinality is
bounded by words-per-doc, not vocabulary²), then one
``groupBy(doc, kind)`` roll-up and a conditional-aggregation pivot back
to one row per document.  No per-row Python anywhere; every expression
is JVM whole-stage-codegen.  Fractions are emitted as one integer÷
integer division so engines agree bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _units(df: DataFrame, text_col: str, id_col: str,
           top_ns: tuple, dup_ns: tuple) -> DataFrame:
    """(id, kind, unit) exploded rows for every metric family.

    Performance shape: Spark's array higher-order functions
    (``transform``/``slice`` building each gram) evaluate INTERPRETED
    per element (~70k grams/s measured) — they never enter whole-stage
    codegen.  The n-gram families are instead derived from ONE
    ``posexplode`` of the word array and a single window pass of
    ``lead(word, j)`` columns: every per-row expression is then a plain
    ``concat_ws``/``when`` that codegen compiles, and all 9 gram sizes
    share the one sort-shuffle by document.  A gram exists iff its last
    word ``lead(n-1)`` is non-null (split never yields null elements,
    so null means past-end) — identical unit multiset to the slice
    formulation, including empty-string words from separator runs.
    Line/paragraph families stay as two cheap explode branches."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    nonblank = lambda a: F.filter(a, lambda u: F.length(F.trim(u)) > 0)  # noqa: E731
    out = None
    for kind, arr in (("line", nonblank(F.split(t, r"\n"))),
                      ("para", nonblank(F.split(t, r"\n{2,}")))):
        b = df.select(F.col(id_col).alias("_id"),
                      F.lit(kind).alias("kind"),
                      F.explode(arr).alias("unit"))
        out = b if out is None else out.unionByName(b)

    ns = sorted(set(top_ns) | set(dup_ns))
    if ns:
        # grams straight off the kept word ARRAY: one posexplode keeps the
        # per-document array in the row, and word j of the gram starting
        # at ``pos`` is a codegen O(1) ``get(toks, pos + j)`` (null past
        # the end — ANSI-safe, unlike element_at).  This replaced the
        # round-8 window-``lead`` formulation: identical unit multiset (a
        # gram exists iff its last word is non-null; split never yields
        # null elements), but ZERO extra shuffle — the old window pass
        # forced an Exchange(_id) + two sorts over every word row before
        # the gram aggregation's own exchange (guide §2.4: the cell
        # values were already available without re-partitioning).
        words = F.split(F.trim(t), r"\s+")
        L = df.select(F.col(id_col).alias("_id"),
                      words.alias("__toks")) \
              .select("_id", "__toks",
                      F.posexplode("__toks").alias("pos", "w0"))
        cols = [F.col("w0")] + [F.get("__toks", F.col("pos") + j)
                                for j in range(1, max(ns))]
        grams = [F.when(cols[n - 1].isNotNull(),
                        F.concat_ws(" ", *cols[:n])) for n in ns]
        kinds = F.array(*[F.lit(f"{n}gram") for n in ns])
        g = (L.select("_id", F.posexplode(F.array(*grams))
                             .alias("ki", "unit"))
              .where(F.col("unit").isNotNull())
              .select("_id", F.element_at(kinds, F.col("ki") + 1)
                             .alias("kind"), "unit"))
        out = g if out is None else out.unionByName(g)
    return out


def repetition_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      top_ns: tuple = TOP_NS,
                      dup_ns: tuple = DUP_NS) -> DataFrame:
    """One row per document with every repetition metric (see module doc).

    Documents whose text yields no units for a family (no lines, fewer
    than n words) report 0.0 for that family's metrics.
    """
    from sedona_db_spark.partition import spread_small_input
    # small inputs (one parquet file = one scan partition) would otherwise
    # run the whole 9x gram fan-out + partial aggregation on ONE core —
    # no-op at scale where scans already split (see partition.py)
    df = spread_small_input(df, id_col)
    units = _units(df, text_col, id_col, top_ns, dup_ns)
    per_unit = (units.groupBy("_id", "kind", "unit")
                     .agg(F.count(F.lit(1)).alias("cnt"))
                     .withColumn("ulen", F.length("unit")))

    # ONE kind-conditional roll-up straight to the per-document row: the
    # old per-(id, kind) intermediate groupBy added a full exchange round
    # for nothing — every per-kind aggregate distributes over a filter on
    # ``kind``, so sum/min(when(kind = k, ...)) on per_unit computes the
    # identical values (null when the kind is absent, exactly like the
    # old max(when(...)) pivot) with one shuffle instead of two.
    def _k(name: str, expr: Column, agg=F.sum) -> Column:
        return agg(F.when(F.col("kind") == name, expr))

    cnt, ulen = F.col("cnt"), F.col("ulen")
    agg = []
    for fam in ("line", "para"):
        agg += [
            _k(fam, cnt).alias(f"{fam}_units"),
            _k(fam, cnt - 1).alias(f"{fam}_dup"),
            _k(fam, cnt * ulen).alias(f"{fam}_chars"),
            _k(fam, (cnt - 1) * ulen).alias(f"{fam}_dup_chars"),
        ]
    for n in sorted(set(top_ns)):
        # max count, ties to the lexicographically smallest gram: the
        # struct min orders by (-cnt, unit)
        agg.append(_k(f"{n}gram",
                      F.struct((-cnt).alias("neg"),
                               F.col("unit").alias("unit")),
                      agg=F.min).alias(f"top{n}"))
    for n in sorted(set(dup_ns)):
        agg.append(F.sum(F.when((F.col("kind") == f"{n}gram") & (cnt >= 2),
                                cnt * ulen)).alias(f"rep{n}"))
    rolled = per_unit.groupBy("_id").agg(*agg)

    base = df.select(F.col(id_col).alias("_id"),
                     F.length(F.coalesce(F.col(text_col), F.lit("")))
                      .alias("n_chars"))
    j = base.join(rolled, "_id", "left")

    def _ratio(num: Column, den: Column) -> Column:
        return F.when(F.coalesce(den, F.lit(0)) > 0,
                      num.cast("double") / den.cast("double")
                      ).otherwise(F.lit(0.0))

    def _capped(num: Column, den: Column) -> Column:
        return F.least(_ratio(num, den), F.lit(1.0))

    sel = [F.col("_id").alias(id_col),
           _ratio(F.col("line_dup"), F.col("line_units"))
           .alias("dup_line_frac"),
           _ratio(F.col("line_dup_chars"), F.col("line_chars"))
           .alias("dup_line_char_frac"),
           _ratio(F.col("para_dup"), F.col("para_units"))
           .alias("dup_para_frac"),
           _ratio(F.col("para_dup_chars"), F.col("para_chars"))
           .alias("dup_para_char_frac")]
    for n in sorted(set(top_ns)):
        top = F.col(f"top{n}")
        chars = F.when(top.isNotNull(),
                       (-top["neg"]) * F.length(top["unit"])
                       ).otherwise(F.lit(0))
        sel.append(_capped(chars, F.col("n_chars"))
                   .alias(f"top_{n}gram_char_frac"))
    for n in sorted(set(dup_ns)):
        sel.append(_capped(F.coalesce(F.col(f"rep{n}"), F.lit(0)),
                           F.col("n_chars"))
                   .alias(f"dup_{n}gram_char_frac"))
    return j.select(*sel)


def with_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Join the repetition metrics back onto the input rows."""
    return df.join(repetition_scores(df, text_col, id_col), id_col, "left")
