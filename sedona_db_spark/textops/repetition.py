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

from pyspark.sql import DataFrame, functions as F

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
    # Expressions are built as SQL strings (one py4j round-trip per
    # selectExpr instead of one per Column operation): plan construction
    # for the 13-metric family was ~0.7 s of driver-side py4j chatter
    # (guide §1.2 step 2 — per-"task" work here is the driver itself).
    t = f"coalesce(`{text_col}`, '')"
    out = None
    for kind, pat in (("line", r"\\n"), ("para", r"\\n{2,}")):
        b = df.selectExpr(
            f"`{id_col}` AS _id",
            f"'{kind}' AS kind",
            f"explode(filter(split({t}, '{pat}'), "
            f"u -> length(trim(u)) > 0)) AS unit")
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
        def tok(j):
            return "w0" if j == 0 else f"get(__toks, pos + {j})"
        grams = ", ".join(
            "CASE WHEN {last} IS NOT NULL THEN concat_ws(' ', {ws}) END"
            .format(last=tok(n - 1), ws=", ".join(tok(j) for j in range(n)))
            for n in ns)
        kinds = ", ".join(f"'{n}gram'" for n in ns)
        g = (df.selectExpr(f"`{id_col}` AS _id",
                           f"split(trim({t}), '\\\\s+') AS __toks")
               .selectExpr("_id", "__toks",
                           "posexplode(__toks) AS (pos, w0)")
               .selectExpr("_id",
                           f"posexplode(array({grams})) AS (ki, unit)")
               .where(F.col("unit").isNotNull())
               .selectExpr("_id",
                           f"element_at(array({kinds}), ki + 1) AS kind",
                           "unit"))
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
                     .agg(F.expr("count(1)").alias("cnt"))
                     .withColumn("ulen", F.expr("length(unit)")))

    # ONE kind-conditional roll-up straight to the per-document row: the
    # old per-(id, kind) intermediate groupBy added a full exchange round
    # for nothing — every per-kind aggregate distributes over a filter on
    # ``kind``, so sum/min(CASE WHEN kind = k ...) on per_unit computes
    # the identical values (null when the kind is absent, exactly like
    # the old max(when(...)) pivot) with one shuffle instead of two.
    def _k(name: str, expr: str, agg: str = "sum") -> str:
        return f"{agg}(CASE WHEN kind = '{name}' THEN {expr} END)"

    agg = []
    for fam in ("line", "para"):
        agg += [
            f"{_k(fam, 'cnt')} AS {fam}_units",
            f"{_k(fam, 'cnt - 1')} AS {fam}_dup",
            f"{_k(fam, 'cnt * ulen')} AS {fam}_chars",
            f"{_k(fam, '(cnt - 1) * ulen')} AS {fam}_dup_chars",
        ]
    for n in sorted(set(top_ns)):
        # max count, ties to the lexicographically smallest gram: the
        # struct min orders by (-cnt, unit)
        agg.append(_k(f"{n}gram", "struct(-cnt AS neg, unit AS unit)",
                      "min") + f" AS top{n}")
    for n in sorted(set(dup_ns)):
        agg.append(f"sum(CASE WHEN kind = '{n}gram' AND cnt >= 2 "
                   f"THEN cnt * ulen END) AS rep{n}")
    rolled = per_unit.groupBy("_id").agg(*[F.expr(a) for a in agg])

    base = df.selectExpr(
        f"`{id_col}` AS _id",
        f"length(coalesce(`{text_col}`, '')) AS n_chars")
    j = base.join(rolled, "_id", "left")

    def _ratio(num: str, den: str) -> str:
        return (f"CASE WHEN coalesce({den}, 0) > 0 THEN "
                f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) "
                f"ELSE CAST(0.0 AS DOUBLE) END")

    def _capped(num: str, den: str) -> str:
        return f"least({_ratio(num, den)}, CAST(1.0 AS DOUBLE))"

    sel = [f"_id AS `{id_col}`"]
    for fam in ("line", "para"):
        sel.append(_ratio(f"{fam}_dup", f"{fam}_units")
                   + f" AS dup_{fam}_frac")
        sel.append(_ratio(f"{fam}_dup_chars", f"{fam}_chars")
                   + f" AS dup_{fam}_char_frac")
    for n in sorted(set(top_ns)):
        chars = (f"CASE WHEN top{n} IS NOT NULL THEN "
                 f"(-top{n}.neg) * length(top{n}.unit) ELSE 0 END")
        sel.append(_capped(chars, "n_chars")
                   + f" AS top_{n}gram_char_frac")
    for n in sorted(set(dup_ns)):
        sel.append(_capped(f"coalesce(rep{n}, 0)", "n_chars")
                   + f" AS dup_{n}gram_char_frac")
    return j.selectExpr(*sel)


def with_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Join the repetition metrics back onto the input rows."""
    return df.join(repetition_scores(df, text_col, id_col), id_col, "left")
