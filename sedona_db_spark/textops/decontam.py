"""Benchmark decontamination: flag training documents that share long
word n-grams with an evaluation set.

The standard eval-contamination check (GPT-3 appendix C / PaLM /
FineWeb all use 8-13-gram overlap): any training document containing a
verbatim ``n``-gram from a benchmark document is flagged, with the hit
count as evidence strength.  Exact, not probabilistic — the join
carries the gram text.

Scale design: the benchmark side is tiny (thousands of rows) next to
the corpus, but the gram INDEX is built from the BENCHMARK side, so
the corpus explodes its grams once and equi-joins against a broadcast
benchmark index — the corpus never self-joins and never shuffles on
anything but its own gram stream.  A df-cap on benchmark grams drops
universal boilerplate ("the of and ..." runs) before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_grams(df: DataFrame, text_col: str, id_col: str, n: int,
                out_id: str) -> DataFrame:
    """Distinct (id, gram) word n-grams via posexplode + ``get`` on the
    kept word array (same codegen shape as textops.repetition): word j of
    the gram starting at ``pos`` is an O(1) array access, so there is no
    window pass — the round-8 ``lead`` formulation forced an exchange on
    the id plus two sorts over every word row for values that were
    already sitting in the row's own array."""
    from sedona_db_spark.partition import spread_small_input
    df = spread_small_input(df, id_col)
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), r"\s+")
    L = (df.select(F.col(id_col).alias(out_id), words.alias("__toks"))
           .select(out_id, "__toks",
                   F.posexplode("__toks").alias("pos", "w0")))
    cols = [F.col("w0")] + [F.get("__toks", F.col("pos") + j)
                            for j in range(1, n)]
    gram = F.concat_ws(" ", *cols)
    return (L.where(cols[n - 1].isNotNull())
             .select(out_id, gram.alias("gram"))
             .distinct())


def contamination_report(corpus: DataFrame, benchmark: DataFrame,
                         n: int = 8, max_df: int | None = 64,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         bench_id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bench_id, n_shared) for every corpus document sharing at
    least one distinct word ``n``-gram with a benchmark document.

    ``max_df``: benchmark grams occurring in more than that many corpus
    documents are dropped as boilerplate before counting (``None``
    disables; the GPT-3-style check uses raw overlap, but raw overlap
    on short boilerplate causes false flags at corpus scale).
    """
    if n < 2:
        raise ValueError("contamination_report requires n >= 2")
    bg = _word_grams(benchmark, bench_text_col, bench_id_col, n,
                     "bench_id")
    cg = _word_grams(corpus, text_col, id_col, n, "_doc")
    if max_df is not None:
        hot = (cg.join(F.broadcast(bg.select("gram").distinct()), "gram")
                 .groupBy("gram")
                 .agg(F.countDistinct("_doc").alias("_df"))
                 .where(F.col("_df") > max_df)
                 .select("gram"))
        bg = bg.join(F.broadcast(hot), "gram", "left_anti")
    hits = (cg.join(F.broadcast(bg), "gram")
              .groupBy("_doc", "bench_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    return hits.select(F.col("_doc").alias(id_col), "bench_id",
                       "n_shared")


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_hits: int = 1,
                  max_df: int | None = 64,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  bench_id_col: str = "doc_id") -> DataFrame:
    """Corpus minus documents with >= ``min_hits`` shared ``n``-grams
    against ANY benchmark document (anti-join on the report)."""
    rep = contamination_report(corpus, benchmark, n, max_df, text_col,
                               id_col, bench_text_col, bench_id_col)
    flagged = (rep.groupBy(id_col)
                  .agg(F.sum("n_shared").alias("_tot"))
                  .where(F.col("_tot") >= min_hits)
                  .select(id_col))
    return corpus.join(F.broadcast(flagged), id_col, "left_anti")
