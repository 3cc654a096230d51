"""Benchmark decontamination: flag training documents whose n-grams
collide with an evaluation/benchmark set.

The standard eval-leak guard for LLM training corpora (GPT-3 appendix C /
Llama-style n-gram overlap): build the benchmark's k-gram set, count per
training document how many of its distinct k-grams appear in it, and flag
documents at or above a hit threshold.

100 TB layout: the benchmark set is small by construction (eval suites
are MBs, the corpus is TBs) — its distinct-gram frame is BROADCAST, so
the corpus side never shuffles to find matches: scan → shingle → explode
(all narrow) → broadcast hash join → the per-doc match counts that come
back are bounded by the matched rows only (rare in a clean corpus). The
final left join of counts onto the corpus is left to AQE, which
broadcasts the (small) count frame in the expected case; a pathological
everything-contaminated corpus degrades to a shuffle join, not an OOM.

The reference (abdenlab/oxbow) has no corpus-curation layer; this
extends the engine per the training-data-pipeline brief, reusing the
shingle machinery from `operators/dedup.py` so Spark and the DuckDB
oracle share one shingle definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxbow_spark.operators.dedup import shingle_stage


def benchmark_grams(benchmark: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", shingle_k: int = 3) -> DataFrame:
    """(g): the benchmark's distinct k-gram set — one column, deduped.
    Small by construction; callers broadcast it."""
    sh = shingle_stage(benchmark, text_col, id_col, shingle_k)
    return sh.select(F.explode("sh").alias("g")).distinct()


def ngram_decontaminate(
    docs: DataFrame, benchmark: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", shingle_k: int = 3, min_hits: int = 1,
) -> DataFrame:
    """(id, n_shingles, n_matched, contamination, contaminated): per-doc
    benchmark overlap. ``n_matched`` counts the doc's *distinct* k-grams
    that appear anywhere in the benchmark; ``contamination`` is the
    matched fraction; ``contaminated`` is ``n_matched >= min_hits``.

    Filtering is the caller's choice (`.where(~F.col("contaminated"))`) —
    returning the full frame keeps the stats auditable and the operator
    composable with quality scoring."""
    grams = F.broadcast(benchmark_grams(benchmark, text_col, id_col, shingle_k))
    sh = shingle_stage(docs, text_col, id_col, shingle_k)
    doc_grams = sh.select(F.col(id_col), F.explode("sh").alias("g"))
    matched = (
        doc_grams.join(grams, "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    base = sh.select(F.col(id_col), F.size("sh").cast("long").alias("n_shingles"))
    n_matched = F.coalesce(F.col("n_matched"), F.lit(0)).cast("long")
    return base.join(matched, id_col, "left").select(
        F.col(id_col),
        F.col("n_shingles"),
        n_matched.alias("n_matched"),
        (n_matched / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double"))
        .alias("contamination"),
        (n_matched >= min_hits).alias("contaminated"),
    )
