"""Large-document stress for the whole text-operator family.

Round 12 found two O(tokens²) cliffs (shingles under explode,
repetition metrics under a filter) that the sf0.1 bench corpus'
~200-token documents can NOT expose — per-doc superlinearity needs
big, DISTINCT-token-heavy rows to show. This sweep runs every text
operator over single documents of 10k/40k/160k distinct-heavy tokens
(each consumed through the shape that bit before: a downstream
filter + column prune) so a reintroduced per-element re-evaluation
shows up as a super-linear step, not as noise.

Usage: PYTHONPATH=. python tools/bench_text_large_docs.py [--trials 2]
"""
from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--sizes", default="10000,40000,160000")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.driver.memory", "12g")
        .appName("bench_text_large_docs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oxbow_spark.operators import text as T
    from oxbow_spark.operators.decontam import ngram_decontaminate
    from oxbow_spark.operators.dedup import minhash_signatures
    from oxbow_spark.operators.pipeline import chunk_documents

    bench = spark.createDataFrame(
        [(9, "held out benchmark prompt words")],
        "doc_id long, text string")

    # every operator consumed through a filter + prune — the consumer
    # shape that triggers pushdown alias substitution (SCALE.md #5)
    ops = {
        "text_stats": lambda d: T.text_stats(d)
        .where(F.col("n_tokens") >= 0),
        "quality_score": lambda d: T.quality_score(d)
        .where(F.col("passes") | ~F.col("passes")),
        "lang_id": lambda d: T.lang_id(d)
        .where(F.col("pred_lang").isNotNull()),
        "fingerprint": lambda d: T.fingerprint(d)
        .where(F.length("fingerprint") > 0),
        "scrub_pii": lambda d: T.scrub_pii(d)
        .where(F.col("n_urls") >= 0),
        "repetition_stats": lambda d: T.repetition_stats(d)
        .where(F.col("repetition_ok") | ~F.col("repetition_ok")),
        "ngram_lm_score": lambda d: T.ngram_lm_score(d)
        .where(F.col("ppl").isNotNull() | F.col("ppl").isNull()),
        "dup_span_stats": lambda d: T.dup_span_stats(d)
        .where(F.col("n_dup_grams") >= 0),
        "remove_dup_spans": lambda d: T.remove_dup_spans(d)
        .where(F.col("n_removed_tokens") >= 0),
        "minhash_signatures": lambda d: minhash_signatures(d)
        .where(F.col("sig_0").isNotNull()),
        "decontaminate": lambda d: ngram_decontaminate(d, bench)
        .where(F.col("contamination") >= 0),
        "chunk_documents": lambda d: chunk_documents(d)
        .where(F.length("chunk_text") > 0),
    }

    out = {}
    for n_tok in [int(s) for s in args.sizes.split(",")]:
        doc = " ".join(f"w{i % 9973}x{i % 97}" for i in range(n_tok))
        df = spark.createDataFrame([(1, doc)],
                                   "doc_id long, text string").persist()
        df.count()
        row = {}
        for name, fn in ops.items():
            frame = fn(df)
            cols = [c for c in frame.columns]
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.monotonic()
                frame.groupBy().agg(
                    F.count("*"),
                    *[F.count(c) for c in cols[:2]]).collect()
                best = min(best, time.monotonic() - t0)
            row[name] = round(best, 3)
        out[n_tok] = row
        print(json.dumps({n_tok: row}), flush=True)
        df.unpersist()
    print(json.dumps({"sizes": out}))


if __name__ == "__main__":
    main()
