"""Distributed BPE (byte-pair-encoding) tokenizer TRAINING and
segmentation for training-data pipelines.

Classic word-level BPE (Sennrich et al. 2016): words split into
character symbols plus an end-of-word marker; each merge step promotes
the most frequent adjacent symbol pair (ties broken lexicographically,
so training is deterministic across partitionings and engines).

Scale design: the corpus reduces ONCE to a (word, freq) vocabulary
frame — training never touches the corpus again, and every iteration
runs on that vocab frame only (explode adjacent pairs weighted by word
frequency → one partial/final hash agg → a 1-row argmax action; the
merge then applies as a single Catalyst ``aggregate`` greedy
left-to-right fold over the symbol arrays — no UDF). At web scale the
vocab frame is 1e6-1e8 rows, orders below the corpus; iterations
persist/unpersist to keep lineage flat. Segmentation of the corpus with
a trained merge list runs as an Arrow-batched ``mapInPandas`` (the same
place a real tokenizer library would sit) with a rank-greedy reference
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oxbow_spark.operators.dedup import tokens

EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): whitespace-word frequency table — the only
    corpus-sized pass in BPE training."""
    c = F.col(text_col)
    return (df.where(F.length(F.trim(c)) > 0)
            .select(F.explode(tokens(c)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """word → array of single-char symbols + the end-of-word marker."""
    return vocab.select(
        "word", "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("syms"),
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right application of one merge (a, b) → a+b over a
    symbol array, as a pure Catalyst aggregate fold: if the fold's last
    emitted symbol is ``a`` and the next is ``b``, replace the tail with
    the merged token (matching the reference BPE semantics on runs:
    'aaa' + (a,a) → ['aa', 'a'])."""
    merged = a + b
    return F.expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND x = '{b}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        "ELSE concat(acc, array(x)) END)"
    )


def bpe_train(df: DataFrame, n_merges: int, text_col: str = "text",
              min_pair_freq: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list [(a, b), ...]. Deterministic: the argmax orders
    by (count DESC, a ASC, b ASC); training stops early when no pair
    reaches ``min_pair_freq``.

    Symbols may contain quote characters only if the corpus does — merge
    candidates containing a single quote are skipped (they cannot be
    splice into the SQL fold safely), which real text never hits on
    whitespace-delimited words."""
    syms = _init_symbols(word_freqs(df, text_col)).persist()
    syms.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, element_at(syms, i+1) AS b))")
    try:
        for _ in range(n_merges):
            best = (syms.where(F.size("syms") >= 2)
                    .select(F.col("freq"), F.explode(pair_expr).alias("p"))
                    .groupBy("p.a", "p.b")
                    .agg(F.sum("freq").alias("cnt"))
                    .where(~F.col("a").contains("'")
                           & ~F.col("b").contains("'"))
                    .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                    .limit(1).collect())
            if not best or best[0]["cnt"] < min_pair_freq:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            nxt = syms.select(
                "word", "freq", _merge_expr(a, b).alias("syms")).persist()
            nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy-by-rank BPE segmentation of one word (the
    standard inference rule: repeatedly merge the best-ranked adjacent
    pair until none applies)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_words, n_bpe_tokens, tokens_digest): segment each document
    with a trained merge list — Arrow-batched ``mapInPandas`` (the slot a
    real tokenizer library plugs into; the plan, schema and batching are
    identical either way). The digest hashes the exact token stream so
    tests and oracles can pin the output without a giant column."""
    import hashlib

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    ranks = {p: i for i, p in enumerate(merges)}
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("n_words", LongType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("tokens_digest", StringType()),
    ])

    def fn(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, nt, dig = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = text.split() if isinstance(text, str) else []
                toks: list[str] = []
                for w in words:
                    seg = cache.get(w)
                    if seg is None:
                        seg = cache[w] = bpe_segment_word(w, ranks)
                    toks.extend(seg)
                ids.append(i)
                nw.append(len(words))
                nt.append(len(toks))
                dig.append(hashlib.md5(
                    "\x00".join(toks).encode("utf-8")).hexdigest())
            yield pd.DataFrame({id_col: ids, "n_words": nw,
                                "n_bpe_tokens": nt, "tokens_digest": dig})

    return df.select(id_col, text_col).mapInPandas(fn, schema)
