"""Distributed BPE (byte-pair-encoding) tokenizer TRAINING and
segmentation for training-data pipelines.

Classic word-level BPE (Sennrich et al. 2016): words split into
character symbols plus an end-of-word marker; each merge step promotes
the most frequent adjacent symbol pair (ties broken lexicographically,
so training is deterministic across partitionings and engines).

Scale design: the corpus reduces ONCE to a (word, freq) vocabulary
frame — training never touches the corpus again. Two training
strategies share that single corpus pass:

- ``strategy="driver"`` (default): collect the (word, freq) vocab —
  bounded to the top ``max_vocab_words`` by frequency, the standard
  practice since real web corpora reduce to 1e6-1e7 distinct words —
  and learn all merges driver-local with the incremental Sennrich
  pair-index algorithm (each merge touches only the words that contain
  the winning pair). One Spark job total, independent of n_merges; a
  32k-merge vocab no longer costs 32k scheduler round-trips.
- ``strategy="distributed"``: the over-bound fallback when the vocab
  itself can't fit on the driver — every iteration runs on the vocab
  frame only (explode adjacent pairs weighted by word frequency → one
  partial/final hash agg → a 1-row argmax action; the merge applies as
  a single Catalyst ``aggregate`` greedy left-to-right fold over the
  symbol arrays, with symbols SQL-escaped — no UDF). Iterations
  persist/unpersist to keep lineage flat.

Both strategies produce the identical merge list (same pair counts,
same (count DESC, a ASC, b ASC) tie-break) — property-tested against a
brute-force reference including adversarial quote/backslash symbols.
Segmentation of the corpus with a trained merge list runs as an
Arrow-batched ``mapInPandas`` (the same place a real tokenizer library
would sit) with a rank-greedy reference implementation.
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


def _sql_str(s: str) -> str:
    """Escape a symbol for splicing into a Spark SQL single-quoted
    string literal (standard C-style escape mode): backslash first,
    then the quote. Backslash-bearing corpus words (file paths, LaTeX,
    code) would otherwise produce a broken or silently altered literal
    when their pair wins the argmax."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(a: str, b: str):
    """Greedy left-to-right application of one merge (a, b) → a+b over a
    symbol array, as a pure Catalyst aggregate fold: if the fold's last
    emitted symbol is ``a`` and the next is ``b``, replace the tail with
    the merged token (matching the reference BPE semantics on runs:
    'aaa' + (a,a) → ['aa', 'a']). Symbols are SQL-escaped, so any
    corpus word — quotes, backslashes — splices safely."""
    ea, eb, em = _sql_str(a), _sql_str(b), _sql_str(a + b)
    return F.expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{ea}' "
        f"AND x = '{eb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{em}')) "
        "ELSE concat(acc, array(x)) END)"
    )


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right single-merge application (the Python twin of
    ``_merge_expr``'s fold)."""
    out: list[str] = []
    ab = a + b
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return out


def _train_local(rows: list[tuple[str, int]], n_merges: int,
                 min_pair_freq: int) -> list[tuple[str, str]]:
    """Incremental Sennrich trainer over a collected (word, freq) vocab:
    global pair counts plus a pair→{word index} occurrence index, so
    each merge step only revisits the words that actually contain the
    winning pair. Identical output (counts + tie-break) to the
    distributed loop and the brute-force reference."""
    from collections import Counter

    words = [list(w) + [EOW] for w, _ in rows]
    freqs = [f for _, f in rows]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        for i in sorted(where.get((a, b), ())):
            syms, f = words[i], freqs[i]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _apply_merge(syms, a, b)
            words[i] = new_syms
            new = Counter(zip(new_syms, new_syms[1:]))
            for p, k in old.items():
                d = k - new.get(p, 0)
                if d:
                    c = pair_counts.get(p, 0) - d * f
                    if c <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = c
                if p not in new:
                    s = where.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            where.pop(p, None)
            for p, k in new.items():
                if k > old.get(p, 0):
                    pair_counts[p] = pair_counts.get(p, 0) + (k - old[p] if p in old else k) * f
                where.setdefault(p, set()).add(i)
        where.pop((a, b), None)
        pair_counts.pop((a, b), None)
    return merges


def bpe_train(df: DataFrame, n_merges: int, text_col: str = "text",
              min_pair_freq: int = 2, strategy: str = "driver",
              max_vocab_words: int | None = 2_000_000
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list [(a, b), ...]. Deterministic: the argmax orders
    by (count DESC, a ASC, b ASC); training stops early when no pair
    reaches ``min_pair_freq``.

    ``strategy="driver"`` (default) runs ONE Spark job — the corpus →
    (word, freq) reduction, top-``max_vocab_words`` by (freq DESC,
    word ASC) via TakeOrderedAndProject (no total sort) — then learns
    every merge driver-local with the incremental pair-index trainer.
    ``strategy="distributed"`` keeps all state in Spark (one
    explode+agg+argmax+fold round per merge) for vocabularies too large
    to collect; pass ``max_vocab_words=None`` with ``strategy="driver"``
    to collect the full vocab unbounded."""
    if strategy == "driver":
        vocab = word_freqs(df, text_col)
        if max_vocab_words is not None:
            vocab = (vocab.orderBy(F.desc("freq"), F.asc("word"))
                     .limit(max_vocab_words))
        rows = [(r["word"], r["freq"]) for r in vocab.collect()]
        rows.sort()  # deterministic word order for the index walk
        return _train_local(rows, n_merges, min_pair_freq)
    if strategy != "distributed":
        raise ValueError(f"unknown strategy {strategy!r}")
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
