"""Text-analysis operators for training-data pipelines.

Language ID (marker-word heuristic), quality scoring, token counting and
document fingerprinting — all pure ``pyspark.sql.functions`` expressions
(whole-stage-codegen'd, no UDFs), so they run at scan speed and their
semantics are mirror-able in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oxbow_spark.operators.dedup import _py_tokens, tokens

# marker stopwords per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "es", "una"),
}
# fixed precedence for argmax ties (deterministic across engines)
LANG_ORDER = ("en", "de", "fr", "es")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _count_in(tok: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/number/punct
    boundaries (a cheap BPE proxy: ~tokens = words + punctuation runs +
    digit runs). Uses one regexp scan, JVM-side.
    """
    pieces = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"), 1)
    return F.size(pieces)


# conservative common-subset regexes (Java regex ≡ RE2 for these shapes,
# so the DuckDB oracle matches byte-for-byte)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, n_urls, n_emails, scrubbed_digest): URL/email scrubbing — the
    PII-redaction pass of a training-data pipeline, as pure codegen'd
    regexp expressions (two regexp_replace + two regexp_extract_all, no
    UDFs, scan-speed). URLs are replaced first (<URL>), then emails
    (<EMAIL>) — a URL's userinfo part would otherwise be double-counted
    as an email — and counts follow the same order (emails counted on
    the URL-scrubbed text). The digest stands in for the scrubbed text
    so the oracle hash-checks the exact output."""
    c = F.col(text_col)
    no_urls = F.regexp_replace(c, URL_RE, "<URL>")
    scrubbed = F.regexp_replace(no_urls, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(f"({URL_RE})"), 1)).alias("n_urls"),
        F.size(F.regexp_extract_all(no_urls, F.lit(f"({EMAIL_RE})"), 1)).alias("n_emails"),
        F.md5(scrubbed).alias("scrubbed_digest"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: chars, tokens, mean token length, punct & stopword ratios."""
    c = F.col(text_col)
    tok = tokens(c)
    n_tok = token_count(c)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = _count_in(tok, STOPWORDS)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
         / F.greatest(n_tok, F.lit(1)).cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("punct_ratio"),
        (n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality gate (Gopher-rule-ish, engine-portable arithmetic):
    docs pass when length, mean token length and stopword presence are in
    sane ranges. Returns per-doc boolean + component flags.
    """
    s = text_stats(df, text_col, id_col)
    ok_len = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000)
    ok_tok = (F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= 12.0)
    ok_stop = F.col("stopword_ratio") >= 0.01
    ok_punct = F.col("punct_ratio") <= 0.3
    return s.select(
        id_col, "n_tokens",
        ok_len.alias("ok_length"), ok_tok.alias("ok_token_len"),
        ok_stop.alias("ok_stopwords"), ok_punct.alias("ok_punct"),
        (ok_len & ok_tok & ok_stop & ok_punct).alias("passes"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language classifier.

    Counts per-language marker tokens; predicts the argmax with fixed
    precedence (LANG_ORDER) on ties; texts containing CJK codepoints
    classify 'zh' first; no markers at all -> 'und'.
    """
    tok = tokens(F.col(text_col))
    counts = {lg: _count_in(tok, ws) for lg, ws in LANG_MARKERS.items()}
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    best = F.greatest(*[counts[lg] for lg in LANG_ORDER])
    pred = F.when(has_cjk, F.lit("zh")).when(best <= 0, F.lit("und"))
    for lg in LANG_ORDER:
        pred = pred.when(counts[lg] == best, F.lit(lg))
    out = [F.col(id_col), pred.alias("pred_lang")]
    out += [counts[lg].alias(f"n_{lg}") for lg in LANG_ORDER]
    return df.select(*out)


def _let_bound_grams_sql(body_sql: str) -> str:
    """SQL shape for token n-gram builders: the `_t` token array is
    let-bound to the lambda variable `tt` (``body_sql`` must reference
    it as `tt`), so per-element element_at/slice operands stay lambda
    variables under ANY optimizer substitution. These expressions are
    exploded directly (non-attribute generators skip
    InferFiltersFromGenerate), so no current plan re-inlines them —
    this is the audit-rule hardening from SCALE.md fact #5: a lambda
    body must never reference a Project alias like `_t`."""
    return f"element_at(transform(array(_t), tt -> {body_sql}), 1)"


def _run_starts(srt: Column) -> Column:
    """1-based positions that open a run in a SORTED array (always includes
    1). Empty array → empty. LET-BOUND (round 12): the input binds to a
    lambda variable so the per-element comparisons stay O(1) even after
    the optimizer substitutes a derived tree for ``srt`` — a downstream
    `.where` on any column computed from this one pushes below the
    staged Projects and re-inlines `array_sort(split(...))` into the
    filter's copy; with an attribute operand in the lambda that was
    fine, with the substituted tree it re-evaluated O(n log n) PER
    ELEMENT (SCALE.md fact #5; measured: one 10k-distinct-token doc
    filtered on repetition_ok did not finish in 540 s, 0.17 s
    unfiltered)."""
    def _body(s):
        n = F.size(s)
        return F.when(
            n >= 1,
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (i == 1)
                | (F.element_at(s, i) != F.element_at(s, i - 1)),
            ),
        ).otherwise(F.array().cast("array<int>"))

    return F.element_at(F.transform(F.array(srt), _body), 1)


def _top_run_chars(srt: Column, starts: Column, discount: int) -> Column:
    """Max over distinct elements of a SORTED array of
    ``occurrences × (len(element) − discount)`` — the character mass of the
    most-repeated element, from the array and its staged run-start
    positions (`_run_starts`). ``discount`` subtracts separator chars
    (1 for "w1 w2" bigrams). Empty array → 0. LET-BOUND (round 12):
    both inputs bind to lambda variables through one struct slot so
    every per-element element_at stays O(1) under ANY optimizer
    rewrite — staging the inputs as materialized columns (the round-9
    discipline) does not survive filter-pushdown alias substitution
    (SCALE.md fact #5)."""
    def _body(t):
        s, st = t["s"], t["st"]
        m = F.size(st)
        ext = F.concat(st, F.array((F.size(s) + 1).cast("int")))
        counts = F.zip_with(
            F.slice(ext, 2, m), F.slice(ext, 1, m),
            lambda nxt, cur: nxt - cur)
        lens = F.transform(
            st, lambda p: F.length(F.element_at(s, p)) - F.lit(discount))
        return F.when(
            m >= 1,
            F.array_max(F.zip_with(counts, lens, lambda c, l: c * l)),
        ).otherwise(F.lit(0))

    return F.element_at(
        F.transform(F.array(F.struct(srt.alias("s"),
                                     starts.alias("st"))), _body), 1)


def _repetition_metrics_udf():
    """Arrow kernel for `repetition_stats`: all four metrics in one
    pandas_udf. Bit-identical to the expression path: the tokenizer is
    `dedup._py_tokens` (≡ split(trim, '\\s+')), every metric is integer
    arithmetic (counts × code-point lengths — Python len ≡ Spark
    `length`, both count code points) until one final float64 division
    of exactly-representable ints, which IEEE defines uniquely — pinned
    by tests/test_text_kernels.py on the real corpus plus unicode /
    degenerate edges. Null text reproduces the expression path's
    outputs exactly: n_tokens/dup null (size(null)/arithmetic-on-null),
    both top fractions 0.0 (the run-chars trees bottom out at 0 and
    `greatest`/`least` skip nulls)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_tokens:int, dup_token_frac:double, "
                "top_token_frac:double, top_2gram_frac:double>")
    def k(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        n_out, dup_out, t1_out, t2_out = [], [], [], []
        for s in texts:
            if s is None:
                n_out.append(None)
                dup_out.append(None)
                t1_out.append(0.0)
                t2_out.append(0.0)
                continue
            toks = _py_tokens(s)
            n = len(toks)
            c = Counter(toks)
            tot = 0
            top1 = 0
            for t, cnt in c.items():
                m = cnt * len(t)
                tot += m
                if m > top1:
                    top1 = m
            if n >= 2:
                bg = Counter(zip(toks, toks[1:]))
                top2 = max(cnt * (len(a) + len(b))
                           for (a, b), cnt in bg.items())
            else:
                top2 = 0
            n_out.append(n)
            dup_out.append(float(n - len(c)) / float(max(n, 1)))
            t1_out.append(min(1.0, float(top1) / float(max(tot, 1))))
            t2_out.append(min(1.0, float(top2) / float(max(tot, 1))))
        return pd.DataFrame({
            "n_tokens": pd.array(n_out, dtype="Int32"),
            "dup_token_frac": pd.array(dup_out, dtype="Float64"),
            "top_token_frac": pd.array(t1_out, dtype="Float64"),
            "top_2gram_frac": pd.array(t2_out, dtype="Float64"),
        })

    return k


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_dup_token_frac: float = 0.6,
                     max_top_token_frac: float = 0.13,
                     max_top_2gram_frac: float = 0.11,
                     kernel: bool = True) -> DataFrame:
    """Gopher-style repetition quality metrics, entirely per-row.

    The Gopher/RefinedWeb repetition rules (duplicate-line fraction,
    characters in the most frequent n-gram) drop boilerplate-heavy docs.
    Our corpus is single-line, so the signals are token-level:

    - ``dup_token_frac``   — 1 − distinct/total tokens;
    - ``top_token_frac``   — char mass of the most frequent token ÷ total
      token chars (occurrences × token length);
    - ``top_2gram_frac``   — same for word bigrams (joining space
      discounted);
    - ``repetition_ok``    — all three under their thresholds.

    Scale: per-row either way — no explode, no groupBy, no shuffle; 100 TB
    runs at scan speed. ``kernel=True`` (default, r15) computes all four
    metrics in one Arrow pandas_udf (`_repetition_metrics_udf`): the
    expression formulation's interpreted HOFs (sort + run-length chains,
    `_top_run_chars`) measured 9.5 s of task CPU at sf0.1 vs ~0.5 s for
    the kernel, and its Column-API build cost ~0.3 s of py4j per plan
    (guide §4.2 — batch-native code beats interpreted JVM expression
    chains; the Arrow boundary moves only the text column the operator
    already reads). The UDF is marked nondeterministic so a consumer
    filter on `repetition_ok` cannot duplicate the evaluation (guide
    §4.4). ``kernel=False`` keeps the expression path — the reference
    the equality battery pins the kernel against, and the zero-Python
    fallback. Each expression-path array stage is a separate Project so
    CollapseProject cannot re-inline the split into downstream lambdas
    (the `shingles_of` trap).
    """
    if kernel:
        m = _repetition_metrics_udf().asNondeterministic()
        out = df.select(
            F.col(id_col), m(F.col(text_col)).alias("_m")
        ).select(
            id_col,
            F.col("_m.n_tokens").alias("n_tokens"),
            F.col("_m.dup_token_frac").alias("dup_token_frac"),
            F.col("_m.top_token_frac").alias("top_token_frac"),
            F.col("_m.top_2gram_frac").alias("top_2gram_frac"),
        )
        return out.withColumn(
            "repetition_ok",
            (F.col("dup_token_frac") <= max_dup_token_frac)
            & (F.col("top_token_frac") <= max_top_token_frac)
            & (F.col("top_2gram_frac") <= max_top_2gram_frac),
        )
    tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))

    # let-bound bigram build (SCALE.md fact #5): with F.col("_t") in the
    # lambda body, a downstream filter on repetition_ok substitutes
    # split(trim(text)) for it and re-evaluates the split PER BIGRAM
    def _bigrams(t):
        def _body(tt):
            n1 = F.size(tt) - 1
            return F.when(
                n1 >= 1,
                F.array_sort(F.transform(
                    F.sequence(F.lit(1), n1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(tt, i),
                        F.element_at(tt, i + 1)),
                )),
            ).otherwise(F.array().cast("array<string>"))

        return F.element_at(F.transform(F.array(t), _body), 1)

    staged = tok.select(
        id_col, "_t",
        F.array_sort("_t").alias("_ts"),
        _bigrams(F.col("_t")).alias("_bs"),
    )
    # run starts staged as real columns: `_top_run_chars` slices them per
    # row; inlining them into its lambdas would re-run the O(n) filter per
    # array element (the quadratic HOF trap — measured 13 s for 5k docs)
    runs = staged.select(
        id_col, "_t", "_ts", "_bs",
        _run_starts(F.col("_ts")).alias("_rt"),
        _run_starts(F.col("_bs")).alias("_rb"),
    )
    n_tok = F.size(F.col("_t"))
    tot_chars = F.aggregate(
        F.col("_t"), F.lit(0), lambda acc, x: acc + F.length(x))
    dup_frac = (
        (n_tok - F.size(F.array_distinct(F.col("_t")))).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double"))
    # clamp at 1.0: overlapping bigram occurrences can cover more chars
    # than the doc holds ("a a a a" → 3×"a a")
    top_tok = F.least(
        F.lit(1.0),
        _top_run_chars(F.col("_ts"), F.col("_rt"), 0).cast("double")
        / F.greatest(tot_chars, F.lit(1)).cast("double"))
    top_2g = F.least(
        F.lit(1.0),
        _top_run_chars(F.col("_bs"), F.col("_rb"), 1).cast("double")
        / F.greatest(tot_chars, F.lit(1)).cast("double"))
    out = runs.select(
        id_col,
        n_tok.alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        top_2g.alias("top_2gram_frac"),
    )
    return out.withColumn(
        "repetition_ok",
        (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac),
    )


def _input_exceeds_one_split(df: DataFrame,
                             floor_bytes: int | None = None) -> bool:
    """True when Catalyst's size estimate for ``df`` exceeds one scan
    split (``spark.sql.files.maxPartitionBytes``) — i.e. when re-computing
    the frame means re-reading more than a single task's worth of input.
    ``floor_bytes`` lowers the threshold to ``min(split, floor_bytes)``
    for callers whose fixed cost amortizes before a full split (bm25's
    persist: one ~80 ms barrier job + cache write vs two extra tokenize
    scans — measured winning by 61 MB, a wash around ~5 MB, losing at
    0.6 MB). Derived from input size, never from the local core count
    (the `_tp` discipline, registry.py); returns False on any estimation
    failure so callers degrade to the recompute-from-scan plan."""
    if df.isStreaming:
        return False  # a streaming frame can be neither persisted nor noop-written
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes()))
        split = int(df.sparkSession._jsparkSession.sessionState().conf()
                    .filesMaxPartitionBytes())
        if floor_bytes is not None:
            split = min(split, floor_bytes)
        return est > split
    except Exception:  # pragma: no cover - estimation is best-effort
        return False


def _arrow_kernel_pays(df: DataFrame,
                       per_task_bytes: int = 64 * 1024) -> bool:
    """True when an Arrow kernel's fixed per-task boundary cost (~60 ms
    runner/worker handshake + Arrow writer setup, guide §4) amortizes
    over the rows a task actually holds: Catalyst's input-size estimate
    divided across ``defaultParallelism`` tasks exceeds
    ``per_task_bytes``. The floor is the measured break-even for the
    text kernels (sf0.1 documents at cpus=32 = ~19 KB/task: JVM wins
    1.5x; at cpus=8 = ~74 KB/task: kernel wins 1.2x; sf10 = ~1.9
    MB/task: kernel wins 3x — interleaved A/Bs, tools/
    bench_kernels_scale.py). Past one scan split per task
    (``spark.sql.files.maxPartitionBytes``) the question is settled
    regardless of parallelism, hence the ``min``. Derived from input
    size and cluster parallelism, never pinned to a local core count;
    returns False (the always-correct JVM route) on streaming frames or
    any estimation failure."""
    if df.isStreaming:
        return False
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes()))
        sess = df.sparkSession
        split = int(sess._jsparkSession.sessionState().conf()
                    .filesMaxPartitionBytes())
        par = max(int(sess.sparkContext.defaultParallelism), 1)
        return est > min(split, per_task_bytes * par)
    except Exception:  # pragma: no cover - estimation is best-effort
        return False


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id",
              persist_base: bool | None = None) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` docs for a bag-of-words query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene/Okapi+ form —
    always positive).

    Scale design: term frequencies come from a per-row ``filter`` of the
    token array to the (tiny, literal) query vocabulary BEFORE any
    explode — the exploded frame is O(matches), not O(corpus tokens).
    Document length and corpus stats (N, avgdl, df per term) are one
    partial-agg pass each; the stats frames are scalars/``|terms|`` rows
    and broadcast onto the matches. One groupBy(doc) shuffle of the
    match frame closes the score. Per-term contributions are quantized
    (DECIMAL 28,6) before the final sum so the result is identical across
    summation orders and engines (`operators/zoom.py:exact_sum`
    discipline). Ties break by doc_id for a deterministic top-k.

    ``persist_base``: the physical plan scans + tokenizes the corpus three
    times (corpus stats, tf, df-per-term re-deriving tf) — a real 3x scan
    cost on the widest input at 100 TB (VERDICT r15 #3). When the input
    exceeds ~8 MB (``persist_base=None`` derives this from Catalyst's
    size estimate, capped at one ``spark.sql.files.maxPartitionBytes``
    split), the narrow ``(id, dl, filtered-terms)`` stage is persisted
    MEMORY_AND_DISK and materialized eagerly (noop sink) before its
    consumers race it as concurrent AQE stage jobs — the plan becomes one
    InMemoryTableScan feeding all three branches, one corpus scan total.
    The floor is measured (tools/bench_bm25_persist.py, interleaved
    min-of-3): the persist wins 0.65-0.73x at 61 MB (sf10, cpus 8/32)
    but loses on a sub-MB file (r15 quiet: 0.85 → 1.02-1.26 s at
    sf0.1), where two re-tokenizes are cheaper than the barrier job +
    cache write — so below the floor the branch is a no-op and the plan
    is unchanged. The persist lives in the session cache; callers that
    loop many bm25 queries should ``spark.catalog.clearCache()`` between
    them (the bench does).
    """
    terms = sorted(set(query_terms))
    tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    base = tok.select(
        id_col,
        F.size("_t").alias("dl"),
        F.filter("_t", lambda t: t.isin(*terms)).alias("_q"),
    )
    if persist_base is None:
        # floor measured this round (tools/bench_bm25_persist.py,
        # interleaved min-of-3): persist 0.65-0.73x at 61 MB (sf10,
        # cpus 8/32), ~0.95x at 0.6 MB (sf0.1 — and a measured LOSS
        # there in the quieter r15 window), so the flip sits at ~8 MB:
        # below it two extra tokenize scans are cheaper than the
        # barrier job + cache write the persist pays
        persist_base = _input_exceeds_one_split(
            df, floor_bytes=8 * 1024 * 1024)
    if persist_base:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        base.write.format("noop").mode("overwrite").save()
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("tot_dl"),
    )
    hits = base.where(F.size("_q") > 0)
    tf = (
        hits.select(id_col, "dl", F.explode("_q").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl").cast("double") / avgdl)))
    return (
        scored.groupBy(id_col)
        .agg(F.sum(contrib.cast("decimal(28,6)")).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Robust to token reordering/duplication; engine-portable.
    """
    tok = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tok)).alias("fingerprint"),
        F.size(tok).alias("n_distinct_tokens"),
    )


def ngram_lm_score(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", alpha: float = 0.5,
                   order: int = 2,
                   lambdas: tuple[float, float, float] = (0.1, 0.3, 0.6)
                   ) -> DataFrame:
    """(id, n_terms, mean_nll, ppl): CCNet-style n-gram language-model
    perplexity scoring, trained on the corpus itself — the standard
    quality signal for web-scale pretraining filters (CCNet fits KenLM
    on Wikipedia; here the bigram model fits on the scored corpus so the
    operator is self-contained and deterministic).

    Model: add-alpha-smoothed bigram LM. First token scores under the
    unigram distribution ``(c(w)+a)/(N+aV)``; token i>0 under
    ``(c(w_{i-1} w_i)+a)/(c(w_{i-1})+aV)``. ``mean_nll`` is the mean
    negative natural log-probability per scored token; ``ppl`` its exp.
    Per-term contributions quantize to DECIMAL(28,6) before the sum, so
    aggregation order cannot perturb the result (oracle-hashable, same
    discipline as `bm25_topk`).

    ``order=3`` (CCNet fits a 5-gram KenLM; 3 is the useful middle at
    a self-contained cost) scores with simple linear interpolation over
    (unigram, bigram, trigram) add-alpha probabilities weighted by
    ``lambdas`` — token 1 scores under the unigram alone, token 2 under
    the (λ1, λ2)-renormalized bigram interpolation, tokens ≥3 under the
    full mix. The trigram context count c(prev2, prev1) is the corpus
    bigram count (deterministic, engine-portable convention).

    Plan shape: one explode per n-gram order for counts, then the
    scoring joins on token keys — count tables are vocab-sized
    (≪ corpus), broadcast when small, plain shuffle joins otherwise; the
    model constants (N, V) ride a broadcast 1-row cross join, never a
    driver collect. Empty documents keep a row with null score."""
    if order == 3:
        return _trigram_lm_score(df, text_col, id_col, alpha, lambdas)
    if order != 2:
        raise ValueError(f"unsupported order {order}")
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>"))
        .otherwise(tokens(c)).alias("_t"),
    )
    uni = (base.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    consts = uni.agg(
        F.sum("cw").alias("N"), F.count(F.lit(1)).alias("V"))

    # sequence(1, 0) DESCENDS in Spark — gate short arrays explicitly
    pair_expr = F.expr(_let_bound_grams_sql(
        "CASE WHEN size(tt) >= 2 THEN transform(sequence(1, size(tt) - 1), "
        "i -> struct(element_at(tt, i) AS prev, element_at(tt, i+1) AS cur)) "
        "ELSE array() END"))
    pairs = base.select(F.col(id_col), F.explode(pair_expr).alias("p")) \
        .select(id_col, F.col("p.prev").alias("prev"),
                F.col("p.cur").alias("cur"))
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))

    av = F.lit(float(alpha)) * F.col("V")
    first = (base.where(F.size("_t") > 0)
             .select(F.col(id_col), F.element_at("_t", 1).alias("w"))
             .join(uni, "w")
             .crossJoin(F.broadcast(consts))
             .select(F.col(id_col),
                     (-F.log((F.col("cw") + F.lit(float(alpha)))
                             / (F.col("N") + av))).alias("nll")))
    rest = (pairs.join(big, ["prev", "cur"])
            .join(uni.withColumnRenamed("w", "prev"), "prev")
            .crossJoin(F.broadcast(consts))
            .select(F.col(id_col),
                    (-F.log((F.col("cb") + F.lit(float(alpha)))
                            / (F.col("cw") + av))).alias("nll")))
    scored = (first.unionByName(rest)
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_terms"),
                   F.sum(F.col("nll").cast("decimal(28,6)")).alias("_s")))
    out = base.select(id_col).join(scored, id_col, "left")
    mean = (F.col("_s").cast("double")
            / F.col("n_terms").cast("double"))
    return out.select(
        F.col(id_col),
        F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
        F.round(mean, 6).alias("mean_nll"),
        F.round(F.exp(mean), 6).alias("ppl"),
    )


def _trigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                      alpha: float, lambdas: tuple[float, float, float]
                      ) -> DataFrame:
    """Interpolated-trigram leg of `ngram_lm_score` (order=3). Same
    decimal-quantized aggregation discipline; all count joins are inner
    (every observed n-gram is in its own count table by construction)."""
    l1, l2, l3 = (float(x) for x in lambdas)
    if abs(l1 + l2 + l3 - 1.0) > 1e-9:
        raise ValueError("lambdas must sum to 1")
    a = F.lit(float(alpha))
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>"))
        .otherwise(tokens(c)).alias("_t"),
    )
    uni = (base.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    consts = uni.agg(F.sum("cw").alias("N"), F.count(F.lit(1)).alias("V"))
    av = a * F.col("V")

    pair_expr = F.expr(_let_bound_grams_sql(
        "CASE WHEN size(tt) >= 2 THEN transform(sequence(1, size(tt) - 1), "
        "i -> struct(element_at(tt, i) AS prev, element_at(tt, i+1) AS cur)) "
        "ELSE array() END"))
    pairs = base.select(F.col(id_col), F.explode(pair_expr).alias("p")) \
        .select(id_col, F.col("p.prev").alias("prev"),
                F.col("p.cur").alias("cur"))
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))

    tri_expr = F.expr(_let_bound_grams_sql(
        "CASE WHEN size(tt) >= 3 THEN transform(sequence(1, size(tt) - 2), "
        "i -> struct(element_at(tt, i) AS p2, element_at(tt, i+1) AS p1, "
        "element_at(tt, i+2) AS cur)) ELSE array() END"))
    triples = base.select(F.col(id_col), F.explode(tri_expr).alias("g")) \
        .select(id_col, F.col("g.p2").alias("p2"),
                F.col("g.p1").alias("p1"), F.col("g.cur").alias("cur"))
    tri = triples.groupBy("p2", "p1", "cur").agg(
        F.count(F.lit(1)).alias("ct"))

    def p_uni(cw):
        return (cw + a) / (F.col("N") + av)

    # token 1: unigram only
    first = (base.where(F.size("_t") > 0)
             .select(F.col(id_col), F.element_at("_t", 1).alias("w"))
             .join(uni, "w")
             .crossJoin(F.broadcast(consts))
             .select(F.col(id_col),
                     (-F.log(p_uni(F.col("cw")))).alias("nll")))
    # token 2: (l1, l2)-renormalized bigram interpolation
    l1n, l2n = l1 / (l1 + l2), l2 / (l1 + l2)
    second = (base.where(F.size("_t") >= 2)
              .select(F.col(id_col),
                      F.element_at("_t", 1).alias("prev"),
                      F.element_at("_t", 2).alias("cur"))
              .join(big, ["prev", "cur"])
              .join(uni.select(F.col("w").alias("prev"),
                               F.col("cw").alias("cwp")), "prev")
              .join(uni.select(F.col("w").alias("cur"),
                               F.col("cw").alias("cwc")), "cur")
              .crossJoin(F.broadcast(consts))
              .select(F.col(id_col), (-F.log(
                  F.lit(l1n) * p_uni(F.col("cwc"))
                  + F.lit(l2n) * ((F.col("cb") + a)
                                  / (F.col("cwp") + av)))).alias("nll")))
    # tokens >= 3: full (l1, l2, l3) mix
    rest = (triples
            .join(tri, ["p2", "p1", "cur"])
            .join(big.select(F.col("prev").alias("p2"),
                             F.col("cur").alias("p1"),
                             F.col("cb").alias("cctx")), ["p2", "p1"])
            .join(big.select(F.col("prev").alias("p1"),
                             F.col("cur").alias("cur"),
                             F.col("cb").alias("cb2")), ["p1", "cur"])
            .join(uni.select(F.col("w").alias("p1"),
                             F.col("cw").alias("cwp1")), "p1")
            .join(uni.select(F.col("w").alias("cur"),
                             F.col("cw").alias("cwc")), "cur")
            .crossJoin(F.broadcast(consts))
            .select(F.col(id_col), (-F.log(
                F.lit(l1) * p_uni(F.col("cwc"))
                + F.lit(l2) * ((F.col("cb2") + a) / (F.col("cwp1") + av))
                + F.lit(l3) * ((F.col("ct") + a)
                               / (F.col("cctx") + av)))).alias("nll")))
    scored = (first.unionByName(second).unionByName(rest)
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_terms"),
                   F.sum(F.col("nll").cast("decimal(28,6)")).alias("_s")))
    out = base.select(id_col).join(scored, id_col, "left")
    mean = F.col("_s").cast("double") / F.col("n_terms").cast("double")
    return out.select(
        F.col(id_col),
        F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
        F.round(mean, 6).alias("mean_nll"),
        F.round(F.exp(mean), 6).alias("ppl"),
    )


def dup_span_stats(df: DataFrame, k: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, n_dup_grams, n_dup_spans, dup_tokens, longest_dup_span,
    dup_token_frac): exact duplicate-substring statistics — the
    "deduplicate training data" signal (Lee et al. 2022): a k-token
    gram that occurs more than once ANYWHERE in the corpus marks its
    span; overlapping/adjacent marked spans merge per document (via
    `interval_ops.merge_intervals` keyed by doc — token positions are
    the coordinate system).

    Plan shape: one gram explode + one gram-count groupBy (map-side
    partials), a join back on the gram key, and one per-doc window merge
    of the marked spans. No all-pairs anything; the gram-count frame is
    the only corpus-order structure and it shuffles once. Docs with no
    duplicated span keep a zero-filled row."""
    from oxbow_spark.operators.interval_ops import merge_intervals

    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>"))
        .otherwise(tokens(c)).alias("_t"),
    )
    gram_expr = F.expr(_let_bound_grams_sql(
        f"CASE WHEN size(tt) >= {k} THEN "
        f"transform(sequence(1, size(tt) - {k} + 1), "
        f"i -> struct(i AS pos, array_join(slice(tt, i, {k}), ' ') AS gram)) "
        f"ELSE array() END"))
    g = base.select(F.col(id_col), F.size("_t").alias("_n"),
                    F.explode(gram_expr).alias("g")) \
        .select(id_col, "_n", F.col("g.pos").alias("pos"),
                F.col("g.gram").alias("gram"))
    counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    marked = g.join(counts.where(F.col("cnt") > 1), "gram") \
        .select(id_col, "_n", F.col("pos").alias("start"),
                (F.col("pos") + k).alias("end"))
    spans = merge_intervals(
        marked.select(id_col, "start", "end"), on=id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("end") - F.col("start")).alias("dup_tokens"),
        F.max(F.col("end") - F.col("start")).alias("longest_dup_span"),
    )
    n_grams = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_grams"))
    out = (base.select(F.col(id_col), F.size("_t").alias("_n"))
           .join(per_doc, id_col, "left")
           .join(n_grams, id_col, "left"))
    return out.select(
        F.col(id_col),
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("longest_dup_span", F.lit(0)).cast("long")
        .alias("longest_dup_span"),
        (F.coalesce("dup_tokens", F.lit(0)).cast("double")
         / F.greatest(F.col("_n"), F.lit(1)).cast("double"))
        .alias("dup_token_frac"),
    )


def remove_dup_spans(df: DataFrame, k: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, clean_text, n_tokens, n_removed_tokens): the REMOVAL half of
    Lee et al. 2022 — every token covered by a corpus-duplicated k-gram
    span (the exact spans `dup_span_stats` measures) is dropped from the
    document, whitespace-rejoined. The convention removes ALL copies of
    a duplicated span (the released deduplicate-text-datasets behavior);
    a doc that is entirely duplicated text comes back empty.

    Plan shape: the same gram explode + gram-count groupBy + per-doc
    span merge as `dup_span_stats`, then the merged spans collect into a
    per-doc array (bounded by doc length) and the rebuild is one pure
    expression — filter tokens whose position falls in no span. No UDF,
    no second corpus shuffle beyond the span-frame join."""
    from oxbow_spark.operators.interval_ops import merge_intervals

    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>"))
        .otherwise(tokens(c)).alias("_t"),
    )
    gram_expr = F.expr(_let_bound_grams_sql(
        f"CASE WHEN size(tt) >= {k} THEN "
        f"transform(sequence(1, size(tt) - {k} + 1), "
        f"i -> struct(i AS pos, array_join(slice(tt, i, {k}), ' ') AS gram)) "
        f"ELSE array() END"))
    g = base.select(F.col(id_col), F.explode(gram_expr).alias("g")) \
        .select(id_col, F.col("g.pos").alias("pos"),
                F.col("g.gram").alias("gram"))
    counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    marked = g.join(counts.where(F.col("cnt") > 1), "gram") \
        .select(id_col, F.col("pos").alias("start"),
                (F.col("pos") + k).alias("end"))
    spans = merge_intervals(marked, on=id_col) \
        .groupBy(id_col).agg(F.collect_list(
            F.struct(F.col("start").alias("s"),
                     F.col("end").alias("e"))).alias("_spans"))
    j = base.join(spans, id_col, "left")
    keep = F.expr(
        "filter(transform(_t, (x, i) -> struct(x AS tok, i + 1 AS p)), "
        "tp -> _spans IS NULL OR NOT exists(_spans, "
        "sp -> tp.p >= sp.s AND tp.p < sp.e))")
    return j.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(keep, lambda tp: tp["tok"]))
        .alias("clean_text"),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size(keep)).cast("long")
        .alias("n_removed_tokens"),
    )
