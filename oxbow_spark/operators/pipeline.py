"""Training-data curation operators: dedup clustering, reproducible
splits, quality binning.

These close the loop from pairwise signals (near-dup pairs, quality
scores) to the decisions a 100 TB curation pipeline actually ships:
which document of a duplicate CLUSTER to keep, which split a document
belongs to forever, which quality tier it lands in. Everything is
deterministic and engine-portable (md5 bucketing, min-label clustering,
standard NTILE), so the DuckDB oracle reproduces each result
bit-for-bit. The reference (abdenlab/oxbow) has no such layer; this
extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over an undirected edge list →
    (vertex, cluster) with cluster = the minimum vertex id reachable.

    Min-label propagation with pointer jumping: each round every vertex
    takes the minimum of (its label, its neighbors' labels, its label's
    label). The pointer-jump halves remaining chain distances, so rounds
    = O(log diameter) instead of O(diameter) — a 40-vertex path resolves
    in ~6 rounds, and at 100 TB the round count stays single-digit for
    any realistic near-dup graph. Each round is two equi-joins + one
    min-aggregate on the (small) label frame — the corpus itself never
    re-enters — truncated through an eager localCheckpoint so lineage
    stays flat across iterations (the standard Spark discipline for
    iterative algorithms). Convergence is a driver-side changed-count,
    same driver-coordination discipline as IVF's bounded k-means.

    Only vertices that appear in ``edges`` are labeled (isolated
    documents have no cluster decision to make).
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("v")).distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nmin = (
            sym.join(labels.select(F.col("v").alias("dst"),
                                   F.col("label").alias("dlabel")), "dst")
            .groupBy("src").agg(F.min("dlabel").alias("nmin"))
        )
        stepped = (
            labels.join(nmin.withColumnRenamed("src", "v"), "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        ptr = stepped.select(F.col("v").alias("u"), F.col("label").alias("ulabel"))
        new = (
            stepped.join(ptr, stepped["label"] == ptr["u"], "left")
            .select(
                stepped["v"],
                F.least(stepped["label"],
                        F.coalesce(ptr["ulabel"], stepped["label"])).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n").join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label")).limit(1).count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("v"), F.col("label").alias("cluster"))


def cluster_canonical(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(vertex, cluster, is_canonical): near-dup clusters with the
    canonical representative = the cluster's minimum id — the keep/drop
    decision of a dedup pass (keep rows where is_canonical)."""
    cc = connected_components(edges, id_a, id_b)
    return cc.select(
        "v", "cluster", (F.col("cluster") == F.col("v")).alias("is_canonical")
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """(id, split): deterministic, engine-portable train/val/test
    assignment. The unit value is the first 8 md5 hex digits of
    (salt || id) scaled to [0, 1) — a pure function of the id, so the
    assignment is stable across runs, engines, partitionings and
    appends (a re-crawled document keeps its split: no test-set
    leakage). ``fractions`` values must sum to 1."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double") / F.lit(float(1 << 32))
    )
    expr = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.select(F.col(id_col), expr.alias("split"))


def resample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic domain-mixture resampling: keep each row of domain
    ``key_col = d`` with probability ``rates[d]`` (domains not listed keep
    ``default_rate``). The acceptance test is the `hash_split` unit value
    — first 8 md5 hex digits of (salt ‖ id) scaled to [0, 1) — compared
    to the domain's rate, so the decision is a pure per-row function:
    no shuffle, no RNG state, stable across runs/partitionings/appends,
    and independent of `hash_split`'s salt (different salt → different
    hash stream; a doc's split and its mixture fate are uncorrelated).

    This is the domain-balancing pass of a training-data pipeline
    (up-weighting curated sources / down-weighting crawl) expressed as a
    Catalyst filter: at 100 TB it runs at scan speed and composes with
    pushdown. For rates > 1 (true up-sampling with repetition) use
    ``explode(sequence(...))`` on ceil(rate) copies + this filter on the
    fractional remainder; this operator intentionally only thins."""
    for d, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {d!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double") / F.lit(float(1 << 32))
    )
    rate = None
    for d, r in sorted(rates.items()):
        cond = F.col(key_col) == d
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    return df.where(u < rate)


def sequence_pack(
    counted: DataFrame,
    capacity: int,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, shard, chunk, chunk_offset): concat-then-chunk sequence
    packing — the standard pretraining layout where documents are
    concatenated in a deterministic order and sliced into
    ``capacity``-token context windows (documents may straddle window
    boundaries; attention masking handles that downstream). A document's
    window is a pure prefix-sum: chunk = floor(tokens_before / capacity),
    chunk_offset = tokens_before % capacity.

    Sharded by a hash of the id (md5-derived — deterministic and
    engine-portable, like `hash_split`), so the prefix sum is a window
    per shard, not a global total order: at 100 TB each shard packs
    independently and in parallel; chunk ids are unique within
    (shard, chunk).

    ``n_shards`` is the parallelism knob: each shard's prefix sum runs
    as ONE window partition = one task, so shard count bounds the
    packing parallelism. The default (None) derives it from the input —
    ``max(16, counted partitions)`` — so a 100 TB input gets
    thousands of shards without caller intervention. Pass an explicit
    value when the layout must be partitioning-independent (the oracle
    twins do). Shard choice only re-buckets: within a shard,
    (chunk, chunk_offset) follow the same prefix-sum law for ANY
    n_shards (see tests/test_pipeline.py::test_sequence_pack_shard_law)."""
    if n_shards is None:
        n_shards = max(16, counted.rdd.getNumPartitions())
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    ).cast("int")
    w = (
        Window.partitionBy("shard").orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return (
        counted.select(id_col, tokens_col, shard.alias("shard"))
        .select(
            id_col, "shard",
            F.floor(before / capacity).cast("long").alias("chunk"),
            (before % capacity).cast("long").alias("chunk_offset"),
        )
    )


def quality_ntile(
    scored: DataFrame,
    n_bins: int = 8,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, bin): curriculum-style quality tiers via NTILE over a
    TOTAL order (score desc, id asc — the id tiebreak makes the binning
    deterministic and oracle-comparable). NTILE is the standard
    almost-equal-bucket split, identical in Spark and ANSI SQL.

    Scale note: a global NTILE is a single total sort — fine for scored
    *summaries*; at full-corpus scale use `quantile_thresholds` +
    `quality_threshold_bins` instead (same output shape, no total
    order)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return scored.select(
        id_col, score_col, F.ntile(n_bins).over(w).alias("bin")
    )


def quantile_thresholds_core(values, n_bins: int) -> list[float]:
    """Shared numpy quantile core: threshold i (i = 1..n_bins-1) is the
    element at 1-indexed rank ceil(i/n_bins · n) of the sorted values —
    the SAME rank rule Spark's exact approxQuantile (relativeError=0)
    applies, verified empirically in
    tests/test_pipeline.py::test_quantile_rank_rule_matches_spark. Both
    the Spark query and the Spark-free oracle builder call this (the
    IVF `ivf_fit_core` pattern), so inlined threshold literals agree
    bit-for-bit."""
    import math

    import numpy as np

    s = np.sort(np.asarray(values, dtype=np.float64))
    n = len(s)
    if n == 0:
        raise ValueError("quantile thresholds of an empty column")
    return [
        float(s[min(max(int(math.ceil(i / n_bins * n)) - 1, 0), n - 1)])
        for i in range(1, n_bins)
    ]


def quantile_thresholds(
    df: DataFrame,
    n_bins: int,
    score_col: str = "score",
    relative_error: float = 0.0,
) -> list[float]:
    """Bin thresholds via one Greenwald-Khanna sketch pass
    (``df.stat.approxQuantile``) — partial-aggregated and merged like any
    other agg, NO total sort, bounded sketch memory. The full-corpus
    scale path for quality binning.

    ``relative_error=0`` keeps every distinct value in the sketch and
    returns the exact rank-``ceil(p·n)`` element (bit-identical to
    `quantile_thresholds_core`); at 100 TB pass e.g. ``1e-4`` for a
    fixed-size sketch whose thresholds are within ±ε·n ranks — bins
    shift by at most that many members, which quality tiering
    tolerates."""
    probs = [i / n_bins for i in range(1, n_bins)]
    return df.stat.approxQuantile(score_col, probs, relative_error)


def quality_threshold_bins(
    scored: DataFrame,
    thresholds: list[float],
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, bin): quality tiers from precomputed ascending
    ``thresholds`` — a pure per-row expression (bin = n_bins − number of
    thresholds strictly below the score; bin 1 = best), so the binning
    itself is scan-speed with NO shuffle and no total order: the scale
    twin of `quality_ntile`.

    On data with distinct scores and row count divisible by n_bins it
    reproduces NTILE exactly (tests assert this); tied scores all land
    in one deterministic bin, where NTILE would split them by the id
    tiebreak — the documented (and usually preferable) difference."""
    n_bins = len(thresholds) + 1
    count_below = None
    for t in thresholds:
        term = (F.col(score_col) > F.lit(float(t))).cast("int")
        count_below = term if count_below is None else count_below + term
    bin_expr = (F.lit(n_bins) - count_below) if count_below is not None else F.lit(1)
    return scored.select(id_col, score_col, bin_expr.alias("bin"))


def chunk_documents(
    df: DataFrame, chunk_tokens: int = 256, overlap: int = 64,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, chunk_start, n_tokens, chunk_text): sliding-window
    document chunking — the RAG-indexing shape (fixed token windows with
    ``overlap`` tokens of context carried between neighbors; the final
    window may be short, every token is covered).

    Pure per-row expressions: tokenize once, explode over the window
    starts (fan-out = #chunks, narrow), slice + rejoin — no shuffle, no
    UDF; the plan is a Project + Generate at any corpus size."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from oxbow_spark.operators.dedup import tokens

    tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride) + 1
    ).cast("long")
    ex = tok.select(
        F.col(id_col), F.col("_t"), n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = (F.col("chunk_id") * stride).cast("long")
    piece = F.slice(F.col("_t"), (start + 1).cast("int"), chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("_n") - start).cast("long")
        .alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def curate_corpus(
    df: DataFrame,
    benchmarks: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float | None = None,
    minhash_threshold: float = 0.5,
    splits: dict[str, float] | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.6,
    semantic_nlist: int = 64,
    proto_drop_frac: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    dedup_spans_k: int | None = None,
    min_clean_tokens: int = 10,
) -> DataFrame:
    """End-to-end training-corpus curation — the composition every
    operator in this family exists for, in the standard order:

    1. quality gate   — `text.quality_score(...).passes`
    2. repetition gate — `text.repetition_stats(...).repetition_ok`
    3. perplexity gate — corpus-fit bigram LM ≤ ``max_ppl`` (optional)
    4. exact dedup    — md5 text digest, keep min id per group
    5. near dedup     — MinHash-LSH verified pairs → connected
       components, keep each cluster's canonical (min id) doc
    6. span removal   — ``dedup_spans_k`` (optional): REWRITE survivors
       by stripping every corpus-duplicated k-token span
       (`text.remove_dup_spans`, the Lee et al. 2022 removal mode),
       then re-gate length — docs whose cleaned text drops below
       ``min_clean_tokens`` tokens are dropped. Runs over the
       doc-dedup survivors so span counting never pays for docs the
       cheaper whole-doc gates already removed; downstream stages
       (semantic/decontam/DSIR) all see the CLEANED text
    7. semantic dedup — SemDeDup over an (id, embedding) frame
       (optional, round 6): k-means clusters fit on the surviving set,
       in-cluster cosine ≥ ``semantic_threshold`` drops all but the
       farthest-from-centroid example; ``proto_drop_frac`` (round 8)
       then applies the D4 pipeline's second stage — prototypicality
       pruning (drop the most centroid-similar fraction per cluster,
       Sorscher et al. / Tirumala et al.) on the SemDeDup survivors,
       reusing the same fitted centroids
    8. decontamination — drop docs overlapping ``benchmarks`` (optional)
    9. DSIR selection — keep the ``dsir_keep`` Gumbel-top docs by
       hashed-n-gram importance toward ``dsir_target`` (optional,
       round 6) — runs LAST so the kept budget is spent on clean docs
    10. split assignment — stable md5 buckets (defaults 98/1/1)

    Returns the curated frame: (id, text, split). Every stage is one of
    this repo's oracle-checked operators; the composition itself adds
    only semi/anti joins on id sets (broadcast when small, AQE
    otherwise). Write out with
    ``df.write.partitionBy('split').parquet(...)`` — hash splits are
    append-stable, so re-crawled corpora extend without test-set leak."""
    from oxbow_spark.operators import text as text_ops
    from oxbow_spark.operators.decontam import ngram_decontaminate
    from oxbow_spark.operators.dedup import exact_dedup, minhash_dedup_pairs

    base = df.select(id_col, text_col)

    ok_q = text_ops.quality_score(df, text_col, id_col) \
        .where(F.col("passes")).select(id_col)
    ok_r = text_ops.repetition_stats(df, text_col, id_col) \
        .where(F.col("repetition_ok")).select(id_col)
    keep = base.join(ok_q, id_col, "left_semi") \
               .join(ok_r, id_col, "left_semi")
    if max_ppl is not None:
        ok_p = text_ops.ngram_lm_score(df, text_col, id_col) \
            .where(F.col("ppl").isNotNull() & (F.col("ppl") <= max_ppl)) \
            .select(id_col)
        keep = keep.join(ok_p, id_col, "left_semi")

    # exact dedup: keep each digest group's canonical (min id) member
    ex = exact_dedup(keep, text_col, id_col)
    keep = keep.join(ex.select(F.col("keep_id").alias(id_col)),
                     id_col, "left_semi")

    # near dedup: verified pair graph → connected components → keep
    # each component's canonical (min id, == its cluster label)
    pairs = minhash_dedup_pairs(keep, text_col, id_col,
                                threshold=minhash_threshold)
    near_drop = connected_components(pairs, "id_a", "id_b") \
        .where(F.col("v") != F.col("cluster")) \
        .select(F.col("v").alias(id_col))
    keep = keep.join(near_drop, id_col, "left_anti")

    if dedup_spans_k is not None:
        # span-level rewrite (Lee et al. 2022 removal mode): duplicated
        # k-gram spans counted over the SURVIVING corpus, every covered
        # token stripped, whitespace-rejoined; then the length re-gate.
        # The rewritten text replaces text_col for every later stage.
        cleaned = text_ops.remove_dup_spans(
            keep, k=dedup_spans_k, text_col=text_col, id_col=id_col)
        keep = cleaned.where(
            (F.size(F.split(F.trim(F.col("clean_text")), r"\s+"))
             >= min_clean_tokens)
            & (F.length(F.trim(F.col("clean_text"))) > 0)) \
            .select(F.col(id_col), F.col("clean_text").alias(text_col))

    if embeddings is not None:
        from oxbow_spark.operators.similarity import (
            ivf_fit, prototype_prune_drops, semantic_dup_drops)

        emb = embeddings.join(keep.select(id_col), id_col, "left_semi")
        cents = ivf_fit(emb, nlist=semantic_nlist, vec_col="embedding",
                        order_col=id_col)
        sem_drop = semantic_dup_drops(
            emb, cents, threshold=semantic_threshold,
            vec_col="embedding", id_col=id_col).select(id_col)
        keep = keep.join(sem_drop, id_col, "left_anti")
        if proto_drop_frac is not None:
            # D4 stage 2: density pruning over the SemDeDup SURVIVORS
            # (the paper's ordering), same centroids
            emb2 = emb.join(keep.select(id_col), id_col, "left_semi")
            pr = prototype_prune_drops(
                emb2, cents, drop_frac=proto_drop_frac,
                vec_col="embedding", id_col=id_col).select(id_col)
            keep = keep.join(pr, id_col, "left_anti")
    elif proto_drop_frac is not None:
        raise ValueError("proto_drop_frac requires an embeddings frame")

    if benchmarks is not None:
        hits = ngram_decontaminate(keep, benchmarks, text_col=text_col,
                                   id_col=id_col).where(F.col("contaminated"))
        keep = keep.join(hits.select(id_col), id_col, "left_anti")

    if dsir_target is not None:
        if dsir_keep is None:
            raise ValueError("dsir_target requires dsir_keep")
        keep = dsir_resample(keep, dsir_target, dsir_keep,
                             text_col=text_col, id_col=id_col)

    sp = hash_split(keep, splits or {"train": 0.98, "val": 0.01,
                                     "test": 0.01}, id_col=id_col)
    return keep.join(sp, id_col)


def _dsir_grams(text_col: str):
    """Unigram + bigram whitespace grams (the DSIR hashed feature set)
    as one array expression; empty/blank text → empty array."""
    from oxbow_spark.operators.dedup import tokens

    t = tokens(F.col(text_col))
    big = F.expr(
        "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1), "
        "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1))) "
        "ELSE array() END")
    return (F.when(F.length(F.trim(F.col(text_col))) == 0,
                   F.array().cast("array<string>"))
            .otherwise(t).alias("_t"), big)


def _dsir_bucket(col):
    """md5-derived hashed-feature bucket (engine-portable: both Spark
    and DuckDB reproduce conv(md5 hex prefix) exactly)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def dsir_log_weights(raw: DataFrame, target: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 4096, alpha: float = 0.5
                     ) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    (id, n_grams, log_weight) where ``log_weight`` is the hashed
    n-gram (unigram+bigram) log importance ratio of the target
    distribution over the raw distribution,
    ``Σ_g log(p_target(b(g)) / p_raw(b(g)))`` with add-alpha-smoothed
    bucket distributions. Buckets hash through an md5 prefix so the
    DuckDB oracle reproduces them bit-for-bit; per-gram terms quantize
    to DECIMAL(28,6) before the sum (aggregation-order-proof, the LM
    discipline). Docs with no grams keep a 0.0-weight row.

    Plan shape: one gram explode per corpus for the two bucket-count
    frames (≤ n_buckets rows each — broadcast into the scoring join),
    one gram explode of ``raw`` for scoring, constants on a 1-row
    broadcast; the corpus never shuffles except the per-doc sum's
    partial/final agg."""
    t_expr, big = _dsir_grams(text_col)

    def grams_of(df):
        return (df.select(F.col(id_col), t_expr)
                .select(id_col, F.explode(
                    F.concat(F.col("_t"), big)).alias("g"))
                .select(id_col,
                        (_dsir_bucket(F.col("g")) % n_buckets).alias("b")))

    rawg = grams_of(raw)
    tgtg = grams_of(target)
    rc = rawg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tc = tgtg.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    consts = (rc.agg(F.sum("cr").alias("Nr"))
              .crossJoin(tc.agg(F.sum("ct").alias("Nt"))))
    a = F.lit(float(alpha))
    ab = a * F.lit(float(n_buckets))
    term = (F.log((F.coalesce(F.col("ct"), F.lit(0)) + a)
                  / (F.col("Nt") + ab))
            - F.log((F.col("cr") + a) / (F.col("Nr") + ab)))
    scored = (rawg
              .join(rc, "b")
              .join(tc, "b", "left")
              .crossJoin(F.broadcast(consts))
              .select(F.col(id_col),
                      term.cast("decimal(28,6)").alias("_w"))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.sum("_w").alias("_s")))
    base = raw.select(id_col)
    return (base.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.round(F.coalesce(F.col("_s").cast("double"),
                                       F.lit(0.0)), 6)
                    .alias("log_weight")))


def dsir_resample(raw: DataFrame, target: DataFrame, n_keep: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 4096, alpha: float = 0.5,
                  seed: str = "dsir", gumbel: bool = True) -> DataFrame:
    """DSIR selection: keep the ``n_keep`` documents with the highest
    ``log_weight + Gumbel(md5(id, seed))`` score — the Gumbel-top-k
    trick samples WITHOUT replacement proportionally to the importance
    weights, yet stays fully deterministic (the noise derives from the
    doc id, so retries and engines agree). ``gumbel=False`` keeps the
    strict top-``n_keep`` by weight. Returns the kept rows of ``raw``.

    Scale: scoring is `dsir_log_weights`; selection sorts only the
    narrow (id, score) frame through TakeOrderedAndProject (no
    corpus-wide total sort) and semi-joins the ids back. For
    keep-fraction selection at extreme scale, derive a score threshold
    with `quantile_thresholds` instead and filter."""
    w = dsir_log_weights(raw, target, text_col, id_col, n_buckets, alpha)
    if gumbel:
        u = ((F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
            1, 15), 16, 10).cast("double") + F.lit(0.5))
            / F.lit(float(1 << 60)))
        score = F.col("log_weight") + (-F.log(-F.log(u)))
    else:
        score = F.col("log_weight")
    ids = (w.select(id_col, score.alias("_score"))
           .orderBy(F.desc("_score"), F.asc(id_col))
           .limit(int(n_keep)).select(id_col))
    return raw.join(ids, id_col, "left_semi")


def epoch_shuffle(
    df: DataFrame,
    epoch: int = 0,
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    1-based ``shuffle_rank`` — its position in the epoch's random
    permutation — from sorting on the first 15 md5 hex digits of
    (salt ‖ epoch ‖ id). Reproducible across runs/engines/partition
    layouts (a pure function of the id), a different permutation each
    ``epoch``, and append-stable in the sense that adding documents
    permutes ranks but never reorders two surviving ids relative to
    each other within an epoch.

    Plan: the md5 key's TOP 16 BITS bucket the rows (md5 is uniform, so
    ~n/65536 rows per bucket regardless of corpus shape — no sampled
    range exchange needed, and ranks are a pure function of the data,
    never of partition layout), row_number runs per (bucket) window,
    and a TINY per-bucket count frame (≤65536 rows) supplies global
    offsets through one broadcast join — the `cluster_intervals`
    prefix-sum discipline. ONE shuffle total; no single-reducer global
    window. Writers downstream keep the order because part files are
    named part-<partitionId> (sorted(glob) = rank order after a
    repartitionByRange on the rank)."""
    # ':' separators on BOTH sides of epoch: without the first one,
    # (salt='a1', epoch=2) and (salt='a', epoch=12) would collide on
    # 'a12:' and produce identical permutations
    key = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.lit(":"), F.lit(str(int(epoch))), F.lit(":"),
        F.col(id_col).cast("string"))), 1, 15), 16, 10).cast("long")
    staged = df.withColumn("_sk", key) \
        .withColumn("_bk", F.shiftright(F.col("_sk"), 44))
    local = staged.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("_bk").orderBy("_sk", id_col)))
    counts = staged.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    wo = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_bk", F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"))
    return (local.join(F.broadcast(offs), "_bk")
            .withColumn(out_col, (F.col("_rn") + F.col("_off")).cast("long"))
            .drop("_sk", "_bk", "_rn"))


def temperature_rates(
    counts: dict[str, int], alpha: float,
    budget: int | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixture rates (the multilingual/multi-domain
    sampling rule of mT5/XLM-R: p_d ∝ n_d^alpha): given per-domain row
    counts, return per-domain KEEP probabilities that realize the
    alpha-tempered distribution within ``budget`` total rows (default:
    the largest budget reachable without up-sampling any domain —
    rates are capped at 1.0 because `resample_mixture` only thins).

    alpha=1 keeps natural proportions, alpha=0 equalizes domains,
    in-between damps head domains and boosts the tail — the standard
    knob against crawl dominating curated sources. Driver-side
    arithmetic over the TINY counts dict (one groupBy to produce it);
    apply with `resample_mixture(df, rates)` for a pure scan-speed
    filter."""
    if not counts:
        raise ValueError("temperature_rates needs at least one domain")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    n = {d: int(c) for d, c in counts.items() if c > 0}
    w = {d: c ** alpha for d, c in n.items()}
    tot_w = sum(w.values())
    probs = {d: wv / tot_w for d, wv in w.items()}
    # budget cap: the largest N with N * p_d <= n_d for all d
    n_max = min(n[d] / p for d, p in probs.items() if p > 0)
    N = n_max if budget is None else min(float(budget), n_max)
    return {d: min(1.0, (N * probs[d]) / n[d]) for d in n}


def temperature_mixture(
    df: DataFrame, alpha: float,
    key_col: str = "source", id_col: str = "doc_id",
    budget: int | None = None, salt: str = "mix",
) -> DataFrame:
    """`resample_mixture` with rates derived from the corpus itself via
    `temperature_rates`: ONE tiny groupBy for the per-domain counts
    (map-side combined, collected — a #domains-row frame), then the
    pure per-row md5 filter. Deterministic end to end."""
    counts = {r[0]: r[1] for r in
              df.groupBy(key_col).count().collect()}
    rates = temperature_rates(counts, alpha, budget)
    return resample_mixture(df, rates, key_col=key_col, id_col=id_col,
                            salt=salt)
