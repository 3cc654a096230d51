"""Deduplication operators for large-scale text/training-data pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all
expressed as Catalyst-friendly DataFrame ops (no Python UDFs in the hot
path). Hash functions are built on ``md5`` so results are reproducible
across engines (DuckDB oracle parity) and across Spark versions; at 100 TB
swap ``md5`` for ``xxhash64`` (same plan shape, faster) — the structure,
shuffles and join strategy are identical.

Scale notes:
- exact dedup: one hash-shuffle on the digest; map-side partial agg keeps
  shuffle volume at ~1 row per distinct digest per task.
- MinHash-LSH: docs -> shingles -> K min-hashes -> B band keys; the only
  wide op is the band-key self-join, whose fan-out is controlled by band
  size; verification joins shingle sets only for candidate pairs.
- SimHash: token-parallel bit voting via a single explode + groupBy.
- n-gram Jaccard all-pairs is O(n^2) and intentionally restricted to
  small partitions of the corpus (per-source blocks) — the LSH path is
  the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokens(col):
    return F.split(F.trim(col), TOKEN_SPLIT)


def shingles_of(t, k: int = 3):
    """Array of k-word shingles from a *token array column*.

    IMPORTANT: pass a materialized column reference, not the `tokens(...)`
    expression itself — Catalyst's CollapseProject re-inlines a split()
    expression into the transform lambda, making this O(tokens × shingles)
    per row. See `shingle_stage` for the staged form.
    """
    idx = F.sequence(F.lit(0), F.size(t) - k)
    return F.when(
        F.size(t) >= k,
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)])),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def word_shingles(col, k: int = 3):
    """Array of k-word shingles (contiguous token windows) of a text column.
    Convenience form; for hot paths use `shingle_stage` (see `shingles_of`)."""
    return shingles_of(tokens(col), k)


def shingle_stage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_k: int = 3, persist: bool = True,
) -> DataFrame:
    """(id, sh): distinct shingle set per doc, built in two persisted stages
    (tokens, then shingles) so the split/shingle expressions evaluate once
    per row. On a cluster the same barrier is persist(DISK_ONLY) or a
    checkpoint — the plan shape is what matters, not the storage level."""
    tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    if persist:
        tok = tok.persist()
    out = tok.select(
        F.col(id_col),
        F.array_distinct(shingles_of(F.col("_t"), shingle_k)).alias("sh"),
    )
    if persist:
        out = out.persist()
    return out


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text digest.

    Returns (digest, keep_id, n_copies). ``dropDuplicates`` semantics but
    with a deterministic representative and a copy count.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, shingle_k: int = 3, _sh: DataFrame | None = None,
) -> DataFrame:
    """(id, sig_0..sig_{H-1}): per-doc MinHash signature.

    hash_j(shingle) = md5(j || ':' || shingle); sig_j = lexicographic min
    over the doc's shingle set. Entirely JVM-side (higher-order functions),
    no shuffle until the caller groups/joins.

    Signature mins are invariant under shingle duplication, so the staged
    distinct shingle set is used (shared with the Jaccard verify stage).
    """
    staged = (
        _sh if _sh is not None
        else shingle_stage(df, text_col, id_col, shingle_k)
    )
    cols = [F.col(id_col)]
    for j in range(num_hashes):
        hashed = F.transform("sh", lambda s, j=j: F.md5(F.concat_ws(":", F.lit(str(j)), s)))
        cols.append(F.array_min(hashed).alias(f"sig_{j}"))
    return staged.select(*cols)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id",
    num_hashes: int = 8, band_rows: int = 2,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 LSH band.

    Bands: hash of ``band_rows`` consecutive signature components. The
    band-key equi-join is the only shuffle; its skew is bounded because a
    band key collision requires all rows in the band to agree.
    """
    bands = []
    for b in range(num_hashes // band_rows):
        parts = [F.col(f"sig_{b * band_rows + r}") for r in range(band_rows)]
        bands.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("key")))
    e = sigs.select(F.col(id_col), F.explode(F.array(*bands)).alias("bk"))
    a = e.select(F.col(id_col).alias("id_a"), F.col("bk").alias("k"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("bk").alias("k"))
    return (
        a.join(b, "k")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_k: int = 3, _sh: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs.

    Joins shingle arrays to the (small) candidate pair set, then computes
    |A ∩ B| / |A ∪ B| with array intrinsics — no UDF, no explode.
    """
    sh = _sh if _sh is not None else shingle_stage(df, text_col, id_col, shingle_k)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, band_rows: int = 2, shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidate pairs verified >= threshold.

    One persisted distinct-shingle stage feeds both the signature build and
    the Jaccard verify; the signature frame is persisted too since it feeds
    both sides of the band-key self-join. Without these barriers Catalyst
    re-inlines the shingle+md5 expressions into every branch. The persists
    are materialized eagerly — a lazy persist lets the self-join branches
    race and compute the subtree twice on a cold cache.
    """
    sh = shingle_stage(df, text_col, id_col, shingle_k)
    sh.count()
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, _sh=sh).persist()
    sigs.count()
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_rows)
    return jaccard_pairs(df, cand, text_col, id_col, shingle_k, _sh=sh).where(
        F.col("jaccard") >= threshold
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint over ``bits`` bit positions (<= 32).

    Bit source: parity of the i-th hex digit of md5(token) — engine-portable
    and deterministic. Bit voting is an explode + single groupBy (one
    shuffle, partial-aggregated map-side).
    """
    t = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .withColumn("h", F.md5("tok"))
    )
    votes = [
        F.sum(
            F.when(F.ascii(F.substring("h", i + 1, 1)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    g = t.groupBy(id_col).agg(*votes)
    sim = sum(
        (F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0) for i in range(bits)),
        start=F.lit(0),
    )
    return g.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, block_col: str, text_col: str = "text", id_col: str = "doc_id",
    shingle_k: int = 3, threshold: float = 0.2,
) -> DataFrame:
    """All-pairs n-gram Jaccard within blocks (per-``block_col`` groups).

    The block is the scale guard: pairs are only formed inside a block, so
    cost is sum(|block|^2), not |corpus|^2. For unblocked near-dup at scale
    use ``minhash_dedup_pairs``.
    """
    tok = df.select(
        F.col(block_col).alias("blk"), F.col(id_col),
        tokens(F.col(text_col)).alias("_t"),
    ).persist()
    sh = tok.select(
        "blk", F.col(id_col),
        F.array_distinct(shingles_of(F.col("_t"), shingle_k)).alias("sh"),
    ).persist()
    a = sh.select("blk", F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select("blk", F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("blk", "id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
