"""Assembly liftover via UCSC chain files (public format:
genome.ucsc.edu/goldenPath/help/chain.html).

A chain is a net of gapless aligned blocks between a source ("target"
in chain-file nomenclature — the FROM assembly) and a destination
("query" — the TO assembly). Positions inside an aligned block map by
offset; positions in gaps are unmapped. `-` strand chains map onto the
reversed destination sequence, so coordinates flip to
``q_size - x - 1``.

Best-chain semantics (matching UCSC liftOver's chain selection): when
several chains of a real whole-genome net overlap the same source
range, each input row maps through the single best candidate — maximum
chain score, ties broken by minimum chain_id — never one output row
per matching chain.

Scale design: chain files are a few MB even for whole-genome nets →
the parsed block table BROADCASTS, pre-grouped per (chrom, 64 kb bin)
into an array of block structs. Rows reach their candidate blocks via
one broadcast hash equi-join on ``(chrom, bin)`` (group keys are
unique, so the join never duplicates corpus rows), and the best-chain
pick is a pure expression — ``filter`` by containment + ``array_max``
over (score, -chain_id)-ordered structs. No window, no extra shuffle,
no nested-loop range probe; the corpus side stays narrow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_BIN = 1 << 16  # 64 kb mapping bins — chain blocks are typically kb-scale


@dataclass(frozen=True)
class ChainBlock:
    t_chrom: str
    t_start: int   # source-assembly block range [t_start, t_end)
    t_end: int
    q_chrom: str
    q_start: int   # destination block start on the + strand coordinate
    q_strand: str  # '+' or '-'
    q_size: int    # destination chromosome length (for - strand flips)
    chain_id: int
    score: int     # chain header score — best-chain tiebreak


def parse_chain(text: str) -> list[ChainBlock]:
    """Parse UCSC chain text into gapless mapping blocks. The chain
    header's q coordinates are strand-local; blocks are emitted with
    strand-local q_start (the flip to + coordinates happens in the
    mapping expression, matching UCSC liftOver)."""
    blocks: list[ChainBlock] = []
    t_pos = q_pos = 0
    hdr: list[str] | None = None
    cid = 0
    score = 0
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("chain"):
            hdr = line.split()
            if len(hdr) < 12:
                raise ValueError(f"chain header too short: {line!r}")
            t_pos = int(hdr[5])
            q_pos = int(hdr[10])
            cid = int(hdr[12]) if len(hdr) > 12 else cid + 1
            score = int(hdr[1])
            continue
        if hdr is None:
            raise ValueError("chain data before any chain header")
        parts = line.split()
        size = int(parts[0])
        if size > 0:
            blocks.append(ChainBlock(
                t_chrom=hdr[2], t_start=t_pos, t_end=t_pos + size,
                q_chrom=hdr[7], q_start=q_pos, q_strand=hdr[9],
                q_size=int(hdr[8]), chain_id=cid, score=score,
            ))
        if len(parts) == 3:
            t_pos += size + int(parts[1])
            q_pos += size + int(parts[2])
        else:
            hdr = None  # last line of the chain
    return blocks


def chain_frame(spark: SparkSession, blocks: list[ChainBlock]) -> DataFrame:
    """Block table exploded into the coarse bins each block spans —
    ready to broadcast into the mapping join."""
    rows = []
    for b in blocks:
        for bn in range(b.t_start // _BIN, (b.t_end - 1) // _BIN + 1):
            rows.append((b.t_chrom, bn, b.t_start, b.t_end, b.q_chrom,
                         b.q_start, b.q_strand, b.q_size, b.chain_id,
                         b.score))
    return spark.createDataFrame(
        rows,
        "t_chrom string, _bin long, t_start long, t_end long, "
        "q_chrom string, q_start long, q_strand string, q_size long, "
        "chain_id long, score long",
    )


_BLOCK_FIELDS = ["t_start", "t_end", "q_chrom", "q_start", "q_strand",
                 "q_size", "chain_id", "score"]


def _grouped_chains(chains: DataFrame) -> DataFrame:
    """(t_chrom, _bin) → array of block structs. Unique group keys, so
    the downstream broadcast join matches each corpus row at most once
    (the whole point: multi-chain overlap resolution never re-shuffles
    or duplicates the corpus)."""
    return chains.groupBy("t_chrom", "_bin").agg(
        F.collect_list(F.struct(*_BLOCK_FIELDS)).alias("_blocks"))


def _best_block(cand: Column) -> Column:
    """Best chain among candidate blocks: max score, tie → min chain_id
    (UCSC liftOver keeps the highest-scoring chain in the net). Struct
    comparison is lexicographic, so leading (score, -chain_id) makes
    array_max pick it deterministically; null/empty arrays yield null."""
    return F.array_max(F.transform(cand, lambda b: F.struct(
        b["score"].alias("score"),
        (-b["chain_id"]).alias("_nci"),
        b["t_start"].alias("t_start"),
        b["q_chrom"].alias("q_chrom"),
        b["q_start"].alias("q_start"),
        b["q_strand"].alias("q_strand"),
        b["q_size"].alias("q_size"),
        b["chain_id"].alias("chain_id"),
    )))


def liftover_positions(
    df: DataFrame, chains: DataFrame, chrom_col: str = "chrom",
    pos_col: str = "pos",
) -> DataFrame:
    """Input columns + (new_chrom, new_pos, chain_id); unmapped rows
    (position in a chain gap or outside every chain) keep nulls — the
    liftOver 'unMapped' set, left for the caller to filter or audit.
    Overlapping chains resolve to the best one per row (max score, tie
    min chain_id) — one output row per input row, always.
    Positions are 0-based."""
    pos = F.col(pos_col).cast("long")
    left = df.withColumn("_bin", F.floor(pos / _BIN))
    g = _grouped_chains(chains)
    j = left.join(
        F.broadcast(g),
        (F.col(chrom_col) == F.col("t_chrom")) & (left["_bin"] == g["_bin"]),
        "left",
    )
    cand = F.filter(
        "_blocks", lambda b: (pos >= b["t_start"]) & (pos < b["t_end"]))
    # the best-block struct is STAGED as its own column. Measured
    # NEUTRAL (4.3 s either way at 400 chains/bin x 200k positions):
    # the five output references are the IDENTICAL subtree, which
    # codegen subexpression elimination already evaluates once even
    # for CodegenFallback HOFs — unlike popgen's distinct metric
    # trees (SCALE.md fact #5 addendum). Kept staged anyway: the
    # audit-rule shape is robust to a downstream filter substituting
    # the alias (one extra evaluation, never per-reference).
    j = j.withColumn("_best", _best_block(cand))
    best = F.col("_best")
    fwd = best["q_start"] + (pos - best["t_start"])
    new_pos = F.when(best["q_strand"] == "+", fwd) \
        .otherwise(best["q_size"] - fwd - 1)
    return j.select(
        *[left[c] for c in df.columns],
        best["q_chrom"].alias("new_chrom"),
        new_pos.cast("long").alias("new_pos"),
        best["chain_id"].alias("chain_id"),
    )


def liftover_intervals(
    df: DataFrame, chains: DataFrame, chrom_col: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    min_match: float | None = None, id_col: str | None = None,
) -> DataFrame:
    """Interval liftover. Default (``min_match=None``): both ends must
    land in the SAME chain block — the strict gapless case; straddling
    intervals keep nulls.

    ``min_match`` (UCSC liftOver's ``-minMatch``, its default 0.95)
    relaxes this: an interval maps through a chain when at least that
    fraction of its bases falls in the chain's aligned blocks — gaps
    inside the chain are stitched over, and the output interval spans
    from the first to the last mapped base. Candidate chains below the
    threshold are dropped; among the rest the best (max score, tie min
    chain_id) wins. See `_liftover_intervals_minmatch` for the plan
    shape and the optional ``id_col`` fast path.

    Output: input columns + (new_chrom, new_start, new_end, chain_id);
    split/unmapped intervals keep nulls. Overlapping chains resolve to
    the best containing block per row (max score, tie min chain_id) —
    one output row per input row, always. `-` strand chains flip the
    interval: new_start = flip(end-1), new_end = flip(start)+1."""
    if min_match is not None:
        return _liftover_intervals_minmatch(
            df, chains, chrom_col, start_col, end_col, min_match, id_col)
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    left = df.withColumn("_bin", F.floor(s / _BIN))
    g = _grouped_chains(chains)
    j = left.join(
        F.broadcast(g),
        (F.col(chrom_col) == F.col("t_chrom")) & (left["_bin"] == g["_bin"]),
        "left",
    )
    cand = F.filter(
        "_blocks",
        lambda b: (s >= b["t_start"]) & (e <= b["t_end"]) & (e > s))
    # staged for the same reason (and with the same measured-neutral
    # caveat) as liftover_positions
    j = j.withColumn("_best", _best_block(cand))
    best = F.col("_best")
    fwd_s = best["q_start"] + (s - best["t_start"])
    fwd_e = best["q_start"] + (e - best["t_start"])
    plus = best["q_strand"] == "+"
    new_s = F.when(plus, fwd_s).otherwise(best["q_size"] - fwd_e)
    new_e = F.when(plus, fwd_e).otherwise(best["q_size"] - fwd_s)
    return j.select(
        *[left[c] for c in df.columns],
        best["q_chrom"].alias("new_chrom"),
        new_s.cast("long").alias("new_start"),
        new_e.cast("long").alias("new_end"),
        best["chain_id"].alias("chain_id"),
    )


def _liftover_intervals_minmatch(
    df: DataFrame, chains: DataFrame, chrom_col: str, start_col: str,
    end_col: str, min_match: float, id_col: str | None,
) -> DataFrame:
    """-minMatch interval mapping. Plan: intervals explode into their
    64 kb bins (typically 1-2 copies), broadcast-join the flat binned
    block table, per-(row, chain) aggregate of overlapped bases (each
    block counted once — its overlap is charged to the bin holding the
    overlap start), threshold on the mapped fraction, best-chain
    ``max_by``, then one equi-join back onto the input so unmapped rows
    keep nulls. With ``id_col`` (a unique row key) the rejoin is a
    plain key join; without one, the computation runs on
    ``dropDuplicates()`` of the input and rejoins null-safe on every
    column — exact for duplicate rows, at the cost of one extra
    shuffle. The corpus never cartesians: the only wide ops are the
    per-(row, chain) partial-agg groupBy and (keyless mode) the
    distinct."""
    from functools import reduce

    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    base = df if id_col is not None else df.dropDuplicates()
    keys = [id_col] if id_col is not None else list(df.columns)

    binned = base.select(
        *keys, s.alias("_s"), e.alias("_e"),
        F.col(chrom_col).alias("_chrom"),
        F.explode(
            F.when((e > s) & s.isNotNull(),
                   F.sequence(F.floor(s / _BIN), F.floor((e - 1) / _BIN)))
            .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
        ).alias("_qbin"),
    ) if id_col is not None else base.select(
        "*", s.alias("_s"), e.alias("_e"),
        F.col(chrom_col).alias("_chrom"),
        F.explode(
            F.when((e > s) & s.isNotNull(),
                   F.sequence(F.floor(s / _BIN), F.floor((e - 1) / _BIN)))
            .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
        ).alias("_qbin"),
    )
    j = binned.join(
        F.broadcast(chains),
        (F.col("_chrom") == F.col("t_chrom"))
        & (F.col("_qbin") == F.col("_bin")))
    ov_s = F.greatest(F.col("_s"), F.col("t_start"))
    ov_e = F.least(F.col("_e"), F.col("t_end"))
    per = j.where((ov_e > ov_s) & (F.floor(ov_s / _BIN) == F.col("_qbin")))
    blk = F.struct(F.col("t_start"), F.col("t_end"), F.col("q_start"))
    agg = per.groupBy(*keys, "chain_id").agg(
        F.sum(ov_e - ov_s).alias("_mapped"),
        F.min_by(blk, F.col("t_start")).alias("_b0"),
        F.max_by(blk, F.col("t_end")).alias("_b1"),
        F.first("_s").alias("_s"), F.first("_e").alias("_e"),
        F.first("q_chrom").alias("q_chrom"),
        F.first("q_strand").alias("q_strand"),
        F.first("q_size").alias("q_size"),
        F.first("score").alias("score"),
    )
    frac_ok = (F.col("_mapped").cast("double")
               / (F.col("_e") - F.col("_s"))) >= F.lit(min_match)
    b0, b1 = F.col("_b0"), F.col("_b1")
    q0 = b0["q_start"] + (F.greatest(F.col("_s"), b0["t_start"])
                          - b0["t_start"])
    q1 = b1["q_start"] + (F.least(F.col("_e"), b1["t_end"]) - b1["t_start"])
    plus = F.col("q_strand") == "+"
    cand = agg.where(frac_ok).select(
        *keys,
        F.struct(
            F.col("score").alias("score"),
            (-F.col("chain_id")).alias("_nci"),
            F.col("q_chrom").alias("new_chrom"),
            F.when(plus, q0).otherwise(F.col("q_size") - q1)
            .cast("long").alias("new_start"),
            F.when(plus, q1).otherwise(F.col("q_size") - q0)
            .cast("long").alias("new_end"),
            F.col("chain_id").alias("chain_id"),
        ).alias("_m"),
    )
    best = (cand.groupBy(*keys)
            .agg(F.max("_m").alias("_m"))
            .select(*keys, "_m.new_chrom", "_m.new_start", "_m.new_end",
                    "_m.chain_id"))
    right = best.select(
        *[F.col(k).alias(f"_k_{i}") for i, k in enumerate(keys)],
        "new_chrom", "new_start", "new_end", "chain_id")
    cond = reduce(
        lambda a, b: a & b,
        [df[k].eqNullSafe(right[f"_k_{i}"]) for i, k in enumerate(keys)])
    return (df.join(right, cond, "left")
            .select(*[df[c] for c in df.columns],
                    "new_chrom", "new_start", "new_end", "chain_id"))
