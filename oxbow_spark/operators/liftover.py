"""Assembly liftover via UCSC chain files (public format:
genome.ucsc.edu/goldenPath/help/chain.html).

A chain is a net of gapless aligned blocks between a source ("target"
in chain-file nomenclature — the FROM assembly) and a destination
("query" — the TO assembly). Positions inside an aligned block map by
offset; positions in gaps are unmapped. `-` strand chains map onto the
reversed destination sequence, so coordinates flip to
``q_size - x - 1``.

Scale design: chain files are a few MB even for whole-genome nets →
the parsed block table BROADCASTS; rows join blocks on
``(chrom, bin)`` (each block explodes into the coarse bins it spans,
driver-side — block counts are ~1e5-1e6, never corpus-sized), so the
mapping is a broadcast hash join + offset arithmetic, never a
nested-loop range probe. The corpus side stays narrow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
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


def parse_chain(text: str) -> list[ChainBlock]:
    """Parse UCSC chain text into gapless mapping blocks. The chain
    header's q coordinates are strand-local; blocks are emitted with
    strand-local q_start (the flip to + coordinates happens in the
    mapping expression, matching UCSC liftOver)."""
    blocks: list[ChainBlock] = []
    t_pos = q_pos = 0
    hdr: list[str] | None = None
    cid = 0
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
            continue
        if hdr is None:
            raise ValueError("chain data before any chain header")
        parts = line.split()
        size = int(parts[0])
        if size > 0:
            blocks.append(ChainBlock(
                t_chrom=hdr[2], t_start=t_pos, t_end=t_pos + size,
                q_chrom=hdr[7], q_start=q_pos, q_strand=hdr[9],
                q_size=int(hdr[8]), chain_id=cid,
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
                         b.q_start, b.q_strand, b.q_size, b.chain_id))
    return spark.createDataFrame(
        rows,
        "t_chrom string, _bin long, t_start long, t_end long, "
        "q_chrom string, q_start long, q_strand string, q_size long, "
        "chain_id long",
    )


def liftover_positions(
    df: DataFrame, chains: DataFrame, chrom_col: str = "chrom",
    pos_col: str = "pos",
) -> DataFrame:
    """Input columns + (new_chrom, new_pos, chain_id); unmapped rows
    (position in a chain gap or outside every chain) keep nulls — the
    liftOver 'unMapped' set, left for the caller to filter or audit.
    Positions are 0-based."""
    pos = F.col(pos_col).cast("long")
    left = df.withColumn("_bin", F.floor(pos / _BIN))
    j = left.join(
        F.broadcast(chains),
        (F.col(chrom_col) == F.col("t_chrom")) & (left["_bin"] == chains["_bin"])
        & (pos >= F.col("t_start")) & (pos < F.col("t_end")),
        "left",
    )
    fwd = F.col("q_start") + (pos - F.col("t_start"))
    new_pos = F.when(F.col("q_strand") == "+", fwd) \
        .otherwise(F.col("q_size") - fwd - 1)
    return j.select(
        *[left[c] for c in df.columns],
        F.col("q_chrom").alias("new_chrom"),
        new_pos.cast("long").alias("new_pos"),
        F.col("chain_id"),
    )


def liftover_intervals(
    df: DataFrame, chains: DataFrame, chrom_col: str = "chrom",
    start_col: str = "start", end_col: str = "end",
) -> DataFrame:
    """Interval liftover: both ends must land in the SAME chain block
    (the strict gapless case — UCSC liftOver additionally stitches
    across chain gaps under -minMatch; that relaxation maps each end
    separately with `liftover_positions` and joins on chain_id).
    Output: input columns + (new_chrom, new_start, new_end, chain_id);
    split/unmapped intervals keep nulls. `-` strand chains flip the
    interval: new_start = flip(end-1), new_end = flip(start)+1."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    left = df.withColumn("_bin", F.floor(s / _BIN))
    j = left.join(
        F.broadcast(chains),
        (F.col(chrom_col) == F.col("t_chrom")) & (left["_bin"] == chains["_bin"])
        & (s >= F.col("t_start")) & (e <= F.col("t_end")) & (e > s),
        "left",
    )
    fwd_s = F.col("q_start") + (s - F.col("t_start"))
    fwd_e = F.col("q_start") + (e - F.col("t_start"))
    plus = F.col("q_strand") == "+"
    new_s = F.when(plus, fwd_s).otherwise(F.col("q_size") - fwd_e)
    new_e = F.when(plus, fwd_e).otherwise(F.col("q_size") - fwd_s)
    return j.select(
        *[left[c] for c in df.columns],
        F.col("q_chrom").alias("new_chrom"),
        new_s.cast("long").alias("new_start"),
        new_e.cast("long").alias("new_end"),
        F.col("chain_id"),
    )
