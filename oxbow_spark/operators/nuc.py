"""Nucleotide composition (the bedtools-nuc / seqkit-stats family) over
sequence frames from the FASTA/FASTQ scans.

All per-row math is JVM-side Catalyst expressions — base counts via
`translate` length deltas (one pass per symbol class, whole-stage
codegen, no UDF); windowed GC tracks via a bounded `sequence` explode of
window starts + substring slices (narrow, fan-out = ceil(len/step)).
The reference scans sequences (`oxbow/src/fasta.rs`) and leaves
composition analytics downstream; this is that downstream, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _count_chars(seq: Column, chars: str) -> Column:
    """Occurrences of any of ``chars`` in ``seq`` (case already folded):
    length minus length-after-translate — one codegen'd expression."""
    return (F.length(seq) - F.length(F.translate(seq, chars, ""))).cast("long")


def nuc_stats(df: DataFrame, seq_col: str = "sequence",
              id_cols: list[str] | None = None) -> DataFrame:
    """Per-row composition: length, A/C/G/T/N counts, other-symbol
    count, and gc_frac (G+C over called A/C/G/T bases, the bedtools-nuc
    definition — N's don't dilute the fraction). Case-insensitive."""
    if id_cols is None:
        id_cols = [c for c in df.columns if c != seq_col]
    up = F.upper(F.col(seq_col))
    a, c = _count_chars(up, "A"), _count_chars(up, "C")
    g, t = _count_chars(up, "G"), _count_chars(up, "T")
    n = _count_chars(up, "N")
    ln = F.length(up).cast("long")
    called = a + c + g + t
    return df.select(
        *id_cols,
        ln.alias("length"),
        a.alias("n_a"), c.alias("n_c"), g.alias("n_g"), t.alias("n_t"),
        n.alias("n_n"),
        (ln - called - n).alias("n_other"),
        ((g + c) / F.greatest(called, F.lit(1)).cast("double"))
        .alias("gc_frac"),
    )


def gc_windows(df: DataFrame, window: int, step: int | None = None,
               seq_col: str = "sequence", id_col: str = "name") -> DataFrame:
    """(id, win_start, win_len, gc_frac): sliding/tumbling GC% track per
    sequence — the UCSC gc5Base-style signal. ``step`` defaults to
    ``window`` (tumbling). The final partial window is emitted with its
    true length. Plan: one `sequence` explode of window starts (narrow)
    + per-slice translate counts; no shuffle at all."""
    step = step or window
    up = F.upper(F.col(seq_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(up) - 1, F.lit(0)),
        F.lit(step),
    )
    # empty sequences must yield zero windows — without the filter the
    # clamped bound greatest(len-1, 0) emits one bogus (0, 0, 0.0) row
    ex = df.where(F.length(F.col(seq_col)) > 0).select(
        F.col(id_col), up.alias("_seq"),
        F.explode(starts).alias("win_start"),
    )
    sl = F.col("_seq").substr(F.col("win_start") + 1, F.lit(window))
    g_c = _count_chars(sl, "GC")
    called = _count_chars(sl, "ACGT")
    return ex.select(
        F.col(id_col),
        F.col("win_start").cast("long").alias("win_start"),
        F.length(sl).cast("long").alias("win_len"),
        (g_c / F.greatest(called, F.lit(1)).cast("double")).alias("gc_frac"),
    )


def getfasta_intervals(
    intervals: DataFrame, seqs: DataFrame,
    on: str = "chrom", start_col: str = "start", end_col: str = "end",
    name_col: str = "name", seq_col: str = "seq",
    strand_col: str | None = None,
    tile_bp: int = 1 << 20,
    out_col: str = "iv_seq",
) -> DataFrame:
    """bedtools-getfasta: every interval row plus the sequence it spans
    (half-open [start, end)), optionally reverse-complemented where
    ``strand_col`` is '-' (bedtools ``-s``). Intervals clip to the
    contig like bedtools; intervals on unknown contigs or entirely
    past the contig end drop (bedtools warns and skips those).

    Plan shape — the reason this is not "join on chrom + substring":
    a per-contig row carries the WHOLE contig string (250 MB for human
    chr1) and an equi-join would ship it to every matching interval
    row. Instead the contig rows explode ONCE into ``tile_bp`` tiles
    (pure `sequence` + `substring` expressions, no UDF), intervals
    explode into only the tiles they touch (fan-out ≈
    interval_len/tile_bp), ONE co-keyed equi-join on (contig, tile)
    moves tile-sized strings only, and per-interval pieces reassemble
    with a sorted-array concat — one partial-agg groupBy, no window.
    Shuffle volume is O(interval bases + touched tile bytes), never
    O(genome × intervals)."""
    tb = int(tile_bp)
    if tb <= 0:
        raise ValueError("tile_bp must be positive")

    tiles = seqs.select(
        F.col(name_col).alias("_c"),
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.ceil(F.length(seq_col) / tb).cast("long") - 1,
                       F.lit(0).cast("long")))).alias("_t2"),
        F.col(seq_col).alias("_s"),
    ).select(
        "_c", "_t2",
        F.col("_s").substr((F.col("_t2") * tb + 1).cast("int"),
                           F.lit(tb)).alias("_tile"))

    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    cols = list(intervals.columns)
    iv = (intervals.where(e > s)
          .withColumn("_rid", F.monotonically_increasing_id())
          .withColumn("_cs", F.greatest(s, F.lit(0).cast("long")))
          .where(F.col("_cs") < e)
          .withColumn("_t", F.explode(F.sequence(
              F.floor(F.col("_cs") / tb), F.floor((e - 1) / tb)))))
    lo = F.greatest(F.col("_cs"), F.col("_t") * tb)
    hi = F.least(F.col(end_col).cast("long"), (F.col("_t") + 1) * tb)
    pieces = (iv.join(tiles, (iv[on] == tiles["_c"])
                      & (iv["_t"] == tiles["_t2"]))
              .select(
                  "_rid", F.col("_t").alias("_tt"),
                  F.struct(*[iv[c].alias(c) for c in cols]).alias("_row"),
                  F.col("_tile").substr(
                      (lo - F.col("_t") * tb + 1).cast("int"),
                      (hi - lo).cast("int")).alias("_piece"))
              # an in-contig interval always yields non-empty pieces;
              # empty ones mean the span lies past the contig end —
              # drop them so fully-out-of-range intervals vanish
              # (bedtools skips those) under ANY tile width
              .where(F.length("_piece") > 0))
    asm = (pieces.groupBy("_rid")
           .agg(F.first("_row").alias("_row"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("_tt").alias("t"),
                                     F.col("_piece").alias("p")))),
                        lambda x: x["p"]), "").alias("_seq")))
    out = asm.select(*[F.col("_row")[c].alias(c) for c in cols],
                     F.col("_seq").alias(out_col))
    if strand_col is not None:
        rc = F.translate(F.reverse(F.col(out_col)),
                         "ACGTacgtNnRYSWKMryswkm",
                         "TGCAtgcaNnYRSWMKyrswmk")
        out = out.withColumn(
            out_col,
            F.when(F.col(strand_col) == "-", rc).otherwise(F.col(out_col)))
    return out


def maskfasta_intervals(
    seqs: DataFrame, intervals: DataFrame,
    on: str = "chrom", start_col: str = "start", end_col: str = "end",
    name_col: str = "name", seq_col: str = "seq",
    soft: bool = False, mask_char: str = "N",
    tile_bp: int = 1 << 20, split_bp: int | None = None,
) -> DataFrame:
    """bedtools-maskfasta: return the contig frame with every base
    covered by ``intervals`` replaced by ``mask_char`` (or lowercased
    with ``soft=True``, bedtools ``-soft``). Intervals clip to the
    contig; duplicates/overlaps are harmless (they merge first).

    Plan shape (the `getfasta_intervals` tiling, inverted): contigs
    explode once into ``tile_bp`` tiles; the MERGED (disjoint)
    intervals explode into the tiles they touch; per (contig, tile)
    the clipped spans collect into a sorted array and ONE
    `aggregate`+`overlay` expression fold applies them to the tile
    string (no UDF); untouched tiles pass through a left join, and
    contigs reassemble with a sorted-array concat. Shuffle volume is
    O(tiles + interval rows), never O(genome × intervals); no task
    ever holds more than a tile plus its spans. ``split_bp`` chunks
    the interval-merge window for single-contig interval skew."""
    from oxbow_spark.operators.interval_ops import merge_intervals

    tb = int(tile_bp)
    if tb <= 0:
        raise ValueError("tile_bp must be positive")
    if len(mask_char) != 1:
        raise ValueError("mask_char must be a single character")

    tiles = seqs.select(
        F.col(name_col).alias("_c"),
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.greatest(F.ceil(F.length(seq_col) / tb).cast("long") - 1,
                       F.lit(0).cast("long")))).alias("_t"),
        F.col(seq_col).alias("_s"),
    ).select(
        "_c", "_t",
        F.col("_s").substr((F.col("_t") * tb + 1).cast("int"),
                           F.lit(tb)).alias("_tile"))

    m = merge_intervals(
        intervals.select(F.col(on).alias("_c"),
                         F.col(start_col).cast("long").alias("start"),
                         F.col(end_col).cast("long").alias("end")),
        on="_c", split_bp=split_bp).where(F.col("end") > 0).withColumn(
        "_ms", F.greatest(F.col("start"), F.lit(0).cast("long")))
    spans = m.withColumn("_t", F.explode(F.sequence(
        F.floor(F.col("_ms") / tb), F.floor((F.col("end") - 1) / tb)))) \
        .select(
            "_c", "_t",
            F.greatest(F.col("_ms") - F.col("_t") * tb,
                       F.lit(0).cast("long")).alias("_lo"),   # 0-based in tile
            F.least(F.col("end") - F.col("_t") * tb,
                    F.lit(tb).cast("long")).alias("_hi"))
    per_tile = spans.groupBy("_c", "_t").agg(
        F.array_sort(F.collect_list(
            F.struct(F.col("_lo"), F.col("_hi")))).alias("_spans"))

    def apply_span(acc, sp):
        # clip to the actual tile length (the last tile is short); the
        # soft replacement is computed FROM acc, so it lowercases the
        # current bases in place
        lo = sp["_lo"]
        ln = F.least(sp["_hi"], F.length(acc).cast("long")) - lo
        repl = (F.lower(acc.substr((lo + 1).cast("int"), ln.cast("int")))
                if soft else F.repeat(F.lit(mask_char), ln.cast("int")))
        return F.when(ln > 0, F.overlay(acc, repl, (lo + 1).cast("int"))) \
            .otherwise(acc)

    masked = (tiles.join(per_tile, ["_c", "_t"], "left")
              .select(
                  "_c", "_t",
                  F.when(F.col("_spans").isNotNull(),
                         F.aggregate("_spans", F.col("_tile"), apply_span))
                  .otherwise(F.col("_tile")).alias("_tile")))
    return (masked.groupBy("_c")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("_t").alias("t"),
                                 F.col("_tile").alias("p")))),
                    lambda x: x["p"]), "").alias(seq_col))
            .select(F.col("_c").alias(name_col), seq_col))
