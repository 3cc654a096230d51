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
