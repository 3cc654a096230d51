"""Alignment (read-pair) duplicate marking — the reference's flagship
downstream workflow (`docs/user-guide/examples/sam_mark_duplicates.md`),
re-expressed entirely in Catalyst expressions.

The reference implements this over Polars with row-at-a-time Python
`map_elements` for the 5′-start, quality-sum, and key-building steps. Here
every derived field is a JVM-side higher-order-function expression
(whole-stage codegen, no Python in the hot path), and the pair grouping +
best-pair selection are one `groupBy(qname)` + one window — two shuffles
total at any scale, both partition-parallel.

Semantics (matching the walkthrough):
- unclipped 5′ start: forward = pos − leading S/H clips; reverse =
  pos + reference-aligned length (M/=/X/D/N) + trailing S/H clips − 1
  (`sam_mark_duplicates.md:57-110`, per htsjdk).
- reads pair by qname; unpaired reads are dropped with the same warning
  semantics (filtered, reference `build_dedup_key` returns None).
- the dedup key is the sorted (rname, 5p, strand) signature of the pair
  (`sam_mark_duplicates.md:113-123`).
- among duplicate pairs, the highest total (summed Phred) quality wins;
  ties break by qname for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oxbow_spark.functions import genomics as G

_CLIPS = ("S", "H")


def _clip_len(ops: Column) -> Column:
    """Total length of leading S/H ops (stops at the first non-clip)."""
    acc0 = F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop"))
    return F.aggregate(
        ops, acc0,
        lambda a, x: F.struct(
            F.when(~a["stop"] & x["op"].isin(*_CLIPS), a["n"] + x["n"])
            .otherwise(a["n"]).alias("n"),
            (a["stop"] | ~x["op"].isin(*_CLIPS)).alias("stop"),
        ),
    )["n"]


def unclipped_5p_start(pos, cigar, flag) -> Column:
    """Unclipped 5′ start of an alignment (expression form of
    `get_unclipped_5p_start`, `sam_mark_duplicates.md:57-110`)."""
    ops = G.cigar_ops(cigar)
    lead = _clip_len(ops)
    trail = _clip_len(F.reverse(ops))
    aligned = G.cigar_reflen(cigar)
    p = F.col(pos) if isinstance(pos, str) else pos
    return F.when(
        G.flag_is(flag, "reverse"), p + aligned + trail - 1
    ).otherwise(p - lead)


def total_quality(qual) -> Column:
    """Summed Phred score of a quality string (0 when null)."""
    return F.coalesce(
        F.aggregate(G.phred_to_scores(qual), F.lit(0), lambda a, x: a + x),
        F.lit(0),
    )


def mark_duplicates(df: DataFrame, qname_col: str = "qname") -> DataFrame:
    """Deduplicate read pairs: one best (highest total quality) pair per
    (sorted 5′ signature) key; returns the surviving alignment records
    with the original columns. Unpaired qnames are dropped (reference
    behavior). Input needs qname/flag/rname/pos/cigar/qual columns."""
    enriched = df.withColumn(
        "_p5", unclipped_5p_start("pos", "cigar", "flag")
    ).withColumn(
        "_strand", G.strand_from_flag("flag")
    ).withColumn("_tq", total_quality("qual"))

    pairs = (
        enriched.groupBy(qname_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("rname"), F.col("_p5"), F.col("_strand")))
            ).alias("_ends"),
            F.sum("_tq").alias("_pair_quality"),
            F.collect_list(F.struct(*[F.col(c) for c in df.columns])).alias("_alignments"),
        )
        .where(F.size("_ends") >= 2)
        .withColumn(
            "_dedup_key",
            F.concat_ws(
                "__",
                F.concat_ws(":", F.col("_ends")[0]["rname"],
                            F.col("_ends")[0]["_p5"], F.col("_ends")[0]["_strand"]),
                F.concat_ws(":", F.col("_ends")[1]["rname"],
                            F.col("_ends")[1]["_p5"], F.col("_ends")[1]["_strand"]),
            ),
        )
    )
    w = Window.partitionBy("_dedup_key").orderBy(
        F.desc("_pair_quality"), F.asc(qname_col)
    )
    best = pairs.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    return best.select(F.explode("_alignments").alias("_a")).select("_a.*")
