"""samtools-mpileup-style base pileup as pure Catalyst expressions.

Given an alignment frame (rname, 1-based pos, cigar, seq), emit one row
per covered reference base with nucleotide counts — the workhorse
downstream of every alignment scan (variant eyeballing, consensus,
error profiling). The reference (abdenlab/oxbow) scans alignments and
leaves pileup to consumers; this is that consumer, Spark-first.

Plan shape: the CIGAR walk is ONE ``aggregate`` fold per record
(running read/ref offsets per op — no UDF, no per-record Python), base
events explode from M/=/X segments (ref-consuming substitutions slice
the read), deletion events from D segments; the only shuffle is the
final (rname, refpos) hash aggregation, which takes map-side partial
combine. At 100 TB the explode is inherently read-length × records —
exactly pileup's output cardinality — and partial aggs keep the
shuffle at covered-genome-positions size, not base-events size.
Region-limit first (scan pushdown) for targeted pileups.

Conventions (documented, deterministic):
- M, =, X consume read+ref and contribute base counts (bases upcased;
  anything outside ACGT counts as N);
- D consumes ref and counts in ``n_del`` (and in ``depth``, matching
  samtools' DP which spans deletions);
- N (ref skip) consumes ref but contributes NOTHING (intron skip, not
  a deletion); I/S consume read only; H/P consume nothing;
- records with null cigar or null seq (unmapped / seq-less) are
  skipped, like samtools does with '*' sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_READ_OPS = "'M','I','S','=','X'"
_REF_OPS = "'M','D','N','=','X'"


_SEG_CHUNK = 64


def _cigar_segments() -> Column:
    """cigar → array<struct<op, len, q, r>> with per-op running read (q)
    and ref (r) offsets, via a TWO-LEVEL aggregate fold.

    A single fold that concats one seg per step re-copies the
    accumulated array every op — O(ops²) element copies per record,
    which is invisible at short-read op counts but measured 5× slower
    end-to-end on 5 000-op long-read CIGARs (round 11). Folding over
    ``_SEG_CHUNK``-op slices instead bounds the inner fold at O(C²)
    per chunk and the outer concat at O((ops/C)²) chunk pointers —
    O(ops·C) total, still one expression, zero shuffle, and the chunk
    slices are cut from an array VIEW (array columns, unlike binary,
    are zero-copy to reference)."""
    C = _SEG_CHUNK
    seg_t = "ARRAY<STRUCT<op: STRING, len: INT, q: INT, r: INT>>"
    return F.expr(
        f"""flatten(aggregate(
  transform(sequence(0, CAST(ceil(size(_oz) / {C}) AS INT) - 1),
            k -> slice(_oz, k * {C} + 1, {C})),
  struct(CAST(array() AS ARRAY<{seg_t}>) AS segs, 0 AS q, 0 AS r),
  (acc, ch) -> struct(
     concat(acc.segs, array(aggregate(ch,
        struct(CAST(array() AS {seg_t}) AS s, acc.q AS q, acc.r AS r),
        (a, x) -> struct(
           concat(a.s, array(struct(x.`1` AS op, x.`0` AS len,
                                    a.q AS q, a.r AS r))),
           a.q + CASE WHEN x.`1` IN ({_READ_OPS}) THEN x.`0` ELSE 0 END,
           a.r + CASE WHEN x.`1` IN ({_REF_OPS}) THEN x.`0` ELSE 0 END),
        a -> a.s))),
     acc.q + aggregate(ch, 0, (a, x) ->
        a + CASE WHEN x.`1` IN ({_READ_OPS}) THEN x.`0` ELSE 0 END),
     acc.r + aggregate(ch, 0, (a, x) ->
        a + CASE WHEN x.`1` IN ({_REF_OPS}) THEN x.`0` ELSE 0 END)),
  acc -> acc.segs))"""
    )


def pileup(df: DataFrame, on: str = "rname", pos_col: str = "pos",
           cigar_col: str = "cigar", seq_col: str = "seq",
           qual_col: str | None = None, flag_col: str | None = None,
           min_bq: int = 0, insertions: bool = False) -> DataFrame:
    """(rname, refpos, n_a, n_c, n_g, n_t, n_n, n_del, depth
    [, mean_bq] [, depth_fwd, depth_rev] [, n_ins]): per-base pileup
    over 1-based inclusive reference positions.

    - ``qual_col`` (phred+33 string, SAM layout) adds the mean base
      quality of the read bases covering each position (deletions
      excluded; records with null qual contribute bases but no quality
      — samtools' treatment of '*' quals).
    - ``min_bq`` (samtools ``-Q``, default 13 there, 0 here) drops base
      events below the phred threshold from counts AND depth; deletions
      carry no base quality and always pass, as do bases from null-qual
      records (the gate can't evaluate them). Requires ``qual_col``.
    - ``flag_col`` adds ``depth_fwd``/``depth_rev`` — depth split by the
      SAM 0x10 reverse-strand bit (samtools' case-coded strand column,
      as counts).
    - ``insertions=True`` adds ``n_ins``: the number of insertion (I)
      ops anchored at each position — samtools anchors an insertion to
      the PRECEDING reference base, so a leading insertion (no
      ref-consuming op before it) has no anchor and is skipped.
      Insertion events never count toward depth (the read's anchor base
      already does).
    """
    if min_bq > 0 and qual_col is None:
        raise ValueError("min_bq requires qual_col")
    with_q = qual_col is not None
    cols = [
        F.col(on).alias("rname"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(cigar_col).alias("cigar"),
        F.upper(F.col(seq_col)).alias("seq"),
        (((F.col(flag_col).bitwiseAND(16)) != 0) if flag_col is not None
         else F.lit(False)).alias("_rev"),
    ]
    if with_q:
        cols.append(F.col(qual_col).alias("_qual"))
    base = df.where(
        F.col(cigar_col).isNotNull() & F.col(seq_col).isNotNull()
    ).select(*cols)
    # the parsed (len, op) zip is staged as its own column: the chunked
    # fold slices it per chunk (array columns are zero-copy views), and
    # a real column stops CollapseProject re-inlining the regex parse
    # into every chunk slice
    seg = base.withColumn("_oz", F.expr(
        r"""arrays_zip(
  transform(regexp_extract_all(cigar, '(\\d+)[MIDNSHP=X]', 1),
            x -> CAST(x AS INT)),
  regexp_extract_all(cigar, '\\d+([MIDNSHP=X])', 1))"""
    )).withColumn("_segs", _cigar_segments())
    # read/qual slicing discipline (round 11, the translate_dna /
    # gc_windows lesson): per-base substr on a STRING column is
    # O(position) — Spark's UTF8String has no random access — so a
    # length-L read pays O(L²) char steps (ruinous for long reads);
    # and a BINARY *column* referenced inside an interpreted lambda
    # pays a full UnsafeRow.getBinary copy per element. Hence the
    # LET-BINDING: both binaries are evaluated once per record into a
    # one-element-array struct bound to lambda variable `w`
    # (GenericInternalRow — field reads return the stored byte[]
    # reference, no copy), and every per-base slice is byte-addressed
    # O(1). SAM seq/qual are ASCII, so bytes == chars.
    q_expr = ("CASE WHEN w.qb IS NOT NULL "
              "THEN ascii(CAST(substr(w.qb, s.q + i, 1) AS STRING)) - 33 "
              "ELSE CAST(NULL AS INT) END" if with_q
              else "CAST(NULL AS INT)")
    qb_field = ("CAST(_qual AS BINARY)" if with_q
                else "CAST(NULL AS BINARY)")
    ins_branch = ("""
  WHEN s.op = 'I' AND s.r > 0 THEN
    array(struct(pos + s.r - 1 AS refpos, '+' AS base,
                 CAST(NULL AS INT) AS bq))""" if insertions else "")
    events = seg.select(
        "rname", "_rev",
        F.explode(F.expr(
            f"""element_at(transform(
  array(struct(CAST(seq AS BINARY) AS sb, {qb_field} AS qb)), w ->
  flatten(transform(_segs, s ->
  CASE WHEN s.op IN ('M','=','X') THEN
    transform(sequence(1, s.len),
              i -> struct(pos + s.r + i - 1 AS refpos,
                          CAST(substr(w.sb, s.q + i, 1) AS STRING) AS base,
                          {q_expr} AS bq)){ins_branch}
  WHEN s.op = 'D' THEN
    transform(sequence(1, s.len),
              i -> struct(pos + s.r + i - 1 AS refpos,
                          '*' AS base, CAST(NULL AS INT) AS bq))
  ELSE CAST(array() AS ARRAY<STRUCT<refpos: BIGINT, base: STRING, bq: INT>>)
  END))), 1)""")).alias("e"),
    ).select("rname", F.col("e.refpos").alias("refpos"),
             F.col("e.base").alias("base"), F.col("e.bq").alias("bq"),
             "_rev")
    if min_bq > 0:
        events = events.where(
            F.col("base").isin("*", "+") | F.col("bq").isNull()
            | (F.col("bq") >= min_bq))

    def cnt(cond: Column, name: str) -> Column:
        return F.sum(cond.cast("long")).alias(name)

    b = F.col("base")
    in_depth = b != "+"
    aggs = [
        cnt(b == "A", "n_a"),
        cnt(b == "C", "n_c"),
        cnt(b == "G", "n_g"),
        cnt(b == "T", "n_t"),
        cnt(~b.isin("A", "C", "G", "T", "*", "+"), "n_n"),
        cnt(b == "*", "n_del"),
        (cnt(in_depth, "depth") if insertions
         else F.count(F.lit(1)).alias("depth")),
    ]
    if with_q:
        aggs.append(F.round(F.avg("bq"), 6).alias("mean_bq"))
    if flag_col is not None:
        aggs.append(cnt(in_depth & ~F.col("_rev"), "depth_fwd"))
        aggs.append(cnt(in_depth & F.col("_rev"), "depth_rev"))
    if insertions:
        aggs.append(cnt(b == "+", "n_ins"))
    return events.groupBy("rname", "refpos").agg(*aggs)


def consensus(pile: DataFrame, min_depth: int = 1,
              min_frac: float = 0.0) -> DataFrame:
    """(rname, refpos, consensus, support, depth, frac): majority base
    per covered position from a `pileup` frame. Ties break A<C<G<T<N
    (deterministic); positions below ``min_depth`` or whose winner falls
    under ``min_frac`` of depth emit 'N'. Pure Project — no shuffle
    beyond the pileup's own aggregation."""
    counts = [("A", "n_a"), ("C", "n_c"), ("G", "n_g"), ("T", "n_t"),
              ("N", "n_n")]
    best = F.greatest(*[F.col(c) for _b, c in counts])
    winner = F.coalesce(
        *[F.when(F.col(c) == best, F.lit(b)) for b, c in counts])
    frac = best.cast("double") / F.greatest(F.col("depth"), F.lit(1))
    ok = (F.col("depth") >= min_depth) & (frac >= min_frac) & (best > 0)
    return pile.select(
        "rname", "refpos",
        F.when(ok, winner).otherwise(F.lit("N")).alias("consensus"),
        best.alias("support"),
        "depth",
        F.round(frac, 6).alias("frac"),
    )


def naive_snv(pile: DataFrame, ref: DataFrame, min_depth: int = 4,
              min_alt_frac: float = 0.2) -> DataFrame:
    """(rname, refpos, ref_base, alt, alt_count, depth, alt_frac):
    naive SNV candidates — positions where a non-reference base clears
    ``min_alt_frac`` of depth at ``min_depth`` coverage. ``ref`` is a
    (rname, refpos, ref_base) frame (e.g. exploded from the FASTA
    scan); the join is a plain equi-join on (rname, refpos) — broadcast
    when the targeted region is small, shuffle otherwise. Ties break
    A<C<G<T. The classic GATK-free smoke-test caller, not a genotyper."""
    counts = [("A", "n_a"), ("C", "n_c"), ("G", "n_g"), ("T", "n_t")]
    j = pile.join(ref, ["rname", "refpos"])
    rb = F.upper(F.col("ref_base"))
    alt_best = F.greatest(*[
        F.when(F.lit(b) == rb, F.lit(0)).otherwise(F.col(c))
        for b, c in counts])
    alt = F.coalesce(*[
        F.when((F.lit(b) != rb) & (F.col(c) == alt_best), F.lit(b))
        for b, c in counts])
    frac = alt_best.cast("double") / F.greatest(F.col("depth"), F.lit(1))
    return (
        j.where((F.col("depth") >= min_depth) & (alt_best > 0)
                & (frac >= min_alt_frac))
        .select("rname", "refpos", rb.alias("ref_base"),
                alt.alias("alt"), alt_best.alias("alt_count"),
                "depth", F.round(frac, 6).alias("alt_frac"))
    )


def ref_bases_frame(fasta: DataFrame, name_col: str = "name",
                    seq_col: str = "sequence") -> DataFrame:
    """FASTA scan frame → (rname, refpos, ref_base) with 1-based
    positions — the reference side of `naive_snv`. Explode-then-slice
    (the gc_windows plain shape): positions explode via `sequence` and
    each base is a byte-addressed BINARY substr cut in the SAME
    whole-stage-codegen stage, where the contig binary is a JVM local
    — unlike `posexplode(split(seq, ''))`, which materializes a
    contig-length array of one-char strings (gigabytes for a
    chromosome row) before exploding. Narrow, no shuffle."""
    binf = fasta.select(
        F.col(name_col).alias("rname"),
        F.upper(F.col(seq_col)).cast("binary").alias("_b"))
    ex = binf.where(F.length("_b") > 0).select(
        "rname", "_b",
        F.explode(F.sequence(
            F.lit(1).cast("long"),
            F.length("_b").cast("long"))).alias("refpos"))
    return ex.select(
        "rname", "refpos",
        F.col("_b").substr(F.col("refpos").cast("int"), F.lit(1))
        .cast("string").alias("ref_base"))
