"""Genomic scalar functions as pure Catalyst expressions.

These are the value-level transforms the reference performs inside its
batch builders (SURVEY §2.9 X1–X12) — re-expressed as JVM-side column
expressions (higher-order array functions, bitwise ops, regex) so they
run inside whole-stage codegen with NO Python in the hot path. Our
DataSources embed the same logic at parse time; this module makes each
transform reusable post-load (e.g. recomputing ends after liftover, or
deriving strand from flags in a pipeline that read a plain parquet
export).

Reference parity notes (file:line cites relative to /root/reference):
- CIGAR string grammar and op classes: oxbow/src/alignment/model/field.rs:448-478
- alignment end = pos + reference-consumed length − 1:
  oxbow/src/alignment/model/field.rs:280-286 (noodles alignment_end)
- Phred+33 quality strings: oxbow/src/alignment/model/field.rs:420-445
- flag bitfield use: docs/user-guide/examples/sam_mark_duplicates.md:33-35
- GT → {allele, phased} struct: oxbow/src/variant/model/genotype.rs:34-41
- itemRgb "255,0,0" → [255,0,0]: oxbow/src/bed/model/field_def.rs:629+
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oxbow_spark.coords import Region, convert_start_col

_CIGAR_RE = r"(\d+)[MIDNSHP=X]"
# ops that consume reference / query bases (SAM spec §1.4.6)
_REF_OPS = ("M", "D", "N", "=", "X")
_QUERY_OPS = ("M", "I", "S", "=", "X")


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cigar_ops(cigar) -> Column:
    """CIGAR string → array<struct<n:int, op:string>> ("10M1I" →
    [{10,M},{1,I}]). Inverse of the reference's op-list→string rendering
    (X1)."""
    c = _c(cigar)
    matches = F.regexp_extract_all(c, F.lit(r"(\d+[MIDNSHP=X])"), 1)
    return F.transform(
        matches,
        lambda m: F.struct(
            F.substring(m, 1, F.length(m) - 1).cast("int").alias("n"),
            F.substring(m, -1, 1).alias("op"),
        ),
    )


def _op_len_sum(cigar, ops: tuple[str, ...]) -> Column:
    return F.aggregate(
        cigar_ops(cigar),
        F.lit(0),
        lambda acc, x: acc + F.when(x["op"].isin(*ops), x["n"]).otherwise(0),
    )


def cigar_reflen(cigar) -> Column:
    """Reference-consumed length of a CIGAR (M/D/N/=/X)."""
    return _op_len_sum(cigar, _REF_OPS)


def cigar_qlen(cigar) -> Column:
    """Query-consumed length of a CIGAR (M/I/S/=/X) — equals len(seq)."""
    return _op_len_sum(cigar, _QUERY_OPS)


def alignment_end(pos, cigar) -> Column:
    """1-based inclusive alignment end: pos + reflen − 1 (X3). Null when
    pos or cigar is null; unmapped reads keep a null end."""
    p, c = _c(pos), _c(cigar)
    return F.when(
        p.isNotNull() & c.isNotNull(), p + cigar_reflen(c) - F.lit(1)
    )


# SAM flag bits (spec §1.4.2)
FLAGS: dict[str, int] = {
    "paired": 0x1, "proper_pair": 0x2, "unmapped": 0x4, "mate_unmapped": 0x8,
    "reverse": 0x10, "mate_reverse": 0x20, "read1": 0x40, "read2": 0x80,
    "secondary": 0x100, "qc_fail": 0x200, "duplicate": 0x400,
    "supplementary": 0x800,
}


def flag_is(flag, name: str) -> Column:
    """Boolean test of one SAM flag bit by name (X4), e.g.
    ``flag_is("flag", "duplicate")``."""
    return _c(flag).bitwiseAND(F.lit(FLAGS[name])) != 0


def strand_from_flag(flag) -> Column:
    """'-' when the reverse-strand bit (0x10) is set, else '+'."""
    return F.when(flag_is(flag, "reverse"), F.lit("-")).otherwise(F.lit("+"))


def phred_to_scores(qual) -> Column:
    """Phred+33 quality string → array<int> of scores (inverse of X2)."""
    q = _c(qual)
    chars = F.split(q, "")
    # split('') leaves no trailing empty element in Spark; filter defensively
    return F.transform(
        F.filter(chars, lambda ch: F.length(ch) > 0),
        lambda ch: F.ascii(ch) - F.lit(33),
    )


def scores_to_phred(scores) -> Column:
    """array<int> scores → Phred+33 string (X2)."""
    return F.array_join(
        F.transform(_c(scores), lambda s: F.char(s + F.lit(33))), ""
    )


def parse_gt(gt) -> Column:
    """VCF GT string → struct{allele: array<int>, phased: array<boolean>}
    (X5, mirroring the reference's GT struct
    `variant/model/genotype.rs:34-41`): '.' alleles → null ints;
    phased[i] is true when the separator *preceding* allele i is '|'
    (an explicit leading '|' phases allele 0; otherwise allele 0 is
    reported phased only when every separator in the call is '|')."""
    g = _c(gt)
    lead = g.startswith("|")
    trimmed = F.when(lead, g.substr(F.lit(2), F.length(g))).otherwise(g)
    parts = F.split(trimmed, r"[/|]")
    seps = F.regexp_extract_all(trimmed, F.lit(r"([/|])"), 1)
    allele = F.transform(
        parts, lambda a: F.when(a != ".", a.cast("int"))
    )
    all_pipes = F.forall(seps, lambda s: s == "|") & (F.size(seps) > 0)
    phased0 = F.when(lead, F.lit(True)).otherwise(all_pipes)
    phased_rest = F.transform(seps, lambda s: s == "|")
    return F.struct(
        allele.alias("allele"),
        F.concat(F.array(phased0), phased_rest).alias("phased"),
    )


def item_rgb(col) -> Column:
    """BED itemRgb "255,0,0" → array<smallint> [255,0,0] (X7; u8 domain
    needs smallint). '0' and '.' → null (BED spec 'no color')."""
    c = _c(col)
    return F.when(
        c.isNotNull() & (c != "0") & (c != "."),
        F.split(c, ",").cast("array<smallint>"),
    )


def filter_region(
    df: DataFrame, region: str, source_coords: str = "01",
    chrom_col: str = "chrom", start_col: str = "start", end_col: str = "end",
) -> DataFrame:
    """Genomic range predicate (F1) on a loaded DataFrame: parses the
    UCSC/bracket region grammar (X11) and applies the interval-overlap
    conjuncts, which push down to parquet scans. Columns are assumed to
    be in ``source_coords`` rendering; the region string is interpreted
    under the same system (the reference's ambiguity rule). End columns
    never shift between systems (a 1-based inclusive end equals the
    0-based exclusive end numerically), so only the start converts."""
    r = Region.parse(region, source_coords)
    if r.is_unmapped:
        return df.where(F.col(chrom_col).isNull())
    start0 = convert_start_col(start_col, source_coords, "01")
    pred = F.col(chrom_col) == r.name
    if r.end is not None:
        pred = pred & (start0 < F.lit(r.end))
    pred = pred & (F.col(end_col) > F.lit(r.start))
    return df.where(pred)
