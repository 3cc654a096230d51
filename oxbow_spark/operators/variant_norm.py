"""Variant normalization (the `bcftools norm` core): parsimony +
left-alignment of indels against the reference.

Algorithm (Tan, Abecasis & Kang 2015, "Unified representation of
genetic variants", the vt/bcftools reference):
  1. while REF and every ALT end in the same base and all have len > 1:
     truncate the last base;
     — if any allele becomes empty, extend all alleles LEFT with the
       previous reference base (pos -= 1);
  2. while REF and every ALT share their first base and all have
     len > 1: drop the first base (pos += 1).
Step 1's extension is what slides indels left through repeat tracts.

Spark shape: the per-variant while loop is irreducibly per-record (like
CRAM feature reconstruction), so it runs as an Arrow-batched
`mapInPandas` — narrow, no shuffle, batch-bounded. The reference lands
on executors as a broadcast {chrom: sequence} dict; whole-genome scale
swaps that for per-partition faidx fetches through
`sources/sequence.py` (`read_fai`/`faidx_fetch`) without changing the
loop or the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql.types import StructField, StructType


def normalize_one(pos: int, ref: str, alts: list[str],
                  contig: str) -> tuple[int, str, list[str], bool]:
    """Normalize one variant. ``pos`` is 0-based; ``contig`` is the
    full reference sequence of the chromosome. Returns
    (new_pos, new_ref, new_alts, changed)."""
    alleles = [ref] + list(alts)
    if any(not a or "." in a or "<" in a or "*" in a for a in alleles):
        return pos, ref, list(alts), False  # symbolic/spanning: untouched
    if len(set(alleles)) == 1:
        return pos, ref, list(alts), False  # degenerate REF==ALT
    orig = (pos, tuple(alleles))
    # rule 1 (vt): while every allele ends in the same base, truncate it;
    # if that empties an allele, extend all alleles LEFT with the
    # previous reference base — this is the walk through repeat tracts
    while len({a[-1] for a in alleles}) == 1:
        last = alleles[0][-1]
        alleles = [a[:-1] for a in alleles]
        if any(len(a) == 0 for a in alleles):
            if pos == 0:  # at contig start: undo the truncation, stop
                alleles = [a + last for a in alleles]
                break
            prev = contig[pos - 1]
            alleles = [prev + a for a in alleles]
            pos -= 1
    # rule 2: while every allele is >1 long and shares its first base,
    # drop it
    while all(len(a) > 1 for a in alleles) and \
            len({a[0] for a in alleles}) == 1:
        alleles = [a[1:] for a in alleles]
        pos += 1
    changed = (pos, tuple(alleles)) != orig
    return pos, alleles[0], alleles[1:], changed


def normalize_variants(
    df: DataFrame, reference: dict[str, str], chrom_col: str = "chrom",
    pos_col: str = "pos", ref_col: str = "ref", alt_col: str = "alt",
    pos_base: int = 1,
) -> DataFrame:
    """Input columns with ``pos``/``ref``/``alt`` rewritten to the
    normalized representation, plus a ``normalized`` flag. ``alt`` may
    be a comma-joined string (VCF style) or an array column.
    ``pos_base=1`` matches VCF POS; pass 0 for half-open frames.
    ``reference`` maps chrom → full sequence (broadcast to executors)."""
    schema_fields = []
    for f_ in df.schema.fields:
        schema_fields.append(StructField(f_.name, f_.dataType, True))
    from pyspark.sql.types import BooleanType

    schema = StructType(schema_fields + [StructField("normalized",
                                                     BooleanType())])
    alt_is_array = dict(df.dtypes)[alt_col].startswith("array")
    bc = df.sparkSession.sparkContext.broadcast(reference)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        refs = bc.value
        for pdf in batches:
            out = pdf.copy()
            flags = []
            for i in range(len(pdf)):
                chrom = pdf[chrom_col].iloc[i]
                pos = int(pdf[pos_col].iloc[i]) - pos_base
                ref = pdf[ref_col].iloc[i]
                rawalt = pdf[alt_col].iloc[i]
                alts = list(rawalt) if alt_is_array else \
                    str(rawalt).split(",")
                contig = refs.get(chrom)
                if contig is None or ref is None:
                    flags.append(False)
                    continue
                np_, nref, nalts, changed = normalize_one(
                    pos, ref, alts, contig)
                flags.append(changed)
                if changed:
                    out.iat[i, out.columns.get_loc(pos_col)] = np_ + pos_base
                    out.iat[i, out.columns.get_loc(ref_col)] = nref
                    out.iat[i, out.columns.get_loc(alt_col)] = (
                        nalts if alt_is_array else ",".join(nalts))
            out["normalized"] = flags
            yield out

    return df.mapInPandas(fn, schema)
