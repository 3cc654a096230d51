"""VCF header model: header-derived nested schemas for INFO and
FORMAT/genotype columns.

Parity targets (`oxbow/src/variant/model.rs:38-47,119-271`,
`variant/model/info.rs:64-177`, `variant/model/genotype.rs:28-118`,
field semantics `variant/model/field.rs:180-259`):

- Standard fields: chrom string, pos int(±coords offset), id array<string>
  ('.' → empty list), ref string, alt array<string>, qual float ('.' →
  null), filter array<string> (PASS → empty list, '.' → null, else names).
- INFO: struct column; Number=0/Flag → boolean, Number=1 → scalar,
  Number>1 / A / R / G / '.' → array; base types Integer→int, Float→float,
  String/Character→string.
- FORMAT: per-sample struct columns (``genotype_by='sample'``, default) or
  per-field structs keyed by sample (``genotype_by='field'``), optionally
  nested under a single ``samples`` struct (``samples_nested``). ``GT``
  gets struct<allele: array<int>, phased: array<boolean>>; phased[i] is
  True when the separator preceding allele i is '|' (leading '|' phases
  allele 0).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_BASE_TYPES: dict[str, T.DataType] = {
    "Integer": T.IntegerType(),
    "Float": T.FloatType(),
    "String": T.StringType(),
    "Character": T.StringType(),
}

GT_TYPE = T.StructType([
    T.StructField("allele", T.ArrayType(T.IntegerType()), True),
    T.StructField("phased", T.ArrayType(T.BooleanType()), True),
])

STANDARD_FIELDS: list[tuple[str, T.DataType]] = [
    ("chrom", T.StringType()),
    ("pos", T.IntegerType()),
    ("id", T.ArrayType(T.StringType())),
    ("ref", T.StringType()),
    ("alt", T.ArrayType(T.StringType())),
    ("qual", T.FloatType()),
    ("filter", T.ArrayType(T.StringType())),
]
STANDARD_FIELD_NAMES = [n for n, _ in STANDARD_FIELDS]

_META_RE = re.compile(r"^##(?P<kind>INFO|FORMAT|FILTER|contig)=<(?P<body>.*)>\s*$")


def _parse_meta_body(body: str) -> dict[str, str]:
    """Parse `ID=DP,Number=1,Type=Integer,Description="..."` respecting
    quoted commas."""
    out: dict[str, str] = {}
    key, buf, in_quotes, cur = None, [], False, []
    # simple state machine over chars
    s = body
    i = 0
    while i < len(s):
        c = s[i]
        if key is None:
            if c == "=":
                key = "".join(cur)
                cur = []
            else:
                cur.append(c)
        else:
            if c == '"':
                in_quotes = not in_quotes
            elif c == "," and not in_quotes:
                out[key] = "".join(cur)
                key, cur = None, []
            else:
                cur.append(c)
        i += 1
    if key is not None:
        out[key] = "".join(cur)
    return out


@dataclass(frozen=True)
class VcfFieldDef:
    """One INFO or FORMAT definition (name, Number, Type)."""

    name: str
    number: str  # '0','1','2',... or 'A','R','G','.','LA',...
    vtype: str   # Integer/Float/String/Character/Flag

    @property
    def is_flag(self) -> bool:
        return self.vtype == "Flag" or self.number == "0"

    @property
    def is_scalar(self) -> bool:
        return self.number == "1"

    @property
    def fixed_count(self) -> int | None:
        """n for Number=n>1 (FixedSizeList in the reference → array here)."""
        return int(self.number) if self.number.isdigit() and int(self.number) > 1 else None

    def spark_type(self, gt_special: bool = False) -> T.DataType:
        if gt_special and self.name == "GT":
            return GT_TYPE
        if self.is_flag:
            return T.BooleanType()
        base = _BASE_TYPES.get(self.vtype, T.StringType())
        if self.is_scalar:
            return base
        return T.ArrayType(base)

    def _scalar(self, v: str):
        if v == "." or v == "":
            return None
        try:
            if self.vtype == "Integer":
                return int(v)
            if self.vtype == "Float":
                return float(v)
        except ValueError:
            return None
        return v

    def parse(self, raw: str | None):
        """Parse a text value ('.'-aware); raw=None means key present with
        no '=' (Flag) or missing sample field."""
        if self.is_flag:
            return True
        if raw is None or raw == ".":
            return None
        if self.is_scalar:
            return self._scalar(raw)
        return [self._scalar(v) for v in raw.split(",")]


def parse_gt(raw: str | None):
    """'0|1' → {allele: [0,1], phased: [False,True]}; '.'/None → None;
    missing alleles ('./.') become null elements."""
    if raw is None or raw == "" or raw == ".":
        return None
    alleles: list[int | None] = []
    phased: list[bool] = []
    cur = []
    cur_phased = raw.startswith("|")
    s = raw[1:] if raw[0] in "|/" else raw
    for c in s:
        if c in "|/":
            alleles.append(int("".join(cur)) if cur and cur != ["."] else None)
            phased.append(cur_phased)
            cur = []
            cur_phased = c == "|"
        else:
            cur.append(c)
    alleles.append(int("".join(cur)) if cur and cur != ["."] else None)
    phased.append(cur_phased)
    return {"allele": alleles, "phased": phased}


@dataclass
class VcfHeader:
    """Parsed ## header + #CHROM line."""

    infos: list[VcfFieldDef] = field(default_factory=list)
    formats: list[VcfFieldDef] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)
    contigs: list[str] = field(default_factory=list)
    contig_sizes: dict[str, int] = field(default_factory=dict)
    samples: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, header_lines: list[str]) -> "VcfHeader":
        h = cls()
        for line in header_lines:
            line = line.rstrip("\n")
            m = _META_RE.match(line)
            if m:
                meta = _parse_meta_body(m.group("body"))
                kind = m.group("kind")
                if kind == "INFO":
                    h.infos.append(VcfFieldDef(meta["ID"], meta.get("Number", "."), meta.get("Type", "String")))
                elif kind == "FORMAT":
                    h.formats.append(VcfFieldDef(meta["ID"], meta.get("Number", "."), meta.get("Type", "String")))
                elif kind == "FILTER":
                    h.filters.append(meta["ID"])
                elif kind == "contig":
                    h.contigs.append(meta["ID"])
                    if "length" in meta:
                        h.contig_sizes[meta["ID"]] = int(meta["length"])
            elif line.startswith("#CHROM"):
                cols = line.split("\t")
                if len(cols) > 9:
                    h.samples = cols[9:]
        return h

    def info_struct(self, names: list[str] | None = None) -> T.StructType:
        defs = self.infos if names is None else [d for d in self.infos if d.name in set(names)]
        return T.StructType([T.StructField(d.name, d.spark_type(), True) for d in defs])

    def genotype_struct(self, names: list[str] | None = None) -> T.StructType:
        """struct of FORMAT fields for one sample (genotype_by='sample')."""
        defs = self.formats if names is None else [d for d in self.formats if d.name in set(names)]
        return T.StructType(
            [T.StructField(d.name, d.spark_type(gt_special=True), True) for d in defs]
        )

    def field_struct(self, def_: VcfFieldDef) -> T.StructType:
        """struct keyed by sample for one FORMAT field (genotype_by='field')."""
        return T.StructType(
            [T.StructField(s, def_.spark_type(gt_special=True), True) for s in self.samples]
        )

    # ------------------------------------------------------------- values

    def parse_info(self, raw: str, names: list[str] | None = None) -> dict:
        defs = self.infos if names is None else [d for d in self.infos if d.name in set(names)]
        present: dict[str, str | None] = {}
        if raw and raw != ".":
            for part in raw.split(";"):
                k, eq, v = part.partition("=")
                present[k] = v if eq else None
        return {d.name: (d.parse(present[d.name]) if d.name in present else None) for d in defs}

    def parse_sample(
        self, format_keys: list[str], raw: str, names: list[str] | None = None
    ) -> dict:
        defs = self.formats if names is None else [d for d in self.formats if d.name in set(names)]
        vals = raw.split(":") if raw else []
        present = dict(zip(format_keys, vals))
        out = {}
        for d in defs:
            rv = present.get(d.name)
            if d.name == "GT":
                out[d.name] = parse_gt(rv)
            else:
                out[d.name] = d.parse(rv) if rv is not None else None
        return out


def parse_filter(raw: str) -> list[str] | None:
    """PASS → [], '.' → None, else the failed filter names."""
    if raw == "PASS":
        return []
    if raw == "." or raw == "":
        return None
    return raw.split(";")


def parse_id(raw: str) -> list[str]:
    """'.' → empty list (valid), else ';'-separated ids."""
    if raw == "." or raw == "":
        return []
    return raw.split(";")


def parse_alt(raw: str) -> list[str]:
    if raw == "." or raw == "":
        return []
    return raw.split(",")
