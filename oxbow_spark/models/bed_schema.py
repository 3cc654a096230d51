"""BED schema grammar: ``bed``, ``bed{n}``, ``bed{n}+{m}``, ``bed{n}+``,
``bedgraph``.

Behavioral parity with the reference (`oxbow/src/bed/model/schema.rs`):
- ``n`` standard fields, 3 ≤ n ≤ 12 (bare ``bed`` means 6);
- ``+{m}``: m custom String fields named ``BED{n}+{i}``;
- ``+`` (m unspecified): the line remainder lands in one ``rest`` column;
- ``bedgraph`` ≡ bed3 + a float ``value`` column.

Spark types follow SURVEY §1.3 (`oxbow/src/bed/model/field.rs:16-87`):
start/end/thickStart/thickEnd/blockCount Int64, score UInt16→int, strand
dict→string, itemRgb FixedSizeList<UInt8,3>→array<smallint>,
blockSizes/blockStarts List<Int64>→array<bigint>, bedGraph value Float64.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

STANDARD_FIELD_NAMES = [
    "chrom", "start", "end", "name", "score", "strand",
    "thickStart", "thickEnd", "itemRgb", "blockCount",
    "blockSizes", "blockStarts",
]

_STANDARD_TYPES: dict[str, T.DataType] = {
    "chrom": T.StringType(),
    "start": T.LongType(),
    "end": T.LongType(),
    "name": T.StringType(),
    "score": T.IntegerType(),
    "strand": T.StringType(),
    "thickStart": T.LongType(),
    "thickEnd": T.LongType(),
    "itemRgb": T.ArrayType(T.ShortType()),
    "blockCount": T.LongType(),
    "blockSizes": T.ArrayType(T.LongType()),
    "blockStarts": T.ArrayType(T.LongType()),
}

_GRAMMAR = re.compile(r"^bed(?:(?P<n>\d+))?(?:(?P<plus>\+)(?P<m>\d+)?)?$")


def _parse_int(v: str):
    return None if v in (".", "") else int(v)


def _parse_rgb(v: str):
    if v in (".", ""):
        return None
    if v == "0":
        return [0, 0, 0]
    return [int(x) for x in v.split(",")]


def _parse_int_list(v: str):
    if v in (".", ""):
        return None
    return [int(x) for x in v.rstrip(",").split(",")]


def _parse_str(v: str):
    return None if v == "" else v


def _parse_float(v: str):
    return None if v in (".", "") else float(v)


_PARSERS = {
    "chrom": _parse_str,
    "start": _parse_int,
    "end": _parse_int,
    "name": _parse_str,
    "score": _parse_int,
    "strand": _parse_str,
    "thickStart": _parse_int,
    "thickEnd": _parse_int,
    "itemRgb": _parse_rgb,
    "blockCount": _parse_int,
    "blockSizes": _parse_int_list,
    "blockStarts": _parse_int_list,
}


@dataclass(frozen=True)
class BedSchema:
    """Parsed BED schema: n standard fields + custom tail."""

    n: int
    m: int | None  # None → single 'rest' column with the line remainder
    custom_names: tuple[str, ...]
    custom_types: tuple[T.DataType, ...]

    @classmethod
    def parse(cls, s: str) -> "BedSchema":
        s = s.strip().lower()
        if s == "bedgraph":
            return cls(3, 1, ("value",), (T.DoubleType(),))
        mt = _GRAMMAR.match(s)
        if not mt:
            raise ValueError(f"invalid BED schema {s!r}")
        n = int(mt.group("n")) if mt.group("n") else 6
        if not 3 <= n <= 12:
            raise ValueError(f"invalid BED schema: n must be in 3..12, got {n}")
        if not mt.group("plus"):
            return cls(n, 0, (), ())
        if mt.group("m") is None:
            return cls(n, None, ("rest",), (T.StringType(),))
        m = int(mt.group("m"))
        names = tuple(f"BED{n}+{i}" for i in range(1, m + 1))
        return cls(n, m, names, tuple(T.StringType() for _ in range(m)))

    @property
    def field_names(self) -> list[str]:
        return STANDARD_FIELD_NAMES[: self.n] + list(self.custom_names)

    def to_struct(self) -> T.StructType:
        fields = [
            T.StructField(nm, _STANDARD_TYPES[nm], nm != "chrom")
            for nm in STANDARD_FIELD_NAMES[: self.n]
        ]
        fields += [
            T.StructField(nm, tp, True)
            for nm, tp in zip(self.custom_names, self.custom_types)
        ]
        return T.StructType(fields)

    def parse_line(self, line: str) -> list:
        """Parse one data line into python values matching to_struct()."""
        std_names = STANDARD_FIELD_NAMES[: self.n]
        if self.m is None:
            parts = line.split("\t", self.n)
            vals = [_PARSERS[nm](parts[i]) for i, nm in enumerate(std_names)]
            vals.append(parts[self.n] if len(parts) > self.n else None)
            return vals
        parts = line.split("\t")
        expected = self.n + self.m
        if len(parts) < expected:
            raise ValueError(
                f"BED line has {len(parts)} fields, schema expects {expected}: {line[:80]!r}"
            )
        vals = [_PARSERS[nm](parts[i]) for i, nm in enumerate(std_names)]
        for j, tp in enumerate(self.custom_types):
            raw = parts[self.n + j]
            if isinstance(tp, T.DoubleType):
                vals.append(_parse_float(raw))
            else:
                vals.append(_parse_str(raw))
        return vals
