"""AutoSql declaration parsing: the schema language embedded in BigBed
files (and used by UCSC track formats like narrowPeak/broadPeak).

Behavioral parity with the reference's AutoSql field typing
(`py-oxbow/src/bbi.rs:258-279`, `oxbow/src/bed/model/field_def.rs:65-112`):
each declared field maps to a typed Spark column; the BigBed source uses
the embedded declaration to type the custom (post-bed3) columns instead
of emitting one opaque ``rest`` string.

Type mapping:
- ``string``/``lstring``/``char``/``char[n]``/``enum(...)`` → string
- ``byte``/``ubyte``/``short``/``ushort``/``int`` → int
- ``uint``/``bigint`` → bigint (uint32 max exceeds int32)
- ``float`` → float, ``double`` → double
- ``T[n]`` / ``set(...)`` → array of the element type

Values parse from the tab-separated BigBed rest payload; ``.`` and empty
map to null for numeric fields (UCSC convention), strings stay verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T


def _p_str(v: str):
    return v if v != "" else None


def _p_int(v: str):
    return None if v in ("", ".") else int(v)


def _p_float(v: str):
    return None if v in ("", ".") else float(v)


def _p_int_list(v: str):
    if v in ("", "."):
        return None
    return [int(x) for x in v.rstrip(",").split(",")]


def _p_float_list(v: str):
    if v in ("", "."):
        return None
    return [float(x) for x in v.rstrip(",").split(",")]


def _p_str_list(v: str):
    if v in ("", "."):
        return None
    return [x for x in v.rstrip(",").split(",")]


PARSERS = {
    "str": _p_str,
    "int": _p_int,
    "long": _p_int,
    "float": _p_float,
    "double": _p_float,
    "int_list": _p_int_list,
    "long_list": _p_int_list,
    "float_list": _p_float_list,
    "double_list": _p_float_list,
    "str_list": _p_str_list,
}

_SCALARS: dict[str, tuple[str, T.DataType]] = {
    "string": ("str", T.StringType()),
    "lstring": ("str", T.StringType()),
    "char": ("str", T.StringType()),
    "byte": ("int", T.IntegerType()),
    "ubyte": ("int", T.IntegerType()),
    "short": ("int", T.IntegerType()),
    "ushort": ("int", T.IntegerType()),
    "int": ("int", T.IntegerType()),
    "uint": ("long", T.LongType()),
    "bigint": ("long", T.LongType()),
    "float": ("float", T.FloatType()),
    "double": ("double", T.DoubleType()),
}


@dataclass(frozen=True)
class AsqlField:
    """One declared field: Spark type + a picklable parser tag."""

    name: str
    tag: str  # PARSERS key
    dtype: T.DataType

    def parse(self, v: str):
        return PARSERS[self.tag](v)


_FIELD_RE = re.compile(
    r"\s*(?P<type>[A-Za-z]+\s*(?:\[\s*\d+\s*\])?|(?:enum|set)\s*\([^)]*\))"
    r"\s+(?P<name>\w+)\s*;"
    r'(?:\s*"(?:[^"\\]|\\.)*")?',
)
_ARRAY_RE = re.compile(r"^([A-Za-z]+)\s*\[\s*(\d+)\s*\]$")


def _field_type(tok: str) -> tuple[str, T.DataType]:
    t = tok.strip()
    m = _ARRAY_RE.match(t)
    if m:
        base, n = m.group(1).lower(), int(m.group(2))
        if base == "char":  # char[n] is a fixed-width string, not a list
            return ("str", T.StringType())
        if base not in _SCALARS:
            raise ValueError(f"unknown AutoSql array element type {base!r}")
        tag, dtype = _SCALARS[base]
        return (f"{tag}_list", T.ArrayType(dtype))
    low = t.lower()
    if low.startswith("enum"):
        return ("str", T.StringType())
    if low.startswith("set"):
        return ("str_list", T.ArrayType(T.StringType()))
    if low not in _SCALARS:
        raise ValueError(f"unknown AutoSql type {t!r}")
    return _SCALARS[low]


def parse_autosql(text: str) -> tuple[str, list[AsqlField]]:
    """(table name, declared fields) from an AutoSql declaration."""
    m = re.search(r"^\s*(?:table|object|simple)\s+(\S+)", text, re.MULTILINE)
    name = m.group(1) if m else ""
    lp = text.find("(")
    rp = text.rfind(")")
    if lp < 0 or rp < lp:
        raise ValueError("AutoSql declaration has no field block")
    fields = []
    for fm in _FIELD_RE.finditer(text[lp + 1:rp]):
        tag, dtype = _field_type(fm.group("type"))
        fields.append(AsqlField(fm.group("name"), tag, dtype))
    if not fields:
        raise ValueError("AutoSql declaration has no fields")
    return name, fields
