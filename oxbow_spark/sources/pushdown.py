"""Filter → genomic-region pushdown for Python DataSources.

Spark 4's Python DataSource API hands the reader the query's filter
conjuncts (`DataSourceReader.pushFilters`). We translate the
(chrom-equality, start-range) conjuncts into a query `Region` used for
index-chunk / container pruning in `partitions()` — the automatic
counterpart of the explicit ``regions`` option, mirroring how the
reference's range queries drive its index (`SURVEY` F1). Every filter is
returned to Spark as *unsupported* so the full predicate is re-applied
post-scan: pruning stays an over-approximation + residual re-check, so
correctness never depends on pushdown precision (reference analog:
`batch_iterator/query.rs:142-159`).

A filter on the start column alone (e.g. ``pos < N``) selects records
*starting* in the range — a subset of records *overlapping* it — so
index pruning with the derived region is a superset read, which the
residual filter then narrows. Filters over other columns are ignored
(they prune nothing but still re-check)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
)

from oxbow_spark.coords import Region


def pushdown_enabled() -> bool:
    """True when the session allows Python DataSource filter pushdown.

    Spark REFUSES to plan a reader that defines ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false
    (DATA_SOURCE_PUSHDOWN_DISABLED), so sources must pick a reader class
    at plan time: the pushdown subclass only under an enabled session
    (our session factory enables it), the plain reader otherwise —
    vanilla sessions keep working, with ``regions`` options as the
    explicit pushdown path."""
    try:
        s = SparkSession.getActiveSession()
        if s is None:
            return False
        return s.conf.get(
            "spark.sql.python.filterPushdown.enabled", "false"
        ).lower() == "true"
    except Exception:
        return False


def region_from_filters(
    filters,
    chrom_col: str,
    start_col: str,
    coord_offset: int,
    native_cs: str = "11",
) -> Region | None:
    """Derive a pruning Region from filter conjuncts, or None.

    ``coord_offset`` is the shift the source applies to emitted starts
    (requested − native); filter values arrive in the requested rendering
    and convert back to native before building the 0-based Region.
    ``native_cs`` says whether native starts are 1-based ("11",
    SAM/VCF/GFF) or 0-based ("01", BED/BBI)."""
    chrom = None
    lo = None  # native inclusive lower bound on start
    hi = None  # native exclusive upper bound on start
    _RANGE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
    for f in filters:
        if not isinstance(f, _RANGE):
            continue  # IsNotNull etc: no value; prunes nothing
        attr = f.attribute[-1] if isinstance(f.attribute, tuple) else f.attribute
        if isinstance(f, EqualTo) and attr == chrom_col and isinstance(f.value, str):
            chrom = f.value
        elif attr == start_col and isinstance(f.value, int):
            native = f.value - coord_offset
            if isinstance(f, GreaterThan):
                lo = max(lo or 0, native + 1)
            elif isinstance(f, GreaterThanOrEqual):
                lo = max(lo or 0, native)
            elif isinstance(f, LessThan):
                hi = min(hi, native) if hi is not None else native
            elif isinstance(f, LessThanOrEqual):
                hi = min(hi, native + 1) if hi is not None else native + 1
            elif isinstance(f, EqualTo):
                lo = max(lo or 0, native)
                hi = min(hi, native + 1) if hi is not None else native + 1
    if chrom is None:
        return None
    base = 1 if native_cs == "11" else 0
    start0 = max((lo if lo is not None else base) - base, 0)
    end0 = hi - base if hi is not None else None
    return Region(chrom, start0, end0)
