"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively (pandas-on-Spark `merge_asof` exists, but routes through a
different API surface; DuckDB/kdb expose it as ASOF JOIN).

For each left row, attach the single right row with the greatest
``on``-value <= the left's (``direction="backward"``; ``"forward"``
mirrors it), optionally within ``by`` equality groups — the canonical
"latest state at event time" attribution join for training-data
pipelines.

Scale design: NOT a range join (a naive ``l.ts >= r.ts`` theta-join is
O(n*m) within each key and explodes on skewed keys). Both sides are
tagged and unioned, then a single window pass per ``by`` group carries
the most recent right-side values forward (`last(..., ignorenulls)` over
rows unbounded-preceding..current). Cost: ONE shuffle on the ``by`` key
+ a sort within groups — the same shape as any windowed aggregate, and
AQE handles skewed groups the same way. Right rows ordered before left
rows at equal ``on`` values, so an exact-tie right row is visible to the
left row (ASOF >= semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the as-of matching right row's ``right_cols``.

    ``right`` should be unique per (``by``, ``on``); pre-aggregate if
    not (the window otherwise picks the last right row in sort order,
    which is deterministic only if the caller adds a tiebreaker).
    Unmatched left rows keep null right columns (ASOF LEFT JOIN).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    l_payload = [c for c in left.columns if c not in by and c != on]
    l = left.select(
        *by, F.col(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in l_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    r = right.select(
        *by, F.col(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_payload],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)
    order = [F.col(on).asc(), F.col("_side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*by).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
        for c in right_cols
    ]
    out = u.select(*by, on, "_side", *l_payload, *carried).where(
        F.col("_side") == 1
    )
    return out.select(
        *by, on, *l_payload,
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )
