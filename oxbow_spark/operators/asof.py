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

#: auto broadcast bound for the chunked path's carry frame: at ~100 B
#: per row, 10M rows is Spark's 1 GB broadcast-relation comfort zone
#: (the 8 GB hard cap is ~80M) and it must fit the driver AND every
#: executor — above this the stitch falls back to a co-partitioned
#: shuffle join (same result, one extra sort of the big side)
BROADCAST_CARRY_MAX_ROWS = 10_000_000


def _carry_fits_broadcast(u: DataFrame, by: list[str], on: str,
                          bp: int) -> bool:
    """Estimate the chunked path's carry row count —
    #distinct ``by`` keys × #chunks spanned by the ``on`` range — and
    decide whether it fits `BROADCAST_CARRY_MAX_ROWS`. One agg job at
    plan time: approx_count_distinct + min/max are map-side partial
    aggregates over a scan Catalyst prunes to the by/on columns, so
    the cost is one narrow pass over the key columns, not the join."""
    aggs = [F.min(on).alias("_lo"), F.max(on).alias("_hi")]
    if by:
        aggs.append(F.approx_count_distinct(F.struct(*by)).alias("_nk"))
    row = u.groupBy().agg(*aggs).first()
    if row["_lo"] is None:
        return True  # empty inputs — the carry is empty too
    chunks = int(row["_hi"] // bp) - int(row["_lo"] // bp) + 1
    keys = int(row["_nk"]) if by else 1
    return keys * chunks <= BROADCAST_CARRY_MAX_ROWS


def estimate_broadcast_carry(frames: list[tuple[DataFrame, list[str],
                                                list[str]]],
                             bp: int) -> bool:
    """Decide the carry stitch ONCE from the cheapest frames that bound
    the key/range shape, for callers issuing several `asof_join`
    (``split_on=bp``) calls whose inputs are DERIVED (join/agg/window
    outputs): the per-call default estimator would re-execute each
    derived upstream at plan time, while a scan-side projection gives
    the same (conservative) bound for one column-pruned pass per base
    frame.

    ``frames``: (df, by_cols, on_cols) triples — each df contributes
    its distinct-key count and the min/max envelope over every listed
    ``on_cols`` candidate. Keys sum across frames (an upper bound on
    the distinct keys of any union the caller builds); the range is
    the global envelope. Returns the ``broadcast_carry`` flag to pass
    explicitly to each `asof_join` call.

    Cost: the k per-frame aggregates are UNIONED into one frame and
    reduced by a single final aggregate, so a caller passing k frames
    pays ONE driver-blocking job (Spark runs the k narrow scan legs as
    stages of that job), not k serial ones."""
    per = []
    for df, by, ons in frames:
        mins = [F.min(c).cast("long") for c in ons]
        maxs = [F.max(c).cast("long") for c in ons]
        # least/greatest skip nulls, so a frame empty on one candidate
        # column still contributes the others' envelope
        lo = F.least(*mins) if len(mins) > 1 else mins[0]
        hi = F.greatest(*maxs) if len(maxs) > 1 else maxs[0]
        nk = (F.approx_count_distinct(F.struct(*by)) if by
              else F.lit(1)).cast("long")
        per.append(df.groupBy().agg(lo.alias("_lo"), hi.alias("_hi"),
                                    nk.alias("_nk")))
    u = per[0]
    for p in per[1:]:
        u = u.unionByName(p)
    row = u.groupBy().agg(F.sum("_nk").alias("_nk"),
                          F.min("_lo").alias("_lo"),
                          F.max("_hi").alias("_hi")).first()
    if row["_lo"] is None:
        return True  # all inputs empty — the carry is empty too
    chunks = int(row["_hi"]) // int(bp) - int(row["_lo"]) // int(bp) + 1
    return max(int(row["_nk"]), 1) * chunks <= BROADCAST_CARRY_MAX_ROWS


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    split_on: int | None = None,
    broadcast_carry: bool | None = None,
) -> DataFrame:
    """Left rows + the as-of matching right row's ``right_cols``.

    ``right`` should be unique per (``by``, ``on``); pre-aggregate if
    not (the window otherwise picks the last right row in sort order,
    which is deterministic only if the caller adds a tiebreaker).
    Unmatched left rows keep null right columns (ASOF LEFT JOIN).

    ``split_on`` (the 100× scale path — `merge_intervals`' chunked
    discipline applied to the as-of window): rows hash into
    ``floor(on / split_on)`` chunks and the carry window keys on
    (by, chunk), so one hot ``by`` group (a single contig's 10⁸
    boundaries, one user's event history) never lands in a single
    window task. A TINY per-chunk summary frame (one row per non-empty
    chunk: the chunk's last right-row payload in as-of order) feeds
    each chunk its carry-in via a per-``by`` window over
    O(range/split_on) rows; one co-partitioned (by, chunk) join
    stitches. Bit-identical to the plain path (property-tested).
    Requires a numeric ``on``.

    ``broadcast_carry``: the carry frame is O(#distinct ``by`` keys ×
    on-range/split_on) rows × the right payload width, and
    broadcasting it keeps the big side on its window partitioning
    instead of re-sorting for a merge join (measured 2× on a 20M-row
    single-key stress). Sizing rule: it must fit the driver + every
    executor — ``keys × range/split_on ≲ 10M rows``
    (`BROADCAST_CARRY_MAX_ROWS`; at ~100 B/row that is Spark's 1 GB
    broadcast-relation comfort zone, the 8 GB hard cap is ~80M).
    Default ``None`` AUTO-SELECTS: one map-side-combined agg job at
    plan time (column-pruned to the ``by``/``on`` columns —
    approx_count_distinct(keys), min/max(on)) estimates the carry row
    count and picks broadcast iff it is under the bound, so a caller
    with 10⁶ keys and fine chunks never hits the memory cliff by
    default. ``True``/``False`` skip the estimate job and force the
    strategy; with ``False`` consider coarsening ``split_on`` too
    (fewer chunks per key — any value that still yields ≥ ~10× #cores
    chunks per hot key keeps the skew win).

    .. warning:: the default estimate is an EAGER Spark job at
       ``asof_join()`` call time (exactly one job, over the
       left∪right lineage). When either input is a DERIVED frame (a
       join/agg/window output, not a scan) and is not cached, that
       upstream plan executes once extra at construction — even if
       the returned frame is never collected. Cache the derived
       input, pass an explicit ``True``/``False``, or bound the shape
       once with `estimate_broadcast_carry` over the cheap base
       projections (what `interval_ops`' internal call sites do).
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
    backward = direction == "backward"
    order = [F.col(on).asc(), F.col("_side").asc()]
    if not backward:
        order = [F.col(on).desc(), F.col("_side").asc()]

    if split_on is None:
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

    bp = int(split_on)
    if bp <= 0:
        raise ValueError("split_on must be positive")
    u = u.withColumn("_k", F.floor(F.col(on) / bp))
    wk = (
        Window.partitionBy(*by, "_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.select(
        *by, "_k", F.col(on), "_side", *l_payload,
        *[F.last(f"_r_{c}", ignorenulls=True).over(wk).alias(f"_l_{c}")
          for c in right_cols],
    )
    # one row per (by, chunk) present in EITHER side — left-only chunks
    # must appear so their carry-in can join back. PER-COLUMN summaries
    # (not one best-row struct): the plain path's last(ignorenulls)
    # falls back past a later right row whose value for column c is
    # null to an earlier row's non-null c, so each column's carry must
    # track its own latest NON-NULL value. Struct max/min keyed on
    # `on` per column (null when no right row in the chunk has one).
    def _pick(c: str):
        cond = (F.col("_side") == 0) & F.col(f"_r_{c}").isNotNull()
        s = F.when(cond, F.struct(F.col(on).alias("_o"),
                                  F.col(f"_r_{c}").alias("_v")))
        return (F.max(s) if backward else F.min(s)).alias(f"_b_{c}")

    summ = u.groupBy(*by, "_k").agg(*[_pick(c) for c in right_cols])
    ws = Window.partitionBy(*by).orderBy(
        F.col("_k").asc() if backward else F.col("_k").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    # strictly-preceding (succeeding, forward) chunks' last non-null
    # payload per column — O(range/split_on) rows per key, never
    # corpus-sized
    carry = summ.select(
        *by, "_k",
        *[F.last(f"_b_{c}", ignorenulls=True).over(ws).alias(f"_c_{c}")
          for c in right_cols])
    # carry is O(keys × range/split_on) rows — broadcast so the big
    # side keeps its window partitioning instead of re-sorting for a
    # merge join (measured 2x on a 20M-row single-key stress); above
    # the ~10M-row carry bound a co-partitioned shuffle join avoids
    # the memory cliff. Default None estimates which side of the
    # bound this call is on (see docstring sizing rule)
    if broadcast_carry is None:
        broadcast_carry = _carry_fits_broadcast(u, by, on, bp)
    stitch = F.broadcast(carry) if broadcast_carry else carry
    out = (
        local.join(stitch, [*by, "_k"])
        .where(F.col("_side") == 1)
        .select(
            *by, on, *l_payload,
            *[F.coalesce(F.col(f"_l_{c}"), F.col(f"_c_{c}")["_v"]).alias(c)
              for c in right_cols],
        )
    )
    return out
