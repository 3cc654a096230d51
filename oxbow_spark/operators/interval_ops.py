"""Interval set operations (the bedtools merge/intersect/subtract
family) as Spark DataFrame programs.

The reference scans genomic intervals but defers all set algebra to
downstream engines (`py-oxbow/oxbow/_pyarrow.py:738-774` raises
NotImplementedError for joins); bedtools-style merge/intersect/subtract
are the standard downstream operations on BED/GTF/BigBed frames.
Half-open [start, end) coordinates throughout — normalize 1-based inputs
with `oxbow_spark.coords` first.

Scale notes:
- `merge_intervals` is ONE per-chrom window pass (running max of `end`)
  + ONE hash aggregation. The window partitions by chrom: genome-scale
  inputs put ~3 Gbp / #contigs per partition, which fits. For extreme
  single-contig skew pass ``split_bp``: intervals pre-split at coarse
  range-chunk boundaries, the window keys on (chrom, chunk) — bounded
  partitions — and only the ≤2 boundary-touching runs per chunk enter a
  tiny second stitch pass. Exact same result (weights make the
  n_merged counts immune to piece splitting); the stitch pass costs
  more than it saves below ~10^9 rows per contig, so it is opt-in.
- `intersect_intervals` rides the binned equi-join (`interval_join.py`)
  — never a nested loop.
- `subtract_intervals` = merge(b) → binned join → per-a-row gap walk
  (lag window keyed by a-row id) + anti-join pass-through of untouched
  rows. Three narrow-keyed shuffles, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oxbow_spark.operators.asof import asof_join, estimate_broadcast_carry
from oxbow_spark.operators.interval_join import overlap_join

_NEG_INF = -(1 << 62)


def _merge_runs(base: DataFrame, keys: list[str],
                start_col: str, end_col: str,
                distance: int = 0) -> DataFrame:
    """Core merge pass over (_s, _e, _w) rows: running-max window keyed
    by ``keys`` + one hash agg. ``_w`` weights sum into n_merged, which
    makes the pass composable (chunk pieces carry weight 0/1; stitch
    re-merges runs whose weight is their piece count)."""
    w = Window.partitionBy(*keys).orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_grp = (F.col("_s") > F.coalesce(prev_max, F.lit(_NEG_INF))
               + distance).cast("long")
    grp = F.sum(new_grp).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        base.withColumn("_grp", grp)
        .groupBy(*keys, "_grp")
        .agg(
            F.min("_s").alias(start_col),
            F.max("_e").alias(end_col),
            F.sum("_w").alias("n_merged"),
        )
        .drop("_grp")
    )


def merge_intervals(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    split_bp: int | None = None, distance: int = 0,
) -> DataFrame:
    """(chrom, start, end, n_merged): union of overlapping OR adjacent
    intervals per key (bedtools-merge default: bookended intervals
    [a,b) + [b,c) merge).

    ``split_bp`` (the 100× scale path for single-contig skew): intervals
    split at ``split_bp`` chunk boundaries, the merge window keys on
    (chrom, chunk) so no partition exceeds one chunk's rows, and runs
    touching a chunk edge — at most 2 per chunk — are stitched by a
    second merge over that tiny frame. Result is identical to the plain
    path: continuation pieces carry weight 0, so each source interval
    counts once in n_merged no matter how many chunks it spans."""
    base = df.select(
        F.col(on),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    )
    if split_bp is None:
        return _merge_runs(base.withColumn("_w", F.lit(1).cast("long")),
                           [on], start_col, end_col, distance)

    bp = int(split_bp)
    if distance >= bp:
        raise ValueError("distance must be smaller than split_bp")
    k0 = F.floor(F.col("_s") / bp)
    k1 = F.greatest(F.floor((F.col("_e") - 1) / bp), k0)
    pieces = base.select(
        F.col(on), "_s", "_e",
        F.explode(F.sequence(k0, k1)).alias("_k"),
    ).select(
        F.col(on), "_k",
        F.greatest(F.col("_s"), F.col("_k") * bp).alias("_ps"),
        F.least(F.col("_e"), (F.col("_k") + 1) * bp).alias("_pe"),
        # an interval's weight lives in its FIRST chunk only
        (F.col("_k") == F.floor(F.col("_s") / bp)).cast("long").alias("_w"),
    ).select(F.col(on), "_k", F.col("_ps").alias("_s"),
             F.col("_pe").alias("_e"), "_w")

    runs = _merge_runs(pieces, [on, "_k"], start_col, end_col, distance)
    # with distance > 0, runs within that margin of a chunk edge can
    # still connect across it — widen the stitch candidacy accordingly
    touch = (F.col(start_col) <= F.col("_k") * bp + distance) | \
        (F.col(end_col) >= (F.col("_k") + 1) * bp - distance)
    final = runs.where(~touch).drop("_k")         .select(F.col(on), start_col, end_col, "n_merged")
    # ≤2 boundary-touching runs per (chrom, chunk) → the stitch merge
    # input is O(contig/split_bp), never corpus-sized
    stitched = _merge_runs(
        runs.where(touch).select(
            F.col(on), F.col(start_col).alias("_s"),
            F.col(end_col).alias("_e"), F.col("n_merged").alias("_w")),
        [on], start_col, end_col, distance)
    return final.unionByName(stitched)


def intersect_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, on: str = "chrom",
    a_start: str = "start", a_end: str = "end",
    b_start: str = "b_start", b_end: str = "b_end",
) -> DataFrame:
    """One row per overlapping (a, b) pair with the clipped intersection
    bounds as ``i_start``/``i_end`` (bedtools-intersect per-pair output;
    merge the result for the flattened union). Carries all non-key
    columns of both inputs — pre-alias collisions like `overlap_join`."""
    j = overlap_join(
        a, b, bin_size=bin_size, on=on,
        left_start=a_start, left_end=a_end,
        right_start=b_start, right_end=b_end,
    )
    return j.select(
        "*",
        F.greatest(F.col(a_start).cast("long"),
                   F.col(b_start).cast("long")).alias("i_start"),
        F.least(F.col(a_end).cast("long"),
                F.col(b_end).cast("long")).alias("i_end"),
    )


def subtract_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    b_start: str = "start", b_end: str = "end",
    id_col: str | None = None,
    split_bp: int | None = None,
    remove_any: bool = False,
) -> DataFrame:
    """bedtools-subtract: the parts of each ``a`` interval not covered
    by any ``b`` interval. Output columns = ``a``'s columns with
    start/end replaced by the surviving segment bounds (an ``a`` row
    can yield 0, 1 or many segments).

    ``remove_any`` is bedtools ``-A``: drop each ``a`` interval
    ENTIRELY when anything in ``b`` overlaps it (one binned semi-join,
    no gap walk). ``id_col`` names a unique per-row key of ``a`` if one
    exists (the cheapest path — no extra shuffle); without it the row's
    own values become the key: ``a`` collapses to distinct rows with a
    multiplicity count, the gap walk runs once per distinct row, and
    segments re-expand to the original multiplicity at the end. That
    default is fully deterministic — safe under speculative retries and
    branch recomputation, unlike a `monotonically_increasing_id` — at
    the cost of one extra full-width aggregation of ``a``."""
    if remove_any:
        hits = overlap_join(
            a.select(F.col(on).alias("_on"),
                     F.col(start_col).cast("long").alias("_as"),
                     F.col(end_col).cast("long").alias("_ae")).distinct(),
            b.select(F.col(on).alias("_on"),
                     F.col(b_start).cast("long").alias("_bs"),
                     F.col(b_end).cast("long").alias("_be")),
            bin_size=bin_size, on="_on",
            left_start="_as", left_end="_ae",
            right_start="_bs", right_end="_be",
        ).select("_on", "_as", "_ae").distinct()
        return a.join(
            hits,
            (F.col(on) == F.col("_on"))
            & (F.col(start_col).cast("long") == F.col("_as"))
            & (F.col(end_col).cast("long") == F.col("_ae")),
            "left_anti")
    other = [c for c in a.columns if c not in (start_col, end_col)]
    if id_col:
        aid = a.select(
            F.col(id_col).alias("_aid"),
            F.col(start_col).cast("long").alias("_as"),
            F.col(end_col).cast("long").alias("_ae"),
            *[F.col(c) for c in other],
        )
        mult: list = []
    else:
        # deterministic default key: the distinct row's own values
        # (struct equality — collision-free), with multiplicity
        # restored after the gap walk
        aid = (a.groupBy(*a.columns)
               .agg(F.count(F.lit(1)).alias("_n"))
               .select(
                   F.struct(*[F.col(c) for c in a.columns]).alias("_aid"),
                   F.col("_n"),
                   F.col(start_col).cast("long").alias("_as"),
                   F.col(end_col).cast("long").alias("_ae"),
                   *[F.col(c) for c in other],
               ))
        mult = ["_n"]
    bm = merge_intervals(b, on=on, start_col=b_start, end_col=b_end,
                         split_bp=split_bp) \
        .select(F.col(on).alias("_on"),
                F.col(b_start).alias("_bs"), F.col(b_end).alias("_be"))
    j = overlap_join(
        aid.withColumnRenamed(on, "_on"),
        bm,
        bin_size=bin_size, on="_on",
        left_start="_as", left_end="_ae",
        right_start="_bs", right_end="_be",
    )
    cs = F.greatest(F.col("_bs"), F.col("_as"))
    ce = F.least(F.col("_be"), F.col("_ae"))
    cov = j.select("_aid", *mult, "_as", "_ae",
                   *[F.col("_on").alias(on) if c == on else F.col(c)
                     for c in other],
                   cs.alias("_cs"), ce.alias("_ce"))
    w = Window.partitionBy("_aid").orderBy("_cs")
    seg_start = F.coalesce(
        F.lag("_ce").over(w), F.col("_as")).alias("_seg_s")
    gaps = cov.select(
        "_aid", *mult, "_as", "_ae", *other,
        seg_start, F.col("_cs").alias("_seg_e"), "_ce",
        F.row_number().over(
            Window.partitionBy("_aid").orderBy(F.desc("_cs"))
        ).alias("_rn_desc"),
    )
    mids = gaps.where(F.col("_seg_e") > F.col("_seg_s")).select(
        *other, *mult,
        F.col("_seg_s").alias(start_col), F.col("_seg_e").alias(end_col),
    )
    tails = gaps.where(
        (F.col("_rn_desc") == 1) & (F.col("_ae") > F.col("_ce"))
    ).select(
        *other, *mult,
        F.col("_ce").alias(start_col), F.col("_ae").alias(end_col),
    )
    untouched = aid.join(
        cov.select("_aid").distinct(), "_aid", "left_anti"
    ).select(*other, *mult,
             F.col("_as").alias(start_col), F.col("_ae").alias(end_col))
    out = mids.unionByName(tails).unionByName(untouched)
    if mult:
        out = out.withColumn(
            "_dup",
            F.explode(F.array_repeat(F.lit(1), F.col("_n").cast("int")))
        ).drop("_n", "_dup")
    return out


def closest_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, on: str = "chrom",
    a_start: str = "start", a_end: str = "end", a_id: str = "a_id",
    b_start: str = "start", b_end: str = "end", b_id: str = "b_id",
    k: int = 1, split_bp: int | None = None,
) -> DataFrame:
    """bedtools-closest: for each ``a`` interval, the nearest ``b``
    interval on the same key and the distance to it — 0 when they
    overlap, else the half-open gap (bookended intervals have distance
    0 under this convention; bedtools' closed-coordinate output prints
    1 there). Ties break on the smaller ``b_id`` (bedtools prints all
    ties; one deterministic winner keeps the result oracle-hashable).
    ``a`` rows with no same-key ``b`` at all keep a null match.

    Three narrow candidate generators, never an all-pairs join:
    overlap candidates via the binned equi-join (distance 0), nearest
    preceding via a backward as-of on (a.start vs b.end), nearest
    following via a forward as-of on (a.end vs b.start) — each ONE
    keyed shuffle; a final per-a-row window picks min (distance, b_id).
    ``split_bp`` chunks both as-of windows on (chrom, floor(pos/split))
    so a single hot contig never pins one window task
    (`operators/asof.py` split_on — bit-identical, property-tested).
    """
    aa = a.select(
        F.col(a_id).alias("_aid"), F.col(on).alias("_on"),
        F.col(a_start).cast("long").alias("_as"),
        F.col(a_end).cast("long").alias("_ae"),
    )
    bb = b.select(
        F.col(b_id).alias("_bid"), F.col(on).alias("_on"),
        F.col(b_start).cast("long").alias("_bs"),
        F.col(b_end).cast("long").alias("_be"),
    )
    # overlap candidates: distance 0
    ovl = overlap_join(
        aa, bb, bin_size=bin_size, on="_on",
        left_start="_as", left_end="_ae",
        right_start="_bs", right_end="_be",
    ).select("_aid", "_on", "_as", "_ae", "_bid", F.lit(0).cast("long").alias("_dist"))
    # decide the as-of carry stitch ONCE from the cheap scan-side
    # projections — the per-call default would re-execute the derived
    # prev_b/next_b groupBys at plan time (asof_join's eager-estimate
    # warning); aa∪bb bounds both calls' key/range shape
    bcarry = None
    if split_bp is not None:
        bcarry = estimate_broadcast_carry(
            [(aa, ["_on"], ["_as", "_ae"]),
             (bb, ["_on"], ["_bs", "_be"])], split_bp)
    # nearest preceding: greatest b.end <= a.start; ties on end keep min
    # id; the matched end rides along to compute the gap
    prev_b = (
        bb.groupBy("_on", "_be").agg(F.min("_bid").alias("_bid"))
        .select("_on", F.col("_be").alias("_bv"), "_bid",
                F.col("_be").alias("_bend"))
    )
    prev = asof_join(
        aa.withColumnRenamed("_as", "_bv"),
        prev_b, on="_bv", by="_on", direction="backward",
        right_cols=["_bid", "_bend"], split_on=split_bp,
        broadcast_carry=bcarry,
    ).where(F.col("_bid").isNotNull()).select(
        "_aid", "_on", F.col("_bv").alias("_as"), "_ae", "_bid",
        (F.col("_bv") - F.col("_bend")).cast("long").alias("_dist"),
    )
    # nearest following: smallest b.start >= a.end; ties on start keep min id
    next_b = (
        bb.groupBy("_on", "_bs").agg(F.min("_bid").alias("_bid"))
        .select("_on", F.col("_bs").alias("_bv"), "_bid",
                F.col("_bs").alias("_bstart"))
    )
    nxt = asof_join(
        aa.withColumnRenamed("_ae", "_bv"),
        next_b, on="_bv", by="_on", direction="forward",
        right_cols=["_bid", "_bstart"], split_on=split_bp,
        broadcast_carry=bcarry,
    ).where(F.col("_bid").isNotNull()).select(
        "_aid", "_on", "_as", F.col("_bv").alias("_ae"), "_bid",
        (F.col("_bstart") - F.col("_bv")).cast("long").alias("_dist"),
    )
    cand = ovl.unionByName(prev).unionByName(nxt)
    w = Window.partitionBy("_aid").orderBy("_dist", "_bid")
    # the three candidate passes are disjoint per b-row (overlap needs
    # bs < ae <= be and as < be; prev needs be <= as; next needs
    # bs >= ae), so no per-(a, b) dedup is required before ranking
    best = (cand
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select("_aid", "_bid", "_dist", "_rn"))
    out = aa.join(best, "_aid", "left").select(
        F.col("_aid").alias(a_id), F.col("_on").alias(on),
        F.col("_as").alias(a_start), F.col("_ae").alias(a_end),
        F.col("_bid").alias(b_id), F.col("_dist").alias("distance"),
        F.coalesce("_rn", F.lit(1)).alias("rank"),
    )
    return out.drop("rank") if k == 1 else out


def _prev_end_frame(m: DataFrame, on: str, start_col: str, end_col: str,
                    split_bp: int | None) -> DataFrame:
    """Each MERGED (disjoint) interval + its predecessor's end
    (``_pe``, null for the key's first interval). Plain: one per-key
    lag window. ``split_bp`` (the `_lead_segments` chunked
    discipline): the lag keys on (key, floor(start/split_bp)) so one
    hot contig never lands in a single window task; merged intervals
    are disjoint, so ends increase with starts and each chunk's
    carry-in is the running max end over the strictly-preceding
    chunks' TINY summary frame (one row per non-empty chunk),
    broadcast back co-keyed on (key, chunk). Bit-identical to the
    plain path (property-tested)."""
    if split_bp is None:
        w = Window.partitionBy(on).orderBy(start_col)
        return m.select(F.col(on), F.col(start_col), F.col(end_col),
                        F.lag(end_col).over(w).alias("_pe"))
    bp = int(split_bp)
    if bp <= 0:
        raise ValueError("split_bp must be positive")
    ch = m.withColumn("_k", F.floor(F.col(start_col) / bp))
    wk = Window.partitionBy(on, "_k").orderBy(start_col)
    local = ch.withColumn("_lpe", F.lag(end_col).over(wk))
    summ = ch.groupBy(on, "_k").agg(F.max(end_col).alias("_le"))
    ws = Window.partitionBy(on).orderBy("_k") \
        .rowsBetween(Window.unboundedPreceding, -1)
    carry = summ.select(F.col(on), "_k",
                        F.max("_le").over(ws).alias("_ce"))
    return (local.join(F.broadcast(carry), [on, "_k"])
            .select(F.col(on), F.col(start_col), F.col(end_col),
                    F.coalesce("_lpe", "_ce").alias("_pe")))


def complement_intervals(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    split_bp: int | None = None,
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """bedtools-complement: the gaps between the merged intervals of
    each key. Default universe is data-bounded ([min(start), max(end)]
    per key); pass ``sizes`` ({chrom: length}) for the true bedtools
    semantics over [0, size) — leading and trailing gaps included, and
    fully-uncovered chroms in ``sizes`` emit their whole span. One
    merge pass + one predecessor-end pass (+ a broadcast of the tiny
    sizes table when given). ``split_bp`` chunks BOTH per-key windows
    (the merge and the predecessor-end lag — see `_prev_end_frame`);
    the trailing-gap probe is a per-key max-end groupBy, never a
    window."""
    m = merge_intervals(df, on=on, start_col=start_col, end_col=end_col,
                        split_bp=split_bp)
    prev = _prev_end_frame(m, on, start_col, end_col, split_bp)
    if sizes is None:
        return (
            prev.where(F.col("_pe").isNotNull()
                       & (F.col(start_col) > F.col("_pe")))
            .select(F.col(on), F.col("_pe").alias(start_col),
                    F.col(start_col).alias(end_col))
        )
    spark = df.sparkSession
    sz = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"{on} string, _size long")
    g = prev.join(F.broadcast(sz), on).select(
        F.col(on),
        F.coalesce("_pe", F.lit(0).cast("long")).alias("_gs"),
        F.col(start_col).alias("_ge"))
    mids = g.where(F.col("_ge") > F.col("_gs")).select(
        F.col(on), F.col("_gs").alias(start_col),
        F.col("_ge").alias(end_col))
    last = m.groupBy(on).agg(F.max(end_col).alias("_me"))
    tails = last.join(F.broadcast(sz), on) \
        .where(F.col("_size") > F.col("_me")).select(
            F.col(on), F.col("_me").alias(start_col),
            F.col("_size").alias(end_col))
    uncovered = sz.join(m.select(on).distinct(), on, "left_anti").select(
        F.col(on), F.lit(0).cast("long").alias(start_col),
        F.col("_size").alias(end_col)).where(F.col(end_col) > 0)
    return mids.unionByName(tails).unionByName(uncovered)


def coverage_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, on: str = "chrom",
    a_start: str = "start", a_end: str = "end",
    b_start: str = "start", b_end: str = "end",
) -> DataFrame:
    """bedtools-coverage: for each ``a`` interval, ``n_overlaps`` (the
    number of ``b`` features overlapping it — unmerged, bedtools'
    count), ``covered_bp`` (bases of ``a`` covered by the UNION of
    ``b`` — computed against `merge_intervals(b)`, whose blocks are
    disjoint so a plain clipped-length sum is the exact union), and
    ``frac`` (covered_bp / interval length, bedtools' seventh column).

    Output: ``a``'s columns + the three metrics; a-intervals touching
    nothing report zeros. Row identity needs no key: metrics are a pure
    function of (chrom, start, end), computed once per DISTINCT
    interval and equi-joined back — duplicates in ``a`` each pick up
    the same row, retry-deterministic by construction.

    Plan: two binned overlap joins (raw b for the count, merged b for
    the union bases) + partial-agg groupBys on the distinct interval
    key — no cartesian, no window over corpus-sized partitions."""
    from oxbow_spark.operators.interval_join import overlap_join

    s = F.col(a_start).cast("long")
    e = F.col(a_end).cast("long")
    keys = a.select(F.col(on).alias("_on"), s.alias("_as"),
                    e.alias("_ae")).distinct()
    raw = b.select(F.col(on).alias("_on"),
                   F.col(b_start).cast("long").alias("_bs"),
                   F.col(b_end).cast("long").alias("_be"))
    grp = ["_on", "_as", "_ae"]
    cnt = (overlap_join(keys, raw, bin_size=bin_size, on="_on",
                        left_start="_as", left_end="_ae",
                        right_start="_bs", right_end="_be")
           .groupBy(*grp).agg(F.count(F.lit(1)).alias("n_overlaps")))
    bm = (merge_intervals(b, on=on, start_col=b_start, end_col=b_end)
          .select(F.col(on).alias("_on"),
                  F.col(b_start).cast("long").alias("_bs"),
                  F.col(b_end).cast("long").alias("_be")))
    cov = (overlap_join(keys, bm, bin_size=bin_size, on="_on",
                        left_start="_as", left_end="_ae",
                        right_start="_bs", right_end="_be")
           .groupBy(*grp).agg(
               F.sum(F.least(F.col("_be"), F.col("_ae"))
                     - F.greatest(F.col("_bs"), F.col("_as")))
               .alias("covered_bp")))
    res = (keys.join(cnt, grp, "left").join(cov, grp, "left")
           .select("_on", "_as", "_ae",
                   F.coalesce("n_overlaps", F.lit(0)).cast("long")
                   .alias("n_overlaps"),
                   F.coalesce("covered_bp", F.lit(0)).cast("long")
                   .alias("covered_bp")))
    j = a.join(
        res,
        F.col(on).eqNullSafe(F.col("_on"))
        & s.eqNullSafe(F.col("_as")) & e.eqNullSafe(F.col("_ae")),
        "left")
    frac = (F.col("covered_bp").cast("double")
            / F.greatest(e - s, F.lit(1)).cast("double"))
    return j.select(
        *[a[c] for c in a.columns],
        F.coalesce("n_overlaps", F.lit(0)).cast("long").alias("n_overlaps"),
        F.coalesce("covered_bp", F.lit(0)).cast("long").alias("covered_bp"),
        F.round(frac, 6).alias("frac"))


def map_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, value_col: str,
    ops: tuple[str, ...] = ("count", "sum", "mean", "min", "max"),
    on: str = "chrom", a_start: str = "start", a_end: str = "end",
    b_start: str = "start", b_end: str = "end",
) -> DataFrame:
    """bedtools-map: aggregate ``b``'s ``value_col`` over each ``a``
    interval (features overlapping it). Output: ``a``'s columns +
    ``map_<op>`` per requested op; intervals touching nothing report
    count 0 and null aggregates (bedtools prints '.'). Same
    values-keyed design as `coverage_intervals` — metrics computed once
    per DISTINCT (chrom, start, end) and equi-joined back, duplicate
    rows free, retry-deterministic. One binned overlap join + one
    partial-agg groupBy."""
    from oxbow_spark.operators.interval_join import overlap_join

    agg_fns = {"count": lambda c: F.count(F.lit(1)),
               "sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
               "median": lambda c: F.median(c)}
    bad = [o for o in ops if o not in agg_fns]
    if bad:
        raise ValueError(f"unknown map ops {bad}")
    s = F.col(a_start).cast("long")
    e = F.col(a_end).cast("long")
    keys = a.select(F.col(on).alias("_on"), s.alias("_as"),
                    e.alias("_ae")).distinct()
    raw = b.select(F.col(on).alias("_on"),
                   F.col(b_start).cast("long").alias("_bs"),
                   F.col(b_end).cast("long").alias("_be"),
                   F.col(value_col).alias("_v"))
    aggs = [agg_fns[o](F.col("_v")).alias(f"map_{o}") for o in ops]
    m = (overlap_join(keys, raw, bin_size=bin_size, on="_on",
                      left_start="_as", left_end="_ae",
                      right_start="_bs", right_end="_be")
         .groupBy("_on", "_as", "_ae").agg(*aggs))
    j = a.join(
        m,
        F.col(on).eqNullSafe(F.col("_on"))
        & s.eqNullSafe(F.col("_as")) & e.eqNullSafe(F.col("_ae")),
        "left")
    out = [a[c] for c in a.columns]
    for o in ops:
        c = F.col(f"map_{o}")
        if o == "count":
            c = F.coalesce(c, F.lit(0)).cast("long")
        out.append(c.alias(f"map_{o}"))
    return j.select(*out)


_SIZES_LITERAL_MAX = 64
_NO_SIZE = 1 << 62


def _with_size(df: DataFrame, on: str,
               sizes: dict[str, int] | None):
    """(df', size_expr): the chrom-size lookup for the clamp family.
    Small tables (≤ `_SIZES_LITERAL_MAX` contigs — every real
    chrom.sizes of a finished genome) inline as a literal WHEN-chain:
    zero extra plan nodes, pure Project preserved. Above that — 10⁵-
    contig scaffold assemblies, where a 10⁵-branch CASE bloats the plan
    and codegen — the sizes broadcast-join in (the same pattern
    `complement_intervals` uses) and the lookup is one column ref.
    Chroms absent from ``sizes`` clamp against an unbounded sentinel
    either way, so both paths are value-identical."""
    if sizes is None:
        return df, F.lit(_NO_SIZE)
    if len(sizes) <= _SIZES_LITERAL_MAX:
        return df, F.coalesce(
            *[F.when(F.col(on) == k, F.lit(int(v)))
              for k, v in sizes.items()],
            F.lit(_NO_SIZE))
    sz = df.sparkSession.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"`{on}` string, `__size` long")
    return (df.join(F.broadcast(sz), on, "left"),
            F.coalesce(F.col("__size"), F.lit(_NO_SIZE)))


def slop_intervals(
    df: DataFrame, left: int, right: int | None = None, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """bedtools-slop: widen each interval by ``left``/``right`` bp
    (``right`` defaults to ``left``), clamped to [0, chrom size) when a
    ``sizes`` dict is given (literal map for real chrom.sizes, broadcast
    join above `_SIZES_LITERAL_MAX` contigs). Pure Project (+ the
    broadcast on the scaffold path)."""
    if right is None:
        right = left
    s = F.col(start_col).cast("long") - left
    e = F.col(end_col).cast("long") + right
    s = F.greatest(s, F.lit(0))
    src, sz = _with_size(df, on, sizes)
    if sizes is not None:
        e = F.least(e, sz)
    cols = [F.col(c) for c in df.columns if c not in (start_col, end_col)]
    return src.select(*cols, s.alias(start_col),
                      F.greatest(e, s).alias(end_col))


def shift_intervals(
    df: DataFrame, amount: int, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """bedtools-shift: translate intervals by ``amount`` bp (negative =
    left). bedtools clamps coordinates at the chromosome bounds —
    intervals SHRINK at an edge rather than backing off (start pinned to
    [0, size-1], end to [start+1, size], so at least 1 bp survives).
    Pure Project (+ a broadcast sizes join on the scaffold path)."""
    s = F.col(start_col).cast("long") + amount
    e = F.col(end_col).cast("long") + amount
    src, sz = _with_size(df, on, sizes)
    s2 = F.least(F.greatest(s, F.lit(0)), sz - 1)
    e2 = F.least(F.greatest(e, s2 + 1), sz)
    cols = [F.col(c) for c in df.columns if c not in (start_col, end_col)]
    return src.select(*cols, s2.alias(start_col), e2.alias(end_col))


def flank_intervals(
    df: DataFrame, left: int, right: int | None = None, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """bedtools-flank: emit the LEFT and RIGHT flanking intervals of
    each input (side-tagged), clamped to [0, size); zero-width flanks
    (at a chrom edge) are dropped, like bedtools. Project + one explode
    (+ a broadcast sizes join on the scaffold path)."""
    if right is None:
        right = left
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    lf = F.struct(F.lit("L").alias("side"),
                  F.greatest(s - left, F.lit(0)).alias("fs"),
                  s.alias("fe"))
    src, sz = _with_size(df, on, sizes)
    rf = F.struct(F.lit("R").alias("side"), e.alias("fs"),
                  F.least(e + right, sz).alias("fe"))
    cols = [F.col(c) for c in df.columns if c not in (start_col, end_col)]
    x = src.select(*cols, F.explode(F.array(lf, rf)).alias("_f"))
    return (x.where(F.col("_f.fe") > F.col("_f.fs"))
            .select(*[F.col(c) for c in df.columns
                      if c not in (start_col, end_col)],
                    F.col("_f.side").alias("side"),
                    F.col("_f.fs").alias(start_col),
                    F.col("_f.fe").alias(end_col)))


def jaccard_intervals(
    a: DataFrame, b: DataFrame, bin_size: int, on: str = "chrom",
    a_start: str = "start", a_end: str = "end",
    b_start: str = "start", b_end: str = "end",
) -> DataFrame:
    """bedtools-jaccard: one row — ``intersection_bp`` (bases shared by
    the merged unions of ``a`` and ``b``), ``union_bp``
    (len(A) + len(B) − intersection, both merged), ``jaccard``
    (their ratio; 0.0 when both sets are empty) and
    ``n_intersections`` (number of intersection blocks — merged inputs
    are disjoint, so the pair count IS the block count; bedtools'
    fourth column).

    Plan: two merge passes, ONE binned overlap join between the merged
    (disjoint) block sets, then three single-row partial aggs combined
    by 1×1 cross joins — no corpus-sized shuffle beyond the merges.
    The division is exact-reproducible: both operands are longs, so the
    double quotient is the same IEEE value in any engine."""
    am = merge_intervals(a, on=on, start_col=a_start, end_col=a_end) \
        .select(F.col(on).alias("_on"), F.col(a_start).alias("_as"),
                F.col(a_end).alias("_ae"))
    bm = merge_intervals(b, on=on, start_col=b_start, end_col=b_end) \
        .select(F.col(on).alias("_on"), F.col(b_start).alias("_bs"),
                F.col(b_end).alias("_be"))
    inter = overlap_join(
        am, bm, bin_size=bin_size, on="_on",
        left_start="_as", left_end="_ae",
        right_start="_bs", right_end="_be",
    ).agg(
        F.coalesce(F.sum(F.least(F.col("_ae"), F.col("_be"))
                         - F.greatest(F.col("_as"), F.col("_bs"))),
                   F.lit(0)).cast("long").alias("intersection_bp"),
        F.count(F.lit(1)).cast("long").alias("n_intersections"),
    )
    la = am.agg(F.coalesce(F.sum(F.col("_ae") - F.col("_as")),
                           F.lit(0)).cast("long").alias("_abp"))
    lb = bm.agg(F.coalesce(F.sum(F.col("_be") - F.col("_bs")),
                           F.lit(0)).cast("long").alias("_bbp"))
    u = (F.col("_abp") + F.col("_bbp") - F.col("intersection_bp"))
    return (
        inter.crossJoin(F.broadcast(la)).crossJoin(F.broadcast(lb))
        .select(
            "intersection_bp",
            u.alias("union_bp"),
            F.when(u > 0, F.col("intersection_bp").cast("double")
                   / u.cast("double"))
            .otherwise(F.lit(0.0)).alias("jaccard"),
            "n_intersections",
        ))


def _lead_segments(pts: DataFrame, on: str,
                   split_bp: int | None) -> DataFrame:
    """Boundary points ``(on, _p)`` → elementary segments ``(on, _ss,
    _se)`` via a lead window. Plain path: one per-key window.
    ``split_bp`` (the `merge_intervals` chunked discipline): the lead
    window keys on (key, floor(_p/split_bp)) so no task holds more
    than one chunk's boundaries; each chunk's last segment closes at
    the NEXT chunk's first boundary, supplied by a tiny per-chunk
    summary frame (one row per non-empty chunk) joined back
    co-partitioned on (key, chunk). Bit-identical to the plain path
    (property-tested)."""
    if split_bp is None:
        w = Window.partitionBy(on).orderBy("_p")
        return pts.select(F.col(on), F.col("_p").alias("_ss"),
                          F.lead("_p").over(w).alias("_se")) \
            .where(F.col("_se").isNotNull())
    bp = int(split_bp)
    if bp <= 0:
        raise ValueError("split_bp must be positive")
    chunked = pts.withColumn("_k", F.floor(F.col("_p") / bp))
    wk = Window.partitionBy(on, "_k").orderBy("_p")
    per = chunked.select(F.col(on), "_k", "_p",
                         F.lead("_p").over(wk).alias("_np"))
    summ = chunked.groupBy(on, "_k").agg(F.min("_p").alias("_first"))
    ws = Window.partitionBy(on).orderBy("_k")
    offs = summ.select(F.col(on), "_k",
                       F.lead("_first").over(ws).alias("_nf"))
    return (per.join(offs, [on, "_k"])
            .select(F.col(on), F.col("_p").alias("_ss"),
                    F.coalesce("_np", "_nf").alias("_se"))
            .where(F.col("_se").isNotNull()))


def multiinter_intervals(
    sets: dict[str, DataFrame], bin_size: int, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    split_bp: int | None = None,
) -> DataFrame:
    """bedtools-multiinter: partition each key's axis into the
    elementary segments induced by EVERY boundary of every input set,
    and report, per covered segment, how many sets cover it and which
    (``n_sets``, ``set_list`` — comma-joined, label-sorted). Adjacent
    segments with identical coverage stay split (bedtools emits a
    record per transition point, not a merged run).

    Plan: per-(label, key) merge (one window pass over the tagged
    union), boundary points → lead-window segments (per-key window —
    same scale profile as `merge_intervals`), then ONE binned overlap
    join of segments vs merged blocks. Merged blocks are disjoint per
    label and segments are elementary (no block boundary strictly
    inside one), so each (segment, label) pair appears at most once —
    the final groupBy is a pure partial-agg count/collect.
    ``split_bp`` chunks the boundary lead window on (key, chunk) for
    single-contig skew (see `_lead_segments`); it does not change the
    result."""
    if not sets:
        raise ValueError("multiinter needs at least one labelled set")
    lab = None
    for label, df in sets.items():
        part = df.select(
            F.lit(str(label)).alias("_lab"), F.col(on),
            F.col(start_col).cast("long").alias("_s"),
            F.col(end_col).cast("long").alias("_e"))
        lab = part if lab is None else lab.unionByName(part)
    merged = _merge_runs(lab.withColumn("_w", F.lit(1).cast("long")),
                         ["_lab", on], "_ms", "_me") \
        .select("_lab", F.col(on), "_ms", "_me")
    pts = merged.select(
        F.col(on), F.explode(F.array("_ms", "_me")).alias("_p")).distinct()
    seg = _lead_segments(pts, on, split_bp)
    cov = overlap_join(
        seg.withColumnRenamed(on, "_on"),
        merged.withColumnRenamed(on, "_on"),
        bin_size=bin_size, on="_on",
        left_start="_ss", left_end="_se",
        right_start="_ms", right_end="_me",
    )
    return (cov.groupBy("_on", "_ss", "_se")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sets"),
                 F.array_join(F.array_sort(F.collect_list("_lab")), ",")
                 .alias("set_list"))
            .select(F.col("_on").alias(on), F.col("_ss").alias(start_col),
                    F.col("_se").alias(end_col), "n_sets", "set_list"))


def window_intervals(
    a: DataFrame, b: DataFrame, bin_size: int,
    left: int, right: int | None = None, on: str = "chrom",
    a_start: str = "start", a_end: str = "end",
    b_start: str = "b_start", b_end: str = "b_end",
) -> DataFrame:
    """bedtools-window: report every (a, b) pair where ``b`` overlaps
    ``a`` widened by ``left``/``right`` bp (``right`` defaults to
    ``left``); output carries BOTH rows' columns with ``a``'s ORIGINAL
    coordinates (the widening is only the match predicate, clamped at 0
    like bedtools). One binned overlap join over the widened bounds —
    the bin explosion pays for the extra window width, nothing else
    changes versus `overlap_join`."""
    if right is None:
        right = left
    wa = a.withColumn(
        "_ws", F.greatest(F.col(a_start).cast("long") - left, F.lit(0))
    ).withColumn("_we", F.col(a_end).cast("long") + right)
    j = overlap_join(
        wa, b, bin_size=bin_size, on=on,
        left_start="_ws", left_end="_we",
        right_start=b_start, right_end=b_end,
    )
    return j.drop("_ws", "_we")


def cluster_intervals(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    distance: int = 0, split_bp: int | None = None,
) -> DataFrame:
    """bedtools-cluster: every input row plus a ``cluster_id`` (1-based,
    increasing in (key asc, start asc) order — what bedtools assigns
    over sorted input). Intervals overlapping or within ``distance`` bp
    (bookends included, like `merge_intervals`) share an id.

    Plan shape (never a global sort of the corpus): the cluster SPANS
    are `merge_intervals`' disjoint runs (``split_bp`` engages its
    chunked window for single-contig skew). Numbering is a prefix-sum:
    plain path = one per-key window over RUNS + a TINY per-key offset
    frame; under ``split_bp`` the row_number itself keys on (key,
    chunk) — runs are ≤ inputs but NOT ≪ when nothing merges (sparse
    corpora), so the numbering window would otherwise be the next
    single-reducer — with per-(key, chunk) count offsets accumulated
    by a small window over O(range/split_bp) rows. Inputs map to
    their containing run with one backward as-of join on start
    (chunked too) — valid because runs are disjoint and every input
    lies wholly inside one run. Reference capability: post-scan
    interval clustering the reference's users run via bedtools; its
    own engine has no interval ops
    (py-oxbow/oxbow/_pyarrow.py:738-774)."""
    runs = merge_intervals(df, on=on, start_col=start_col,
                           end_col=end_col, split_bp=split_bp,
                           distance=distance)
    if split_bp is None:
        wk = Window.partitionBy(on).orderBy(start_col)
        idx = runs.select(F.col(on), F.col(start_col).alias("_rs"),
                          F.row_number().over(wk).alias("_i"))
        counts = runs.groupBy(on).agg(F.count(F.lit(1)).alias("_n"))
        wo = Window.orderBy(on).rowsBetween(Window.unboundedPreceding, -1)
        # one row per key — driver-size; the window over it is trivial
        offs = counts.select(
            F.col(on),
            F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"))
        numbered = idx.join(F.broadcast(offs), on).select(
            F.col(on), F.col("_rs").alias("_v"),
            (F.col("_i") + F.col("_off")).cast("long").alias("cluster_id"))
    else:
        bp = int(split_bp)
        ch = runs.withColumn("_k", F.floor(F.col(start_col) / bp))
        wk = Window.partitionBy(on, "_k").orderBy(start_col)
        idx = ch.select(F.col(on), "_k", F.col(start_col).alias("_rs"),
                        F.row_number().over(wk).alias("_i"))
        # per-(key, chunk) run counts -> cumulative offsets in global
        # (key, chunk) order; one small window over O(range/split_bp)
        # rows per key ordered across keys, never corpus-sized
        counts = ch.groupBy(on, "_k").agg(F.count(F.lit(1)).alias("_n"))
        wo = Window.orderBy(on, "_k") \
            .rowsBetween(Window.unboundedPreceding, -1)
        offs = counts.select(
            F.col(on), "_k",
            F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"))
        numbered = idx.join(F.broadcast(offs), [on, "_k"]).select(
            F.col(on), F.col("_rs").alias("_v"),
            (F.col("_i") + F.col("_off")).cast("long").alias("cluster_id"))
    # explicit stitch choice: `numbered` is a window+join derivative —
    # the default estimator would re-run it at plan time; the input
    # frame's (key, start-range) shape bounds the same carry count in
    # one column-pruned pass
    bcarry = (estimate_broadcast_carry([(df, [on], [start_col])],
                                       split_bp)
              if split_bp is not None else None)
    return asof_join(
        df.withColumn("_v", F.col(start_col).cast("long")),
        numbered, on="_v", by=on, right_cols=["cluster_id"],
        direction="backward", split_on=split_bp,
        broadcast_carry=bcarry,
    ).drop("_v")


def make_windows(
    spark, sizes: dict[str, int], window: int, step: int | None = None,
    on: str = "chrom", start_col: str = "start", end_col: str = "end",
    fanout_bp: int = 1 << 22,
) -> DataFrame:
    """bedtools-makewindows: tile each key's [0, size) with
    ``window``-bp windows every ``step`` bp (default: non-overlapping),
    the last window truncated at the key length; ``win_id`` is the
    1-based window ordinal per key (bedtools ``-i winnum``).

    Plan shape: the sizes dict is a driver-size dim. A single-row
    explode of a 3 Gbp chromosome into 3M windows would pin one task,
    so generation is TWO-LEVEL: explode keys into ``fanout_bp`` blocks
    (tiny frame, one row per block), repartition on (key, block) to
    spread them, then explode windows within each block — parallelism
    scales with genome size, no shuffle beyond the block-frame one."""
    st = int(window if step is None else step)
    if st <= 0 or window <= 0:
        raise ValueError("window and step must be positive")
    fb = max(int(fanout_bp) // st * st, st)  # block edge on a step grid
    sz = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"`{on}` string, `_len` long").where(F.col("_len") > 0)
    blocks = sz.select(
        F.col(on), "_len",
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.floor((F.col("_len") - 1) / fb).cast("long"))).alias("_blk"),
    ).repartition(F.col(on), F.col("_blk"))
    first = F.col("_blk") * (fb // st)
    last = F.least(
        F.floor((F.col("_len") - 1) / st),
        (F.col("_blk") + 1) * (fb // st) - 1,
    ).cast("long")
    wins = blocks.select(
        F.col(on), "_len",
        F.explode(F.sequence(first, last)).alias("_w"))
    return wins.select(
        F.col(on),
        (F.col("_w") * st).cast("long").alias(start_col),
        F.least(F.col("_w") * st + window, F.col("_len"))
        .cast("long").alias(end_col),
        (F.col("_w") + 1).cast("long").alias("win_id"),
    )


def spacing_intervals(
    df: DataFrame, on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    split_bp: int | None = None,
) -> DataFrame:
    """bedtools-spacing: each interval plus the gap to the PREVIOUS
    interval in (key, start, end) sort order — null for the first
    interval of a key, 0 for bookended or overlapping neighbours
    (bedtools prints "." and 0 there). One per-key lag window;
    ``split_bp`` chunks it on (key, floor(start/split_bp)) with a tiny
    per-chunk last-(start, end) summary supplying each chunk's
    carry-in through ONE broadcast stitch join — the `merge_intervals`
    discipline, so a single hot contig never pins one window task.
    Bit-identical to the plain path (property-tested)."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    if split_bp is None:
        w = Window.partitionBy(on).orderBy(start_col, end_col)
        prev_end = F.lag(e).over(w)
        return df.withColumn(
            "spacing",
            F.when(prev_end.isNull(), F.lit(None).cast("long"))
            .otherwise(F.greatest(s - prev_end, F.lit(0).cast("long"))))
    bp = int(split_bp)
    if bp <= 0:
        raise ValueError("split_bp must be positive")
    ch = df.withColumn("_k", F.floor(s / bp))
    wk = Window.partitionBy(on, "_k").orderBy(start_col, end_col)
    local = ch.withColumn("_pe", F.lag(e).over(wk))
    # one row per non-empty (key, chunk): its LAST interval's end in
    # (start, end) order — struct max keyed on (start, end)
    summ = ch.groupBy(on, "_k").agg(
        F.max(F.struct(s.alias("_s"), e.alias("_e"))).alias("_last"))
    ws = Window.partitionBy(on).orderBy("_k") \
        .rowsBetween(Window.unboundedPreceding, -1)
    carry = summ.select(
        F.col(on), "_k",
        F.last("_last", ignorenulls=True).over(ws)["_e"].alias("_ce"))
    prev_end = F.coalesce(F.col("_pe"), F.col("_ce"))
    return (local.join(F.broadcast(carry), [on, "_k"])
            .withColumn(
                "spacing",
                F.when(prev_end.isNull(), F.lit(None).cast("long"))
                .otherwise(F.greatest(s - prev_end,
                                      F.lit(0).cast("long"))))
            .drop("_k", "_pe", "_ce"))


def reldist_intervals(
    a: DataFrame, b: DataFrame, on: str = "chrom",
    a_start: str = "start", a_end: str = "end",
    b_start: str = "start", b_end: str = "end",
    raw: bool = False, split_bp: int | None = None,
) -> DataFrame:
    """bedtools-reldist (Favorov et al. 2012): how the ``a`` intervals
    distribute relative to the ``b`` landmarks — for each ``a``
    midpoint strictly between two consecutive ``b`` midpoints, the
    relative distance ``min(d_prev, d_next) / gap`` (∈ [0, 0.5];
    uniform placement ⇒ flat histogram). Output: per 0.01-wide bin
    ``(reldist, count, total, frac)``; ``raw=True`` returns the per-a
    row frame instead. ``a`` midpoints outside the ``b`` envelope are
    skipped (both flanks required, bedtools' convention); a midpoint
    EQUAL to a ``b`` midpoint scores 0.0.

    Plan shape: distinct ``b`` midpoints (duplicates cannot change
    nearest distances), one backward + one forward as-of join (each a
    single keyed merge-sort shuffle, `operators/asof.py`), then a
    30-ish-row histogram agg with map-side partials and a broadcast
    1×1 total. No all-pairs, no per-key full sort beyond the as-of
    windows; ``split_bp`` chunks those windows on (chrom, chunk) for
    single-contig skew (asof_join's split_on, bit-identical)."""
    amid = a.select(
        F.col(on),
        F.floor((F.col(a_start).cast("long") + F.col(a_end).cast("long"))
                / 2).cast("long").alias("_v"))
    bmid_raw = b.select(
        F.col(on),
        F.floor((F.col(b_start).cast("long") + F.col(b_end).cast("long"))
                / 2).cast("long").alias("_v"))
    bmid = bmid_raw.distinct()
    # one cheap-projection estimate shared by both as-of calls — the
    # second call's left (`prev`) is itself an as-of output, which the
    # default estimator would re-execute wholesale at plan time
    bcarry = (estimate_broadcast_carry(
        [(amid, [on], ["_v"]), (bmid_raw, [on], ["_v"])], split_bp)
        if split_bp is not None else None)
    prev = asof_join(
        amid, bmid.withColumn("_pm", F.col("_v")), on="_v", by=on,
        right_cols=["_pm"], direction="backward", split_on=split_bp,
        broadcast_carry=bcarry)
    both = asof_join(
        prev, bmid.withColumn("_nm", F.col("_v")), on="_v", by=on,
        right_cols=["_nm"], direction="forward", split_on=split_bp,
        broadcast_carry=bcarry)
    scored = both.where(
        F.col("_pm").isNotNull() & F.col("_nm").isNotNull()).select(
        F.col(on),
        F.when(F.col("_nm") == F.col("_pm"), F.lit(0.0)).otherwise(
            F.least(F.col("_v") - F.col("_pm"), F.col("_nm") - F.col("_v"))
            .cast("double") / (F.col("_nm") - F.col("_pm")).cast("double")
        ).alias("reldist"))
    if raw:
        return scored
    binned = scored.select(
        (F.floor(F.col("reldist") * 100) / F.lit(100.0)).alias("reldist"))
    hist = binned.groupBy("reldist").agg(
        F.count(F.lit(1)).cast("long").alias("count"))
    tot = hist.agg(F.sum("count").cast("long").alias("total"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "reldist", "count", "total",
        (F.col("count").cast("double") / F.col("total").cast("double"))
        .alias("frac"))


def shuffle_intervals(
    df: DataFrame, sizes: dict[str, int], on: str = "chrom",
    start_col: str = "start", end_col: str = "end",
    seed: str = "", id_col: str | None = None,
) -> DataFrame:
    """bedtools-shuffle ``-chrom`` mode: every interval keeps its key
    and LENGTH but moves to a deterministic pseudo-random start,
    uniform over [0, size − len] — the permutation-test null model fed
    to `jaccard_intervals` / `reldist_intervals`. The "RNG" is the
    first 15 md5 hex digits of (seed ‖ key ‖ start ‖ end ‖ id) modulo
    the placement range: a pure per-row expression — no shuffle, no
    UDF, engine-portable, stable under repartitioning and reruns
    (pass ``id_col`` to decorrelate identical rows). Intervals longer
    than their key's size pin to start 0 (bedtools errors there;
    pinning keeps the operator total); keys absent from ``sizes``
    are dropped, like bedtools with a genome file."""
    spark = df.sparkSession
    sz = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(sizes.items())],
        f"`{on}` string, `_size` long")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    ln = (e - s).alias("_len")
    parts = [F.lit(seed), F.col(on), F.lit(":"), s.cast("string"),
             F.lit("-"), e.cast("string")]
    if id_col is not None:
        parts += [F.lit("#"), F.col(id_col).cast("string")]
    h = F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10) \
        .cast("long")
    base = df.join(F.broadcast(sz), on).withColumn("_len", e - s)
    room = F.col("_size") - F.col("_len")
    ns = F.when(room > 0, h % (room + 1)) \
        .otherwise(F.lit(0)).cast("long")
    keep = [c for c in df.columns if c not in (start_col, end_col)]
    return base.select(
        *keep, ns.alias(start_col), (ns + F.col("_len")).alias(end_col))


def annotate_intervals(
    a: DataFrame, sets: dict[str, DataFrame], bin_size: int,
    on: str = "chrom", start_col: str = "start", end_col: str = "end",
    counts: bool = False,
) -> DataFrame:
    """bedtools-annotate: every ``a`` row plus, per labelled feature
    set, the FRACTION of the interval covered by that set's merged
    union (``<label>_frac``; ``counts=True`` adds bedtools ``-counts``
    ``<label>_n`` overlap counts). Intervals touching nothing in a set
    report 0.0 / 0.

    Plan: one `coverage_intervals` pass per set — each is two binned
    equi-joins + partial aggs over the DISTINCT interval key — joined
    back on (key, start, end); cost is Σ per-set coverage passes,
    never a cartesian, and the a-frame's own columns ride through
    untouched."""
    out = a
    keys = [on, start_col, end_col]
    for label, b in sets.items():
        cov = coverage_intervals(
            a.select(*keys).distinct(), b, bin_size=bin_size, on=on,
            a_start=start_col, a_end=end_col)
        cols = [F.col(on), F.col(start_col), F.col(end_col),
                F.col("frac").alias(f"{label}_frac")]
        if counts:
            cols.append(F.col("n_overlaps").alias(f"{label}_n"))
        out = out.join(cov.select(*cols), keys, "left")
        fills = {f"{label}_frac": 0.0}
        if counts:
            fills[f"{label}_n"] = 0
        out = out.fillna(fills)
    return out
