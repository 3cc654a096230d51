"""Local mirror of the driver's t2 correctness gate: run every registry
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from oxbow_spark.queries.registry import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize(
    "q", [q for q in QUERIES if q.sql is not None], ids=lambda q: q.name
)
def test_query_matches_oracle(q, spark, sf_dir):
    # callable SQL builders take oracle-data-derived literals from sf_dir
    sql = q.sql(sf_dir) if callable(q.sql) else q.sql
    if sql is None:
        pytest.skip(f"{q.name}: no oracle data at {sf_dir}")
    sdf = q.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{q.name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{q.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a, b = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{q.name}: first mismatching rows {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_registry_fits_driver_window():
    """The driver externally verifies only the first 50 registry rows.
    Every row must therefore sit inside that window — VERDICT r4 found
    20 of 70 rows driver-unverified. Consolidate (union/join twin rows)
    before adding a 51st row; the benchmark set is separate
    (BENCH_QUERIES) and unconstrained."""
    from oxbow_spark.queries.registry import BENCH_QUERIES

    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} registry rows exceed the driver's 50-row "
        "verification window — consolidate twins instead of appending"
    )
    names = [q.name for q in QUERIES]
    assert len(set(names)) == len(names)
    # bench rows must reference callables that exist (name continuity)
    assert all(callable(q.fn) for q in BENCH_QUERIES)


def test_bench_names_stable():
    """BENCH_QUERIES keeps the r1-r4 benchmark row names so
    BENCH_r{N}.json stays comparable round over round."""
    from oxbow_spark.queries.registry import BENCH_QUERIES

    assert [q.name for q in BENCH_QUERIES] == [
        "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
        "q14_promo_revenue", "range_filter_events", "window_dedup_best",
        "zoom_binned_agg", "interval_overlap_join", "dedup_minhash_docs",
        "dedup_simhash_docs", "text_stats_docs", "repetition_docs",
        "bm25_topk_docs", "sim_topk_cosine", "sim_topk_lsh",
        "sessionize_events", "mm_decode_image_docs",
        # round-9 additions (new rows only — the r1-r4 names above keep
        # their positions so BENCH_r{N}.json stays comparable)
        "semdedup_proto_docs", "sim_topk_pq",
    ]


def test_pq_fit_cache_evicts_other_sessions(spark, sf_dir, monkeypatch):
    """_PQ_FIT_CACHE evicts only entries whose owning session's context
    is STOPPED (ADVICE r13): a long-lived process creating many
    sessions must not accumulate dead plan tuples (which transitively
    pin their stopped sessions) — but two concurrently LIVE sessions in
    one process must not thrash each other's fits."""
    from oxbow_spark.queries import registry

    class _FakeSC:
        _jsc = object()  # non-None => live

    class _FakeSession:
        def __init__(self, live):
            self._sc = _FakeSC() if live else None

    monkeypatch.setattr(registry.similarity, "pq_fit",
                        lambda *a, **k: "cb")
    monkeypatch.setattr(registry.similarity, "ivf_fit",
                        lambda *a, **k: "cents")
    saved = dict(registry._PQ_FIT_CACHE)
    try:
        registry._PQ_FIT_CACHE.clear()
        registry._PQ_FIT_CACHE[("dead-app-1", "sfX")] = (
            "x", "y", 8, _FakeSession(live=False))
        registry._PQ_FIT_CACHE[("live-app-2", "sfY")] = (
            "x", "y", 8, _FakeSession(live=True))
        got = registry._pq_models(spark, sf_dir)
        assert got[:2] == ("cb", "cents") and got[2] >= registry._IVF_NLIST
        appid = spark.sparkContext.applicationId
        # the dead session's entry is gone; the live one survives
        assert set(k[0] for k in registry._PQ_FIT_CACHE) == {
            appid, "live-app-2"}
        # second lookup: memo hit, no refit
        monkeypatch.setattr(registry.similarity, "pq_fit",
                            lambda *a, **k: 1 / 0)
        assert registry._pq_models(spark, sf_dir) == got
    finally:
        registry._PQ_FIT_CACHE.clear()
        registry._PQ_FIT_CACHE.update(saved)


def test_shared_sim_frame_memoized_and_repersisted(spark, sf_dir):
    """ADVICE r14 (low): the embedding-curation rows used to .persist()
    a fresh _cluster_sim_frame per invocation and never unpersist —
    repeated callers outside the bench harness accumulated cached plans
    without bound. The memo must return ONE frame per (session, sf,
    variant), and re-persist a hit whose cache registration was dropped
    by clearCache (the bench's inter-trial hygiene)."""
    from oxbow_spark.operators import similarity
    from oxbow_spark.queries import registry

    emb = registry._t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_fit(
        emb, nlist=registry._IVF_NLIST, max_iter=registry._IVF_MAXITER,
        order_col="vec_id")
    saved = dict(registry._SIM_FRAME_CACHE)
    try:
        registry._SIM_FRAME_CACHE.clear()
        f1 = registry._shared_sim_frame(spark, sf_dir, "t", emb, cents)
        f2 = registry._shared_sim_frame(spark, sf_dir, "t", emb, cents)
        assert f1 is f2  # memo hit — not a new persisted frame per call
        assert f1.storageLevel.useMemory
        spark.catalog.clearCache()
        sl = f1.storageLevel
        assert not (sl.useMemory or sl.useDisk or sl.useOffHeap)
        f3 = registry._shared_sim_frame(spark, sf_dir, "t", emb, cents)
        assert f3 is f1 and f3.storageLevel.useMemory
    finally:
        spark.catalog.clearCache()
        registry._SIM_FRAME_CACHE.clear()
        registry._SIM_FRAME_CACHE.update(saved)


def test_sim_topk_pq_steady_state_is_scan_only(spark, sf_dir, monkeypatch):
    """Post-warmup sim_topk_pq trials run ZERO fit/count jobs and a
    constant job count (VERDICT r13 #1: the bench row must time the
    JVM ADC scan — a refit or count hiding in a timed trial is exactly
    the delta the r13 driver bench could not adjudicate)."""
    from oxbow_spark.queries import registry

    sc = spark.sparkContext

    def run(tag: str) -> int:
        sc.setJobGroup(tag, "pq steady state")
        try:
            registry.sim_topk_pq(spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    run("pq-warmup")  # populates (or hits) the per-(session, sf) memo
    # poison fit entry points: a steady-state trial touching them (a
    # cache miss re-running count+fit) fails loudly, not silently slow
    monkeypatch.setattr(registry.similarity, "pq_fit",
                        lambda *a, **k: 1 / 0)
    monkeypatch.setattr(registry.similarity, "ivf_fit",
                        lambda *a, **k: 1 / 0)
    j1, j2 = run("pq-steady-1"), run("pq-steady-2")
    assert j1 == j2, f"steady-state job counts vary: {j1} != {j2}"


def test_nlist_scales_with_corpus():
    """The semdedup/PQ coarse quantizer targets a bounded in-cluster
    population (round-13 decade: fixed nlist measured x98 for x10 data
    on the sum-of-cluster-squares pair stage). Driver SFs stay at the
    floor so oracle/bench comparability never moves."""
    from oxbow_spark.queries.registry import (
        _IVF_NLIST, _IVF_TARGET_CLUSTER_ROWS, _nlist_for)

    assert _nlist_for(500) == _IVF_NLIST      # sf0.001 / sf0.01
    assert _nlist_for(2000) == _IVF_NLIST     # sf0.1
    assert _nlist_for(20000) == 20000 // _IVF_TARGET_CLUSTER_ROWS  # sf1
    assert _nlist_for(0) == _IVF_NLIST
