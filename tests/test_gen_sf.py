"""tools/gen_sf.py — the scale-decade generator must reproduce the
driver tables' exact schemas and row counts at the driver's own SFs,
deterministically, so decade ratios measured on its output transfer to
the driver's data model."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def gen(spark, tmp_path_factory):
    import gen_sf

    out = str(tmp_path_factory.mktemp("gen_sf") / "sf0.001")
    gen_sf.generate(spark, 0.001, out)
    return out


def test_schemas_and_counts_match_driver(spark, gen):
    ref = "/root/testdata/sf0.001"
    for t in TABLES:
        a = spark.read.parquet(f"{ref}/{t}.parquet")
        b = spark.read.parquet(f"{gen}/{t}.parquet")
        sa = [(f.name, f.dataType.simpleString()) for f in a.schema.fields]
        sb = [(f.name, f.dataType.simpleString()) for f in b.schema.fields]
        assert sa == sb, t
        assert a.count() == b.count(), t


def test_deterministic_and_self_consistent(spark, gen):
    """Same seed → same bytes-level content (row multiset); FK ranges
    self-consistent (lineitem→orders→customer joins land); the planted
    near-dup fraction exists for the dedup verify stages."""
    import gen_sf
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{gen}/lineitem.parquet")
    od = spark.read.parquet(f"{gen}/orders.parquet")
    cu = spark.read.parquet(f"{gen}/customer.parquet")
    # regenerate one table: identical multiset
    li2 = gen_sf.gen_lineitem(spark, 0.001)
    assert li.exceptAll(li2).count() == 0 and li2.exceptAll(li).count() == 0
    # FKs resolve completely
    assert li.join(od, li.l_orderkey == od.o_orderkey, "left_anti") \
        .count() == 0
    assert od.join(cu, od.o_custkey == cu.c_custkey, "left_anti") \
        .count() == 0
    # near-dup plant: >=1% of docs share a 2nd-token-onward suffix
    docs = spark.read.parquet(f"{gen}/documents.parquet")
    tail = docs.select(F.substring_index("text", " ", -5).alias("t"))
    n = docs.count()
    n_dup = tail.groupBy("t").count().where(F.col("count") > 1) \
        .agg(F.sum("count")).first()[0] or 0
    assert n_dup >= 0.01 * n, (n_dup, n)
    # q5 prerequisites: ASIA exists and joins through nation
    reg = spark.read.parquet(f"{gen}/region.parquet")
    assert reg.where(F.col("r_name") == "ASIA").count() == 1


def test_embedding_geometry_matches_driver(spark, gen):
    """The generated embeddings must match the DRIVER's geometry —
    isotropic unit vectors, no label-cluster structure, (almost) no
    pairs over the near-dup threshold. The first generator shipped
    label-centered clusters (within-cluster cos ~0.85): 61% of
    in-cluster pairs cleared the 0.35 threshold vs the driver's 0.5%,
    so the r13 semdedup scale decade timed a corpus ~100× denser in
    qualifying pairs than the data model it extrapolates to."""
    import numpy as np

    rows = spark.read.parquet(f"{gen}/embeddings.parquet") \
        .select("embedding", "label").collect()
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    lab = np.asarray([r.label for r in rows])
    # unit norms, isotropic per-dim spread (driver: std == 1/sqrt(64))
    assert np.abs(np.linalg.norm(X, axis=1) - 1.0).max() < 1e-3
    assert abs(X.std() - 0.125) < 0.01
    D = X @ X.T
    iu = np.triu_indices(len(X), 1)
    cos = D[iu]
    # near-random pairwise geometry: no label signal, thin far tail
    same = (lab[:, None] == lab[None, :])[iu]
    assert abs(cos[same].mean() - cos[~same].mean()) < 0.02
    assert (cos >= 0.35).mean() < 0.02, (cos >= 0.35).mean()
    assert cos.max() < 0.85, cos.max()


def test_gen_sf_clump_variant(spark, tmp_path):
    """--clump f makes f of the embeddings EXACT duplicates of one unit
    vector (mass-duplicated content — the geometry that defeats the
    corpus-scaled quantizer and stresses the pair-stage nb cap +
    witness prune); the rest keep the isotropic default. Default
    clump=0 is untouched (geometry-parity test above)."""
    import numpy as np

    import gen_sf

    out = str(tmp_path / "sfclump")
    gen_sf.generate(spark, 0.001, out, tables=["embeddings"], clump=0.5)
    rows = spark.read.parquet(f"{out}/embeddings.parquet") \
        .select("embedding").collect()
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    vals, counts = np.unique(X, axis=0, return_counts=True)
    top = counts.max() / len(X)
    assert 0.4 < top < 0.6, top          # ~half the corpus is ONE vector
    assert (counts == 1).sum() >= 0.35 * len(X)  # the rest stays diverse
    assert np.abs(np.linalg.norm(X, axis=1) - 1.0).max() < 1e-3


def test_distribution_sensitive_queries_match_oracle_on_generated(
        spark, gen, monkeypatch):
    """Second-corpus oracle parity (round 13): the queries whose
    values depend on data DISTRIBUTIONS — not just schemas — must
    match DuckDB on gen_sf's corpus too. These four are exactly the
    ones the first generated-data sweep flagged (liftover keys on the
    event_type strings; dedup_embedding_cosine on near-threshold
    cosine ties; quality_bins on score tie-handling; stream_zoom on
    the single-file events layout); 0-mismatch here pins the
    generator's vocab/layout alignment with the driver."""
    import math

    import duckdb

    import __spark_entry__ as e
    from oxbow_spark.queries import registry

    monkeypatch.setattr(registry, "_ORACLE_SF_DIR", gen)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{gen}/{t}.parquet')")

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return v.isoformat() if hasattr(v, "isoformat") else v

    qs, osql = e.queries(), e.oracle_sql()
    for name in ("liftover_all_events", "dedup_embedding_cosine",
                 "quality_bins_quantile_docs", "stream_zoom_events"):
        sdf = qs[name](spark, gen)
        scols = sdf.columns
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        a = sorted(tuple(norm(r[i]) for i in order)
                   for r in (tuple(x) for x in sdf.collect()))
        res = con.execute(osql[name])
        dcols = [d[0] for d in res.description]
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        b = sorted(tuple(norm(r[i]) for i in dorder)
                   for r in res.fetchall())
        assert sorted(scols) == sorted(dcols), name
        assert a == b, (name, len(a), len(b))
        assert a, name  # non-degenerate: the query produced rows
