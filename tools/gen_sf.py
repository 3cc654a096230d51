"""Deterministic synthetic-table generator for scale-decade runs.

The driver ships read-only parquet at sf0.001/0.01/0.1; every 100 TB
claim in SCALE.md otherwise rests on plan shape plus sf0.1 timings.
This tool regenerates the same ten-table star schema at ARBITRARY
scale factor so a decade (sf0.1 → sf1) can be measured end-to-end with
one consistent generator on both sides of the ratio (VERDICT r12 item
2). Schemas match `/root/testdata` exactly (asserted by
tests/test_gen_sf.py); distributions mimic the driver's observed ones
(doc length ~N(60 tokens), 64-dim isotropic unit embeddings with an
uncorrelated label, 4 lineitem rows per order, 1995-2001 date
envelope).

Scale-model choices, made for RATIO fairness at constant per-key
density (documented because they differ from naive row duplication):

- events' TIME SPAN scales with sf (constant events/sec): a corpus 10×
  the size covers 10× the wall-clock, so interval-overlap output grows
  LINEARLY — duplicating rows into a fixed 30-day span would grow
  overlap pairs quadratically and measure the data model, not the plan.
- documents plants a ~5% near-duplicate fraction (template docs with a
  perturbed lead token) so the dedup verify stages carry proportional
  work at every sf — independent-random docs would give MinHash nothing
  to verify; 10× row duplication would explode each dup group to
  O(group²) pairs.
- everything is hash-generated column math (`xxhash64` streams, no
  Python rows, no driver data), so generation itself distributes and a
  1000-executor run could produce sf10000 the same way.

Usage: python tools/gen_sf.py --sf 1 --out /tmp/oxbow_scale/sf1
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SEED = 42
DAY_US = 86_400_000_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# MUST match the driver's values: the liftover chain net and several
# oracle twins key on these exact event_type strings (the round-13
# generated-data sweep caught a mismatched set as 12k "unmapped" rows)
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
VOCAB = ("batch part spark line column order small sort fast value scan "
         "a hash slow group agg filter query big key window row table "
         "stream merge data join shuffle stage task plan scale broadcast "
         "skew salt bucket codec page footer strip").split()

#: rows per table at sf=1 (sf0.1 reproduces the driver's counts)
BASE = dict(customer=150_000, supplier=10_000, part=200_000,
            orders=1_500_000, lineitem=6_000_000, events=1_000_000,
            documents=50_000, embeddings=20_000)


def _u(tag: int, *cols):
    """Deterministic uniform [0, 1) stream keyed by (tag, *cols)."""
    h = F.xxhash64(F.lit(SEED), F.lit(tag), *cols)
    return F.pmod(h, F.lit(1 << 40)).cast("double") / float(1 << 40)


def _pick(options: list[str], tag: int, *cols):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.floor(_u(tag, *cols) * len(options))
                              .cast("int") + 1))


def _ids(spark: SparkSession, n: int, name: str = "id") -> DataFrame:
    par = max(spark.sparkContext.defaultParallelism, 8)
    return spark.range(0, n, 1, par).withColumnRenamed("id", name)


def gen_region(spark, sf):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(REGIONS)],
        "r_regionkey int, r_name string")


def gen_nation(spark, sf):
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int")


def gen_customer(spark, sf):
    n = int(BASE["customer"] * sf)
    return _ids(spark, n).select(
        (F.col("id") + 1).alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.floor(_u(1, F.col("id")) * 25).cast("int").alias("c_nationkey"),
        F.round(_u(2, F.col("id")) * 10999.99 - 999.99, 2)
        .alias("c_acctbal"),
        _pick(SEGMENTS, 3, F.col("id")).alias("c_mktsegment"))


def gen_supplier(spark, sf):
    n = int(BASE["supplier"] * sf)
    return _ids(spark, n).select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.floor(_u(4, F.col("id")) * 25).cast("int").alias("s_nationkey"),
        F.round(_u(5, F.col("id")) * 10999.99 - 999.99, 2)
        .alias("s_acctbal"))


def gen_part(spark, sf):
    n = int(BASE["part"] * sf)
    return _ids(spark, n).select(
        (F.col("id") + 1).alias("p_partkey"),
        F.format_string("part %s %s",
                        _pick(VOCAB, 6, F.col("id")),
                        _pick(VOCAB, 7, F.col("id"))).alias("p_name"),
        F.format_string("Brand#%d",
                        F.floor(_u(8, F.col("id")) * 5).cast("int") + 1)
        .alias("p_brand"),
        F.format_string("PROMO %s", _pick(VOCAB, 9, F.col("id")))
        .alias("p_type"),
        (F.floor(_u(10, F.col("id")) * 50).cast("int") + 1).alias("p_size"),
        F.round(900 + _u(11, F.col("id")) * 1200, 2).alias("p_retailprice"))


def _ts_from_days(base: str, days_col):
    base_us = F.unix_timestamp(F.lit(base).cast("timestamp")) * 1_000_000
    # timestamp_ntz matches how Spark reads the driver's TIMESTAMP
    # columns (session TZ is UTC, so values are identical either way)
    return F.timestamp_micros(
        (base_us + days_col * F.lit(DAY_US)).cast("long")) \
        .cast("timestamp_ntz")


def gen_orders(spark, sf):
    n = int(BASE["orders"] * sf)
    ncust = int(BASE["customer"] * sf)
    return _ids(spark, n).select(
        (F.col("id") + 1).alias("o_orderkey"),
        (F.floor(_u(12, F.col("id")) * ncust).cast("long") + 1)
        .alias("o_custkey"),
        _pick(["O", "F", "P"], 13, F.col("id")).alias("o_orderstatus"),
        F.round(1000 + _u(14, F.col("id")) * 450_000, 2)
        .alias("o_totalprice"),
        _ts_from_days("1995-01-01",
                      F.floor(_u(15, F.col("id")) * 2404))
        .alias("o_orderdate"),
        _pick(PRIORITIES, 16, F.col("id")).alias("o_orderpriority"))


def gen_lineitem(spark, sf):
    n = int(BASE["lineitem"] * sf)
    npart = int(BASE["part"] * sf)
    nsupp = int(BASE["supplier"] * sf)
    return _ids(spark, n).select(
        (F.floor(F.col("id") / 4).cast("long") + 1).alias("l_orderkey"),
        (F.floor(_u(17, F.col("id")) * npart).cast("long") + 1)
        .alias("l_partkey"),
        (F.floor(_u(18, F.col("id")) * nsupp).cast("long") + 1)
        .alias("l_suppkey"),
        (F.pmod(F.col("id"), F.lit(4)).cast("int") + 1)
        .alias("l_linenumber"),
        F.round(1 + _u(19, F.col("id")) * 49, 1).alias("l_quantity"),
        F.round(1000 + _u(20, F.col("id")) * 99_000, 2)
        .alias("l_extendedprice"),
        F.round(_u(21, F.col("id")) * 0.10, 2).alias("l_discount"),
        F.round(_u(22, F.col("id")) * 0.08, 2).alias("l_tax"),
        _pick(["A", "N", "R"], 23, F.col("id")).alias("l_returnflag"),
        _pick(["O", "F"], 24, F.col("id")).alias("l_linestatus"),
        _ts_from_days("1995-01-02",
                      F.floor(_u(25, F.col("id")) * 2497))
        .alias("l_shipdate"))


def gen_events(spark, sf):
    n = int(BASE["events"] * sf)
    nuser = max(int(150_000 * sf), 1)
    # constant events/sec: the span grows with sf (see module docstring)
    span_us = int(300 * sf * DAY_US)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    return _ids(spark, n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(base_us)
             + (_u(26, F.col("id")) * float(span_us)).cast("long"))
            .cast("long")).cast("timestamp_ntz").alias("ts"),
        (F.floor(_u(27, F.col("id")) * nuser).cast("long") + 1)
        .alias("user_id"),
        _pick(EVENT_TYPES, 28, F.col("id")).alias("event_type"),
        F.round(_u(29, F.col("id")) * 560.21, 2).alias("value"),
        F.format_string('{"k": %d}',
                        F.floor(_u(30, F.col("id")) * 100).cast("int"))
        .alias("props"))


def gen_documents(spark, sf):
    n = max(int(BASE["documents"] * sf), 500)  # driver floor
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    ids = _ids(spark, n, "doc_id")
    # ~5% near-duplicates: dup docs draw their token stream from a
    # TEMPLATE id (the floor of their 50-block) and perturb token #1,
    # giving MinHash/SimHash verify stages proportional work at any sf
    is_dup = (_u(31, F.col("doc_id")) < 0.05) & (F.pmod(
        F.col("doc_id"), F.lit(50)) != 0)
    tpl = F.when(is_dup, F.col("doc_id") - F.pmod(F.col("doc_id"),
                                                  F.lit(50))) \
        .otherwise(F.col("doc_id"))
    staged = ids.select(
        "doc_id", is_dup.alias("_dup"), tpl.alias("_tpl"),
        (F.floor(_u(32, tpl) * 101).cast("int") + 10).alias("_ntok"))
    tok = F.transform(
        F.sequence(F.lit(1), F.col("_ntok")),
        lambda i: F.element_at(
            vocab,
            F.pmod(F.xxhash64(F.lit(SEED), F.lit(33), F.col("_tpl"), i),
                   F.lit(len(VOCAB))).cast("int") + 1))
    # perturb the lead token of dup copies so they are NEAR dups
    text = F.when(
        F.col("_dup"),
        F.concat_ws(" ", F.element_at(
            vocab, F.pmod(F.xxhash64(F.lit(SEED), F.lit(34),
                                     F.col("doc_id")),
                          F.lit(len(VOCAB))).cast("int") + 1),
            F.array_join(F.slice(tok, 2, 200), " "))
    ).otherwise(F.array_join(tok, " "))
    return staged.select(
        "doc_id",
        text.alias("text"),
        _pick(LANGS, 35, F.col("doc_id")).alias("lang"),
        F.format_string("src%d",
                        F.floor(_u(36, F.col("doc_id")) * 20).cast("int"))
        .alias("source"),
        F.length(text).cast("long").alias("n_chars"))


def gen_embeddings(spark, sf, clump: float = 0.0):
    """Isotropic UNIT vectors with an uncorrelated label — measured on
    the driver's own tables (sf0.1, 2000 vecs): norms exactly 1.0,
    per-dim std 1/√64, within-label vs cross-label mean cosine both
    ~1e-5 (no label geometry), max pairwise cosine 0.60, zero planted
    near-dups. The first gen_sf embedding model (label-centered
    clusters + small noise) had within-CLUSTER cosines ~0.85 — 61% of
    in-cluster pairs cleared the 0.35 near-dup threshold vs the
    driver's 0.5%, which made the r13 semdedup scale decade measure a
    corpus ~100× denser in qualifying pairs than the data model it
    claimed to extrapolate. Geometry parity is now asserted by
    tests/test_gen_sf.py."""
    n = max(int(BASE["embeddings"] * sf), 500)  # driver floor
    dim, nlabel = 64, 10
    ids = _ids(spark, n, "vec_id")
    label = F.pmod(F.xxhash64(F.lit(SEED), F.lit(37), F.col("vec_id")),
                   F.lit(nlabel)).cast("int")
    staged = ids.select("vec_id", label.alias("label"))

    def comp(j):
        # Box-Muller: exact N(0,1) from two uniform hash streams
        u1 = _u(39, F.col("vec_id"), j)
        u2 = _u(40, F.col("vec_id"), j)
        return F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-12)))) \
            * F.cos(F.lit(6.283185307179586) * u2)

    raw = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                      lambda j: comp(j))
    staged = staged.select("vec_id", "label", raw.alias("_raw"))
    nrm = F.sqrt(F.aggregate(
        F.col("_raw"), F.lit(0.0), lambda a, x: a + x * x))
    emb = F.transform(F.col("_raw"), lambda x: (x / nrm).cast("float"))
    if clump > 0.0:
        # clumped-geometry variant (VERDICT r14 "what's wrong" #2):
        # ``clump`` fraction of rows share ONE exact embedding —
        # mass-duplicated content, the geometry that actually defeats
        # the corpus-scaled quantizer. A broad directional cohort gets
        # SPLIT by k-means (sampled centroids land in it
        # proportionally), but exact duplicates collapse their
        # centroids to one point: duplicates tie-break to the lowest
        # centroid index, the other in-clump centroids empty out and
        # reseed elsewhere, and one cluster ends up holding the whole
        # clump. This is the corpus the pair-stage nb cap + witness
        # prune are measured on.
        import numpy as np
        rng = np.random.default_rng(SEED)
        c0 = rng.normal(size=dim)
        c0 /= np.linalg.norm(c0)
        c0_lit = F.array(*[F.lit(float(np.float32(x))) for x in c0])
        is_dup = _u(41, F.col("vec_id")) < F.lit(float(clump))
        emb = F.when(is_dup, c0_lit.cast("array<float>")).otherwise(emb)
    return staged.select("vec_id", emb.alias("embedding"), "label")


GENERATORS = dict(region=gen_region, nation=gen_nation,
                  customer=gen_customer, supplier=gen_supplier,
                  part=gen_part, orders=gen_orders, lineitem=gen_lineitem,
                  events=gen_events, documents=gen_documents,
                  embeddings=gen_embeddings)


def generate(spark: SparkSession, sf: float, out: str,
             tables: list[str] | None = None,
             clump: float = 0.0,
             multifile: bool = False) -> None:
    """Write each table as a SINGLE parquet FILE named <t>.parquet —
    the driver's exact layout (DuckDB's read_parquet and the streaming
    file source both expect a file, not a directory). The coalesce(1)
    is generation-only; benched reads re-split via
    spark.sql.files.maxPartitionBytes — which only splits at ROW-GROUP
    boundaries, so the 128 MB default block size capped sf10's events
    scan at 2-way and its documents scan at 1-way (measured: the whole
    zoom/text super-linear cohort in the first full sf1→sf10 sweep was
    this ceiling, not the plans). 16 MB row groups keep single-file
    scan parallelism proportional to data, which is the honest model
    for the 100 TB layout (thousands of independently splittable
    files).

    ``multifile=True`` writes <t>.parquet as a DIRECTORY of part files
    instead: coalesce(1) collapses the whole generation pipeline into
    one task (compute + parquet encode single-threaded), which is fine
    through sf10 but takes hours at sf100. Row values are a pure
    function of the row id (seeded xxhash64 column math), so the two
    layouts hold identical rows; only the file arrangement differs.
    Spark readers (spark.read.parquet) accept both. Use for the big
    side of scale-decade runs; keep the single-file default anywhere
    DuckDB/streaming-source file semantics matter."""
    import glob
    import shutil
    import tempfile

    os.makedirs(out, exist_ok=True)
    for name in (tables or GENERATORS):
        df = (gen_embeddings(spark, sf, clump=clump)
              if name == "embeddings" and clump > 0.0
              else GENERATORS[name](spark, sf))
        dest = os.path.join(out, f"{name}.parquet")
        if multifile:
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            elif os.path.exists(dest):
                os.remove(dest)
            df.write.mode("overwrite") \
                .option("parquet.block.size", str(16 * 1024 * 1024)) \
                .parquet(dest)
            print(f"wrote {name} sf={sf} (multifile)", flush=True)
            continue
        tmp = tempfile.mkdtemp(dir=out, prefix=f"_{name}_")
        df.coalesce(1) \
            .write.mode("overwrite") \
            .option("parquet.block.size", str(16 * 1024 * 1024)) \
            .parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.replace(part, dest)
        shutil.rmtree(tmp)
        print(f"wrote {name} sf={sf}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tables", nargs="*", default=None)
    ap.add_argument("--cpus", type=int, default=0)
    ap.add_argument("--clump", type=float, default=0.0,
                    help="fraction of embeddings that are EXACT "
                         "duplicates of one vector (clumped-geometry "
                         "stress corpus; 0 = isotropic default)")
    ap.add_argument("--multifile", action="store_true",
                    help="write <t>.parquet as a directory of part "
                         "files (parallel generation — required at "
                         "sf100 where the single-file coalesce(1) "
                         "write is hours of single-task work)")
    args = ap.parse_args()

    from oxbow_spark.session import get_spark
    cpus = args.cpus or (os.cpu_count() or 8)
    spark = get_spark("gen_sf", cpus=cpus, shuffle_partitions=cpus)
    generate(spark, args.sf, args.out, args.tables, clump=args.clump,
             multifile=args.multifile)
    spark.stop()


if __name__ == "__main__":
    main()
