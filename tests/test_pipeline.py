"""Training-data curation operators: connected-components clustering,
deterministic hash splits, quality ntile binning."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators import pipeline


def test_cc_transitive_chain(spark):
    # chain 1-2-3-4 plus pair 10-11 plus triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r.v: r.cluster for r in pipeline.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_long_chain_converges(spark):
    # a 40-vertex path needs many propagation rounds (diameter-bound)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    got = {r.v: r.cluster for r in
           pipeline.connected_components(edges, max_iter=64).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cluster_canonical_flags(spark):
    edges = spark.createDataFrame([(5, 3), (3, 9)], "id_a long, id_b long")
    rows = {r.v: r for r in pipeline.cluster_canonical(edges).collect()}
    assert all(r.cluster == 3 for r in rows.values())
    assert rows[3].is_canonical and not rows[5].is_canonical


def test_hash_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in pipeline.hash_split(df, fr).collect()}
    b = {r.doc_id: r.split for r in
         pipeline.hash_split(df.repartition(7), fr).collect()}
    assert a == b  # partitioning-independent
    n = len(a)
    counts = {s: sum(1 for v in a.values() if v == s) for s in fr}
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert abs(counts["val"] / n - 0.1) < 0.03
    # matches the python-side md5 definition exactly
    for i in (0, 1, 999):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        want = "train" if u < 0.8 else ("val" if u < 0.8 + 0.1 else "test")
        assert a[i] == want, i


def test_hash_split_salt_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    fr = {"train": 0.5, "test": 0.5}
    a = {r.doc_id: r.split for r in pipeline.hash_split(df, fr).collect()}
    b = {r.doc_id: r.split for r in
         pipeline.hash_split(df, fr, salt="v2").collect()}
    assert a != b


def test_hash_split_validates_fractions(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        pipeline.hash_split(df, {"a": 0.5, "b": 0.2})


def test_quality_ntile_bins(spark):
    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(100)], "doc_id long, score double"
    )
    got = pipeline.quality_ntile(df, n_bins=4).collect()
    bins = {r.doc_id: r.bin for r in got}
    # highest scores (lowest ids) land in bin 1, lowest in bin 4
    assert bins[0] == 1 and bins[99] == 4
    sizes = [sum(1 for b in bins.values() if b == k) for k in (1, 2, 3, 4)]
    assert sizes == [25, 25, 25, 25]


def test_sequence_pack_prefix_sums(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(40)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in
           pipeline.sequence_pack(df, capacity=250, n_shards=2).collect()}
    assert len(out) == 40
    # per shard, offsets advance by 100 tokens mod capacity and chunks
    # increase monotonically with doc_id
    import hashlib

    by_shard: dict[int, list] = {}
    for i in range(40):
        s = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
        assert out[i].shard == s
        by_shard.setdefault(s, []).append(out[i])
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        before = 0
        for r in rows:
            assert r.chunk == before // 250 and r.chunk_offset == before % 250
            before += 100


def test_sequence_pack_shard_law(spark):
    """Shard count only re-buckets: within a shard, (chunk, chunk_offset)
    follow the prefix-sum law for ANY n_shards, including the derived
    default (n_shards=None)."""
    import hashlib

    rows = [(i, (i * 37) % 300 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    for n_shards in (2, 8, 32, None):
        out = {r.doc_id: r for r in
               pipeline.sequence_pack(df, capacity=512, n_shards=n_shards).collect()}
        assert len(out) == 200
        eff = {out[i].shard for i in range(200)}
        by_shard: dict[int, list] = {}
        for i in range(200):
            by_shard.setdefault(out[i].shard, []).append(i)
        for ids in by_shard.values():
            ids.sort()
            before = 0
            for i in ids:
                r = out[i]
                assert r.chunk == before // 512
                assert r.chunk_offset == before % 512
                before += dict(rows)[i]
        if n_shards is None:
            # derived default must give at least 16 shard slots
            mods = {int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    for i in range(200)}
            assert len(eff) > 1


def test_quantile_rank_rule_matches_spark(spark):
    """Lock the rank rule: Spark's exact approxQuantile (relativeError=0)
    returns the element at 1-indexed rank ceil(p·n) — the rule
    `quantile_thresholds_core` mirrors. If a Spark upgrade changes this,
    the quantile-bins oracle row would silently drift; this test makes
    the drift loud."""
    import numpy as np

    rng = np.random.default_rng(42)
    for n, k in ((101, 8), (1000, 4), (640, 8)):
        vals = rng.normal(size=n)
        vals[::5] = np.round(vals[::5], 1)  # duplicates
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "score double"
        ).repartition(8)
        got = pipeline.quantile_thresholds(df, n_bins=k, relative_error=0.0)
        want = pipeline.quantile_thresholds_core(vals, k)
        assert got == want, (n, k)


def test_threshold_bins_equal_ntile_when_divisible(spark):
    """On distinct scores with row count divisible by n_bins, threshold
    binning reproduces NTILE exactly (the small-scale equivalence law)."""
    import numpy as np

    rng = np.random.default_rng(3)
    scores = rng.permutation(np.linspace(-5, 5, 320))  # distinct, 320 % 8 == 0
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)], "doc_id long, score double"
    )
    ntile = {r.doc_id: r.bin for r in pipeline.quality_ntile(df, n_bins=8).collect()}
    thr = pipeline.quantile_thresholds(df, n_bins=8, relative_error=0.0)
    tb = {r.doc_id: r.bin for r in
          pipeline.quality_threshold_bins(df, thr).collect()}
    assert tb == ntile


def test_threshold_bins_ties_one_bin(spark):
    """Tied scores all land in ONE deterministic bin (NTILE would split
    them by the id tiebreak) — the documented difference."""
    rows = [(i, 1.0) for i in range(50)] + [(50 + i, 2.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    thr = pipeline.quantile_thresholds(df, n_bins=4, relative_error=0.0)
    got = pipeline.quality_threshold_bins(df, thr).collect()
    by_score = {}
    for r in got:
        by_score.setdefault(r.score, set()).add(r.bin)
    assert all(len(bins) == 1 for bins in by_score.values())
    # thresholds at p=.25/.5/.75 are [1.0, 1.0, 2.0]; strict-count
    # binning: 2.0 beats two of them → bin 2; 1.0 beats none → bin 4.
    # Heavy ties legitimately leave bins empty — the mass can't split.
    assert by_score[2.0] == {2} and by_score[1.0] == {4}


def test_resample_mixture_deterministic_and_rates(spark):
    rows = [(i, f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 1.0, "src1": 0.5, "src3": 0.0}
    out = pipeline.resample_mixture(df, rates, default_rate=0.25)
    got = {r.doc_id for r in out.collect()}
    # identical on a second run and under a different partitioning
    again = {r.doc_id for r in
             pipeline.resample_mixture(df.repartition(7), rates,
                                       default_rate=0.25).collect()}
    assert got == again
    by_src = {s: sum(1 for i in got if i % 4 == int(s[-1])) for s in
              ("src0", "src1", "src2", "src3")}
    assert by_src["src0"] == 500          # rate 1.0 keeps everything
    assert by_src["src3"] == 0            # rate 0.0 drops everything
    assert 180 <= by_src["src1"] <= 320   # ~0.5 of 500
    assert 80 <= by_src["src2"] <= 170    # default 0.25 of 500


def test_resample_mixture_salt_independent_of_split(spark):
    # the mixture hash stream must not correlate with hash_split's:
    # surviving docs keep ~the split fractions
    rows = [(i, "web") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = pipeline.resample_mixture(df, {"web": 0.5}, salt="mix")
    splits = pipeline.hash_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1})
    frac = {r.split: 0 for r in splits.collect()}
    for r in splits.collect():
        frac[r.split] += 1
    n = sum(frac.values())
    assert 0.75 <= frac["train"] / n <= 0.85


def test_resample_mixture_rejects_bad_rates(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    import pytest as _pt
    with _pt.raises(ValueError):
        pipeline.resample_mixture(df, {"a": 1.5})
    with _pt.raises(ValueError):
        pipeline.resample_mixture(df, {}, default_rate=-0.1)


def test_chunk_documents_coverage_and_overlap(spark):
    from oxbow_spark.operators.pipeline import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")],
        "doc_id long, text string")
    got = sorted(chunk_documents(df, chunk_tokens=10, overlap=4).collect(),
                 key=lambda r: (r.doc_id, r.chunk_id))
    d1 = [r for r in got if r.doc_id == 1]
    # stride 6: starts 0,6,12,18 -> 4 chunks; last has 25-18=7 tokens
    assert [r.chunk_start for r in d1] == [0, 6, 12, 18]
    assert [r.n_tokens for r in d1] == [10, 10, 10, 7]
    # neighbor chunks share exactly `overlap` tokens
    t0 = d1[0].chunk_text.split()
    t1 = d1[1].chunk_text.split()
    assert t0[-4:] == t1[:4]
    # every token appears in some chunk, in order
    seen = []
    for r in d1:
        for w in r.chunk_text.split():
            if not seen or w != seen[-1] and w not in seen[-4:]:
                pass
    assert d1[0].chunk_text.startswith("w0 ") and d1[-1].chunk_text.endswith("w24")
    # short + empty docs yield exactly one chunk
    assert [r.n_tokens for r in got if r.doc_id == 2] == [2]
    d3 = [r for r in got if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].chunk_text == ""


def test_chunk_documents_rejects_bad_overlap(spark):
    from oxbow_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_curate_corpus_end_to_end(spark):
    """Every gate observable on a hand-built corpus: quality fail,
    repetition fail, exact dup, near dup, benchmark contamination — the
    survivors carry stable split labels."""
    from oxbow_spark.operators.pipeline import curate_corpus

    good = ("the quick brown fox jumps over a lazy dog and then it "
            "runs far away into one quiet green forest while keeping "
            "its steady pace across fallen logs under pale morning "
            "light before resting near clear water by mossy stones")
    other = ("the careful gray cat sits on a warm stone wall watching "
             "small birds in an open garden today as gentle wind moves "
             "through tall dry grass and loose leaves drift slowly "
             "past old wooden gates toward narrow gravel paths")
    contaminated = ("these benchmark words are very secret and they "
                    "leak into the training data for this test of "
                    "decontamination while every other sentence here "
                    "stays ordinary filler prose about nothing at all")
    rows = [
        (1, good),
        (2, good),                                   # exact dup of 1
        (3, good + " tonight"),                      # near dup of 1
        (4, "a a a a a a a a a a a a a a a a a a"),  # repetition fail
        (5, "xx"),                                   # quality fail (short)
        (6, other),
        (7, contaminated),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "these benchmark words are very secret")],
        "doc_id long, text string")
    out = curate_corpus(docs, benchmarks=bench, minhash_threshold=0.5)
    got = {r.doc_id: r.split for r in out.collect()}
    assert 1 in got            # canonical survives
    assert 2 not in got        # exact dup dropped
    assert 3 not in got        # near dup dropped
    assert 4 not in got        # repetition gate
    assert 5 not in got        # quality gate
    assert 6 in got
    assert 7 not in got        # decontaminated
    assert set(got.values()) <= {"train", "val", "test"}
    # determinism
    again = {r.doc_id: r.split for r in curate_corpus(
        docs, benchmarks=bench, minhash_threshold=0.5).collect()}
    assert again == got


def test_curate_corpus_semantic_gate(spark):
    """The optional SemDeDup gate: two textually-distinct survivors with
    near-identical embeddings collapse to one (farthest-from-centroid
    kept); docs without the embedding column path untouched when the
    frame is not passed."""
    import numpy as np

    from oxbow_spark.operators.pipeline import curate_corpus

    t1 = ("the quick brown fox jumps over a lazy dog and then it "
          "runs far away into one quiet green forest while keeping "
          "its steady pace across fallen logs under pale morning "
          "light before resting near clear water by mossy stones")
    t2 = ("a different careful gray cat sits on the warm stone wall "
          "watching small birds in an open garden today as gentle "
          "wind moves through tall dry grass and loose leaves drift "
          "slowly past old wooden gates toward narrow gravel paths")
    t3 = ("entirely another passage describing long train journeys "
          "across wide flat plains under heavy summer skies while "
          "passengers read thick novels and drink lukewarm tea from "
          "paper cups sold by quiet vendors between distant stations")
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3)], "doc_id long, text string")
    e1 = np.eye(16)[0]
    e2 = 0.97 * e1 + 0.03 * np.eye(16)[1]   # semantic dup of doc 1
    e3 = np.eye(16)[2]
    emb = spark.createDataFrame(
        [(1, [float(x) for x in e1]), (2, [float(x) for x in e2]),
         (3, [float(x) for x in e3])],
        "doc_id long, embedding array<float>")
    no_gate = {r.doc_id for r in curate_corpus(docs).collect()}
    assert no_gate == {1, 2, 3}
    out = {r.doc_id for r in curate_corpus(
        docs, embeddings=emb, semantic_threshold=0.9,
        semantic_nlist=2).collect()}
    assert len(out) == 2 and 3 in out
    assert len(out & {1, 2}) == 1  # exactly one of the semantic dups


def _py_dsir(raw, target, n_buckets=64, alpha=0.5):
    """Brute-force DSIR reference: md5-prefix buckets over
    unigram+bigram grams, add-alpha smoothed log ratio."""
    import hashlib
    import math

    def grams(text):
        t = text.split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _i, txt in raw:
        for g in grams(txt):
            b = bucket(g)
            rc[b] = rc.get(b, 0) + 1
    for _i, txt in target:
        for g in grams(txt):
            b = bucket(g)
            tc[b] = tc.get(b, 0) + 1
    Nr, Nt = sum(rc.values()), sum(tc.values())
    out = {}
    for i, txt in raw:
        gs = grams(txt)
        s = 0.0
        for g in gs:
            b = bucket(g)
            term = (math.log((tc.get(b, 0) + alpha)
                             / (Nt + alpha * n_buckets))
                    - math.log((rc[b] + alpha) / (Nr + alpha * n_buckets)))
            s += round(term, 6)  # decimal(28,6) per-term quantization
        out[i] = (len(gs), round(s, 6))
    return out


def test_dsir_weights_match_python_reference(spark):
    raw = [(0, "the cat sat on the mat"),
           (1, "quantum flux capacitors emit tachyon bursts"),
           (2, "the dog sat on the log"),
           (3, ""),
           (4, "tachyon bursts the cat")]
    target = [(0, "the cat sat quietly"), (1, "a cat and a dog sat")]
    from oxbow_spark.operators.pipeline import dsir_log_weights

    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.log_weight)
           for r in dsir_log_weights(rdf, tdf, n_buckets=64).collect()}
    want = _py_dsir(raw, target, n_buckets=64)
    for i, (n, w) in want.items():
        assert got[i][0] == n, i
        assert got[i][1] == pytest.approx(w, abs=2e-6), i
    assert got[3] == (0, 0.0)  # empty doc keeps a zero row
    # target-like docs outweigh the off-distribution one
    assert got[0][1] > got[1][1] and got[2][1] > got[1][1]


def test_dsir_resample_deterministic_and_biased(spark):
    import random

    rng = random.Random(11)
    target_words = ["cat", "dog", "sat", "mat", "pet", "paw"]
    other_words = ["flux", "qubit", "torque", "valve", "ion", "grid"]
    raw = []
    for i in range(120):
        pool = target_words if i % 2 == 0 else other_words
        raw.append((i, " ".join(rng.choice(pool) for _ in range(12))))
    target = [(i, " ".join(rng.choice(target_words) for _ in range(12)))
              for i in range(40)]
    from oxbow_spark.operators.pipeline import dsir_resample

    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    k1 = {r.doc_id for r in dsir_resample(rdf, tdf, 30).collect()}
    k2 = {r.doc_id for r in dsir_resample(rdf, tdf, 30).collect()}
    assert k1 == k2 and len(k1) == 30          # deterministic
    frac_target_like = sum(1 for i in k1 if i % 2 == 0) / len(k1)
    assert frac_target_like >= 0.8             # selection is biased
    # strict (no-noise) mode picks exactly the top weights
    strict = {r.doc_id for r in dsir_resample(
        rdf, tdf, 30, gumbel=False).collect()}
    assert sum(1 for i in strict if i % 2 == 0) / 30 >= 0.95


def test_curate_corpus_dsir_gate(spark):
    """Optional DSIR budget gate: of the clean survivors, only the
    target-like Gumbel-top-n remain."""
    import random

    from oxbow_spark.operators.pipeline import curate_corpus

    rng = random.Random(3)
    tw = ["cat", "dog", "sat", "mat", "pet", "paw", "fur", "toy"]
    ow = ["flux", "qubit", "torque", "valve", "ion", "grid", "rotor", "amp"]
    rows = []
    for i in range(60):
        pool = tw if i % 2 == 0 else ow
        # unique filler keeps the repetition/quality gates green while
        # the sampled pool words carry the distribution signal
        filler = " ".join(f"w{i}x{j}" for j in range(30))
        rows.append((i, filler + " " + " ".join(rng.sample(pool, 6))
                     + " the a of is in"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(i, " ".join(rng.sample(tw, 6)) + " the a of")
         for i in range(20)], "doc_id long, text string")
    out = {r.doc_id for r in curate_corpus(
        docs, dsir_target=target, dsir_keep=20,
        minhash_threshold=0.95).collect()}
    assert len(out) == 20
    assert sum(1 for i in out if i % 2 == 0) / len(out) >= 0.8


def test_curate_corpus_span_removal_gate(spark):
    """The optional Lee-et-al span-removal stage: `dedup_spans_k`
    rewrites survivors — every corpus-duplicated k-gram span stripped
    (pinned cleaned text), docs falling under `min_clean_tokens` after
    cleaning dropped, and DOWNSTREAM stages see the cleaned text (a
    benchmark equal to a removed span no longer contaminates)."""
    from oxbow_spark.operators.pipeline import curate_corpus

    span_a = "bark cedar dune fern glen iris kelp lily moss"
    span_b = "onyx pear quay reed sage teal vine wolf yarn"
    doc_a_pre = "the wind over calm hills near old farm gates"
    doc_a_post = "and rain fell soft upon gray stone walls here"
    doc_b_pre = "a slow boat drifts past tall pine tree line"
    doc_b_post = "for long days under pale blue open sky light"
    rows = [
        (1, f"{doc_a_pre} {span_a} {doc_a_post}"),
        (2, f"{doc_b_pre} {span_b} {doc_b_post}"),
        # mostly duplicated spans: cleaned text falls below the length
        # re-gate (8 tokens < 10) and the doc is dropped
        (3, f"{span_a} the two odd {span_b} and end gap here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in curate_corpus(
        docs, dedup_spans_k=3, min_clean_tokens=10).collect()}
    assert set(out) == {1, 2}
    # cleaned text pinned exactly: the duplicated span is gone, the
    # unique prefix/suffix rejoin on single spaces
    assert out[1] == f"{doc_a_pre} {doc_a_post}"
    assert out[2] == f"{doc_b_pre} {doc_b_post}"

    # without the option nothing is rewritten or dropped
    raw = {r.doc_id: r.text for r in curate_corpus(docs).collect()}
    assert set(raw) == {1, 2, 3}
    assert raw[1] == rows[0][1]

    # decontamination runs AFTER the rewrite: a benchmark that matches
    # only the removed span no longer flags the doc...
    bench = spark.createDataFrame(
        [(0, span_a)], "doc_id long, text string")
    with_bench = {r.doc_id for r in curate_corpus(
        docs, benchmarks=bench, dedup_spans_k=3,
        min_clean_tokens=10).collect()}
    assert with_bench == {1, 2}
    # ...while without span removal the same benchmark kills doc 1
    no_clean = {r.doc_id for r in curate_corpus(
        docs, benchmarks=bench).collect()}
    assert 1 not in no_clean and 2 in no_clean


def test_curate_corpus_proto_prune_gate(spark):
    """The optional D4 density-pruning stage: with proto_drop_frac the
    most-prototypical fraction of each embedding cluster is dropped ON
    TOP of the SemDeDup gate; without embeddings the option errors."""
    import numpy as np

    import pytest as _pytest

    from oxbow_spark.operators.pipeline import curate_corpus

    rng = np.random.default_rng(19)
    docs_rows, emb_rows = [], []
    for i in range(24):
        words = " ".join(f"tok{i}w{j}" for j in range(30))
        docs_rows.append((i, words + " the a of and it"))
        # two tight clusters of embeddings (no exact semantic dups —
        # keep cosines under the dedup threshold but clustered)
        base = np.zeros(6)
        base[i % 2] = 1.0
        v = base + rng.normal(scale=0.25, size=6)
        emb_rows.append((i, [float(x) for x in v]))
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    emb = spark.createDataFrame(emb_rows,
                                "doc_id long, embedding array<double>")

    no_pr = {r.doc_id for r in curate_corpus(
        docs, embeddings=emb, semantic_threshold=0.999,
        semantic_nlist=2).collect()}
    pr = {r.doc_id for r in curate_corpus(
        docs, embeddings=emb, semantic_threshold=0.999,
        semantic_nlist=2, proto_drop_frac=0.25).collect()}
    assert pr < no_pr                      # strictly prunes further
    # ceil(0.25 * |cluster|) per cluster over the semdedup survivors
    assert len(no_pr) - len(pr) >= 2
    with _pytest.raises(ValueError, match="embeddings"):
        curate_corpus(docs, proto_drop_frac=0.25)


def test_epoch_shuffle_matches_python_and_epochs_differ(spark):
    import hashlib

    from oxbow_spark.operators.pipeline import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(500)], "doc_id long, text string")

    def py_rank(epoch, salt=""):
        keyed = sorted(
            (int(hashlib.md5(
                f"{salt}:{epoch}:{i}".encode()).hexdigest()[:15], 16), i)
            for i in range(500))
        return {i: r + 1 for r, (_, i) in enumerate(keyed)}

    got0 = {r.doc_id: r.shuffle_rank
            for r in epoch_shuffle(docs, epoch=0).collect()}
    assert got0 == py_rank(0)
    got1 = {r.doc_id: r.shuffle_rank
            for r in epoch_shuffle(docs, epoch=1).collect()}
    assert got1 == py_rank(1)
    assert got0 != got1                       # epochs permute differently
    assert sorted(got0.values()) == list(range(1, 501))
    # layout-independent: same ranks from a different partitioning
    re = {r.doc_id: r.shuffle_rank
          for r in epoch_shuffle(docs.repartition(13), epoch=0).collect()}
    assert re == got0


def test_temperature_rates_math():
    from oxbow_spark.operators.pipeline import temperature_rates

    counts = {"web": 9000, "wiki": 900, "code": 100}
    # alpha=1: natural -> every rate 1.0 (no thinning needed)
    assert temperature_rates(counts, 1.0) == {
        "web": 1.0, "wiki": 1.0, "code": 1.0}
    # alpha=0: equal thirds; the smallest domain caps the budget at 300
    r0 = temperature_rates(counts, 0.0)
    assert r0["code"] == 1.0
    assert abs(r0["web"] - 100 / 9000) < 1e-12
    assert abs(r0["wiki"] - 100 / 900) < 1e-12
    # expected kept sizes realize the tempered distribution
    kept = {d: counts[d] * r for d, r in r0.items()}
    assert abs(kept["web"] - kept["wiki"]) < 1e-6
    # explicit budget scales everything down proportionally
    rb = temperature_rates(counts, 0.0, budget=150)
    assert abs(counts["web"] * rb["web"] - 50) < 1e-6
    assert abs(counts["code"] * rb["code"] - 50) < 1e-6


def test_temperature_mixture_realizes_distribution(spark):
    from oxbow_spark.operators.pipeline import temperature_mixture

    rows = ([(i, "web") for i in range(8000)]
            + [(8000 + i, "wiki") for i in range(1500)]
            + [(9500 + i, "code") for i in range(500)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, alpha=0.5)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    # code (smallest) is never thinned; head domains are
    assert got["code"] == 500
    assert got["web"] < 8000
    # realized proportions approximate n^0.5 weights (md5 noise ~ +-5%)
    import math
    w = {d: math.sqrt(n) for d, n in
         (("web", 8000), ("wiki", 1500), ("code", 500))}
    want_ratio = w["web"] / w["wiki"]
    got_ratio = got["web"] / got["wiki"]
    assert abs(got_ratio - want_ratio) / want_ratio < 0.1
    # deterministic
    again = {r[0]: r[1] for r in temperature_mixture(df, alpha=0.5)
             .groupBy("source").count().collect()}
    assert again == got
