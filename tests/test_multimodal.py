"""Multimodal plumbing: payload synthesis, sniffing, decode stub batch
shape, frame expansion, embedding featurizer determinism."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oxbow_spark.operators import multimodal


@pytest.fixture(scope="module")
def payload_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.attach_fake_payload(docs.limit(40)).cache()


def test_payload_header_cycles(payload_df):
    rows = payload_df.collect()
    assert rows
    for r in rows:
        b = bytes(r.payload)
        kind = multimodal.sniff_kind(b)
        expected = {0: "png", 1: "jpeg", 2: "riff", 3: "raw"}[r.doc_id % 4]
        assert kind == expected, (r.doc_id, kind)


def test_sniff_digest_matches_python(payload_df):
    got = {r.doc_id: r for r in multimodal.sniff_media(payload_df).collect()}
    for r in payload_df.collect():
        b = bytes(r.payload)
        s = got[r.doc_id]
        assert s.n_bytes == len(b)
        assert s.digest == hashlib.md5(b.hex().upper().encode()).hexdigest()


def test_decode_stub_dimensions_deterministic(payload_df):
    out = multimodal.decode_image_stub(payload_df).collect()
    assert out
    for r in out:
        assert 16 <= r.width < 1024 and 16 <= r.height < 1024
        assert r.n_pixels == r.width * r.height
        assert r.channels == (4 if r.kind == "png" else 3)


def test_decode_real_requires_pil(payload_df):
    if multimodal.HAVE_PIL:
        pytest.skip("PIL unexpectedly available")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(payload_df, real=True)


def test_frame_sample_expansion(payload_df):
    fb, k = 16, 2
    out = multimodal.frame_sample(payload_df, frame_bytes=fb, every_k=k)
    counts = {r.doc_id: r.n for r in
              out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for r in payload_df.collect():
        n_frames = len(bytes(r.payload)) // fb
        expected = len(range(0, n_frames, k))
        assert counts.get(r.doc_id, 0) == expected
    # frame indices are the sampled ones only
    idxs = {r.frame_idx for r in out.collect()}
    assert all(i % k == 0 for i in idxs)


def test_embed_media_shape_and_determinism(payload_df):
    a = multimodal.embed_media(payload_df, dim=8).collect()
    b = multimodal.embed_media(payload_df, dim=8).collect()
    assert {r.doc_id: r.embedding for r in a} == {r.doc_id: r.embedding for r in b}
    for r in a:
        assert len(r.embedding) == 8
        assert all(0.0 <= v <= 1.0 for v in r.embedding)
