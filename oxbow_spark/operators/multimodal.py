"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` payload columns with typed metadata. All
per-payload work runs in Arrow-batched ``mapInPandas`` passes — narrow
(no shuffle), partition-parallel, and batch-vectorized: at 100 TB each
task streams pandas batches of (id, payload) and never materializes the
whole partition. Real codecs (PIL/ffmpeg/torchaudio) are not available in
this container, so the decode kernels are clearly-marked deterministic
stubs behind the exact UDF signature a real decoder would use — swapping
one in changes only the inner per-batch function, not the plan, schema,
partitioning, or batch shape.

The reference (abdenlab/oxbow) has no multimodal layer; this extends the
engine per the training-data-pipeline brief. Digests are md5 over the
uppercase-hex rendering of the payload so the DuckDB oracle (whose md5
only accepts VARCHAR) can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real image decode path — absent in this container
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# (kind, magic-byte prefix) sniff table, checked in order
MAGICS: list[tuple[str, bytes]] = [
    ("png", bytes.fromhex("89504E470D0A1A0A")),
    ("jpeg", bytes.fromhex("FFD8FF")),
    ("riff", b"RIFF"),
]


def sniff_kind(b: bytes) -> str:
    for kind, magic in MAGICS:
        if b.startswith(magic):
            return kind
    return "raw"


def _hex_digest(b: bytes) -> str:
    return hashlib.md5(b.hex().upper().encode()).hexdigest()


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary): deterministic synthetic media payloads built
    from a text column — a format magic header (cycling png/jpeg/riff/none
    by id) followed by the UTF-8 bytes. Stands in for real media bytes in
    tests and oracle checks; production tables would carry real payloads
    in the same column shape."""
    m = F.col(id_col) % 4
    hdr = (
        F.when(m == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(m == 1, F.unhex(F.lit("FFD8FF")))
        .when(m == 2, F.encode(F.lit("RIFF"), "UTF-8"))
        .otherwise(F.unhex(F.lit("")))
    )
    return df.select(
        F.col(id_col),
        F.concat(hdr, F.encode(F.col(text_col), "UTF-8")).alias("payload"),
    )


def sniff_media(df: DataFrame, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """(id, kind, n_bytes, digest): magic-byte sniff + size + content
    digest per payload. One mapInPandas pass, no shuffle."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "kind": [sniff_kind(b) for b in payloads],
                "n_bytes": [len(b) for b in payloads],
                "digest": [_hex_digest(b) for b in payloads],
            })

    return df.mapInPandas(fn, schema)


def decode_image_stub(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id", real: bool = False) -> DataFrame:
    """(id, kind, width, height, channels, n_pixels): image-decode UDF
    plumbing. ``real=True`` requires PIL (NotImplementedError here); the
    default STUB derives deterministic dimensions from the byte length so
    the full pipeline — schema, batching, downstream joins — is testable
    without codecs."""
    if real and not HAVE_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "use the deterministic stub (real=False)"
        )
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("n_pixels", LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                kind = sniff_kind(b)
                n = len(b)
                # STUB decode: dimensions are a pure function of payload size
                w = 16 + (n * 7919) % 1008
                h = 16 + (n * 104729) % 1008
                c = 4 if kind == "png" else 3
                rows.append((i, kind, w, h, c, w * h))
            yield pd.DataFrame(rows, columns=[
                id_col, "kind", "width", "height", "channels", "n_pixels"])

    return df.mapInPandas(fn, schema)


def frame_sample(df: DataFrame, frame_bytes: int = 64, every_k: int = 2,
                 payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """(id, frame_idx, frame_digest): video-style frame sampling — the
    payload is treated as ``n_bytes // frame_bytes`` fixed-size frames and
    every k-th frame is emitted (one → many rows per input, the expand
    shape a real frame extractor needs). Digest = md5(hex(frame))."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_digest", StringType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                hx = bytes(b).hex().upper()
                n_frames = len(b) // frame_bytes
                for j in range(0, n_frames, every_k):
                    ids.append(i)
                    idxs.append(j)
                    sl = hx[j * frame_bytes * 2:(j + 1) * frame_bytes * 2]
                    digs.append(hashlib.md5(sl.encode()).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_digest": digs})

    return df.mapInPandas(fn, schema)


def embed_media(df: DataFrame, dim: int = 8, payload_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """(id, embedding array<float>): media → embedding-vector plumbing.
    STUB featurizer: the first ``dim`` md5 digest bytes scaled to [0,1] —
    deterministic, so downstream similarity/dedup stages are testable; a
    real encoder (CLIP etc.) drops into the same batch signature. The
    digest is taken over the uppercase-hex rendering of the payload so an
    ANSI-SQL oracle (md5 is VARCHAR-only in DuckDB) can recompute it."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[payload_col]:
                d = hashlib.md5(bytes(b).hex().upper().encode()).digest()
                vecs.append([d[j % 16] / 255.0 for j in range(dim)])
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.mapInPandas(fn, schema)
