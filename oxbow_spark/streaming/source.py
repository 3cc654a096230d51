"""Streaming file ingestion for genomic formats.

Beyond the reference (which is batch-only): every genomic DataSource in
this repo also works as a Structured Streaming source —

    stream = spark.readStream.format("bam").load("/runs/*.bam")

New files matching the glob become micro-batch input as they land (the
sequencer-output pattern: a run directory accumulating flow-cell files).
The design composes the existing batch machinery instead of duplicating
it:

- **Offsets are a file-key high-watermark** ``{"wm": <key>}``, where the
  key is the file's basename (default — correct when arrivals are
  lexicographically increasing, the run-id naming convention) or
  ``mtime|name`` with ``stream_order=mtime`` (correct for arbitrary
  names as long as clocks are sane). A micro-batch is the files with
  ``start < key <= end``.
- **Planning delegates to the batch reader**: each new file is planned by
  the format's own ``reader().partitions()`` — so a 100 GB BAM landing
  in the directory becomes many BGZF-chunk partitions in ONE micro-batch,
  index-pruned and replayable exactly like a batch scan, not one
  task per file.
- **Executors run the batch read path** (same Arrow-batch decode); the
  per-file reader is built lazily and cached per (executor, file).
- **Replay** is deterministic: ``partitions(start, end)`` re-derives the
  same file set from a directory listing (files must not be deleted
  while a checkpointed query may still replay them — the standard file
  source contract).

Scale notes: the checkpoint state is one short string (the watermark),
not a seen-files map — O(1) regardless of stream lifetime. Driver work
per micro-batch is one listing + per-NEW-file planning. At least one
matching file must exist when the stream starts (schema derives from it,
exactly like the batch path).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
)

from oxbow_spark.sources import fsio


class _StreamPart(InputPartition):
    """One batch-reader partition of one streamed file."""

    def __init__(self, path: str, options: dict, inner):
        self.path = path
        self.options = options
        self.inner = inner


def _file_key(path: str, order: str) -> str:
    """Watermark key — the FULL path, not the basename: a glob spanning
    subdirectories (``runs/*/sample.bam``) yields distinct files with
    equal basenames, and a basename key would mark the later one as
    already-seen and silently never stream it (round-13 audit, the
    same collision class as the events stage dir). For the common
    single-directory glob the ordering is unchanged."""
    if order == "mtime":
        return f"{int(fsio.getmtime(path) * 1e6):020d}|{path}"
    return path


class GenomicFileStreamReader(DataSourceStreamReader):
    def __init__(self, ds_cls, options: dict, schema):
        self.ds_cls = ds_cls
        self.options = dict(options)
        self.glob = self.options.get("path")
        self.order = self.options.get("stream_order", "name")
        if self.order not in ("name", "mtime"):
            raise ValueError(
                f"stream_order must be 'name' or 'mtime', got {self.order!r}")
        self.schema = schema
        self._max_seen = ""
        self._readers: dict[str, object] = {}

    # -- driver side --------------------------------------------------------

    def _listing(self) -> list[tuple[str, str]]:
        try:
            files = fsio.expand(self.glob)
        except FileNotFoundError:
            return []
        return sorted((_file_key(f, self.order), f) for f in files)

    def initialOffset(self) -> dict:
        return {"wm": ""}

    def latestOffset(self) -> dict:
        ks = self._listing()
        if ks:
            # never regress, even if files vanish between listings
            self._max_seen = max(self._max_seen, ks[-1][0])
        return {"wm": self._max_seen}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("wm", ""), end.get("wm", "")
        parts: list[_StreamPart] = []
        for key, f in self._listing():
            if not (lo < key <= hi):
                continue
            ds = self.ds_cls({**self.options, "path": f})
            rdr = ds.reader(ds.schema())
            parts.extend(_StreamPart(f, self.options, p)
                         for p in rdr.partitions())
        return parts

    def commit(self, end: dict) -> None:
        pass

    # -- executor side ------------------------------------------------------

    def read(self, partition: _StreamPart) -> Iterator:
        rdr = self._readers.get(partition.path)
        if rdr is None:
            ds = self.ds_cls({**partition.options, "path": partition.path})
            rdr = self._readers[partition.path] = ds.reader(ds.schema())
        yield from rdr.read(partition.inner)


class StreamSinkAdapter(DataSourceStreamWriter):
    """Adapts a batch part-file writer (`align_write.py`, `writers.py`)
    into a streaming sink: each micro-batch task appends one
    self-contained part file; an aborted batch removes the parts it
    wrote. `writeStream.format("sam"/"bam"/"vcf"/...)` therefore closes
    the streaming loop — files in, transformed files out."""

    def __init__(self, inner):
        self.inner = inner

    def write(self, iterator):
        return self.inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        pass

    def abort(self, messages, batchId: int) -> None:
        self.inner.abort([m for m in messages if m is not None])


# The user-facing mixin lives in `sources/base.py` (GenomicStreamMixin)
# with a lazy import of GenomicFileStreamReader, so source modules never
# import the streaming package at module load (no import cycle).
