"""Streaming file ingestion for genomic formats.

Beyond the reference (which is batch-only): every genomic DataSource in
this repo also works as a Structured Streaming source —

    stream = spark.readStream.format("bam").load("/runs/*.bam")

New files matching the glob become micro-batch input as they land (the
sequencer-output pattern: a run directory accumulating flow-cell files).
The design composes the existing batch machinery instead of duplicating
it:

- **Offsets are a file-key high-watermark** ``{"wm": <key>, "v": 2}``,
  where the key is the file's FULL path (default ``stream_order=name``
  — correct when arrivals are lexicographically increasing, the run-id
  naming convention) or ``mtime|path`` with ``stream_order=mtime``
  (correct for arbitrary names as long as clocks are sane). A
  micro-batch is the files with ``start < key <= end``. Note the
  name-order monotonic-arrival contract rarely holds for a glob that
  spans DIRECTORIES (``runs/*/x.bam``): a file landing later in a
  lexicographically earlier directory sorts below the watermark and is
  never streamed — the reader warns at construction; use
  ``stream_order=mtime`` for multi-directory globs. Checkpoints
  written by the pre-v2 basename-keyed format are detected by the
  missing ``"v"`` and migrated against the current listing (or the
  reader fails loudly when the migration would skip a file) instead of
  silently planning empty batches against incomparable keys.
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

import glob as _glob
import os
import warnings
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
        if self.order == "name" and self.glob and _glob.has_magic(
                os.path.dirname(self.glob)):
            warnings.warn(
                "stream_order='name' with a glob that spans directories "
                f"({self.glob!r}): arrival order across sibling dirs is "
                "rarely lexicographic, so a file landing later in an "
                "earlier-sorting directory would never be streamed. Use "
                "stream_order='mtime' for multi-directory globs.",
                stacklevel=3)
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
        return {"wm": "", "v": 2}

    def latestOffset(self) -> dict:
        ks = self._listing()
        if ks:
            # never regress, even if files vanish between listings
            self._max_seen = max(self._max_seen, ks[-1][0])
        return {"wm": self._max_seen, "v": 2}

    def _v1_key(self, path: str) -> str:
        """The pre-v2 watermark key for a file: its BASENAME (name order)
        or ``mtime|basename`` (mtime order)."""
        if self.order == "mtime":
            return (f"{int(fsio.getmtime(path) * 1e6):020d}|"
                    f"{os.path.basename(path)}")
        return os.path.basename(path)

    def _normalize_wm(self, off: dict) -> str:
        """Return the v2 (full-path-keyed) watermark for an offset dict,
        migrating a pre-v2 (basename-keyed) checkpoint against the
        current listing. Without this, resuming an old checkpoint would
        compare a basename watermark against full-path keys — '/' sorts
        below most filename characters, so every file since the last
        processed batch would fail ``lo < key`` and be silently skipped
        (or, with relative globs, be re-streamed as duplicates). When
        the seen-set a v1 watermark describes is not expressible as a
        full-path prefix (a multi-directory glob where an UNSEEN file
        sorts below a seen one), fail loudly rather than drop data."""
        wm = off.get("wm", "")
        if off.get("v", 1) >= 2 or not wm:
            return wm
        # TWO unversioned formats exist in checkpoints: the original
        # basename-keyed v1, and an interim full-path-keyed format that
        # already wrote v2-style keys but predates the "v" field. A key
        # whose path component contains a separator cannot be a basename,
        # so it is already full-path-keyed -- return it unchanged.
        # Running it through the basename migration instead would compare
        # basenames against a '/'-prefixed watermark ('/' sorts below
        # most filename characters), find seen=[], and silently reset the
        # watermark to "" -- re-streaming the entire directory as
        # duplicates on exactly the upgrade path this migration serves.
        # (A separator-free key is safe either way: for a glob whose
        # expansion has no directory component the full-path key IS the
        # basename, so the v1 migration below is the identity.)
        tail = wm.split("|", 1)[-1] if self.order == "mtime" else wm
        if os.sep in tail:
            return wm
        listing = self._listing()
        seen = [k2 for k2, f in listing if self._v1_key(f) <= wm]
        new_wm = max(seen) if seen else ""
        skipped = [f for k2, f in listing
                   if self._v1_key(f) > wm and k2 <= new_wm]
        if skipped:
            raise ValueError(
                f"cannot migrate pre-v2 stream watermark {wm!r}: files "
                f"{skipped} are unprocessed under the old basename key "
                "but sort below the migrated full-path watermark "
                f"{new_wm!r}. Restart the query from a fresh checkpoint "
                "(or with stream_order='mtime').")
        return new_wm

    def partitions(self, start: dict, end: dict):
        # Both ends may come from a pre-v2 checkpoint (Spark replays a
        # pending batch with the checkpointed start AND end).
        lo, hi = self._normalize_wm(start), self._normalize_wm(end)
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
