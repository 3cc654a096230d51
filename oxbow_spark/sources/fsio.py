"""Filesystem abstraction for the genomic sources: local paths always work
through the stdlib; URLs (http/https/s3/gs/ftp/...) work when ``fsspec``
is importable, and raise a clear error when it is not.

Mirrors the reference's remote/file-like source support
(py-oxbow/oxbow/_core/base.py:386-463, which routes URLs through fsspec
and accepts Python file-like objects) without making fsspec a hard
dependency: every source module calls these helpers instead of ``open`` /
``os.path`` directly, so a cluster with fsspec installed can
``spark.read.format("bam").load("https://host/f.bam")`` while a bare
environment keeps full local functionality.

Partitions ship plain path strings, so executors re-open via these same
helpers — remote reads need fsspec importable on executors too (same
requirement the reference has).
"""

from __future__ import annotations

import glob as _glob
import io
import itertools
import os
import re
from collections.abc import Callable
from typing import BinaryIO

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")

# ---------------------------------------------------------------------------
# Python file-like / callable sources (reference parity:
# py-oxbow/oxbow/_core/base.py:386-463 accepts fsspec URLs AND arbitrary
# Python file-like objects or callables). Under Spark the equivalent is a
# registered zero-arg OPENER addressed by a "pyobj://<name>" pseudo-path:
# every open_binary() call gets a fresh, independently-positioned handle
# (the reference's replayable-fragment discipline, SURVEY D5/D6).
#
# EXECUTOR CONSTRAINT (documented, by design): the registry lives in the
# registering process. Driver-side operations — header/metadata reads,
# schema inference, tag/attribute scans, `DataSource.header()` — work
# fully; distributed `read()` of a pyobj path fails on executors with the
# clear error below, because partition descriptions ship plain strings
# and Python workers are separate processes. For distributed scans,
# materialize to a real path or use an fsspec URL (both sides of the
# same trade-off the reference documents for non-serializable sources).
# ---------------------------------------------------------------------------

_PY_OPENERS: dict[str, Callable[[], BinaryIO]] = {}
_PY_SCHEME = "pyobj://"
_py_counter = itertools.count()


def register_opener(source, name: str | None = None) -> str:
    """Register a Python source and return its ``pyobj://<name>`` path.

    ``source`` may be:
    - a zero-arg callable returning a fresh binary file-like per call
      (the replay-safe form — every open is independent);
    - a ``bytes``/``bytearray`` buffer (wrapped in fresh BytesIO per
      open);
    - a file-like object with ``read``; if it has ``getbuffer`` (BytesIO)
      or is seekable its contents are snapshotted once so later opens
      replay from position 0 regardless of the object's cursor.
    """
    if name is None:
        name = f"src{next(_py_counter)}"
    if callable(source):
        opener = source
    elif isinstance(source, (bytes, bytearray)):
        data = bytes(source)
        opener = lambda: io.BytesIO(data)  # noqa: E731
    elif hasattr(source, "read"):
        if hasattr(source, "getbuffer"):
            data = bytes(source.getbuffer())
        elif getattr(source, "seekable", lambda: False)():
            pos = source.tell()
            source.seek(0)
            data = source.read()
            source.seek(pos)
        else:
            data = source.read()  # non-seekable stream: drain once
        opener = lambda: io.BytesIO(data)  # noqa: E731
    else:
        raise TypeError(
            f"register_opener: expected a callable, bytes, or file-like "
            f"object, got {type(source).__name__}"
        )
    _PY_OPENERS[name] = opener
    return _PY_SCHEME + name


def unregister_opener(path_or_name: str) -> None:
    _PY_OPENERS.pop(path_or_name.removeprefix(_PY_SCHEME), None)


def _py_open(path: str) -> BinaryIO:
    name = path.removeprefix(_PY_SCHEME)
    opener = _PY_OPENERS.get(name)
    if opener is None:
        raise FileNotFoundError(
            f"{path!r} is not registered in this process. pyobj:// sources "
            "are driver-side only (header/schema/metadata reads); for "
            "distributed scans write the data to a real path or fsspec URL."
        )
    f = opener()
    if not hasattr(f, "read"):
        raise TypeError(f"opener for {path!r} returned non-file {type(f)!r}")
    return f
# Windows drive letters ("C:/...") would false-positive on ":" alone; the
# "://" requirement avoids that. file:// is handled as remote-by-scheme but
# needs no extra deps when fsspec is present; without fsspec we strip it.
_LOCAL_SCHEMES = ("file://",)


def is_remote(path: str) -> bool:
    """True when ``path`` is a URL that must be opened through fsspec."""
    if not _SCHEME_RE.match(path):
        return False
    return not path.startswith(_LOCAL_SCHEMES)


def strip_local_scheme(path: str) -> str:
    for s in _LOCAL_SCHEMES:
        if path.startswith(s):
            return path[len(s):] or "/"
    return path


def _fsspec():
    try:
        import fsspec  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - exercised via stub tests
        raise ImportError(
            "remote paths (http/s3/gs/...) require the 'fsspec' package "
            "(plus the protocol extra, e.g. s3fs/gcsfs) on the driver and "
            "executors; install it or copy the file locally"
        ) from exc
    return fsspec


def _fs_of(path: str):
    fsspec = _fsspec()
    fs, p = fsspec.core.url_to_fs(path)
    return fs, p


def open_binary(path: str) -> BinaryIO:
    """Seekable binary handle for a local path, URL, or pyobj source."""
    if path.startswith(_PY_SCHEME):
        return _py_open(path)
    path = strip_local_scheme(path)
    if not is_remote(path):
        return open(path, "rb")
    fsspec = _fsspec()
    return fsspec.open(path, "rb").open()


def getsize(path: str) -> int:
    if path.startswith(_PY_SCHEME):
        with _py_open(path) as f:
            f.seek(0, os.SEEK_END)
            return f.tell()
    path = strip_local_scheme(path)
    if not is_remote(path):
        return os.path.getsize(path)
    fs, p = _fs_of(path)
    return int(fs.info(p)["size"])


def getmtime(path: str) -> float:
    """Modification time (epoch seconds); remote filesystems report what
    their metadata carries (fsspec ``mtime``/``LastModified``)."""
    path = strip_local_scheme(path)
    if not is_remote(path):
        return os.path.getmtime(path)
    fs, p = _fs_of(path)
    info = fs.info(p)
    m = info.get("mtime") or info.get("LastModified")
    if m is None:
        return 0.0
    return m.timestamp() if hasattr(m, "timestamp") else float(m)


def exists(path: str) -> bool:
    if path.startswith(_PY_SCHEME):
        return path.removeprefix(_PY_SCHEME) in _PY_OPENERS
    path = strip_local_scheme(path)
    if not is_remote(path):
        return os.path.exists(path)
    fs, p = _fs_of(path)
    return bool(fs.exists(p))


def expand(path: str) -> list[str]:
    """Directory / glob / single-path expansion, local or remote.

    Remote globs and directory listings go through the URL's filesystem;
    plain remote URLs (no glob characters) pass through untouched so a
    missing-object error surfaces at open time with a useful message.
    """
    if path.startswith(_PY_SCHEME):
        return [path]
    path_l = strip_local_scheme(path)
    if not is_remote(path_l):
        if os.path.isdir(path_l):
            return sorted(
                os.path.join(path_l, f)
                for f in os.listdir(path_l)
                if not f.startswith(("_", "."))
            )
        hits = sorted(_glob.glob(path_l))
        if not hits:
            raise FileNotFoundError(f"no files match {path!r}")
        return hits
    fs, p = _fs_of(path_l)
    if any(ch in p for ch in "*?["):
        hits = sorted(fs.glob(p))
        if not hits:
            raise FileNotFoundError(f"no files match {path!r}")
        return [fs.unstrip_protocol(h) for h in hits]
    if fs.isdir(p):
        return sorted(
            fs.unstrip_protocol(h)
            for h in fs.ls(p, detail=False)
            if not os.path.basename(h).startswith(("_", "."))
        )
    return [path_l]
