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
import os
import re
from typing import BinaryIO

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
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
    """Seekable binary handle for a local path or URL."""
    path = strip_local_scheme(path)
    if not is_remote(path):
        return open(path, "rb")
    fsspec = _fsspec()
    return fsspec.open(path, "rb").open()


def getsize(path: str) -> int:
    path = strip_local_scheme(path)
    if not is_remote(path):
        return os.path.getsize(path)
    fs, p = _fs_of(path)
    return int(fs.info(p)["size"])


def exists(path: str) -> bool:
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
