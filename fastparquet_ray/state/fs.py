"""Filesystem abstraction for shard + manifest I/O.

Reference analog: fastparquet threads an ``open_with`` callable and
fsspec filesystem through every read/write so datasets live on any
object store (/root/reference/fastparquet/api.py:95-103 ``open_with``,
writer.py:864-869). Here every component that touches shard or
manifest bytes resolves the filesystem from the path URI via fsspec:

    /data/enc            -> local filesystem (the default, unchanged)
    file:///data/enc     -> local via the fsspec path
    s3://bucket/enc      -> S3 (same code path, no sandbox test)
    memory://enc         -> in-process store (unit tests)

Components ship the URI string across Ray task/actor boundaries and
re-resolve per process (fsspec instances are picklable, but resolving
from the URI is cheaper and avoids stale connection state). Note that
``memory://`` is process-local by nature — it exercises the full
abstraction in-process; multi-process pipelines need a shared store
(local dir, NFS, S3, ...).

Writes use ``atomic_write``: tmp + rename on filesystems with real
rename (local), direct single-shot write elsewhere (object stores
publish a key atomically on close — the reference relies on the same
property when targeting S3).
"""

from __future__ import annotations

import posixpath
from typing import Any

import fsspec


def get_fs(path: str, filesystem: Any = None) -> tuple[Any, str]:
    """Resolve (fsspec filesystem, root-relative path) for a path or
    URI. An explicit ``filesystem`` wins (path stripped of protocol)."""
    if filesystem is not None:
        return filesystem, filesystem._strip_protocol(path)
    fs, p = fsspec.core.url_to_fs(path)
    return fs, p


def is_local(fs: Any) -> bool:
    proto = fs.protocol
    if isinstance(proto, (tuple, list)):
        return "file" in proto or "local" in proto
    return proto in ("file", "local")


def join(fs: Any, *parts: str) -> str:
    if is_local(fs):
        import os

        return os.path.join(*parts)
    return posixpath.join(*parts)


def atomic_write(fs: Any, path: str, data: bytes, suffix: str = "") -> None:
    """All-or-nothing publish of ``data`` at ``path``. Local: tmp file
    + os-level rename (crash leaves only a .tmp). Object stores /
    memory: one-shot put — the key appears only when the write
    completes, which is the same atomicity the tmp+rename dance buys
    locally."""
    if is_local(fs):
        tmp = f"{path}.tmp{suffix}"
        with fs.open(tmp, "wb") as f:
            f.write(data)
        import os

        os.replace(tmp, path)
    else:
        with fs.open(path, "wb") as f:
            f.write(data)


def read_bytes(fs: Any, path: str, length: int | None = None) -> bytes:
    with fs.open(path, "rb") as f:
        return f.read() if length is None else f.read(length)


def read_header_bytes(fs: Any, path: str, probe: int = 256 * 1024) -> bytes:
    """Complete shard-header blob: one probe read, re-read at the
    length the prefix declares when the header outgrows the probe
    (bloom-filter columns can push headers past 256 KB)."""
    head = read_bytes(fs, path, probe)
    need = 9 + int.from_bytes(head[5:9], "little")
    if len(head) < need:
        head = read_bytes(fs, path, need)
    return head


def to_pyarrow_fs(fs: Any):
    """Wrap an fsspec filesystem for APIs that want pyarrow.fs (Ray
    Data's FileBasedDatasource). Local filesystems pass through as
    native pyarrow LocalFileSystem (faster, zero wrapping)."""
    import pyarrow.fs as pafs

    if is_local(fs):
        return pafs.LocalFileSystem()
    return pafs.PyFileSystem(pafs.FSSpecHandler(fs))
