"""Filesystem abstraction for the state layer (sinks, lineage
manifests, versioned tables).

Every path the state layer touches is either a LOCAL path (``str`` /
``pathlib.Path`` — the single-node fast path, where commits use true
POSIX hard-link/rename atomicity) or a ``scheme://...`` URI resolved
through ``pyarrow.fs`` — the multi-node path, where sinks and
manifests land on shared object storage instead of each actor's
private disk. ``FsPath`` carries the resolved ``(FileSystem, path)``
pair plus the original scheme so paths recorded in manifests round-trip
(a manifest written as ``mock://out/partition=3/...`` lists files that
re-resolve to the same filesystem on read).

Scheme resolution order:
1. ``register_filesystem(scheme, fs)`` — explicit mounts (tests mount
   an fsspec-backed filesystem under ``mock://``; a deployment can
   mount a configured S3 client the same way);
2. ``pyarrow.fs.FileSystem.from_uri`` — the built-in handlers (s3://,
   gs://, hdfs://, file://).

Workers never resolve schemes: driver code resolves once and ships the
``FsPath`` (filesystems pickle) into actor constructors, so the
registry is a driver-side convenience, not distributed state.

Commit protocols (used by manifests.py / versioned.py):
- local: write tmp + ``os.link`` (exclusive) or ``os.replace``
  (last-wins) — atomic, crash-safe, the guarantees tests assert.
- remote: write tmp + ``move`` (copy-PUT + delete on object stores —
  readers see the old or the complete new object, never a partial
  write). For the exclusive/OCC flavor, a CONDITIONAL-PUT backend can
  be mounted per filesystem via ``register_put_if_absent(fs, fn)``
  with ``fn(fs, path, data: bytes) -> bool`` — the S3
  ``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` / Azure
  ``If-None-Match`` hook that makes the publish a true atomic
  put-if-absent (the loser is deterministically refused by the
  store). Without a mounted backend the fallback is existence check
  → move → read-back verify, which narrows the lost-race window to
  concurrent sub-second publishes and detects the loser when the
  store's PUT is last-writer-wins — the same degradation Delta/
  Iceberg document for S3 without a coordination service.
"""

from __future__ import annotations

import fnmatch
import os
import posixpath
from pathlib import Path

import pyarrow.parquet as pq
from pyarrow import fs as pafs

_SCHEMES: dict[str, pafs.FileSystem] = {}
_PUT_IF_ABSENT: dict[int, object] = {}


def register_filesystem(scheme: str, filesystem: pafs.FileSystem) -> None:
    """Mount ``filesystem`` under ``scheme://`` for later ``fspath``
    calls (driver-side; resolved FsPaths ship to workers by value)."""
    _SCHEMES[scheme] = filesystem


def register_put_if_absent(filesystem: pafs.FileSystem, fn) -> None:
    """Mount a conditional-put backend for ``filesystem``:
    ``fn(fs, path, data: bytes) -> bool`` must atomically create
    ``path`` with ``data`` ONLY if it does not exist, returning False
    (without writing) when it already does — the store-side primitive
    (S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=0``) that makes
    ``publish_exclusive`` a true OCC publish on object storage. Keyed
    by filesystem IDENTITY — pair it with ``register_filesystem`` so
    every ``fspath`` resolution returns the same pinned instance
    (paths resolved through ``FileSystem.from_uri`` construct a fresh
    filesystem per call, which would never match). Register on the
    driver before resolving FsPaths (commits run driver-side, so
    workers never need it). Pass ``None`` to unregister."""
    if fn is None:
        _PUT_IF_ABSENT.pop(id(filesystem), None)
    else:
        _PUT_IF_ABSENT[id(filesystem)] = fn


class FsPath:
    """A ``(FileSystem, path)`` pair that behaves enough like
    ``pathlib.Path`` (``/`` join, ``.name``, ``.exists()``, ...) for
    the state layer, local or remote alike. ``str(p)`` returns the
    original URI form so recorded paths re-resolve."""

    __slots__ = ("fs", "path", "prefix")

    def __init__(self, fs: pafs.FileSystem, path: str, prefix: str = ""):
        self.fs = fs
        self.path = path.rstrip("/") if path != "/" else path
        self.prefix = prefix  # "" for local, "scheme://" otherwise

    # ---------------------------------------------------------- naming --
    def __truediv__(self, name: str) -> "FsPath":
        return FsPath(self.fs, posixpath.join(self.path, str(name)),
                      self.prefix)

    @property
    def name(self) -> str:
        return posixpath.basename(self.path)

    @property
    def parent(self) -> "FsPath":
        return FsPath(self.fs, posixpath.dirname(self.path), self.prefix)

    def __str__(self) -> str:
        return self.prefix + self.path

    def __repr__(self) -> str:
        return f"FsPath({str(self)!r})"

    def __fspath__(self) -> str:
        """os.PathLike — LOCAL paths interoperate with os/shutil/open;
        remote paths refuse (an os call on a bare remote path would
        silently hit the local disk)."""
        if not self.is_local:
            raise TypeError(f"{self} is not a local path")
        return self.path

    def __eq__(self, other) -> bool:
        return (isinstance(other, FsPath) and str(self) == str(other))

    def __hash__(self) -> int:
        return hash(str(self))

    @property
    def is_local(self) -> bool:
        return isinstance(self.fs, pafs.LocalFileSystem)

    # ------------------------------------------------------------- I/O --
    def exists(self) -> bool:
        return (self.fs.get_file_info(self.path).type
                is not pafs.FileType.NotFound)

    def is_dir(self) -> bool:
        return (self.fs.get_file_info(self.path).type
                is pafs.FileType.Directory)

    def size(self) -> int:
        return self.fs.get_file_info(self.path).size

    def mkdirs(self) -> None:
        self.fs.create_dir(self.path, recursive=True)

    def unlink(self, missing_ok: bool = False) -> None:
        try:
            self.fs.delete_file(self.path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def read_bytes(self) -> bytes:
        with self.fs.open_input_stream(self.path) as f:
            return f.read()

    def write_bytes(self, b: bytes) -> None:
        with self.fs.open_output_stream(self.path) as f:
            f.write(b)

    def read_text(self) -> str:
        return self.read_bytes().decode()

    def write_text(self, s: str) -> None:
        self.write_bytes(s.encode())

    def iterdir(self) -> list["FsPath"]:
        return self.glob("*")

    def glob(self, pattern: str, recursive: bool = False) -> list["FsPath"]:
        """Children matching ``pattern`` by base name, sorted by path
        (non-recursive = direct children, like ``pathlib.glob``)."""
        sel = pafs.FileSelector(self.path, recursive=recursive,
                                allow_not_found=True)
        out = [FsPath(self.fs, fi.path, self.prefix)
               for fi in self.fs.get_file_info(sel)
               if fnmatch.fnmatch(posixpath.basename(fi.path), pattern)]
        return sorted(out, key=lambda p: p.path)


def fspath(p) -> FsPath:
    """Resolve a local path / ``scheme://`` URI / FsPath to an FsPath."""
    if isinstance(p, FsPath):
        return p
    s = str(p)
    if "://" in s:
        scheme, rest = s.split("://", 1)
        if scheme in _SCHEMES:
            return FsPath(_SCHEMES[scheme], rest, scheme + "://")
        fs, path = pafs.FileSystem.from_uri(s)
        if isinstance(fs, pafs.LocalFileSystem):  # file:// → local
            return FsPath(fs, path, "")
        return FsPath(fs, path, scheme + "://")
    return FsPath(pafs.LocalFileSystem(), str(Path(s).absolute()), "")


# ------------------------------------------------------------- parquet --

def read_table(fp, **kw):
    fp = fspath(fp)
    return pq.read_table(fp.path, filesystem=fp.fs, **kw)


def write_table(table, fp, **kw) -> None:
    fp = fspath(fp)
    pq.write_table(table, fp.path, filesystem=fp.fs, **kw)


def read_metadata(fp):
    fp = fspath(fp)
    return pq.read_metadata(fp.path, filesystem=fp.fs)


def read_schema(fp):
    fp = fspath(fp)
    return pq.read_schema(fp.path, filesystem=fp.fs)


def read_parquet_dataset(fps: list, columns: list[str] | None = None,
                         **kw):
    """Lazy ``ray.data`` scan over FsPaths/paths (they must share one
    filesystem — one table/sink dir). Local paths keep Ray's default
    resolution; remote ones ship the filesystem object to read tasks."""
    import ray.data

    fps = [fspath(f) for f in fps]
    if fps and not fps[0].is_local:
        return ray.data.read_parquet([f.path for f in fps],
                                     filesystem=fps[0].fs,
                                     columns=columns, **kw)
    return ray.data.read_parquet([f.path for f in fps],
                                 columns=columns, **kw)


# ------------------------------------------------------ commit protocols --

def publish_replace(tmp: FsPath, target: FsPath) -> None:
    """Last-writer-wins atomic publish (per-partition lineage manifests:
    single committing writer per partition; a retry re-publishing the
    same content is idempotent). Local: ``os.replace``. Remote: move —
    copy-PUT + delete on object stores, so readers see old-or-new,
    never partial. The move is attempted WITH the destination in place
    first (object-store PUT overwrites atomically); only filesystems
    whose move refuses an existing destination fall back to
    unlink+retry — so on overwriting stores a concurrent reader never
    observes the target as NotFound mid-publish (the contract a resume
    check during manifest republish relies on)."""
    if tmp.is_local:
        os.replace(tmp.path, target.path)
        return
    try:
        tmp.fs.move(tmp.path, target.path)
    except OSError:
        if not target.exists():
            raise
        target.unlink()
        tmp.fs.move(tmp.path, target.path)


def publish_exclusive(tmp: FsPath, target: FsPath) -> bool:
    """Put-if-absent publish for OCC commits (versioned tables): returns
    False when a concurrent writer won the race — the caller raises its
    conflict. Local: hard-link (kernel-atomic EEXIST). Remote with a
    ``register_put_if_absent`` backend: one store-side conditional PUT
    — the loser is deterministically refused, true OCC. Remote without:
    existence check → move → read-back verify (see module docstring
    for the residual-window contract on last-writer-wins PUT stores)."""
    if tmp.is_local:
        try:
            os.link(tmp.path, target.path)
        except FileExistsError:
            tmp.unlink()
            return False
        tmp.unlink()
        return True
    cput = _PUT_IF_ABSENT.get(id(tmp.fs))
    if cput is not None:
        data = tmp.read_bytes()
        ok = bool(cput(tmp.fs, target.path, data))
        tmp.unlink()
        return ok
    if target.exists():
        tmp.unlink()
        return False
    content = tmp.read_text()
    tmp.fs.move(tmp.path, target.path)
    try:
        if target.read_text() != content:
            return False  # lost a concurrent PUT race
    except FileNotFoundError:
        return False
    return True
