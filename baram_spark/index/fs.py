"""Filesystem-agnostic metadata I/O for the index snapshot layer.

Spark reads and writes the big parquet relations (docs, postings,
embeddings, ...) through its own Hadoop connectors and understands the
same URIs natively.  Everything Spark has *no* API for — the manifest
swap, versioned-stats listing, tombstone reads, generation-dir GC — goes
through this module so the index can live on any filesystem
``pyarrow.fs`` can reach (local, ``s3://``, ``hdfs://``, ``gs://``), the
reference's remote-store property (OpenSearch is remote by nature,
/root/reference/src/embedding/mod.rs:237-350).

Path handling:

* plain absolute paths and Spark-style ``file:`` prefixes resolve to the
  local filesystem (with true atomic ``os.rename`` for the manifest swap);
* any other ``scheme://`` URI resolves through
  ``pyarrow.fs.FileSystem.from_uri`` (S3/HDFS/GCS);
* :func:`register_filesystem` lets deployments (and tests) mount an
  explicit ``pyarrow.fs.FileSystem`` — e.g. a ``SubTreeFileSystem`` — on a
  scheme of their own, optionally with a ``spark_root`` translation so
  Spark jobs can reach the same bytes.

On object stores without atomic rename the manifest swap degrades to the
store's move (copy+delete on S3) — same caveat as every file-listing
table format: a real multi-writer deployment serializes the swap behind a
catalog or lock service; the OCC base-snapshot check still narrows the
race to the re-read→move window.
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from pyarrow import fs as pafs

__all__ = [
    "register_filesystem", "unregister_filesystem", "resolve", "spark_url",
    "exists", "isdir", "listdir", "walk_dir_names", "read_text",
    "write_text", "rename", "remove", "makedirs", "rmtree",
    "read_json", "read_parquet", "write_parquet_file",
]

_URI_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")


@dataclass
class _Mount:
    fs: pafs.FileSystem
    spark_root: str | None  # local dir Spark uses for the same bytes


_REGISTRY: dict[str, _Mount] = {}
_LOCAL = pafs.LocalFileSystem()
# resolved remote filesystems, keyed by scheme://authority (pyarrow
# resolves e.g. the S3 region PER BUCKET at from_uri time, and two
# namenode authorities are different clusters — a bare-scheme key would
# hand back the wrong client). Value = (filesystem, strip_prefix) where
# strip_prefix reconstructs the fs-local path. FileSystem.from_uri
# re-runs credential/config resolution per call — one commit issues
# dozens of metadata ops, so the instance must be reused.
_FS_CACHE: dict[str, tuple[pafs.FileSystem, str]] = {}
_AUTH_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)")


def register_filesystem(scheme: str, filesystem: pafs.FileSystem,
                        spark_root: str | None = None) -> None:
    """Mount ``filesystem`` on ``scheme://``. ``spark_root`` (a local
    directory holding the same bytes, e.g. the base dir of a
    ``SubTreeFileSystem``) lets :func:`spark_url` translate paths for
    Spark jobs that lack a Hadoop connector for the scheme."""
    _REGISTRY[scheme] = _Mount(filesystem, spark_root)


def unregister_filesystem(scheme: str) -> None:
    _REGISTRY.pop(scheme, None)


def _strip_file(p: str) -> str:
    # Spark emits file:/x, file:///x and file://host/x variants; an
    # authority component (file://HOST/x) is dropped, not treated as a
    # path segment
    p = p[len("file:"):]
    if p.startswith("//"):
        rest = p[2:]
        slash = rest.find("/")
        p = rest[slash:] if slash >= 0 else "/"
    return p or "/"


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Split a path/URI into (pyarrow FileSystem, fs-local path)."""
    p = str(path)
    if p.startswith("file:"):
        return _LOCAL, _strip_file(p)
    m = _URI_RE.match(p)
    if m:
        scheme = m.group(1)
        if scheme in _REGISTRY:
            rel = p[m.end():].lstrip("/")
            return _REGISTRY[scheme].fs, rel
        am = _AUTH_RE.match(p)
        key = am.group(0) if am else p
        cached = _FS_CACHE.get(key)
        if cached is not None:
            fs, strip = cached
            if p.startswith(strip):
                return fs, p[len(strip):]
        fs, rel = pafs.FileSystem.from_uri(p)
        if p.endswith(rel):  # cacheable: strip + rel reconstructs p
            _FS_CACHE[key] = (fs, p[: len(p) - len(rel)])
        return fs, rel
    return _LOCAL, p


def spark_url(path: str) -> str:
    """Translate a metadata URI into one Spark's Hadoop layer can read.

    Identity for local paths and real ``s3://``/``hdfs://`` URIs (Spark
    has native connectors); registered test/deployment schemes translate
    through their ``spark_root``."""
    p = str(path)
    m = _URI_RE.match(p)
    if m and (mt := _REGISTRY.get(m.group(1))) and mt.spark_root:
        rel = p[m.end():].lstrip("/")
        return f"file:{mt.spark_root.rstrip('/')}/{rel}"
    return p


def _info(path: str) -> pafs.FileInfo:
    fs, p = resolve(path)
    return fs.get_file_info(p)


def exists(path: str) -> bool:
    return _info(path).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    return _info(path).type == pafs.FileType.Directory


def listdir(path: str) -> list[str]:
    """Base names of a directory's children; [] when missing."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except FileNotFoundError:
        # ONLY not-found maps to empty; transient IO errors (throttling,
        # network) must propagate — swallowing one here would alias
        # _next_gen onto a live generation and overwrite it
        return []
    return [i.base_name for i in infos]


def walk_dir_names(path: str) -> list[str]:
    """Base names of every DIRECTORY under ``path``, recursively."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=True))
    except FileNotFoundError:
        return []  # see listdir: not-found only
    return [i.base_name for i in infos
            if i.type == pafs.FileType.Directory]


def read_text(path: str) -> str:
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read().decode("utf-8")


def write_text(path: str, text: str) -> None:
    fs, p = resolve(path)
    with fs.open_output_stream(p) as f:
        f.write(text.encode("utf-8"))


def rename(src: str, dst: str) -> None:
    """Move/replace within one filesystem. POSIX-atomic on local (the
    manifest-swap commit point); the store's move elsewhere (see module
    docstring for the object-store caveat)."""
    fs, s = resolve(src)
    _, d = resolve(dst)
    if isinstance(fs, pafs.LocalFileSystem):
        os.rename(s, d)  # true atomic replace
    else:
        fs.move(s, d)


def remove(path: str) -> None:
    fs, p = resolve(path)
    fs.delete_file(p)


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    """Recursive delete; missing paths are a no-op (GC idempotence)."""
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass  # missing only; a real IO failure must surface, not skip GC


def read_json(path: str) -> dict | None:
    """The manifest read: None when missing or unparseable (a reader must
    never crash on a concurrent writer's half-visible swap)."""
    try:
        return json.loads(read_text(path))
    except Exception:
        return None


def read_parquet(path: str, columns: list[str] | None = None):
    """Driver-side read of a small parquet file/dir → pyarrow Table."""
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    return pq.read_table(p, columns=columns, filesystem=fs)


def write_parquet_file(path: str, table) -> None:
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    pq.write_table(table, p, filesystem=fs)
