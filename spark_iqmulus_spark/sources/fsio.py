"""Filesystem routing for the commit-side byte movers.

The writers' and transcoders' commit phases move bytes with plain POSIX
calls (``open``/``os.sendfile``/``os.rename``), which assumes the output
location is a filesystem the driver shares with the workers.  That holds
in-sandbox and on clusters with a shared POSIX mount, but the 100 TB
deployment writes to an object store or HDFS — so every commit helper
accepts an optional ``pyarrow.fs.FileSystem`` and routes through it when
given (SURVEY §1.4/§3.2; VERDICT r7 item 7).

Two regimes, chosen per call:

- ``filesystem is None`` (default): the POSIX fast path, byte-for-byte the
  pre-existing behavior — in-kernel ``os.sendfile`` concat (~1.2 GB/s,
  measured 11× faster than offset-parallel ``pwrite``, SCALE.md §commit),
  ``os.rename`` swaps.
- a ``pyarrow.fs.FileSystem``: all reads/writes/renames go through the
  filesystem's streams.  ``LocalFileSystem`` gives the same result as the
  default (tests pin that); ``S3FileSystem``/``HadoopFileSystem``/
  ``SubTreeFileSystem`` make the same commit code serve remote URIs.
  pyarrow filesystems pickle, so worker-side part I/O can use them too.

``from_uri_or_local`` is the convenience resolver: paths with a scheme
(``s3://…``) resolve to their filesystem + stripped path, bare paths stay
on the POSIX fast path.

Semantics note: ``rename`` on an object store is copy+delete, not atomic —
callers that rely on rename atomicity (the manifest swap) keep their
recovery logic regardless of the regime.
"""

from __future__ import annotations

import os
import shutil

_CHUNK = 1 << 20


def from_uri_or_local(path: str):
    """Resolve ``path`` to ``(filesystem_or_None, fs_path)``.

    A bare path (no scheme, or ``file://``) returns ``(None, path)`` —
    the POSIX fast-path regime.  A scheme'd URI resolves through
    ``pyarrow.fs.FileSystem.from_uri``.
    """
    if "://" not in path:
        return None, path
    from pyarrow.fs import FileSystem, LocalFileSystem

    fs, fs_path = FileSystem.from_uri(path)
    if isinstance(fs, LocalFileSystem):
        return None, fs_path
    return fs, fs_path


def open_output(path: str, filesystem=None):
    """Open ``path`` for binary write (truncating)."""
    if filesystem is None:
        return open(path, "wb")
    return filesystem.open_output_stream(path)


def open_input(path: str, filesystem=None):
    """Open ``path`` for random-access binary read (seek + read)."""
    if filesystem is None:
        return open(path, "rb")
    return filesystem.open_input_file(path)


def makedirs(path: str, filesystem=None) -> None:
    if filesystem is None:
        os.makedirs(path, exist_ok=True)
    else:
        filesystem.create_dir(path, recursive=True)


def rmtree(path: str, filesystem=None) -> None:
    """Best-effort recursive delete (commit-phase part-dir cleanup)."""
    if filesystem is None:
        shutil.rmtree(path, ignore_errors=True)
    else:
        try:
            filesystem.delete_dir(path)
        except (FileNotFoundError, OSError):
            pass


def remove(path: str, filesystem=None) -> None:
    if filesystem is None:
        os.remove(path)
    else:
        filesystem.delete_file(path)


def rename(src: str, dst: str, filesystem=None) -> None:
    """Move ``src`` over ``dst``.  POSIX rename is atomic; ``fs.move`` on an
    object store is copy+delete — callers keep their own recovery logic."""
    if filesystem is None:
        os.rename(src, dst)
    else:
        filesystem.move(src, dst)


def exists(path: str, filesystem=None) -> bool:
    if filesystem is None:
        return os.path.exists(path)
    from pyarrow.fs import FileType

    return filesystem.get_file_info(path).type != FileType.NotFound


def isdir(path: str, filesystem=None) -> bool:
    if filesystem is None:
        return os.path.isdir(path)
    from pyarrow.fs import FileType

    return filesystem.get_file_info(path).type == FileType.Directory


def listdir(path: str, filesystem=None) -> list[str]:
    """Base names of the direct children of ``path`` (commit-phase output
    hygiene listing).  Missing directory → empty list."""
    if filesystem is None:
        return os.listdir(path) if os.path.isdir(path) else []
    from pyarrow.fs import FileSelector

    try:
        infos = filesystem.get_file_info(
            FileSelector(path, recursive=False, allow_not_found=True)
        )
    except (FileNotFoundError, OSError):
        return []
    return [i.base_name for i in infos]


def file_size(path: str, filesystem=None) -> int:
    if filesystem is None:
        return os.stat(path).st_size
    return filesystem.get_file_info(path).size


def copy_into(out, src_path: str, filesystem=None) -> None:
    """Append ``src_path``'s bytes to the open binary stream ``out`` through
    ``filesystem`` (chunked; no sendfile — pyarrow streams have no fd)."""
    with open_input(src_path, filesystem) as src:
        while True:
            chunk = src.read(_CHUNK)
            if not chunk:
                break
            out.write(chunk)
