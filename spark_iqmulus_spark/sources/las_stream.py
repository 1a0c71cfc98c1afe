"""Streaming point-cloud sources: ``spark.readStream.format("las"/"ply"/"pcd")``.

Continuous tile ingestion — the arrival pattern of a LiDAR production
pipeline (survey tiles landing in a directory) — expressed through the
Python DataSource *streaming* API: each micro-batch picks up files that
appeared since the last committed offset and decodes them with the exact
record-aligned vectorized path the batch reader uses.  The reference is
batch-only (no streaming anywhere in its source — SURVEY.md §1.1); this
extends its format family into Structured Streaming, so watermarked
windowed aggregates, dedup, and stateful operators compose directly over
arriving point clouds.

Semantics and limits (documented, deliberate):

- **Offsets are the sorted set of processed file paths.**  Exactly-once per
  file: a file is either fully in a batch or not yet seen; the checkpoint
  replays the same file set on recovery.  At 100k+ files the offset JSON
  grows with the directory — production would compact to an
  (mtime, path) watermark; the per-file contract here keeps recovery
  trivially correct and is bounded by files-per-checkpoint-era.
- **Schema is fixed at stream start** from the files present (or the first
  matching file); later files are adapted (widened/null-filled) onto it by
  ``adapt_batch`` like any multi-file batch read.  Starting a stream on an
  empty directory requires a ``.schema(...)`` — there is nothing to infer.
- ``fid`` is the file's position within *its* micro-batch (per-batch
  provenance; stable global ids would require the unbounded offset to ride
  along), ``pid`` is the in-file record index, as in batch.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from .binary_section import plan_record_ranges
from .pointcloud_common import (
    DEFAULT_PARTITION_BYTES,
    SectionPartition,
    adapt_batch,
    effective_partition_bytes,
    ignore_corrupt_option,
)


def _list_files(path: str, ext: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            f
            for f in glob.glob(os.path.join(path, f"*{ext}"))
            if os.path.isfile(f)
        )
    if any(ch in path for ch in "*?["):
        return sorted(f for f in glob.glob(path) if os.path.isfile(f))
    return [path] if os.path.exists(path) else []


def _stable_files(path: str, ext: str, settle: float) -> list[str]:
    """List files, excluding any still being written.

    Offsets are path sets, so a file claimed in an offset is never
    revisited — claiming a half-written tile would permanently truncate it.
    Producers SHOULD rename atomically into the watched directory; as a
    belt-and-braces check, any file whose mtime is within ``settle``
    seconds of now is re-stat'ed after the settle window and dropped from
    this offset (picked up next poll) if its size/mtime moved."""
    import time

    files = _list_files(path, ext)
    if settle <= 0 or not files:
        return files

    def _sig(f):
        try:
            st = os.stat(f)
            return (st.st_size, st.st_mtime_ns)
        except OSError:
            return None

    sigs = {f: _sig(f) for f in files}
    cutoff = (time.time() - settle) * 1e9
    young = [
        f
        for f in files
        if sigs[f] is not None and sigs[f][1] > cutoff
    ]
    if young:
        time.sleep(settle)
    return [
        f for f in files if sigs[f] is not None and _sig(f) == sigs[f]
    ]


@dataclass
class _StreamFilePartition(InputPartition):
    """One record range of one newly-arrived file (fid = batch-local)."""

    inner: SectionPartition


class SectionStreamReader(DataSourceStreamReader):
    """Shared streaming machinery for every fixed-stride point-cloud
    format: subclasses provide the extension and a ``_sections(paths)``
    returning ``(fid, BinarySection)`` per new file."""

    ext = ".las"

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("streaming read requires a path")
        self.options = options
        self.out_schema = schema
        self.partition_bytes = int(
            options.get("partition_bytes", DEFAULT_PARTITION_BYTES)
        )
        self.ignore_corrupt = ignore_corrupt_option(options)

    def _sections(self, paths: list[str]):
        raise NotImplementedError

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        settle = float(self.options.get("settle_seconds", 0.5))
        return {"files": _stable_files(self.path, self.ext, settle)}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        new = [p for p in end.get("files", []) if p not in seen]
        if not new:
            # the engine still runs empty batches; a no-op partition keeps
            # the contract (read() yields nothing for it)
            return [_StreamFilePartition(None)]
        secs = list(self._sections(new))
        total = sum(s.count * s.stride for _, s in secs)
        target = effective_partition_bytes(total, self.partition_bytes)
        parts: list[_StreamFilePartition] = []
        for fid, section in secs:
            for rec_start, n in plan_record_ranges(
                section.count, section.stride, target
            ):
                parts.append(
                    _StreamFilePartition(
                        SectionPartition(section, rec_start, n, fid)
                    )
                )
        return parts or [_StreamFilePartition(None)]

    def read(self, partition: _StreamFilePartition):
        p = partition.inner
        if p is None:
            return iter(())
        want = [
            f.name
            for f in self.out_schema.fields
            if f.name not in ("fid", "pid")
            and any(sf.name == f.name for sf in p.section.fields)
        ]
        raw = p.section.read_batch(
            p.rec_start, p.n_records, p.fid, columns=want,
            allow_short=self.ignore_corrupt,
        )
        return iter([adapt_batch(raw, self.out_schema)])

    def commit(self, end: dict) -> None:
        pass  # offsets are replay-safe; nothing to clean up


class LasStreamReader(SectionStreamReader):
    ext = ".las"

    def _sections(self, paths):
        from .las import _las_sections

        return [
            (fid, section)
            for fid, section, _ in _las_sections(paths, self.ignore_corrupt)
        ]


class PlyStreamReader(SectionStreamReader):
    ext = ".ply"

    def _sections(self, paths):
        from .ply import _sections as ply_sections

        element = self.options.get("element", "vertex")
        out = []
        for fid, section, hdr in ply_sections(
            paths, element, self.ignore_corrupt
        ):
            if hdr.is_ascii:
                raise ValueError(
                    f"{section.path}: ascii PLY is not supported in the"
                    " streaming source (no fixed stride) — convert to binary"
                )
            out.append((fid, section))
        return out


class PcdStreamReader(SectionStreamReader):
    ext = ".pcd"

    def _sections(self, paths):
        from .pcd import _binary_section, _headers

        out = []
        for fid, path, hdr in _headers(paths, self.ignore_corrupt):
            if hdr.data_kind != "binary":
                raise ValueError(
                    f"{path}: DATA {hdr.data_kind} is not supported in the"
                    " streaming source — use DATA binary (the scale layout)"
                )
            out.append((fid, _binary_section(path, hdr)))
        return out


# -- streaming sinks --------------------------------------------------------

def make_stream_writer(fmt: str, options, schema):
    """``df.writeStream.format("las"/"ply"/"pcd")`` — one merged
    ``batch-<id>.<fmt>`` per micro-batch (the tile-per-interval layout a
    continuous ingestion pipeline produces).  Task side reuses the batch
    writer's Arrow→numpy encode (and, for LAS, running header stats)
    verbatim; the per-batch commit is the same header-merge + sendfile
    concat, landing in an idempotent ``batch-{id:05d}.<fmt>`` so
    micro-batch replay after failure overwrites rather than duplicates
    (exactly-once per batch id).  Empty micro-batches write nothing."""
    from pyspark.sql.datasource import DataSourceStreamArrowWriter

    if fmt != "las":
        inner_cls = None
        if fmt == "ply":
            from .ply import PlyWriter as inner_cls
        elif fmt == "pcd":
            from .pcd import PcdWriter as inner_cls
        else:
            raise ValueError(f"no streaming sink for format {fmt!r}")

        class CountStreamWriter(DataSourceStreamArrowWriter):
            """ply/pcd: commit messages carry (fid, part_path, count,
            bounds)."""

            def __init__(self):
                self._w = inner_cls(options, schema, overwrite=False)
                self._w.fid_paths = None  # one file per batch, no restore

            def write(self, iterator):
                return self._w.write(iterator)

            def commit(self, messages, batchId: int) -> None:
                paths, total, blist = [], 0, []
                for m in messages:
                    if m is None:
                        continue
                    for _fid, part_path, count, bounds in m.parts:
                        paths.append(part_path)
                        total += count
                        blist.append(bounds)
                if not total:
                    for p in paths:
                        if os.path.exists(p):
                            os.remove(p)
                    return
                dest = os.path.join(
                    self._w.path, f"batch-{batchId:05d}.{fmt}"
                )
                self._w._merge_one(dest, sorted(paths), total)
                if self._w.emit_manifest:
                    # per-batch sidecar refresh: write_sidecar carries over
                    # still-fresh rows for earlier batches' files, so the
                    # streaming dataset answers min/max zero-job too
                    from .automanifest import emit_from_commit

                    emit_from_commit(
                        self._w.path, self._w.data_fields,
                        [(dest, total)], [blist],
                    )

            def abort(self, messages, batchId: int) -> None:
                for m in messages:
                    if m is None:
                        continue
                    for part in m.parts:
                        if os.path.exists(part[1]):
                            os.remove(part[1])

        return CountStreamWriter()

    from .las import LasWriter

    class LasStreamWriter(DataSourceStreamArrowWriter):
        def __init__(self):
            self._w = LasWriter(options, schema, overwrite=False)
            # streaming: one file per batch — never name-restore per fid
            self._w.fid_paths = None

        def write(self, iterator):
            return self._w.write(iterator)

        def commit(self, messages, batchId: int) -> None:
            parts = []
            blist = []
            for m in messages:
                if m is None:
                    continue
                for (
                    _fid, part_path, count, pmin, pmax, ret, emin, emax,
                    bounds,
                ) in m.parts:
                    parts.append((part_path, count, pmin, pmax, ret, emin, emax))
                    blist.append(bounds)
            if not sum(p[1] for p in parts):
                for p in parts:  # empty batch: drop empty sidecars
                    if os.path.exists(p[0]):
                        os.remove(p[0])
                return
            dest = os.path.join(self._w.path, f"batch-{batchId:05d}.las")
            self._w._merge_one(dest, parts)
            if self._w.emit_manifest:
                from .automanifest import emit_from_commit

                emit_from_commit(
                    self._w.path, self._w.fields,
                    [(dest, sum(p[1] for p in parts))], [blist],
                )

        def abort(self, messages, batchId: int) -> None:
            for m in messages:
                if m is None:
                    continue
                for part in m.parts:
                    if os.path.exists(part[1]):
                        os.remove(part[1])

    return LasStreamWriter()


def make_las_stream_writer(options, schema):
    return make_stream_writer("las", options, schema)
