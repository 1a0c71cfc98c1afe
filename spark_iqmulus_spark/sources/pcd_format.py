"""PCD (Point Cloud Data) header model: parse / serialize / LZF codec.

PCD is the native format of the Point Cloud Library; this codec is written
against the *public* file-format description (pcl.readthedocs.io, "The PCD
file format"): an ASCII header of ``KEY value...`` lines (VERSION FIELDS
SIZE TYPE COUNT WIDTH HEIGHT VIEWPOINT POINTS DATA) followed by the point
data in one of three layouts:

- ``ascii``   — one whitespace-separated text row per point
- ``binary``  — packed little-endian records, point-major (fixed stride)
- ``binary_compressed`` — ``u32 compressed_size, u32 uncompressed_size``
  then an LZF-compressed block that decompresses to *field-major* (SoA)
  data: all values of field 0, then all of field 1, ...

``COUNT k`` (k > 1) fields expand to ``name_0 .. name_{k-1}`` scalar
columns, the conventional flattening (each element keeps the declared
SIZE/TYPE).  The format extends the reference's source family
(PlyRelation.scala / LasRelation.scala) to a third public point-cloud
container; there is no PCD support in the reference to mirror, so the
semantics here are purely spec-derived.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# (TYPE letter, SIZE) → numpy char.  I=signed, U=unsigned, F=float.
PCD_TYPES: dict[tuple[str, int], str] = {
    ("I", 1): "i1",
    ("I", 2): "i2",
    ("I", 4): "i4",
    ("I", 8): "i8",
    ("U", 1): "u1",
    ("U", 2): "u2",
    ("U", 4): "u4",
    ("U", 8): "u8",
    ("F", 4): "f4",
    ("F", 8): "f8",
}

_NP_TO_PCD = {v: k for k, v in PCD_TYPES.items()}

#: spark sql simple name → numpy char (signed/float only — what we write)
SPARK_TO_NP = {
    "tinyint": "i1",
    "smallint": "i2",
    "int": "i4",
    "bigint": "i8",
    "float": "f4",
    "double": "f8",
}


@dataclass
class PcdField:
    """One *expanded* scalar column (COUNT>1 fields arrive pre-flattened)."""

    name: str
    np_char: str

    @property
    def size(self) -> int:
        return int(self.np_char[1:])


@dataclass
class PcdHeader:
    location: str = ""
    version: str = "0.7"
    fields: list[PcdField] = field(default_factory=list)
    width: int = 0
    height: int = 1
    viewpoint: tuple = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
    points: int = 0
    data_kind: str = "binary"  # ascii | binary | binary_compressed
    data_offset: int = 0  # byte offset of the data section
    #: declared COUNT per *original* header field, in header order.  The
    #: expanded ``fields`` list flattens COUNT>1 fields to name_0..name_{k-1};
    #: binary_compressed (SoA) layout stores each original field as ONE
    #: ``n*count``-element block with a point's elements adjacent, so the
    #: decoder needs the grouping back.  Empty ⇒ all-1 (constructed headers).
    counts: list[int] = field(default_factory=list)

    def field_groups(self):
        """Yield ``(expanded_fields_slice, count)`` per original field."""
        counts = self.counts or [1] * len(self.fields)
        i = 0
        for c in counts:
            yield self.fields[i : i + c], c
            i += c

    @property
    def stride(self) -> int:
        return sum(f.size for f in self.fields)

    # -- parse -------------------------------------------------------------

    @classmethod
    def parse_file(cls, path: str, filesystem=None) -> "PcdHeader":
        from .fsio import open_input

        with open_input(path, filesystem) as f:
            buf = f.read(16 * 1024)
        return cls.parse(buf, location=path)

    @classmethod
    def parse(cls, buf: bytes, location: str = "") -> "PcdHeader":
        hdr = cls(location=location)
        names: list[str] = []
        sizes: list[int] = []
        types: list[str] = []
        counts: list[int] = []
        offset = 0
        seen_data = False
        for raw_line in buf.split(b"\n"):
            offset += len(raw_line) + 1
            line = raw_line.decode("ascii", "replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            key = key.upper()
            vals = rest.split()
            if key == "VERSION":
                hdr.version = rest.strip()
            elif key == "FIELDS" or key == "COLUMNS":
                names = vals
            elif key == "SIZE":
                sizes = [int(v) for v in vals]
            elif key == "TYPE":
                types = [v.upper() for v in vals]
            elif key == "COUNT":
                counts = [int(v) for v in vals]
            elif key == "WIDTH":
                hdr.width = int(vals[0])
            elif key == "HEIGHT":
                hdr.height = int(vals[0])
            elif key == "VIEWPOINT":
                hdr.viewpoint = tuple(float(v) for v in vals)
            elif key == "POINTS":
                hdr.points = int(vals[0])
            elif key == "DATA":
                hdr.data_kind = vals[0].lower()
                hdr.data_offset = offset
                seen_data = True
                break
        if not seen_data:
            raise ValueError(f"{location}: no DATA line in PCD header")
        if not names or len(names) != len(sizes) or len(names) != len(types):
            raise ValueError(
                f"{location}: FIELDS/SIZE/TYPE lengths disagree "
                f"({len(names)}/{len(sizes)}/{len(types)})"
            )
        if not counts:
            counts = [1] * len(names)
        if hdr.data_kind not in ("ascii", "binary", "binary_compressed"):
            raise ValueError(f"{location}: unknown DATA kind {hdr.data_kind!r}")
        if not hdr.points:
            hdr.points = hdr.width * max(1, hdr.height)
        for name, size, typ, count in zip(names, sizes, types, counts):
            np_char = PCD_TYPES.get((typ, size))
            if np_char is None:
                raise ValueError(
                    f"{location}: unsupported TYPE/SIZE {typ}{size} for {name}"
                )
            if count == 1:
                hdr.fields.append(PcdField(name, np_char))
            else:
                hdr.fields.extend(
                    PcdField(f"{name}_{i}", np_char) for i in range(count)
                )
        hdr.counts = list(counts)
        return hdr

    # -- serialize ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        names = " ".join(f.name for f in self.fields)
        sizes = " ".join(str(f.size) for f in self.fields)
        types = " ".join(_NP_TO_PCD[f.np_char][0] for f in self.fields)
        counts = " ".join("1" for _ in self.fields)
        vp = " ".join(f"{v:g}" for v in self.viewpoint)
        return (
            "# .PCD v0.7 - Point Cloud Data file format\n"
            f"VERSION {self.version}\n"
            f"FIELDS {names}\n"
            f"SIZE {sizes}\n"
            f"TYPE {types}\n"
            f"COUNT {counts}\n"
            f"WIDTH {self.points}\n"
            "HEIGHT 1\n"
            f"VIEWPOINT {vp}\n"
            f"POINTS {self.points}\n"
            f"DATA {self.data_kind}\n"
        ).encode("ascii")

    def info(self) -> dict:
        """pcdinfo-style summary (mirrors LasHeader.info / lasinfo)."""
        return {
            "path": self.location,
            "version": self.version,
            "data": self.data_kind,
            "points": self.points,
            "width": self.width,
            "height": self.height,
            "stride": self.stride,
            "fields": [(f.name, f.np_char) for f in self.fields],
        }


# -- LZF block codec (binary_compressed) -----------------------------------
#
# LZF is the public algorithm by Marc Lehmann used verbatim by PCL for
# binary_compressed PCD.  The decoder below is a direct transcription of
# the published format: control byte < 32 → literal run of (ctrl+1) bytes;
# otherwise a back-reference of length (ctrl>>5)+2 (plus an extension byte
# when the 3-bit length field saturates at 7) at distance
# ((ctrl & 0x1f) << 8 | next) + 1.  Pure Python, so ~MB/s — PCD files
# decompress once per file partition; for bulk pipelines prefer
# DATA binary (the fixed-stride scale path, record-aligned splits).


def lzf_decompress(data: bytes, expected: int) -> bytes:
    out = bytearray(expected)
    o = 0
    i = 0
    n = len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:
            run = ctrl + 1
            out[o : o + run] = data[i : i + run]
            i += run
            o += run
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            length += 2
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            if ref < 0:
                raise ValueError("corrupt LZF stream: back-reference before start")
            # byte-by-byte: back-references may overlap their own output
            for _ in range(length):
                out[o] = out[ref]
                o += 1
                ref += 1
    if o != expected:
        raise ValueError(f"LZF stream decompressed to {o}, expected {expected}")
    return bytes(out)


def lzf_compress_literal(data: bytes) -> bytes:
    """Valid-but-uncompressed LZF: emit maximal literal runs (control byte
    < 32 = run of ctrl+1 literals).  Used by the binary_compressed *writer*
    path and tests — output is accepted by any LZF decoder including PCL's."""
    out = bytearray()
    for start in range(0, len(data), 32):
        chunk = data[start : start + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def read_compressed_body(path: str, hdr: PcdHeader) -> bytes:
    """Read + decompress a binary_compressed data section to its field-major
    (SoA) uncompressed bytes."""
    with open(path, "rb") as f:
        f.seek(hdr.data_offset)
        comp_size, uncomp_size = struct.unpack("<II", f.read(8))
        comp = f.read(comp_size)
    return lzf_decompress(comp, uncomp_size)
