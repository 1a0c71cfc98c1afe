"""PLY header model: parse / serialize / section layout.

Covers the semantics of the reference's PlyHeader
(``/root/reference/src/main/scala/fr/ign/spark/iqmulus/ply/PlyHeader.scala:156-204``
parse; ``:106-111`` section offsets; ``:30-42`` type mapping) re-expressed in
Python against the *public* PLY specification: an ASCII header terminated by
``end_header`` followed by contiguous binary (or ASCII) element sections.

Supported: ``format binary_little_endian/binary_big_endian 1.0``, multiple
elements, scalar properties of the 8 fixed-width types, ``comment`` /
``obj_info`` lines.  List properties are rejected (the reference does not
support them either — fixed-stride records are the storage model).
"""

from __future__ import annotations

import io
import re
from dataclasses import dataclass, field

# PLY scalar type → (numpy char, byte size, spark sql type name)
# Unsigned types map to the signed type of equal width, mirroring the
# reference (PlyHeader.scala:30-42 maps uchar→ByteType etc. with an
# "UnsignedByteType ???" caveat); the raw bit pattern is preserved.
PLY_TYPES: dict[str, tuple[str, int, str]] = {
    "char": ("i1", 1, "tinyint"),
    "int8": ("i1", 1, "tinyint"),
    "uchar": ("u1", 1, "tinyint"),
    "uint8": ("u1", 1, "tinyint"),
    "short": ("i2", 2, "smallint"),
    "int16": ("i2", 2, "smallint"),
    "ushort": ("u2", 2, "smallint"),
    "uint16": ("u2", 2, "smallint"),
    "int": ("i4", 4, "int"),
    "int32": ("i4", 4, "int"),
    "uint": ("u4", 4, "int"),
    "uint32": ("u4", 4, "int"),
    "long": ("i8", 8, "bigint"),
    "int64": ("i8", 8, "bigint"),
    "ulong": ("u8", 8, "bigint"),
    "uint64": ("u8", 8, "bigint"),
    "float": ("f4", 4, "float"),
    "float32": ("f4", 4, "float"),
    "double": ("f8", 8, "double"),
    "float64": ("f8", 8, "double"),
}

#: canonical name used when serializing a numpy char back to PLY
_NP_TO_PLY = {
    "i1": "char",
    "u1": "uchar",
    "i2": "short",
    "u2": "ushort",
    "i4": "int",
    "u4": "uint",
    "i8": "long",
    "u8": "ulong",
    "f4": "float",
    "f8": "double",
}

SPARK_TO_NP = {
    "tinyint": "i1",
    "smallint": "i2",
    "int": "i4",
    "bigint": "i8",
    "float": "f4",
    "double": "f8",
}


@dataclass
class PlyProperty:
    name: str
    np_char: str  # numpy char without endianness, e.g. "f4"

    @property
    def size(self) -> int:
        return int(self.np_char[1:])

    @property
    def sql_type(self) -> str:
        for _, (np_char, _, sql) in PLY_TYPES.items():
            if np_char == self.np_char:
                return sql
        raise ValueError(f"unsupported property type {self.np_char}")

    @property
    def ply_type(self) -> str:
        return _NP_TO_PLY[self.np_char]


@dataclass
class PlyElement:
    name: str
    count: int
    properties: list[PlyProperty] = field(default_factory=list)

    @property
    def stride(self) -> int:
        return sum(p.size for p in self.properties)

    @property
    def byte_size(self) -> int:
        return self.count * self.stride


@dataclass
class PlyHeader:
    """Parsed PLY header + section layout."""

    location: str
    little_endian: bool
    elements: list[PlyElement] = field(default_factory=list)
    comments: list[str] = field(default_factory=list)
    obj_info: list[str] = field(default_factory=list)
    header_length: int = 0  # bytes up to and including end_header newline
    is_ascii: bool = False  # ``format ascii 1.0`` (read-only support)

    def element(self, name: str) -> PlyElement | None:
        for e in self.elements:
            if e.name == name:
                return e
        return None

    def section_offset(self, element_name: str) -> int:
        """Byte offset of an element's binary section: header length plus the
        sizes of all preceding elements (scan-left, as the reference computes
        in PlyHeader.scala:106-111)."""
        off = self.header_length
        for e in self.elements:
            if e.name == element_name:
                return off
            off += e.byte_size
        raise KeyError(element_name)

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        lines = ["ply"]
        fmt = "binary_little_endian" if self.little_endian else "binary_big_endian"
        lines.append(f"format {fmt} 1.0")
        for c in self.comments:
            lines.append(f"comment {c}")
        for o in self.obj_info:
            lines.append(f"obj_info {o}")
        for e in self.elements:
            lines.append(f"element {e.name} {e.count}")
            for p in e.properties:
                lines.append(f"property {p.ply_type} {p.name}")
        lines.append("end_header")
        return ("\n".join(lines) + "\n").encode("ascii")

    # -- parsing ------------------------------------------------------------

    @classmethod
    def parse(cls, data: io.BufferedIOBase, location: str = "") -> "PlyHeader":
        """Parse the ASCII header from a readable binary stream.

        Byte-length accounting includes any ``\\r`` in line terminators
        (the reference counts them too, PlyHeader.scala:171-179), so the
        computed section offsets are exact for CRLF-written files.
        """
        magic = data.readline()
        if magic.strip() != b"ply":
            raise ValueError(f"{location}: not a PLY file (magic {magic[:16]!r})")
        nbytes = len(magic)
        hdr = cls(location=location, little_endian=True)
        current: PlyElement | None = None
        while True:
            raw = data.readline()
            if not raw:
                raise ValueError(f"{location}: truncated PLY header")
            nbytes += len(raw)
            line = raw.decode("ascii", errors="replace").strip()
            if not line:
                continue
            tok = re.split(r"\s+", line)
            kw = tok[0]
            if kw == "format":
                if tok[1] == "binary_little_endian":
                    hdr.little_endian = True
                elif tok[1] == "binary_big_endian":
                    hdr.little_endian = False
                elif tok[1] == "ascii":
                    # text body: read-only, decoded whole-file (the reference
                    # rejects ascii PLY outright — PlyHeader.scala:163-166;
                    # we accept it as an interchange format, binary remains
                    # the record-aligned scale path)
                    hdr.is_ascii = True
                else:
                    raise ValueError(f"{location}: unsupported PLY format {tok[1]}")
            elif kw == "comment":
                hdr.comments.append(line[len("comment ") :] if len(line) > 8 else "")
            elif kw == "obj_info":
                hdr.obj_info.append(line[len("obj_info ") :] if len(line) > 9 else "")
            elif kw == "element":
                current = PlyElement(name=tok[1], count=int(tok[2]))
                hdr.elements.append(current)
            elif kw == "property":
                if tok[1] == "list":
                    raise ValueError(
                        f"{location}: list properties are not supported "
                        "(fixed-stride records only)"
                    )
                if current is None:
                    raise ValueError(f"{location}: property before element")
                np_char = PLY_TYPES[tok[1]][0]
                current.properties.append(PlyProperty(name=tok[2], np_char=np_char))
            elif kw == "end_header":
                break
            else:
                raise ValueError(f"{location}: unknown header keyword {kw!r}")
        hdr.header_length = nbytes
        return hdr

    @classmethod
    def parse_file(cls, path: str, filesystem=None) -> "PlyHeader":
        if filesystem is None:
            with open(path, "rb") as f:
                return cls.parse(f, location=path)
        # pyarrow streams lack readline; buffer the header region (grown
        # until end_header appears) and parse from BytesIO
        from .fsio import open_input

        with open_input(path, filesystem) as f:
            buf = b""
            while b"end_header" not in buf:
                chunk = f.read(64 * 1024)
                if not chunk:
                    break
                buf += chunk
        return cls.parse(io.BytesIO(buf), location=path)
