"""LAS header model: parse / serialize, point formats 0-10, VLR / ExtraBytes.

Re-expresses the semantics of the reference's LasHeader
(``/root/reference/src/main/scala/fr/ign/spark/iqmulus/las/LasHeader.scala``:
375-byte header read ``:414-498``, the 11 point-format schemas ``:342-398``,
VLR/ExtraBytes walk ``:47-145``, header write ``:291-334``, format inference
``:400-409``, lasinfo report ``:246-284``) against the *public* ASPRS LAS
1.0-1.4 specification.  Pure Python + struct/numpy; no Spark imports, so the
module is usable on executors and driver alike.

Unsigned storage types map to the signed Spark type of equal width (the
reference does the same); the raw bit pattern is preserved on read and
write, and the original unsignedness is recorded in field metadata.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

SIGNATURE = b"LASF"
HEADER_SIZE = {0: 227, 1: 227, 2: 227, 3: 235, 4: 375}  # by minor version

# point format id → [(field_name, numpy char)] — storage layout, in order.
# Names follow the reference's schemas (LasHeader.scala:342-398) / FIXTURES.md.
_CORE_0 = [
    ("x", "i4"),
    ("y", "i4"),
    ("z", "i4"),
    ("intensity", "u2"),
    ("flags", "u1"),
    ("classification", "u1"),
    ("angle", "i1"),
    ("user", "u1"),
    ("source", "u2"),
]
_RGB = [("red", "u2"), ("green", "u2"), ("blue", "u2")]
_WAVE = [
    ("wave_desc", "u1"),
    ("wave_offset", "u8"),
    ("wave_size", "u4"),
    ("wave_return", "f4"),
    ("xt", "f4"),
    ("yt", "f4"),
    ("zt", "f4"),
]
_CORE_6 = [
    ("x", "i4"),
    ("y", "i4"),
    ("z", "i4"),
    ("intensity", "u2"),
    ("return", "u1"),
    ("flags", "u1"),
    ("classification", "u1"),
    ("user", "u1"),
    ("angle", "i2"),
    ("source", "u2"),
    ("time", "f8"),
]

POINT_FORMATS: dict[int, list[tuple[str, str]]] = {
    0: _CORE_0,
    1: _CORE_0 + [("time", "f8")],
    2: _CORE_0 + _RGB,
    3: _CORE_0 + [("time", "f8")] + _RGB,
    4: _CORE_0 + [("time", "f8")] + _WAVE,
    5: _CORE_0 + [("time", "f8")] + _RGB + _WAVE,
    6: _CORE_6,
    7: _CORE_6 + _RGB,
    8: _CORE_6 + _RGB + [("nir", "u2")],
    9: _CORE_6 + _WAVE,
    10: _CORE_6 + _RGB + [("nir", "u2")] + _WAVE,
}

_NP_SIZE = {"i1": 1, "u1": 1, "i2": 2, "u2": 2, "i4": 4, "u4": 4, "i8": 8, "u8": 8, "f4": 4, "f8": 8}


def format_stride(fmt: int) -> int:
    return sum(_NP_SIZE[c] for _, c in POINT_FORMATS[fmt])


# ExtraBytes data_type id → numpy char (LAS 1.4 spec table; 0 = raw bytes)
EXTRA_TYPES = {
    1: "u1", 2: "i1", 3: "u2", 4: "i2", 5: "u4",
    6: "i4", 7: "u8", 8: "i8", 9: "f4", 10: "f8",
}


@dataclass
class ExtraField:
    name: str
    np_char: str
    nodata: float | int | None = None
    scale: float | None = None
    offset: float | None = None
    vmin: float | None = None
    vmax: float | None = None
    description: str = ""


@dataclass
class Vlr:
    user_id: str
    record_id: int
    description: str
    payload: bytes


@dataclass
class LasHeader:
    """Parsed (or to-be-written) LAS header."""

    location: str = ""
    version_major: int = 1
    version_minor: int = 2
    pdr_format: int = 0
    pdr_nb: int = 0
    scale: tuple[float, float, float] = (0.01, 0.01, 0.01)
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0)
    pmin: tuple[float, float, float] = (0.0, 0.0, 0.0)
    pmax: tuple[float, float, float] = (0.0, 0.0, 0.0)
    pdr_return_nb: tuple[int, ...] = (0,) * 15
    pdr_length: int = 0  # 0 → derived from format
    pdr_offset: int = 0  # 0 → derived from header size + vlr bytes
    file_source_id: int = 0
    global_encoding: int = 0
    system_identifier: str = "spark_iqmulus_spark"
    generating_software: str = "spark_iqmulus_spark"
    creation_doy: int = 1
    creation_year: int = 2026
    vlrs: list[Vlr] = field(default_factory=list)
    evlrs: list[Vlr] = field(default_factory=list)
    extra_fields: list[ExtraField] = field(default_factory=list)
    #: EVLR chain location (LAS 1.4 header bytes 235/243); consumed by
    #: ``parse_file`` which can seek — EVLRs live after the point data.
    evlr_offset: int = 0
    evlr_count: int = 0

    # -- derived ------------------------------------------------------------

    @property
    def header_size(self) -> int:
        return HEADER_SIZE[self.version_minor]

    @property
    def stride(self) -> int:
        base = format_stride(self.pdr_format)
        extra = sum(_NP_SIZE[f.np_char] for f in self.extra_fields)
        return (self.pdr_length or base + extra)

    @property
    def point_fields(self) -> list[tuple[str, str]]:
        return POINT_FORMATS[self.pdr_format] + [
            (f.name, f.np_char) for f in self.extra_fields
        ]

    @property
    def offset_to_points(self) -> int:
        if self.pdr_offset:
            return self.pdr_offset
        vlr_bytes = sum(54 + len(v.payload) for v in self.vlrs)
        return self.header_size + vlr_bytes

    # -- parse --------------------------------------------------------------

    @classmethod
    def parse_file(cls, path: str, filesystem=None) -> "LasHeader":
        from .fsio import open_input

        with open_input(path, filesystem) as f:
            hdr = cls.parse(f.read(1 << 16), location=path)
            # EVLR walk (LAS 1.4): extended VLRs live *after* the point
            # data; 60-byte record header with a u64 payload length.
            # ExtraBytes descriptors are honored from EVLRs too.
            if hdr.evlr_count and hdr.evlr_offset:
                f.seek(hdr.evlr_offset)
                for _ in range(hdr.evlr_count):
                    head = f.read(60)
                    if len(head) < 60:
                        break
                    user_id = head[2:18].rstrip(b"\0").decode("ascii", "replace")
                    (record_id,) = struct.unpack_from("<H", head, 18)
                    (length,) = struct.unpack_from("<Q", head, 20)
                    desc = head[28:60].rstrip(b"\0").decode("ascii", "replace")
                    payload = f.read(length)
                    hdr.evlrs.append(Vlr(user_id, record_id, desc, payload))
                    if user_id == "LASF_Spec" and record_id == 4:
                        hdr.extra_fields.extend(_parse_extra_bytes(payload))
        return hdr

    @classmethod
    def parse(cls, buf: bytes, location: str = "") -> "LasHeader":
        if buf[:4] != SIGNATURE:
            raise ValueError(f"{location}: not a LAS file (magic {buf[:4]!r})")
        if len(buf) < min(HEADER_SIZE.values()):
            raise ValueError(f"{location}: truncated LAS header ({len(buf)} bytes)")
        (major, minor) = struct.unpack_from("<BB", buf, 24)
        if minor not in HEADER_SIZE:
            raise ValueError(f"{location}: unsupported LAS 1.{minor}")
        (header_size,) = struct.unpack_from("<H", buf, 94)
        (pdr_offset,) = struct.unpack_from("<I", buf, 96)
        (n_vlr,) = struct.unpack_from("<I", buf, 100)
        (fmt_raw,) = struct.unpack_from("<B", buf, 104)
        if fmt_raw & 0x80:
            # laszip sets the high bit of the point format id; the records
            # are compressed chunks, not fixed-stride — decoding would
            # return garbage, so fail loudly (file gets skipped with a
            # warning by the source, like other unreadable files)
            raise ValueError(
                f"{location}: LAZ (laszip-compressed) input not supported — "
                "decompress to .las first"
            )
        pdr_format = fmt_raw & 0x3F
        (pdr_length,) = struct.unpack_from("<H", buf, 105)
        (legacy_nb,) = struct.unpack_from("<I", buf, 107)
        legacy_by_return = struct.unpack_from("<5I", buf, 111)
        sx, sy, sz = struct.unpack_from("<3d", buf, 131)
        ox, oy, oz = struct.unpack_from("<3d", buf, 155)
        xmax, xmin, ymax, ymin, zmax, zmin = struct.unpack_from("<6d", buf, 179)
        pdr_nb = legacy_nb
        by_return: tuple[int, ...] = tuple(legacy_by_return) + (0,) * 10
        evlr_offset = evlr_count = 0
        if minor >= 4:
            (evlr_offset,) = struct.unpack_from("<Q", buf, 235)
            (evlr_count,) = struct.unpack_from("<I", buf, 243)
            (count14,) = struct.unpack_from("<Q", buf, 247)
            ret14 = struct.unpack_from("<15Q", buf, 255)
            # the 1.4 fields are authoritative (legacy slots may be zeroed
            # for >u32 counts or formats 6-10); fall back to legacy only
            # when a nonconforming writer left the 1.4 block entirely empty
            if count14 or any(ret14) or not legacy_nb:
                pdr_nb = count14
                by_return = tuple(ret14)
                if not count14 and any(ret14):
                    # nonconforming writer zeroed count14 but filled the
                    # per-return slots: a 0 count would plan zero records
                    # from a file that has data — derive it instead
                    pdr_nb = legacy_nb or sum(ret14)
        hdr = cls(
            location=location,
            version_major=major,
            version_minor=minor,
            pdr_format=pdr_format,
            pdr_nb=pdr_nb,
            scale=(sx, sy, sz),
            offset=(ox, oy, oz),
            pmin=(xmin, ymin, zmin),
            pmax=(xmax, ymax, zmax),
            pdr_return_nb=by_return,
            pdr_length=pdr_length,
            pdr_offset=pdr_offset,
            file_source_id=struct.unpack_from("<H", buf, 4)[0],
            global_encoding=struct.unpack_from("<H", buf, 6)[0],
            system_identifier=buf[26:58].rstrip(b"\0").decode("ascii", "replace"),
            generating_software=buf[58:90].rstrip(b"\0").decode("ascii", "replace"),
            creation_doy=struct.unpack_from("<H", buf, 90)[0],
            creation_year=struct.unpack_from("<H", buf, 92)[0],
            evlr_offset=evlr_offset,
            evlr_count=evlr_count,
        )
        # VLR walk (headers only retained + ExtraBytes decoded)
        pos = header_size
        for _ in range(n_vlr):
            if pos + 54 > len(buf):
                break
            user_id = buf[pos + 2 : pos + 18].rstrip(b"\0").decode("ascii", "replace")
            (record_id,) = struct.unpack_from("<H", buf, pos + 18)
            (after,) = struct.unpack_from("<H", buf, pos + 20)
            desc = buf[pos + 22 : pos + 54].rstrip(b"\0").decode("ascii", "replace")
            payload = buf[pos + 54 : pos + 54 + after]
            hdr.vlrs.append(Vlr(user_id, record_id, desc, payload))
            if user_id == "LASF_Spec" and record_id == 4:
                hdr.extra_fields.extend(_parse_extra_bytes(payload))
            pos += 54 + after
        return hdr

    # -- serialize ----------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Serialize a version-appropriate header + VLRs (ExtraBytes VLR is
        regenerated from ``extra_fields``)."""
        vlrs = [v for v in self.vlrs if not (v.user_id == "LASF_Spec" and v.record_id == 4)]
        if self.extra_fields:
            vlrs.append(
                Vlr("LASF_Spec", 4, "extra bytes", _serialize_extra_bytes(self.extra_fields))
            )
        hs = self.header_size
        buf = bytearray(hs)
        buf[0:4] = SIGNATURE
        struct.pack_into("<H", buf, 4, self.file_source_id)
        struct.pack_into("<H", buf, 6, self.global_encoding)
        struct.pack_into("<BB", buf, 24, self.version_major, self.version_minor)
        buf[26:58] = self.system_identifier.encode("ascii", "replace")[:32].ljust(32, b"\0")
        buf[58:90] = self.generating_software.encode("ascii", "replace")[:32].ljust(32, b"\0")
        struct.pack_into("<H", buf, 90, self.creation_doy)
        struct.pack_into("<H", buf, 92, self.creation_year)
        struct.pack_into("<H", buf, 94, hs)
        vlr_bytes = sum(54 + len(v.payload) for v in vlrs)
        struct.pack_into("<I", buf, 96, hs + vlr_bytes)
        struct.pack_into("<I", buf, 100, len(vlrs))
        struct.pack_into("<B", buf, 104, self.pdr_format)
        stride = self.stride
        struct.pack_into("<H", buf, 105, stride)
        legacy_nb = self.pdr_nb if (self.version_minor < 4 or self.pdr_nb < 2**32) else 0
        struct.pack_into("<I", buf, 107, min(legacy_nb, 2**32 - 1))
        for i in range(5):
            struct.pack_into(
                "<I", buf, 111 + 4 * i, min(self.pdr_return_nb[i], 2**32 - 1)
            )
        struct.pack_into("<3d", buf, 131, *self.scale)
        struct.pack_into("<3d", buf, 155, *self.offset)
        struct.pack_into(
            "<6d", buf, 179,
            self.pmax[0], self.pmin[0], self.pmax[1],
            self.pmin[1], self.pmax[2], self.pmin[2],
        )
        if self.version_minor >= 4:
            struct.pack_into("<Q", buf, 247, self.pdr_nb)
            for i in range(15):
                struct.pack_into("<Q", buf, 255 + 8 * i, self.pdr_return_nb[i])
        out = bytes(buf)
        for v in vlrs:
            vh = bytearray(54)
            vh[2:18] = v.user_id.encode("ascii")[:16].ljust(16, b"\0")
            struct.pack_into("<H", vh, 18, v.record_id)
            struct.pack_into("<H", vh, 20, len(v.payload))
            vh[22:54] = v.description.encode("ascii")[:32].ljust(32, b"\0")
            out += bytes(vh) + v.payload
        return out

    # -- lasinfo report (A23, LasHeader.scala:246-284 equivalent) -----------

    def info(self) -> str:
        lines = [
            f"file signature:             'LASF'",
            f"file source ID:             {self.file_source_id}",
            f"version:                    {self.version_major}.{self.version_minor}",
            f"system identifier:          '{self.system_identifier}'",
            f"generating software:        '{self.generating_software}'",
            f"file creation day/year:     {self.creation_doy}/{self.creation_year}",
            f"header size:                {self.header_size}",
            f"offset to point data:       {self.offset_to_points}",
            f"number of VLRs:             {len(self.vlrs)}",
            f"point data format:          {self.pdr_format}",
            f"point data record length:   {self.stride}",
            f"number of point records:    {self.pdr_nb}",
            f"number by return:           {list(self.pdr_return_nb[:5])}",
            f"scale factor x y z:         {self.scale[0]} {self.scale[1]} {self.scale[2]}",
            f"offset x y z:               {self.offset[0]} {self.offset[1]} {self.offset[2]}",
            f"min x y z:                  {self.pmin[0]} {self.pmin[1]} {self.pmin[2]}",
            f"max x y z:                  {self.pmax[0]} {self.pmax[1]} {self.pmax[2]}",
        ]
        if self.extra_fields:
            lines.append(f"extra fields:               {[f.name for f in self.extra_fields]}")
        return "\n".join(lines)


def _parse_extra_bytes(payload: bytes) -> list[ExtraField]:
    """Decode LASF_Spec/4 ExtraBytes descriptors (192 bytes each)."""
    out = []
    for pos in range(0, len(payload) - 191, 192):
        (data_type,) = struct.unpack_from("<B", payload, pos + 2)
        (options,) = struct.unpack_from("<B", payload, pos + 3)
        name = payload[pos + 4 : pos + 36].rstrip(b"\0").decode("ascii", "replace")
        if data_type not in EXTRA_TYPES:
            continue  # undocumented/byte blobs unsupported (as in reference)
        np_char = EXTRA_TYPES[data_type]
        is_float = np_char[0] == "f"
        unpack_one = "<d" if is_float else "<q"
        def anytype(off: int):
            return struct.unpack_from(unpack_one, payload, off)[0]
        f = ExtraField(name=name, np_char=np_char)
        if options & 0x01:
            f.nodata = anytype(pos + 40)
        if options & 0x02:
            f.vmin = anytype(pos + 64)
        if options & 0x04:
            f.vmax = anytype(pos + 88)
        if options & 0x08:
            f.scale = struct.unpack_from("<d", payload, pos + 112)[0]
        if options & 0x10:
            f.offset = struct.unpack_from("<d", payload, pos + 136)[0]
        f.description = payload[pos + 160 : pos + 192].rstrip(b"\0").decode("ascii", "replace")
        out.append(f)
    return out


def _serialize_extra_bytes(fields: list[ExtraField]) -> bytes:
    rev = {v: k for k, v in EXTRA_TYPES.items()}
    out = b""
    for f in fields:
        buf = bytearray(192)
        struct.pack_into("<B", buf, 2, rev[f.np_char])
        options = 0
        is_float = f.np_char[0] == "f"
        one = "<d" if is_float else "<q"
        if f.nodata is not None:
            options |= 0x01
            struct.pack_into(one, buf, 40, f.nodata)
        if f.vmin is not None:
            options |= 0x02
            struct.pack_into(one, buf, 64, f.vmin)
        if f.vmax is not None:
            options |= 0x04
            struct.pack_into(one, buf, 88, f.vmax)
        if f.scale is not None:
            options |= 0x08
            struct.pack_into("<d", buf, 112, f.scale)
        if f.offset is not None:
            options |= 0x10
            struct.pack_into("<d", buf, 136, f.offset)
        struct.pack_into("<B", buf, 3, options)
        buf[4:36] = f.name.encode("ascii")[:32].ljust(32, b"\0")
        buf[160:192] = f.description.encode("ascii")[:32].ljust(32, b"\0")
        out += bytes(buf)
    return out


#: spark sql simple type name per numpy storage char (unsigned → same-width
#: signed, as the reference maps them)
NP_TO_SQL = {
    "i1": "tinyint", "u1": "tinyint",
    "i2": "smallint", "u2": "smallint",
    "i4": "int", "u4": "int",
    "i8": "bigint", "u8": "bigint",
    "f4": "float", "f8": "double",
}

SQL_TO_NP = {"tinyint": "i1", "smallint": "i2", "int": "i4", "bigint": "i8", "float": "f4", "double": "f8"}


def format_from_schema(field_names: set[str]) -> int:
    """Smallest point format whose field set covers ``field_names``
    (reference: LasHeader.scala:400-409 formatFromSchema)."""
    for fmt in sorted(POINT_FORMATS, key=lambda f: (format_stride(f), f)):
        names = {n for n, _ in POINT_FORMATS[fmt]}
        if field_names <= names:
            return fmt
    raise ValueError(f"no LAS point format covers fields {sorted(field_names)}")
