"""Deterministic synthetic point-cloud fixtures (FIXTURES.md, seed 42).

Generates PLY/LAS/XYZ files *directly with numpy/struct* (not via our
writers), so reader tests are independent of writer correctness.
"""

from __future__ import annotations

import numpy as np

from spark_iqmulus_spark.sources.las_format import (
    POINT_FORMATS,
    ExtraField,
    LasHeader,
    Vlr,
    _serialize_extra_bytes,
    format_stride,
)
from spark_iqmulus_spark.sources.pcd_format import PcdField, PcdHeader
from spark_iqmulus_spark.sources.ply_format import PlyElement, PlyHeader, PlyProperty

SEED = 42


def make_pcd(path: str, n: int = 5995, seed: int = SEED) -> np.ndarray:
    """Binary PCD: x/y/z float32 uniform [0,100), label int32 0..9."""
    rng = np.random.default_rng(seed)
    arr = np.zeros(
        n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("label", "<i4")]
    )
    for c in "xyz":
        arr[c] = rng.uniform(0, 100, n).astype(np.float32)
    arr["label"] = rng.integers(0, 10, n)
    hdr = PcdHeader(
        location=path,
        fields=[
            PcdField("x", "f4"),
            PcdField("y", "f4"),
            PcdField("z", "f4"),
            PcdField("label", "i4"),
        ],
        width=n,
        points=n,
        data_kind="binary",
    )
    with open(path, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(arr.tobytes())
    return arr


def make_ply_xyz(path: str, n: int = 5995, little_endian: bool = True, rgb: bool = False, seed: int = SEED) -> np.ndarray:
    """F1: PLY vertex element, x/y/z float32 uniform [0,100), optional rgb."""
    rng = np.random.default_rng(seed)
    prefix = "<" if little_endian else ">"
    fields = [("x", "f4"), ("y", "f4"), ("z", "f4")] + ([("r", "u1"), ("g", "u1"), ("b", "u1")] if rgb else [])
    dtype = np.dtype([(nm, prefix + ch) for nm, ch in fields])
    arr = np.zeros(n, dtype=dtype)
    for c in "xyz":
        arr[c] = (rng.uniform(0, 100, n)).astype(np.float32)
    if rgb:
        for c in "rgb":
            arr[c] = rng.integers(0, 256, n)
    props = [PlyProperty(nm, ch) for nm, ch in fields]
    hdr = PlyHeader(
        location=path,
        little_endian=little_endian,
        elements=[PlyElement("vertex", n, props)],
        comments=["synthetic fixture seed 42"],
    )
    with open(path, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(arr.tobytes())
    return arr


def make_las(
    path: str,
    n: int = 10000,
    fmt: int = 1,
    scale=(0.01, 0.01, 0.01),
    offset=(0.0, 0.0, 0.0),
    extra: bool = False,
    seed: int = SEED,
) -> np.ndarray:
    """F2-F6: LAS point records for any format, header stats consistent."""
    rng = np.random.default_rng(seed)
    fields = list(POINT_FORMATS[fmt])
    extras: list[ExtraField] = []
    if extra:
        extras = [
            ExtraField("reflectance", "f8", scale=0.01, offset=0.0),
            ExtraField("amplitude", "i4", nodata=-9999),
        ]
        fields += [(e.name, e.np_char) for e in extras]
    dtype = np.dtype([(nm, "<" + ch) for nm, ch in fields])
    arr = np.zeros(n, dtype=dtype)
    for c in "xyz":
        arr[c] = rng.integers(-(10**6), 10**6, n, dtype=np.int64).astype(np.int32)
    arr["intensity"] = rng.integers(0, 4096, n)
    if fmt < 6:
        arr["flags"] = rng.integers(0, 4, n)  # return number in low bits
    else:
        arr["return"] = rng.integers(0, 4, n)
        arr["flags"] = rng.integers(0, 16, n)
    arr["classification"] = rng.choice([1, 2, 3, 4, 5, 6], n)
    arr["angle"] = rng.integers(-90, 91, n)
    arr["source"] = rng.integers(0, 10, n)
    if "time" in dtype.names:
        arr["time"] = np.sort(rng.uniform(0, 1e5, n))
    for c in ("red", "green", "blue", "nir"):
        if c in dtype.names:
            arr[c] = rng.integers(0, 65536, n)
    if extra:
        arr["reflectance"] = rng.normal(0, 10, n)
        amp = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
        amp[rng.random(n) < 0.05] = -9999
        arr["amplitude"] = amp
        # descriptor min/max (options bits 0x02/0x04) — the bounds source
        # for ExtraBytes file skipping; amplitude excludes the nodata value
        extras[0].vmin = float(arr["reflectance"].min())
        extras[0].vmax = float(arr["reflectance"].max())
        valid_amp = amp[amp != -9999]
        if len(valid_amp):
            extras[1].vmin = int(valid_amp.min())
            extras[1].vmax = int(valid_amp.max())

    world = {c: offset[i] + scale[i] * arr[c].astype(np.float64) for i, c in enumerate("xyz")}
    ret = arr["flags"] & 0x7 if fmt < 6 else arr["return"] & 0xF
    counts = np.bincount(np.minimum(ret, 14), minlength=15)
    hdr = LasHeader(
        location=path,
        version_minor=4 if fmt >= 6 else 2,
        pdr_format=fmt,
        pdr_nb=n,
        scale=tuple(scale),
        offset=tuple(offset),
        pmin=(world["x"].min(), world["y"].min(), world["z"].min()),
        pmax=(world["x"].max(), world["y"].max(), world["z"].max()),
        pdr_return_nb=tuple(int(v) for v in counts),
        extra_fields=extras,
    )
    assert hdr.stride == format_stride(fmt) + (12 if extra else 0) == dtype.itemsize
    with open(path, "wb") as f:
        f.write(hdr.to_bytes())
        f.write(arr.tobytes())
    return arr


def make_xyz_text(path: str, n: int = 1000, seed: int = SEED) -> int:
    """F7: tab-separated x y z [r g b]; some lines have only x y z."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            x, y, z = rng.uniform(0, 100, 3)
            if i % 5 == 0:
                f.write(f"{x:.3f}\t{y:.3f}\t{z:.3f}\n")
            else:
                r, g, b = rng.integers(0, 128, 3)
                f.write(f"{x:.3f}\t{y:.3f}\t{z:.3f}\t{r}\t{g}\t{b}\n")
    return n
