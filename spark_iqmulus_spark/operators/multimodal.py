"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern (SURVEY.md §2C): media are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` operators so each Python worker sees contiguous batches
(the shape a real image/audio decoder needs).  The codec step is REAL for
the formats stdlib+numpy can decode and an honest loud guard elsewhere:

- :func:`decode_image` decodes PPM (P6/P3), uncompressed BMP, and
  non-interlaced 8-bit RGB/RGBA PNG (stdlib zlib); other image containers
  raise ``NotImplementedError`` — plug in PIL/torchvision when available;
- :func:`decode_wav` decodes RIFF/WAVE 16-bit mono PCM via a real
  chunk-walking parser; compressed audio raises likewise;
- :func:`extract_byte_features` is the deterministic byte-level extractor
  used by the metadata pipeline — it exercises the identical Spark
  plumbing (binary Arrow transfer, batch iteration, schema contract).

Scale notes: payloads never hit the driver; ``mapInPandas`` streams
Arrow batches per partition, and the downstream rollup is an ordinary
hash aggregate.  The extractors are per-row pure, so the Python stage
runs on the scan partitioning as-is (see :func:`_spread` — a tiny input
is respread round-robin so every core decodes; an at-scale input passes
through with zero Exchange).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables

#: output schema of the feature extractor (the contract a real decoder
#: implementation must keep).
FEATURE_SCHEMA = (
    "doc_id long, source string, n_bytes int, first_byte int, last_byte int"
)


def decode_image(payload: bytes):
    """Decode an image payload to ``(width, height, pixels)`` where pixels
    is a ``uint8`` ndarray of shape ``(height, width, 3)`` (RGB).

    Pure-stdlib/numpy codecs for the formats that need no compression
    library — binary PPM (``P6``), ascii PPM (``P3``), and uncompressed
    24/32-bit BMP — so the decode→feature path is REAL end-to-end, not a
    stub.  Compressed formats (JPEG/PNG/...) require libraries absent from
    this container and raise ``NotImplementedError`` — a deployment extends
    the sniff table below with PIL/libvips; the Spark-side contract
    (binary column in, fixed feature schema out, Arrow batches) is
    unchanged by the codec behind it."""
    import numpy as np

    if payload[:2] in (b"P6", b"P3"):
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        f"unsupported image container (magic {payload[:4]!r}); only "
        "PPM P6/P3, uncompressed BMP, and non-interlaced 8-bit RGB/RGBA "
        "PNG decode without external libraries"
    )


def encode_ppm(width: int, height: int, pixels) -> bytes:
    """Serialize an ``(height, width, 3)`` uint8 array as binary PPM (P6)."""
    import numpy as np

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.shape != (height, width, 3):
        raise ValueError(f"pixels shape {arr.shape} != ({height},{width},3)")
    return b"P6\n%d %d\n255\n" % (width, height) + arr.tobytes()


def _decode_ppm(payload: bytes):
    """PPM per the public netpbm spec: magic, whitespace/#-comment-separated
    width height maxval, then raw bytes (P6) or ascii ints (P3)."""
    import numpy as np

    magic = payload[:2]
    pos = 2
    tokens: list[bytes] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    width, height, maxval = (int(t) for t in tokens)
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    n = width * height * 3
    if magic == b"P6":
        pos += 1  # exactly one whitespace byte after maxval
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:  # P3: ascii sample values
        vals = payload[pos:].split()
        if len(vals) < n:
            raise ValueError(f"P3 raster has {len(vals)} samples, need {n}")
        raster = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    return width, height, raster.reshape(height, width, 3)


def _decode_bmp(payload: bytes):
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER, BI_RGB) per the public
    format: rows bottom-up, BGR(A) samples, rows padded to 4 bytes."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP decodes here (bpp={bpp},"
            f" compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)
    pix = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        pix = pix[::-1]
    # BGR(A) → RGB
    return width, height, np.ascontiguousarray(pix[:, :, 2::-1][:, :, :3])


#: PNG signature per the public spec (RFC 2083 / W3C PNG)
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, pixels, filters=None) -> bytes:
    """Serialize an ``(height, width, 3)`` uint8 RGB array as a valid
    non-interlaced 8-bit PNG (zlib is stdlib — no external libraries).

    ``filters`` picks each scanline's filter type (0-4); default cycles
    through all five so a round-trip exercises every unfilter branch.
    Forward filtering per the public spec: the stored byte is
    ``raw - predictor`` mod 256."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.shape != (height, width, 3):
        raise ValueError(f"pixels shape {arr.shape} != ({height},{width},3)")
    ch = 3
    if filters is None:
        filters = [y % 5 for y in range(height)]
    raw = arr.reshape(height, width * ch).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(width * ch, dtype=np.int64)
    for y in range(height):
        ft = int(filters[y])
        row = raw[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
        up = prev
        upleft = np.concatenate([np.zeros(ch, dtype=np.int64), up[:-ch]])
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - up
        elif ft == 3:  # Average
            filt = row - ((left + up) >> 1)
        elif ft == 4:  # Paeth
            p = left + up - upleft
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            filt = row - pred
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        lines.append(ft)
        lines += (filt & 255).astype(np.uint8).tobytes()
        prev = row

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes):
    """Non-interlaced 8-bit RGB/RGBA PNG per the public spec: chunk walk →
    zlib-inflate the IDAT stream → per-scanline unfilter (None/Sub/Up
    vectorized in numpy; Average/Paeth carry a left-dependency so they run
    an O(width) loop on just those rows).  RGBA alpha is dropped — the
    :func:`decode_image` contract is ``(h, w, 3)`` RGB."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise NotImplementedError(
                    f"only non-interlaced 8-bit RGB/RGBA PNG decodes here"
                    f" (depth={depth}, color_type={color},"
                    f" interlace={interlace}) — plug in PIL for the rest"
                )
            ch = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    data = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(data) != height * (stride + 1):
        raise ValueError(
            f"PNG raster is {len(data)} bytes, want {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = data[pos]
        row = np.frombuffer(data, np.uint8, stride, pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = row
        elif ft == 2:  # Up — uint8 addition wraps mod 256, per spec
            out[y] = row + prev
        elif ft == 1:  # Sub — per-channel cumulative sum over pixels
            r = row.reshape(width, ch).astype(np.int64)
            out[y] = (np.cumsum(r, axis=0) & 255).astype(np.uint8).reshape(stride)
        elif ft in (3, 4):  # Average / Paeth: left-dependency → serial scan
            # The left-pixel dependency makes this chain inherently serial
            # per scanline; running it on Python ints (bytes→list) avoids
            # the ~µs-per-element numpy dispatch a per-pixel vector loop
            # pays — ~8× faster at megapixel widths, identical arithmetic.
            raw = row.tolist()
            up = prev.tolist()
            rec = [0] * stride
            if ft == 3:
                for i in range(stride):
                    left = rec[i - ch] if i >= ch else 0
                    rec[i] = (raw[i] + ((left + up[i]) >> 1)) & 255
            else:
                for i in range(stride):
                    a = rec[i - ch] if i >= ch else 0  # left
                    b = up[i]  # up
                    c = up[i - ch] if i >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rec[i] = (raw[i] + pred) & 255
            out[y] = np.asarray(rec, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    pix = out.reshape(height, width, ch)
    return width, height, np.ascontiguousarray(pix[:, :, :3])


def extract_byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake 'decoder': per-payload byte statistics.

    Signature and batch shape are identical to what a real decoder would
    use (iterator of pandas batches in, iterator of feature frames out).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
            }
        )


def _spread(df: DataFrame) -> DataFrame:
    """Spread rows across the session's cores ahead of an expensive Python
    (mapInPandas) stage — WITHOUT the keyed-Exchange skew the previous
    ``repartition("source")`` paid.  Hash-partitioning on the O(10)-
    cardinality source key capped the decode stage at |sources| non-empty
    tasks no matter the corpus size (one task per source at 100 TB); the
    feature extractors are per-row pure and the per-source rollup
    partial-aggregates map-side anyway, so co-location buys nothing.

    Scale-adaptive (no constant tuned to either regime): when the scan
    already has at least default-parallelism partitions — any at-scale
    input — the frame passes through UNTOUCHED (zero Exchange); only an
    input with fewer partitions than cores (tiny local file) pays a
    balanced round-robin respread so the Python stage still uses every
    core."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each doc
    (here: utf-8 bytes of the text; in production: image/audio bytes)."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("content_length"),
            F.lit("utf-8").alias("encoding"),
        ).alias("media_meta"),
    )


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary payload column → spread
    across cores (:func:`_spread`) → Arrow-batched feature extraction
    (mapInPandas) → rollup.  Oracle reproduces the byte math from the
    text column."""
    t = load_tables(spark, sf_dir)
    payloads = _spread(with_payload(t["documents"]))
    feats = payloads.mapInPandas(extract_byte_features, schema=FEATURE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("first_byte").alias("sum_first_byte"),
        F.sum("last_byte").alias("sum_last_byte"),
    )


#: frame size for the frame-sampling path (bytes) — the audio/video
#: "frame-sample" plumbing shape: one payload → many fixed-size frames.
FRAME_BYTES = 128

FRAME_SCHEMA = (
    "doc_id long, source string, frame_idx int, frame_len int, byte_sum long"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Split each payload into fixed-size frames with per-frame stats —
    the exact batch/row-explosion shape a real audio frame-sampler or
    video keyframe extractor uses (1 input row → N output rows inside
    mapInPandas; the expansion never touches the driver)."""
    import numpy as np

    for pdf in batches:
        doc_ids, sources, idxs, lens, sums = [], [], [], [], []
        for doc_id, source, payload in zip(
            pdf["doc_id"], pdf["source"], pdf["payload"]
        ):
            for fi, start in enumerate(range(0, len(payload), FRAME_BYTES)):
                frame = payload[start : start + FRAME_BYTES]
                doc_ids.append(doc_id)
                sources.append(source)
                idxs.append(fi)
                lens.append(len(frame))
                sums.append(int(np.frombuffer(frame, dtype=np.uint8).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "source": pd.Series(sources, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_len": pd.Series(lens, dtype="int32"),
                "byte_sum": pd.Series(sums, dtype="int64"),
            }
        )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline: binary payloads → fixed-size frames
    (mapInPandas row explosion) → per-source rollup.  Oracle reproduces the
    frame math from the (ASCII) text with substring arithmetic."""
    t = load_tables(spark, sf_dir)
    payloads = _spread(with_payload(t["documents"]))
    frames = payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
    return frames.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").alias("total_bytes"),
        F.sum("byte_sum").alias("total_byte_sum"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


#: synthetic image geometry for the decode pipeline (small on purpose:
#: the per-doc payload is w*h*3 bytes and the oracle re-derives every pixel)
IMG_W, IMG_H = 16, 8

DECODE_SCHEMA = (
    "doc_id long, source string, width int, height int,"
    " sum_r long, sum_g long, sum_b long, checksum long"
)


def _synth_pixels(doc_id: int):
    """Deterministic per-doc RGB raster: pixel byte i = (doc_id*31 + i*7) % 256
    — pure integer arithmetic so DuckDB can re-derive every pixel."""
    import numpy as np

    n = IMG_W * IMG_H * 3
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 256).astype(np.uint8).reshape(IMG_H, IMG_W, 3)


def encode_then_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The real codec round-trip inside Arrow batches: synthesize a P6 PPM
    payload per doc, then run :func:`decode_image` on the bytes and emit
    per-image features.  This is the production decode shape — binary in,
    fixed feature schema out — with a real (if simple) codec behind it."""
    yield from _codec_roundtrip(batches, encode_ppm)


def encode_then_decode_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Same round-trip through the stdlib-zlib PNG codec (filter types
    cycle 0-4 per scanline, so every unfilter branch runs per image)."""
    yield from _codec_roundtrip(batches, encode_png)


def _codec_roundtrip(
    batches: Iterator[pd.DataFrame], encoder
) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "width", "height",
                                "sum_r", "sum_g", "sum_b", "checksum")}
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            payload = encoder(IMG_W, IMG_H, _synth_pixels(int(doc_id)))
            w, h, pix = decode_image(payload)
            flat = pix.reshape(-1, 3).astype(np.int64)
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sum_r"].append(int(flat[:, 0].sum()))
            rows["sum_g"].append(int(flat[:, 1].sum()))
            rows["sum_b"].append(int(flat[:, 2].sum()))
            # position-weighted checksum pins pixel ORDER, not just values
            allb = pix.reshape(-1).astype(np.int64)
            rows["checksum"].append(int((allb * (np.arange(allb.size) + 1)).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "source": pd.Series(rows["source"], dtype="object"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "sum_r": pd.Series(rows["sum_r"], dtype="int64"),
                "sum_g": pd.Series(rows["sum_g"], dtype="int64"),
                "sum_b": pd.Series(rows["sum_b"], dtype="int64"),
                "checksum": pd.Series(rows["checksum"], dtype="int64"),
            }
        )


#: resize target for the resize pipeline (nearest-neighbor)
OUT_W, OUT_H = 4, 4

RESIZE_SCHEMA = (
    "doc_id long, source string, out_w int, out_h int, checksum long"
)


def resize_nearest(pixels, out_w: int, out_h: int):
    """Nearest-neighbor resize of an ``(h, w, 3)`` uint8 raster: output
    pixel (y, x) samples source (floor(y*h/out_h), floor(x*w/out_w)) —
    integer index math only, so it is exactly reproducible in SQL."""
    import numpy as np

    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[np.ix_(ys, xs)]


def decode_and_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode → nearest-neighbor resize → per-image checksum, all inside
    Arrow batches (the thumbnail-pipeline shape)."""
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "out_w", "out_h", "checksum")}
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            payload = encode_ppm(IMG_W, IMG_H, _synth_pixels(int(doc_id)))
            _, _, pix = decode_image(payload)
            small = resize_nearest(pix, OUT_W, OUT_H)
            flat = small.reshape(-1).astype(np.int64)
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["out_w"].append(OUT_W)
            rows["out_h"].append(OUT_H)
            rows["checksum"].append(int((flat * (np.arange(flat.size) + 1)).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "source": pd.Series(rows["source"], dtype="object"),
                "out_w": pd.Series(rows["out_w"], dtype="int32"),
                "out_h": pd.Series(rows["out_h"], dtype="int32"),
                "checksum": pd.Series(rows["checksum"], dtype="int64"),
            }
        )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pipeline: PPM payload → decode_image → nearest-neighbor
    resize → per-source rollup of position-weighted checksums.  The oracle
    re-derives each sampled source pixel with the same integer index math,
    so a resize that samples the wrong row/column or reorders channels
    hash-fails."""
    t = load_tables(spark, sf_dir)
    docs = _spread(t["documents"].select("doc_id", "source"))
    feats = docs.mapInPandas(decode_and_resize, schema=RESIZE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("out_w").cast("long") * F.col("out_h")).alias("total_px"),
        F.sum("checksum").alias("sum_checksum"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode pipeline with a REAL codec: per-doc PPM payload →
    ``decode_image`` (pure-numpy P6 parser) inside mapInPandas → per-source
    rollup of pixel statistics.  The oracle re-derives every pixel with the
    same integer recurrence, so a decode that misreads the header, drops a
    row, or permutes channels hash-fails."""
    t = load_tables(spark, sf_dir)
    docs = _spread(t["documents"].select("doc_id", "source"))
    feats = docs.mapInPandas(encode_then_decode, schema=DECODE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("width").cast("long") * F.col("height")).alias("total_px"),
        F.sum("sum_r").alias("sum_r"),
        F.sum("sum_g").alias("sum_g"),
        F.sum("sum_b").alias("sum_b"),
        F.sum("checksum").alias("sum_checksum"),
    )


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_decode through the stdlib-zlib PNG codec: per-doc
    non-interlaced 8-bit RGB PNG (scanline filters cycling 0-4) →
    ``decode_image`` → per-source pixel rollup.  The oracle is the same
    pixel recurrence as the PPM decode key, so a filter/unfilter bug,
    chunk misparse, or inflate drift hash-fails."""
    t = load_tables(spark, sf_dir)
    docs = _spread(t["documents"].select("doc_id", "source"))
    feats = docs.mapInPandas(encode_then_decode_png, schema=DECODE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("width").cast("long") * F.col("height")).alias("total_px"),
        F.sum("sum_r").alias("sum_r"),
        F.sum("sum_g").alias("sum_g"),
        F.sum("sum_b").alias("sum_b"),
        F.sum("checksum").alias("sum_checksum"),
    )


QUERIES = {
    "q_multimodal": q_multimodal,
    "q_multimodal_decode": q_multimodal_decode,
    "q_multimodal_frames": q_multimodal_frames,
    "q_multimodal_resize": q_multimodal_resize,
    "q_multimodal_png": q_multimodal_png,
}

ORACLES = {
    "q_multimodal_resize": f"""
        WITH out_px AS (
            SELECT d.doc_id, d.source, t.j,
                   ((((t.j // 3) // {OUT_W}) * {IMG_H}) // {OUT_H} * {IMG_W}
                    + (((t.j // 3) % {OUT_W}) * {IMG_W}) // {OUT_W}) * 3
                   + t.j % 3 AS i
            FROM documents d
            CROSS JOIN generate_series(0, {OUT_W * OUT_H * 3 - 1}) AS t(j)
        ), per_doc AS (
            SELECT doc_id, source,
                   sum(((doc_id * 31 + i * 7) % 256) * (j + 1)) AS checksum
            FROM out_px GROUP BY doc_id, source
        )
        SELECT source,
               count(*) AS n_images,
               CAST(count(*) * {OUT_W * OUT_H} AS BIGINT) AS total_px,
               CAST(sum(checksum) AS BIGINT) AS sum_checksum
        FROM per_doc GROUP BY source
    """,
    "q_multimodal_decode": f"""
        WITH px AS (
            SELECT d.doc_id, d.source, t.i,
                   (d.doc_id * 31 + t.i * 7) % 256 AS b
            FROM documents d
            CROSS JOIN generate_series(0, {IMG_W * IMG_H * 3 - 1}) AS t(i)
        ), per_doc AS (
            SELECT doc_id, source,
                   sum(CASE WHEN i % 3 = 0 THEN b ELSE 0 END) AS sum_r,
                   sum(CASE WHEN i % 3 = 1 THEN b ELSE 0 END) AS sum_g,
                   sum(CASE WHEN i % 3 = 2 THEN b ELSE 0 END) AS sum_b,
                   sum(b * (i + 1)) AS checksum
            FROM px GROUP BY doc_id, source
        )
        SELECT source,
               count(*) AS n_images,
               CAST(count(*) * {IMG_W * IMG_H} AS BIGINT) AS total_px,
               CAST(sum(sum_r) AS BIGINT) AS sum_r,
               CAST(sum(sum_g) AS BIGINT) AS sum_g,
               CAST(sum(sum_b) AS BIGINT) AS sum_b,
               CAST(sum(checksum) AS BIGINT) AS sum_checksum
        FROM per_doc GROUP BY source
    """,
    "q_multimodal_frames": f"""
        WITH f AS (
            SELECT doc_id, source,
                   unnest(generate_series(
                       0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INT) - 1
                   )) AS frame_idx,
                   text
            FROM documents
        ), frames AS (
            SELECT doc_id, source, frame_idx,
                   substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
            FROM f
        )
        SELECT source,
               count(*) AS n_frames,
               CAST(sum(length(frame)) AS BIGINT) AS total_bytes,
               CAST(sum(list_sum(list_transform(
                   generate_series(1, length(frame)),
                   i -> ascii(substring(frame, i, 1))
               ))) AS BIGINT) AS total_byte_sum,
               max(frame_idx) AS max_frame_idx
        FROM frames GROUP BY source
    """,
    "q_multimodal": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(sum(ascii(substring(text, 1, 1))) AS BIGINT) AS sum_first_byte,
               CAST(sum(ascii(substring(text, length(text), 1))) AS BIGINT) AS sum_last_byte
        FROM documents GROUP BY source
    """,
}

# the PNG key's pixels are the identical synthetic recurrence — the oracle is
# the PPM decode oracle verbatim (what differs is the codec under test)
ORACLES["q_multimodal_png"] = ORACLES["q_multimodal_decode"]


# ---------------------------------------------------------------------------
# Audio: real stdlib WAV/PCM codec (RIFF chunk walk), mirroring the PNG
# upgrade — the audio modality's decode step is no longer a stub.
# ---------------------------------------------------------------------------

#: samples per synthetic clip = AUD_BASE + doc_id % 17 (varying lengths so
#: header arithmetic is exercised, bounded so the oracle's generate_series
#: stays small).
AUD_BASE = 200


def synth_samples(doc_id: int):
    """Deterministic 16-bit mono PCM clip: sample i =
    ``((doc_id*17 + i*11) % 65536) - 32768`` — pure integer arithmetic so
    DuckDB re-derives every sample (the audio analog of _synth_pixels)."""
    import numpy as np

    n = AUD_BASE + doc_id % 17
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 17 + i * 11) % 65536) - 32768).astype(np.int16)


def encode_wav(sample_rate: int, samples, junk: int = 0) -> bytes:
    """Encode int16 mono PCM as a canonical RIFF/WAVE byte stream
    (``fmt `` + optional odd-length ``auxi`` filler chunk + ``data``).

    ``junk > 0`` inserts an unknown chunk of that many bytes before
    ``data`` — decoders must skip it via the chunk-size walk, including
    the RIFF word-alignment pad byte when ``junk`` is odd."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = [(b"fmt ", fmt)]
    if junk:
        chunks.append((b"auxi", bytes((i * 3) % 256 for i in range(junk))))
    chunks.append((b"data", data))
    body = b"WAVE"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE payload to ``(sample_rate, samples)`` with
    ``samples`` an int16 ndarray.  A real chunk-walking parser: validates
    the RIFF/WAVE container, reads ``fmt ``, skips unknown chunks (with
    odd-size pad bytes), and stops at ``data``.  Only uncompressed 16-bit
    mono PCM decodes; anything else raises loudly (the honest-guard
    convention of decode_image)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio container (magic {payload[:4]!r}); only "
            "RIFF/WAVE PCM decodes without external libraries"
        )
    riff_len = struct.unpack("<I", payload[4:8])[0]
    if riff_len != len(payload) - 8:
        raise ValueError(f"RIFF length {riff_len} != payload {len(payload) - 8}")
    pos, rate, n_channels, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if pos + 8 + size > len(payload):
            # only chunks the decoder CONSUMES must be complete; an
            # unknown chunk with an oversized/streaming size field makes
            # the walk RE-SYNC: scan forward for the next known chunk
            # header and resume there (ADVICE r9/r10)
            if tag in (b"fmt ", b"data"):
                raise ValueError(
                    f"WAV chunk {tag!r} declares {size} bytes but only "
                    f"{len(payload) - pos - 8} remain"
                )
            # only accept a re-sync candidate that parses as a PLAUSIBLE
            # chunk header — a bare find() would match the 4 bytes 'data'
            # inside the lying chunk's binary body and decode garbage as
            # samples.  Scan for BOTH known tags and take the earliest,
            # so a real 'fmt ' located after the lying chunk isn't
            # skipped (ADVICE r10).  Plausibility per tag: the declared
            # size must fit the remaining payload, and a 'fmt ' candidate
            # must additionally parse as sane PCM (codec/channels/rate/
            # bits in range) — without that, scanning for 'fmt ' would
            # ENLARGE the false-acceptance surface: a false match inside
            # the lying body would silently overwrite rate/channels/bits
            # (round-11 self-review)
            def _plausible(idx: int, tag: bytes) -> bool:
                if idx + 8 > len(payload):
                    return False
                sz = struct.unpack("<I", payload[idx + 4 : idx + 8])[0]
                if idx + 8 + sz > len(payload):
                    return False
                if tag == b"fmt ":
                    if sz < 16:
                        return False
                    codec, ch, rt, _, _, bt = struct.unpack(
                        "<HHIIHH", payload[idx + 8 : idx + 24]
                    )
                    return (
                        codec == 1
                        and 1 <= ch <= 8
                        and 1 <= rt <= 1_000_000
                        and bt in (8, 16, 24, 32)
                    )
                return True

            # once a real fmt has parsed, a re-synced 'fmt ' can only be a
            # false match inside the lying body — accepting it would
            # silently overwrite the real rate/channels/bits.  Bound
            # re-sync to 'data' in that case (ADVICE r11).
            known_tags = (b"data",) if rate is not None else (b"fmt ", b"data")
            candidates = []
            for known in known_tags:
                idx = payload.find(known, pos + 8)
                while idx >= 0 and not _plausible(idx, known):
                    idx = payload.find(known, idx + 1)
                if idx >= 0:
                    candidates.append(idx)
            if not candidates:
                break  # no known chunk anywhere → the final raise below
            pos = min(candidates)
            continue
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            codec, n_channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if codec != 1:
                raise NotImplementedError(f"WAV codec {codec} (only PCM=1)")
        elif tag == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt")
            if (n_channels, bits) != (1, 16):
                raise NotImplementedError(
                    f"{n_channels}ch/{bits}-bit WAV (only 16-bit mono)"
                )
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)  # word-aligned chunk walk
    raise ValueError("WAV without a data chunk")


#: output schema of the audio feature extractor.
AUDIO_SCHEMA = (
    "doc_id long, source string, sample_rate int, n_samples int,"
    " sum_amp long, energy long, checksum long"
)


def encode_then_decode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """WAV round-trip inside Arrow batches: synthesize the PCM clip, encode
    to RIFF bytes (odd doc_ids get an odd-length junk chunk so the
    skip-and-pad branch runs on half the corpus), decode with the real
    parser, emit integer features."""
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "sample_rate", "n_samples",
                                "sum_amp", "energy", "checksum")}
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            doc_id = int(doc_id)
            rate_in = 8000 + (doc_id % 3) * 4000
            payload = encode_wav(
                rate_in, synth_samples(doc_id), junk=(13 if doc_id % 2 else 0)
            )
            rate, s = decode_wav(payload)
            s64 = s.astype(np.int64)
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(s))
            rows["sum_amp"].append(int(s64.sum()))
            rows["energy"].append(int((s64 * s64).sum()))
            rows["checksum"].append(int((s64 * (np.arange(len(s64)) + 1)).sum()))
        yield pd.DataFrame(rows)


def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode pipeline with a REAL codec: per-doc RIFF/WAVE PCM
    payload → ``decode_wav`` (stdlib-struct chunk walk; unknown-chunk skip
    and word-alignment pad exercised on odd doc_ids) inside mapInPandas →
    per-source rollup of exact integer sample statistics.  The oracle
    re-derives every sample from the same integer recurrence, so a header
    misparse, off-by-one chunk walk, byte-order slip, or dropped sample
    hash-fails.  Scale shape: identical to the image keys — payloads stay
    in Python workers, the rollup is an ordinary partial-aggregated hash
    aggregate on O(sources) groups."""
    t = load_tables(spark, sf_dir)
    docs = _spread(t["documents"].select("doc_id", "source"))
    feats = docs.mapInPandas(encode_then_decode_wav, schema=AUDIO_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("n_samples").cast("long")).alias("total_samples"),
        # decoded (not synthesized) rates: pins the fmt-chunk parse, which
        # the data-byte checksums cannot see
        F.sum(F.col("sample_rate").cast("long")).alias("sum_rate"),
        F.sum("sum_amp").alias("sum_amp"),
        F.sum("energy").alias("sum_energy"),
        F.sum("checksum").alias("sum_checksum"),
    )


QUERIES["q_multimodal_wav"] = q_multimodal_wav

ORACLES["q_multimodal_wav"] = f"""
    WITH s AS (
        SELECT d.doc_id, d.source, t.i,
               ((d.doc_id * 17 + t.i * 11) % 65536) - 32768 AS v
        FROM documents d
        CROSS JOIN generate_series(0, {AUD_BASE} + 16) AS t(i)
        WHERE t.i < {AUD_BASE} + d.doc_id % 17
    ), per_doc AS (
        SELECT doc_id, source,
               count(*) AS n,
               sum(v) AS sum_amp,
               sum(v * v) AS energy,
               sum(v * (i + 1)) AS checksum
        FROM s GROUP BY doc_id, source
    )
    SELECT source,
           count(*) AS n_clips,
           CAST(sum(n) AS BIGINT) AS total_samples,
           CAST(sum(8000 + (doc_id % 3) * 4000) AS BIGINT) AS sum_rate,
           CAST(sum(sum_amp) AS BIGINT) AS sum_amp,
           CAST(sum(energy) AS BIGINT) AS sum_energy,
           CAST(sum(checksum) AS BIGINT) AS sum_checksum
    FROM per_doc GROUP BY source
"""
