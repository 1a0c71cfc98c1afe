"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern (SURVEY.md §2C): media are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` operators so each Python worker sees contiguous batches
(the shape a real image/audio decoder needs).  The image/audio libraries
are not in this container, so the *codec* step is stubbed:

- :func:`decode_image` raises ``NotImplementedError`` (clearly-marked stub
  for a real decoder — plug in PIL/torchvision when available);
- :func:`extract_byte_features` is the deterministic fake used by the
  pipeline and tests — it exercises the identical Spark plumbing (binary
  Arrow transfer, batch iteration, schema contract).

Scale notes: payloads never hit the driver; ``mapInPandas`` streams
Arrow batches per partition, and the downstream rollup is an ordinary
hash aggregate.  Partitioning by ``source`` keeps related media co-located
for batch decoding.
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


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels.  STUB — the container has no
    imaging libraries; a real deployment plugs PIL/libvips in here.  The
    Spark-side plumbing (binary columns, Arrow batches, mapInPandas
    contract) is real and tested via :func:`extract_byte_features`."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use extract_byte_features for the plumbing path"
    )


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
    """End-to-end multimodal pipeline: binary payload column → repartition
    by source (co-locate media for batch decode) → Arrow-batched feature
    extraction (mapInPandas) → rollup.  Oracle reproduces the byte math
    from the text column."""
    t = load_tables(spark, sf_dir)
    payloads = with_payload(t["documents"]).repartition("source")
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
    payloads = with_payload(t["documents"]).repartition("source")
    frames = payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
    return frames.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").alias("total_bytes"),
        F.sum("byte_sum").alias("total_byte_sum"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


QUERIES = {
    "q_multimodal": q_multimodal,
    "q_multimodal_frames": q_multimodal_frames,
}

ORACLES = {
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
