"""Multimodal column plumbing: image/audio/video as opaque binary.

Spark-side reality, decoder stubs: the container has no image/audio
libraries, so the *decode* step raises NotImplementedError (or runs a
clearly-marked deterministic fake), while everything Spark-cares-about
— schema, Arrow batch shape, mapInPandas signatures, partitioning —
is real and tested.

Pattern (SURVEY.md §2-B multimodal): a media column is
``STRUCT<uri: string, media_type: string, payload: binary,
meta: map<string,string>>``; bulk media lives in object storage and
``payload`` may be null with only ``uri`` set (pointer pattern), so
100 TB of video never flows through a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "uri string, media_type string, payload binary, meta map<string,string>"
)


def attach_media_column(
    df: DataFrame,
    uri_col: str,
    media_type: str,
    out_col: str = "media",
) -> DataFrame:
    """Wrap a uri column into the typed media struct (pointer form)."""
    return df.withColumn(
        out_col,
        F.struct(
            F.col(uri_col).alias("uri"),
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("binary").alias("payload"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ),
    )


def read_binary_files(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files: (path, modificationTime, length, content)
    via Spark's binaryFile source — splittable listing, lazy content."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def decode_image(payload: bytes) -> dict:
    """STUB — image decode requires PIL/opencv, absent in this
    container. At deploy time this returns {width, height, channels,
    pixels}; here it always raises."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; wire PIL/opencv here at deploy time"
    )


def _fake_decode_meta(payload: bytes | None, uri: str | None) -> tuple[int, int]:
    """Deterministic FAKE decoder used by tests: derives a (width,
    height) from the payload bytes / uri hash so the Spark plumbing
    (batching, schema, null handling) is exercised end-to-end."""
    basis = payload if payload is not None else (uri or "").encode()
    h = 0
    for byt in basis[:64]:
        h = (h * 131 + byt) & 0x7FFFFFFF
    return (h % 1920) + 1, (h % 1080) + 1


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over media structs.

    Arrow-batched; one python worker per partition; output schema is
    fixed so downstream plans analyze without running. With
    ``real_decode=True`` calls :func:`decode_image` (raises in this
    environment — documented stub).
    """
    out_schema = (
        "uri string, media_type string, byte_len long, width int, height int"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            rows = []
            for m in media:
                payload = m["payload"] if m is not None else None
                uri = m["uri"] if m is not None else None
                if real_decode:
                    decode_image(payload)  # NotImplementedError here
                w, h = _fake_decode_meta(payload, uri)
                rows.append(
                    {
                        "uri": uri,
                        "media_type": m["media_type"] if m is not None else None,
                        "byte_len": len(payload) if payload is not None else 0,
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(rows, columns=["uri", "media_type", "byte_len", "width", "height"])

    return df.select(media_col).mapInPandas(gen, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 30,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video media: emits one row per
    sampled frame index (0, n, 2n, …) with a null frame payload —
    the decode hook is the stub above. 1→N via mapInPandas keeps the
    fan-out executor-side (no explode of decoded frames through a
    shuffle)."""
    out_schema = "uri string, frame_index int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                uri = m["uri"] if m is not None else None
                for j in range(max_frames):
                    out.append({"uri": uri, "frame_index": j * every_n, "frame": None})
            yield pd.DataFrame(out, columns=["uri", "frame_index", "frame"])

    return df.select(media_col).mapInPandas(gen, schema=out_schema)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image-resize plumbing: mapInPandas with a fixed output schema.

    The pixel operation itself is STUBBED (no imaging library in this
    container): output payload is None and a meta note records the
    target size. At deploy time the body swaps to PIL/opencv; the
    Spark side — Arrow batching, schema, partition parallelism — is
    exactly what production runs.
    """
    out_schema = "uri string, width int, height int, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                out.append(
                    {
                        "uri": m["uri"] if m is not None else None,
                        "width": width,
                        "height": height,
                        "payload": None,  # PIL.Image.resize(...) at deploy
                    }
                )
            yield pd.DataFrame(out, columns=["uri", "width", "height", "payload"])

    return df.select(media_col).mapInPandas(gen, schema=out_schema)
