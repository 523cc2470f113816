"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct alongside
(modality, byte_size, format sniffed from magic bytes). Heavy per-item work
(decode, resize, frame-sample, feature-extract) runs through mapInPandas:
Arrow-batched, columnar, and scale-out by partition — the pattern a 100 TB
media pipeline needs (reshuffle by size class first if items are skewed).

The actual codec step is STUBBED (no image/audio libs in this container):
``decode_features`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic md5-derived feature vector so the Spark-side
plumbing (schemas, batching, UDF signature) is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "wav",
    b"OggS": "ogg",
}


def with_media_metadata(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Attach a typed metadata struct sniffed from the binary column."""
    head = F.expr(f"substring({binary_col}, 1, 4)")
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        prefix = F.lit(bytearray(magic))
        fmt = F.when(
            F.expr(f"substring({binary_col}, 1, {len(magic)})") == F.lit(magic), name
        ).otherwise(fmt)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col(binary_col)).cast("long").alias("byte_size"),
            fmt.alias("format"),
            F.sha1(F.col(binary_col)).alias("content_sha1"),
        ),
    )


def synthesize_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media bytes from a text column (test fixture for
    the binary plumbing; real pipelines read binary files/blob columns)."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8"))


def decode_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """binary → feature vector via Arrow-batched mapInPandas.

    Real decode is not implemented in this environment; ``fake=True`` yields
    a deterministic md5-derived vector per item (plumbing test path).
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "container; call with fake=True for the deterministic test path"
        )

    schema = f"{id_col} bigint, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [b / 255.0 for b in hashlib.md5(buf).digest()[:dim]]
                for buf in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(batches, schema=schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """binary → resized binary + output dims, Arrow-batched.

    Real image decode/resample is STUBBED (no codec libs here); the fake
    path emits a deterministic byte buffer of exactly width*height bytes so
    batch shape, output schema, and size accounting are all real and
    testable. A production kernel swaps only the inner function (e.g.
    PIL/libvips), keeping the partition-parallel plumbing unchanged.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires codec libraries not present in this "
            "container; call with fake=True for the deterministic test path"
        )
    schema = f"{id_col} bigint, media binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in it:
            out = [
                bytes(
                    hashlib.md5(buf + bytes([i % 251])).digest()[0]
                    for i in range(n)
                )
                if len(buf)
                else b""
                for buf in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 4,
    binary_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """video binary → exploded (id, frame_idx, frame) rows, Arrow-batched.

    The fan-out (one input row → up to max_frames output rows) is the part
    that matters at scale: mapInPandas lets the batch emit a different row
    count than it received, so frame sampling never needs a driver-side
    explode. Real frame extraction is STUBBED; the fake path slices the
    input bytes deterministically per frame index.
    """
    if not fake:
        raise NotImplementedError(
            "frame sampling requires codec libraries not present in this "
            "container; call with fake=True for the deterministic test path"
        )
    schema = f"{id_col} bigint, frame_idx int, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, buf in zip(pdf[id_col], pdf[binary_col]):
                n_frames = min(max_frames, max(len(buf) // every_n, 1))
                for fi in range(n_frames):
                    ids.append(did)
                    idxs.append(fi)
                    frames.append(bytes(buf[fi * every_n : (fi + 1) * every_n]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(batches, schema=schema)
