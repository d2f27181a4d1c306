"""Multimodal columns: opaque binary payloads with typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns beside typed metadata structs; the engine's job is the Spark-side
plumbing — schema, partition-friendly batch kernels, Arrow UDF signatures —
while the actual codecs stay pluggable. The image/audio libraries are not
in this container, so the decode step is gated: real codecs raise
``NotImplementedError`` unless their library imports; a deterministic fake
header format (``IMTB`` magic) keeps the full path testable end-to-end.

Design rules (same as every operator here):
- metadata extraction that is pure byte arithmetic stays JVM-side
  (``F.length``, ``F.sha2``, ``F.substring`` on binary);
- per-blob decoding runs in ``mapInPandas`` over Arrow batches — bytes
  never round-trip through per-row Python objects one at a time;
- frame/patch expansion is ``explode(sequence(...))`` — JVM-side, so a
  video's frame fan-out shuffles row references, not pixel data.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # real codecs, absent in this container — decode gates on this
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None

#: deterministic fake container format for tests: magic + u32 width + u32
#: height + u32 channels + u32 n_frames, then raw payload bytes
FAKE_MAGIC = b"IMTB"
FAKE_FMT = ">4sIIII"  # plain string: Struct objects don't pickle into UDFs
FAKE_HEADER_SIZE = struct.calcsize(FAKE_FMT)

BLOB_META_SCHEMA = (
    "id BIGINT, width INT, height INT, channels INT, n_frames INT, payload_bytes INT"
)


def pack_fake_blob(
    width: int, height: int, channels: int = 3, n_frames: int = 1, seed: int = 0
) -> bytes:
    """Deterministic synthetic blob (tests/fixtures only)."""
    n = width * height * channels * n_frames
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=min(n, 4096), dtype=np.uint8).tobytes()
    return struct.pack(FAKE_FMT, FAKE_MAGIC, width, height, channels, n_frames) + payload


def attach_blob_meta(
    df: DataFrame, bin_col: str = "blob", prefix: str = "blob_"
) -> DataFrame:
    """JVM-side metadata: byte length + sha256 of the raw blob.

    The sha column is the multimodal analog of the corpus per-row
    ``sha256(content)`` invariant (BASELINE.json input_hint).
    """
    b = F.col(bin_col)
    return df.withColumn(f"{prefix}bytes", F.length(b).cast("long")).withColumn(
        f"{prefix}sha", F.sha2(b, 256)
    )


def decode_blob_meta(
    df: DataFrame, id_col: str = "id", bin_col: str = "blob"
) -> DataFrame:
    """Parse the typed header of every blob — vectorized ``mapInPandas``.

    Real image decode would go here (PIL/libvips); with no codec in the
    container this parses the deterministic ``IMTB`` header, exercising the
    exact batch shape / schema / partitioning a real decoder plugs into.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            metas = []
            for blob in pdf[bin_col]:
                raw = bytes(blob)
                if len(raw) >= FAKE_HEADER_SIZE and raw[:4] == FAKE_MAGIC:
                    _, w, h, c, nf = struct.unpack(FAKE_FMT, raw[:FAKE_HEADER_SIZE])
                    metas.append((w, h, c, nf, len(raw) - FAKE_HEADER_SIZE))
                else:
                    metas.append((0, 0, 0, 0, len(raw)))
            meta = np.array(metas, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "width": meta[:, 0].astype(np.int32),
                    "height": meta[:, 1].astype(np.int32),
                    "channels": meta[:, 2].astype(np.int32),
                    "n_frames": meta[:, 3].astype(np.int32),
                    "payload_bytes": meta[:, 4].astype(np.int32),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(parse, schema=BLOB_META_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "id", bin_col: str = "blob") -> DataFrame:
    """Real image decode — requires a codec library this container lacks."""
    if Image is None:
        raise NotImplementedError(
            "real image decode needs PIL/libvips (not in this container); "
            "use decode_blob_meta for the plumbing path"
        )
    raise NotImplementedError("real codec path intentionally unimplemented here")


def frame_sample(
    meta: DataFrame, every_k: int = 10, id_col: str = "id"
) -> DataFrame:
    """Video frame sampling plumbing: (id, n_frames) → (id, frame_idx) rows
    for every k-th frame. Pure JVM explode — the fan-out never moves pixel
    bytes, only (id, frame) references that a decode stage joins back."""
    return meta.where(F.col("n_frames") > 0).select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


def resize_spec(
    meta: DataFrame, target: int, id_col: str = "id"
) -> DataFrame:
    """Resize planning: aspect-preserving target dims per blob (shorter side
    → ``target``), pure column arithmetic. A real resize kernel consumes
    this spec inside mapInPandas next to the decoder."""
    w, h = F.col("width"), F.col("height")
    scale = F.lit(float(target)) / F.least(w, h)
    return meta.where((w > 0) & (h > 0)).select(
        id_col,
        "width",
        "height",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def patch_grid(
    meta: DataFrame, patch: int, id_col: str = "id"
) -> DataFrame:
    """Image → patch-coordinate fan-out (ViT-style tiling plumbing):
    (id, patch_row, patch_col) for every full patch. JVM-side cross
    sequence explode; pixel data joins in at decode time."""
    npr = (F.col("height") / patch).cast("int")
    npc = (F.col("width") / patch).cast("int")
    return (
        meta.where((npr > 0) & (npc > 0))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), npr - 1)).alias("patch_row"),
            npc.alias("_npc"),
        )
        .select(
            id_col,
            "patch_row",
            F.explode(F.sequence(F.lit(0), F.col("_npc") - 1)).alias("patch_col"),
        )
    )
