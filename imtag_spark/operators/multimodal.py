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


IMAGE_SCHEMA = "id BIGINT, width INT, height INT, channels INT, pixels BINARY"


def _decode_pnm(raw: bytes) -> tuple[int, int, int, bytes]:
    """Pure-NumPy binary PPM (P6, RGB) / PGM (P5, gray) decoder.

    Netpbm is the classic uncompressed interchange format: ASCII header
    (magic, width, height, maxval; ``#`` comments allowed) then raw
    big-endian samples. maxval ≤ 255 only (8-bit), which is what the
    fixture encoder emits.
    """
    channels = 3 if raw[:2] == b"P6" else 1
    # tokenize the header: whitespace-separated fields, '#' to EOL is comment
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        fields.append(int(raw[i:j]))
        i = j
    i += 1  # single whitespace byte after maxval, then raw samples
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported by the fallback decoder")
    n = w * h * channels
    px = np.frombuffer(raw, dtype=np.uint8, count=n, offset=i)
    return w, h, channels, px.tobytes()


def _decode_bmp(raw: bytes) -> tuple[int, int, int, bytes]:
    """Pure-NumPy uncompressed 24-bit BITMAPINFOHEADER BMP decoder.

    Rows are 4-byte aligned and stored bottom-up (top-down when the height
    field is negative), samples BGR; output is row-major RGB.
    """
    if len(raw) < 54:
        raise NotImplementedError("truncated BMP header")
    offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"fallback BMP decoder handles uncompressed 24-bit only "
            f"(got bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, 3, rows[..., ::-1].tobytes()  # BGR → RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes (fixtures/tests)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → uncompressed 24-bit bottom-up BMP bytes (fixtures/tests)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_blob(raw: bytes) -> tuple[int, int, int, bytes]:
    """Per-blob codec dispatch: (width, height, channels, pixel bytes).

    Module-level (not a closure inside :func:`decode_image`) on purpose:
    Spark's Python workers re-import this module, so the ``Image`` gate is
    re-evaluated per worker — and a module-level kernel lets tests cover
    the PIL branch directly with a stubbed ``Image`` without needing PIL
    inside worker processes (tests/test_multimodal.py).
    """
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(raw))
        arr = np.asarray(img)
        c = 1 if arr.ndim == 2 else arr.shape[2]
        return img.width, img.height, c, arr.tobytes()
    if raw[:2] in (b"P6", b"P5"):
        return _decode_pnm(raw)
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    raise NotImplementedError(
        f"no decoder for blob with magic {raw[:4]!r}: PIL is not "
        "installed and the NumPy fallback handles PPM/PGM/BMP only"
    )


def decode_image(df: DataFrame, id_col: str = "id", bin_col: str = "blob") -> DataFrame:
    """Decode image blobs to raw row-major pixel bytes + dims.

    Codec resolution per blob, inside the Arrow batch kernel:
    - PIL, when importable (not in this container), handles any format;
    - otherwise a pure-NumPy fallback decodes binary PPM/PGM (``P6``/``P5``)
      and uncompressed 24-bit BMP — the classic raw interchange formats —
      so the decode kernel is executable end-to-end even codec-less;
    - anything else raises ``NotImplementedError`` naming the magic bytes
      (honest gate: no silent skips of undecodable training data).

    Output ``pixels`` is the raw interleaved uint8 buffer (h×w×channels,
    row-major RGB or gray) — the shape every downstream kernel (resize,
    patching, feature extraction) consumes without re-parsing.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = [decode_blob(bytes(blob)) for blob in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "width": np.array([o[0] for o in out], dtype=np.int32),
                    "height": np.array([o[1] for o in out], dtype=np.int32),
                    "channels": np.array([o[2] for o in out], dtype=np.int32),
                    "pixels": [o[3] for o in out],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, schema=IMAGE_SCHEMA)


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
