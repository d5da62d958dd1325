"""Multimodal column plumbing (EXT E5).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, partitioning,
mapInPandas signatures — is real and tested. The codec step is a
PROBE-BASED backend (``HAS_IMAGE_CODEC``): ``real_decode`` routes through
Pillow when importable, else a built-in pure-Python decoder for
uncompressed BMP/PPM, and raises ``NotImplementedError`` only for formats
neither backend can read. ``decode_features`` additionally offers a
deterministic byte-level fake path so tests can assert exact values
without any image fixture.

Scale notes: blobs ride through Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest for large blobs
and repartition by size (sinks.target_size_repartition) before writing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sha256 string, "
    "head_hex string, fake_embedding array<double>"
)


def attach_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a binary column + metadata struct from a text column —
    the fixture generator for the multimodal surface (documents has no
    real image bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


# Codec backend probe: when Pillow is installed the real image decode
# routes through it for every format it knows; without it, a built-in
# pure-Python decoder still handles uncompressed BMP and binary PNM
# (PPM/PGM), so the REAL decode branch executes even in image-library-free
# environments. Other formats raise NotImplementedError. The Spark-side
# plumbing (schema, Arrow batch shape, mapInPandas signature) is identical
# either way, so swapping backends changes NOTHING upstream.
try:  # pragma: no cover - exercised only where Pillow exists
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

HAS_IMAGE_CODEC = _PILImage is not None  # full-format backend present?

_PNM_MODES = {b"P4": "1", b"P5": "L", b"P6": "RGB"}
_BMP_MODES = {1: "1", 8: "L", 24: "RGB", 32: "RGBA"}


def _decode_pnm(blob: bytes) -> dict:
    """Binary PNM (P4 bitmap / P5 graymap / P6 pixmap): ASCII header of
    whitespace-separated tokens (``#`` comments allowed), then raw pixels.
    Header grammar per the netpbm spec (public format documentation)."""
    magic = blob[:2]
    mode = _PNM_MODES[magic]
    tokens: list[int] = []
    need = 2 if magic == b"P4" else 3  # P4 has no maxval
    i = 2
    while len(tokens) < need:
        if i >= len(blob):
            raise ValueError("truncated PNM header")
        c = blob[i : i + 1]
        if c == b"#":  # comment to end of line
            i = blob.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            tokens.append(int(blob[i:j]))
            i = j
    width, height = tokens[0], tokens[1]
    fmt = {b"P4": "pbm", b"P5": "pgm", b"P6": "ppm"}[magic]
    return {"width": width, "height": height, "mode": mode, "format": fmt}


def _decode_bmp(blob: bytes) -> dict:
    """Uncompressed BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER.
    Width/height/bpp/compression live at fixed offsets 18/22/28/30
    (little-endian), per the public Windows BMP format documentation.
    Height may be negative (top-down rows) — report its magnitude."""
    import struct

    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp, compression = struct.unpack_from("<HI", blob, 28)
    if compression != 0:
        raise NotImplementedError(
            f"compressed BMP (BI_ compression {compression}) needs Pillow"
        )
    mode = _BMP_MODES.get(bpp)
    if mode is None:
        raise NotImplementedError(f"{bpp}-bpp BMP needs Pillow")
    return {"width": width, "height": abs(height), "mode": mode, "format": "bmp"}


def real_decode(blob: bytes) -> dict:
    """The codec step: PIL-backed when Pillow is importable; otherwise the
    built-in pure-Python BMP/PNM decoder handles the uncompressed formats
    and anything else raises the documented NotImplementedError.
    Audio/video deployments swap in torchaudio/pyav behind the same
    signature."""
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(blob)) as im:  # pragma: no cover
            im.load()
            return {
                "width": im.width,
                "height": im.height,
                "mode": im.mode,
                "format": (im.format or "").lower(),
            }
    if blob[:2] in _PNM_MODES:
        return _decode_pnm(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    raise NotImplementedError(
        "no image codec for this format in this environment — built-in "
        "decoder covers uncompressed BMP/PPM/PGM/PBM; install Pillow (or "
        "plug in torchaudio/pyav behind this signature) for the rest"
    )


def encode_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary P6 pixmap for fixtures/tests: pixel (x, y)
    channel c is ``(seed + 7*x + 13*y + 29*c) % 256``. Pure function of
    (width, height, seed), so oracles can predict decoded metadata
    arithmetically."""
    header = f"P6\n{width} {height}\n255\n".encode()
    body = bytes(
        (seed + 7 * x + 13 * y + 29 * c) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )
    return header + body


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bpp uncompressed BMP (BI_RGB, bottom-up) with the
    same pixel formula as :func:`encode_ppm`. Rows padded to 4 bytes per
    the format."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    img_size = row_bytes * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytes(
            (seed + 7 * x + 13 * y + 29 * c) % 256
            for x in range(width)
            for c in (2, 1, 0)  # BGR on disk
        )
        rows.append(row.ljust(row_bytes, b"\0"))
    return header + b"".join(rows)


def attach_image_blob(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL image blob per row — a binary P6 PPM whose
    dimensions derive arithmetically from the id (width = 4 + id % 13,
    height = 3 + id % 7, seed = id % 251) — so the decode path can be
    oracle-checked end-to-end: the oracle predicts width/height from the
    id, the engine must actually parse the bytes to agree. Arrow-batched
    mapInPandas, same blob+meta shape as :func:`attach_blob`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            blobs = [
                encode_ppm(4 + int(i) % 13, 3 + int(i) % 7, seed=int(i) % 251)
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": blobs,
                    "meta": [
                        {"mime": "image/x-portable-pixmap", "n_bytes": len(b)}
                        for b in blobs
                    ],
                }
            )

    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col)).mapInPandas(
        batches,
        schema="doc_id long, blob binary, meta struct<mime string, n_bytes long>",
    )


IMAGE_META_SCHEMA = "doc_id long, width int, height int, mode string, format string"


def decode_images(df: DataFrame) -> DataFrame:
    """Real image decode over mapInPandas (PIL backend when present, else
    the built-in BMP/PNM decoder; an unreadable format surfaces as
    NotImplementedError per batch, same as calling real_decode directly).
    One metadata row per blob; pixel tensors stay inside the batch loop in
    a real feature extractor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [real_decode(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mode": [m["mode"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )

    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def decode_features(df: DataFrame) -> DataFrame:
    """Batch feature extraction over binary blobs via mapInPandas.

    Arrow-batched: each pandas DataFrame chunk carries the blob bytes;
    features are computed vectorized per batch. Deterministic byte-level
    features (byte stats + sha256 + first-8-bytes embedding proxy) so
    tests can assert exact values without any image fixture; for real
    image metadata use :func:`decode_images`, which routes through the
    probe-based codec backend.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["blob"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": blobs.map(len),
                    "sha256": blobs.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "head_hex": blobs.map(lambda b: b[:8].hex()),
                    "fake_embedding": blobs.map(
                        lambda b: [x / 255.0 for x in b[:8]]
                    ),
                }
            )
            yield out

    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(batches, schema=BLOB_SCHEMA)


RESIZE_SCHEMA = "doc_id long, mime string, out_w int, out_h int, resized binary"


def resize_stub(df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Resize plumbing: Arrow-batched mapInPandas producing a fixed-size
    blob per input blob. The fake kernel truncates/right-pads the bytes to
    out_w*out_h (deterministic); a real deployment swaps in
    PIL.Image.resize inside the SAME batch loop — schema, batch shape and
    partitioning don't change."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = out_w * out_h
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized": pdf["blob"].map(
                        lambda b: bytes(b[:target]).ljust(target, b"\0")
                    ),
                }
            )

    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_sha256 string"
FRAME_SIZE = 256  # bytes per fake frame


def frame_sample(df: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling plumbing: one input row (a 'video' blob) fans out to
    one OUTPUT ROW PER SAMPLED FRAME — the 1→N mapInPandas shape a real
    pyav frame sampler needs. Fake kernel: frames are consecutive
    FRAME_SIZE-byte chunks (full chunks only), frames 0, every, 2·every…
    are kept. Deterministic, so frame counts/bytes are oracle-checkable
    arithmetically and hashes exactly in unit tests."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, shas = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = len(b) // FRAME_SIZE
                for fi in range(0, n_frames, every):
                    chunk = b[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_sha256": shas,
                }
            )

    from dumpty_spark.operators.util import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(batches, schema=FRAME_SCHEMA)
