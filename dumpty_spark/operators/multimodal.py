"""Multimodal column plumbing (EXT E5).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, partitioning,
mapInPandas signatures — is real and tested; the actual codec step is
STUBBED (this container has no image/audio libraries): ``decode_features``
computes deterministic byte-level features, and ``real_decode`` raises
``NotImplementedError`` until a codec backend (PIL/libav) is wired in.

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
# routes through it; otherwise the stub raises. The Spark-side plumbing
# (schema, Arrow batch shape, mapInPandas signature) is identical either
# way, so wiring a codec changes NOTHING upstream.
try:  # pragma: no cover - exercised only where Pillow exists
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

HAS_IMAGE_CODEC = _PILImage is not None


def real_decode(blob: bytes) -> dict:
    """The codec step: PIL-backed when Pillow is importable, otherwise a
    clearly-marked NotImplementedError (this container has no image
    libraries). Audio/video deployments swap in torchaudio/pyav behind
    the same signature."""
    if _PILImage is None:
        raise NotImplementedError(
            "no image codec in this environment — install Pillow (or plug "
            "in torchaudio/pyav behind this signature)"
        )
    import io

    with _PILImage.open(io.BytesIO(blob)) as im:  # pragma: no cover
        im.load()
        return {
            "width": im.width,
            "height": im.height,
            "mode": im.mode,
            "format": (im.format or "").lower(),
        }


IMAGE_META_SCHEMA = "doc_id long, width int, height int, mode string, format string"


def decode_images(df: DataFrame) -> DataFrame:
    """Real image decode over mapInPandas (requires the PIL backend; the
    probe failure surfaces as NotImplementedError per batch, same as
    calling real_decode directly). One metadata row per blob; pixel
    tensors stay inside the batch loop in a real feature extractor."""

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


def decode_features(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Batch feature extraction over binary blobs via mapInPandas.

    Arrow-batched: each pandas DataFrame chunk carries the blob bytes;
    features are computed vectorized per batch. The fake path is
    deterministic (byte stats + sha256 + first-8-bytes embedding proxy)
    so tests can assert exact values; the real path raises until a codec
    is installed.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_codec:
                pdf["decoded"] = pdf["blob"].map(real_decode)  # pragma: no cover
                raise AssertionError("unreachable")
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
