"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-native shape for multimodal training data: binaries stay
columnar (parquet/ORC binary pages, never driver-side), metadata is
queryable/pushdown-able, and per-batch decode runs as Arrow-vectorized
``mapInPandas`` so decoder libraries amortize across a batch.

The decode kernels themselves are STUBBED in this environment (no
PIL/libav in the container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (header-derived pseudo-dimensions) exercises the real
plumbing — schema, batching, partitioning — end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried alongside every media binary.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4…
        T.StructField("source_url", T.StringType(), True),
    ]
)


def attach_media(
    df: DataFrame, binary_col: str, media_type: str, fmt: str | None = None
) -> DataFrame:
    """Normalize a raw binary column into (media: binary, media_meta: struct)."""
    return df.withColumn("media", F.col(binary_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("string").alias("source_url"),
        ),
    )


#: Output schema of media_features — fixed so downstream code/tests can
#: rely on it whether the decoder is real or fake.
MEDIA_FEATURES_SCHEMA = (
    "id long, size_bytes long, content_sha256 string, width int, height int"
)


def media_features(
    df: DataFrame, id_col: str = "id", binary_col: str = "media", fake: bool = False
) -> DataFrame:
    """Per-media features via mapInPandas (Arrow batches of binaries).

    Real deployments plug a decoder into ``_decode_batch``; here the
    decode step is stubbed (``fake=True`` derives deterministic
    pseudo-dimensions from the content hash so the full distributed path
    — binary Arrow transfer, batch iteration, schema — is exercised and
    testable without image libraries).
    """

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame()
            out["id"] = pdf[id_col]
            blobs = pdf[binary_col]
            out["size_bytes"] = blobs.map(lambda b: len(b) if b is not None else 0)
            hashes = blobs.map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
            )
            out["content_sha256"] = hashes
            if fake:
                # deterministic pseudo-decode: dimensions from the hash
                out["width"] = hashes.map(
                    lambda h: (int(h[:4], 16) % 1920) + 1 if h else None
                ).astype("Int32")
                out["height"] = hashes.map(
                    lambda h: (int(h[4:8], 16) % 1080) + 1 if h else None
                ).astype("Int32")
            else:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present "
                    "in this environment; pass fake=True for the deterministic "
                    "stub (plumbing is identical)"
                )
            yield out

    return df.mapInPandas(_decode_batch, schema=MEDIA_FEATURES_SCHEMA)


#: One output row per sampled frame.
FRAME_SAMPLE_SCHEMA = (
    "id long, frame_index int, frame_ts_ms long, frame binary"
)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    binary_col: str = "media",
    n_frames: int = 4,
    fps: float = 30.0,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: mapInPandas exploding one video row into
    ``n_frames`` frame rows (frame binary + index + timestamp) — the 1→N
    generator shape a training pipeline feeds to vision encoders.

    Decode is stubbed like media_features: ``fake=True`` slices the raw
    payload into deterministic per-frame chunks (so row explosion, Arrow
    binary transfer both directions, and the output schema are all real
    and tested); the real kernel plugs libav into the same loop.
    """

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires a video decoder not present in "
                    "this environment; pass fake=True for the deterministic "
                    "stub (plumbing is identical)"
                )
            ids, idxs, tss, frames = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(blob) if blob is not None else b""
                # fake decode: n_frames even slices of the payload stand in
                # for decoded frames; timestamps from the nominal fps
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(int(i * 1000 / fps))
                    frames.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"id": ids, "frame_index": pd.array(idxs, dtype="int32"),
                 "frame_ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


#: Resize output: same id space, transformed binary + recorded dims.
RESIZE_SCHEMA = "id long, resized binary, out_width int, out_height int"


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "id",
    binary_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas kernel (1→1).

    ``fake=True`` emits a deterministic transform of the payload
    (truncate/pad to width*height bytes) so the batch shape and schema
    are exercised; a real deployment swaps in PIL/opencv inside the same
    per-batch loop, where the decoder cost amortizes across the batch.
    """
    target = width * height

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an image library not present in "
                    "this environment; pass fake=True for the deterministic "
                    "stub (plumbing is identical)"
                )
            blobs = pdf[binary_col].map(
                lambda b: (bytes(b) + b"\x00" * target)[:target]
                if b is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "resized": blobs,
                    "out_width": pd.array([width] * len(pdf), dtype="int32"),
                    "out_height": pd.array([height] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)
