"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode step is STUBBED (no codec libraries in this container): the
Spark-side machinery — schema, Arrow batch shape, mapInPandas partitioning,
metadata propagation — is real and tested; `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (content-hash seeded dimensions/features) stands in so the
pipeline shape is exercised end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("payload", BinaryType(), True),      # opaque bytes
        StructField("mime", StringType(), True),
        StructField("meta_width", LongType(), True),
        StructField("meta_height", LongType(), True),
        StructField("meta_duration_s", DoubleType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a fake media table (payload = utf-8
    bytes) so the binary-column plumbing runs on provided testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("long").alias("meta_width"),
        F.lit(None).cast("long").alias("meta_height"),
        F.lit(None).cast("double").alias("meta_duration_s"),
    )


def extract_features(media: DataFrame, fake: bool = False, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline would decode with PIL/ffmpeg inside the same mapInPandas;
    here the decode is stubbed. The batch shape (pandas DataFrame per Arrow
    batch, binary column as bytes objects) is exactly what a real decoder
    would receive.
    """

    def batch_fn(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            n = len(pdf)
            n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            feats, widths, heights = [], [], []
            for b in pdf["payload"]:
                h = hashlib.sha256(b or b"").digest()
                widths.append(int.from_bytes(h[0:2], "big") % 4096 + 1)
                heights.append(int.from_bytes(h[2:4], "big") % 4096 + 1)
                feats.append(
                    (np.frombuffer(h[: n_features], dtype=np.uint8) / 255.0).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": pd.array(widths, dtype="Int64"),
                    "height": pd.array(heights, dtype="Int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(batch_fn, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), True),      # re-encoded bytes
        StructField("resized_sha", StringType(), False),
    ]
)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Arrow-batched decode→resample→re-encode over binary payloads.

    Real pipeline: PIL/libvips resize inside the same mapInPandas batch.
    STUB (fake=True): the re-encoded payload is the utf-8 of
    sha256(sha256(payload).hex + "|WxH") — deterministic, cross-engine
    reproducible (the resized_sha column is DuckDB-oracle-checked), and the
    batch shape (binary in, binary out, meta columns) is exactly the real
    decoder's contract."""

    def batch_fn(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media resize requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            outs = []
            for b in pdf["payload"]:
                h = hashlib.sha256(b or b"").hexdigest()
                outs.append(
                    hashlib.sha256(f"{h}|{width}x{height}".encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": [o.encode() for o in outs],
                    "resized_sha": outs,
                }
            )

    return media.mapInPandas(batch_fn, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_s", DoubleType(), False),
        StructField("frame_sha", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, max_frames: int = 4, fake: bool = False) -> DataFrame:
    """Video frame sampling: one input row fans out to n_frames rows —
    the row-explosion plumbing (mapInPandas yielding MORE rows than it
    receives) a real ffmpeg frame sampler needs.

    STUB (fake=True): duration = n_bytes % 120 + 1 seconds, n_frames =
    n_bytes % max_frames + 1, uniform timestamps, frame_sha =
    sha256(sha256(payload).hex + ":" + idx) — all DuckDB-expressible, so
    the fan-out is value-checked by the driver oracle."""

    def batch_fn(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            mid, idxs, tss, shas = [], [], [], []
            for i, b in zip(pdf["media_id"], pdf["payload"]):
                b = b or b""
                h = hashlib.sha256(b).hexdigest()
                dur = len(b) % 120 + 1
                nf = len(b) % max_frames + 1
                for k in range(nf):
                    mid.append(i)
                    idxs.append(k)
                    tss.append(round(k * dur / nf, 3))
                    shas.append(hashlib.sha256(f"{h}:{k}".encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": mid, "frame_idx": idxs, "ts_s": tss,
                 "frame_sha": shas}
            )

    return media.mapInPandas(batch_fn, schema=FRAMES_SCHEMA)
