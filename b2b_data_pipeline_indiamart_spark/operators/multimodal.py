"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` payload column plus typed
metadata — the layout a 100 TB training-data pipeline uses so parquet
scans can prune metadata-only queries without touching payload bytes.

The *decode* step is STUBBED: the container has no image/audio libs, so
``_decode_stub`` derives deterministic fake properties from the payload
hash, and ``decode_real`` raises ``NotImplementedError`` with the
intended library call. Everything Spark-side — schemas, ``mapInPandas``
signatures, Arrow batch iteration, one-in/many-out frame explosion —
is real and tested; swapping the stub for PIL/ffmpeg is a one-function
change that does not touch any plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the ``documents`` testdata: the UTF-8
    text bytes stand in for encoded payloads, kind round-robins by
    doc_id. Deterministic, so every multimodal test is reproducible."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):  # pragma: no cover - stub
    """REAL decode — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "media decode requires PIL (image), soundfile (audio) or ffmpeg "
        "(video), none of which ship in this environment; use the "
        "deterministic _decode_stub path"
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: properties derived from the payload's
    sha256 so outputs are stable across runs/partitionings."""
    h = hashlib.sha256(payload or b"").digest()
    w = 64 + h[0] % 192  # 64..255 px
    ht = 64 + h[1] % 192
    dur = round(1.0 + (h[2] % 120), 1)  # 1..121 s
    frames = 1 if kind == "image" else int(dur * 8)
    return {
        "width": w if kind != "audio" else 0,
        "height": ht if kind != "audio" else 0,
        "duration_s": 0.0 if kind == "image" else dur,
        "n_frames": frames,
    }


def extract_media_features(media: DataFrame) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``.

    Arrow streams whole column batches into Python; each batch is
    processed vectorized-where-possible and yielded back — no per-row
    pickling. This is the narrow (shuffle-free) stage: features compute
    where the payload bytes already live.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "duration_s": [d["duration_s"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' every image payload to ``width``×``height``.

    The pixel transform is the stub (output bytes = sha256 of input ‖
    target dims, so it's deterministic and size-bounded); the plumbing
    is the real shape: filter non-images *before* the Python boundary
    so Catalyst prunes them at the scan, then map payload batches.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        hashlib.sha256((p or b"") + tag).digest()
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(do_resize, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 16) -> DataFrame:
    """Sample every ``every_n``-th frame of each video: one input row →
    many output rows, the explode-shaped ``mapInPandas`` pattern.

    Frame bytes are the stub (sha256(payload ‖ frame_idx)); frame count
    comes from the stubbed decode. Output fan-out is bounded by the
    decode's n_frames, and the non-video filter stays JVM-side.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = _decode_stub(payload, "video")["n_frames"]
                for i in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(
                        hashlib.sha256((payload or b"") + str(i).encode()).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": blobs})

    return media.filter(F.col("kind") == "video").mapInPandas(frames, schema=FRAMES_SCHEMA)
