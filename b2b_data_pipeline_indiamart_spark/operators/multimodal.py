"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` payload column plus typed
metadata — the layout a 100 TB training-data pipeline uses so parquet
scans can prune metadata-only queries without touching payload bytes.

Decoding is two-tier:

- **Real header decode** (:func:`parse_image_header`,
  :func:`parse_wav_header`): pure-Python (stdlib-only) parsers for the
  container formats whose metadata lives in a fixed header — PNG IHDR,
  GIF logical-screen descriptor, BMP info header, JPEG SOF scan, WAV
  RIFF/fmt/data chunks. These run inside the ``mapInPandas`` batch
  loop and return real width/height (images) and duration (WAV audio).
- **Stub fallback** (``_decode_stub``): payloads the header parsers
  don't recognize (and video — a real frame decode needs ffmpeg, which
  this container lacks; ``decode_real`` documents the intended call)
  get deterministic fake properties derived from the payload hash. The
  ``decoder`` output column says which path produced each row.

Everything Spark-side — schemas, ``mapInPandas`` signatures, Arrow
batch iteration, one-in/many-out frame explosion — is real and tested;
swapping the video stub for ffmpeg is a one-function change that does
not touch any plan.
"""

from __future__ import annotations

import hashlib
import struct
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
        T.StructField("decoder", T.StringType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _hex_byte(col) -> F.Column:
    """Dynamic int (0..255) → 2-hex-digit string, JVM-side."""
    return F.lower(F.lpad(F.hex(col.cast("long")), 2, "0"))


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the ``documents`` testdata. Kind
    round-robins by doc_id; IMAGE payloads carry a REAL container
    header (PNG / GIF / BMP rotating by doc_id) with deterministic
    doc_id-derived dimensions, followed by the UTF-8 text bytes as
    body, so the header-decode path is exercised end-to-end on real
    bytes. Audio/video payloads stay raw text (stub-decoded — see
    module docstring). Header synthesis is pure Catalyst (hex-string
    concat → ``to_binary``): no Python between the scan and the
    decode stage.
    """
    w = F.lit(64) + F.col("doc_id") % 192
    h = F.lit(64) + (F.col("doc_id") * 7) % 192
    png_hex = F.concat(
        # magic ‖ IHDR length(13) ‖ "IHDR" ‖ width BE32 ‖ height BE32 ‖
        # bit-depth/color-type/compression/filter/interlace
        F.lit("89504e470d0a1a0a0000000d49484452"),
        F.lit("000000"), _hex_byte(w), F.lit("000000"), _hex_byte(h),
        F.lit("0806000000"),
    )
    gif_hex = F.concat(  # "GIF89a" ‖ width LE16 ‖ height LE16
        F.lit("474946383961"), _hex_byte(w), F.lit("00"), _hex_byte(h), F.lit("00")
    )
    bmp_hex = F.concat(  # "BM" ‖ 16 filler bytes ‖ width LE32 ‖ height LE32
        F.lit("424d"), F.lit("00" * 16),
        _hex_byte(w), F.lit("000000"), _hex_byte(h), F.lit("000000"),
    )
    img_header = F.to_binary(
        F.element_at(
            F.array(png_hex, gif_hex, bmp_hex),
            (F.floor(F.col("doc_id") / 3) % 3 + 1).cast("int"),
        ),
        F.lit("hex"),
    )
    body = F.encode("text", "UTF-8")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", F.concat(img_header, body)).otherwise(body).alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def parse_image_header(payload: bytes | None) -> tuple[str, int, int] | None:
    """(format, width, height) from a PNG/GIF/BMP/JPEG container
    header, or None if the bytes aren't a recognized image.

    Pure stdlib — each format keeps its dimensions at a fixed (or, for
    JPEG, marker-addressed) offset, so no pixel codec is needed:
    PNG IHDR bytes 16..24 (BE32), GIF logical screen bytes 6..10
    (LE16), BMP info-header bytes 18..26 (LE32, height signed — may be
    negative for top-down rows), JPEG SOFn segment scan.
    """
    if not payload:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h))
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn marker
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker, seg_len = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


def parse_wav_header(payload: bytes | None) -> float | None:
    """Duration in seconds from a RIFF/WAVE header, or None.

    Walks the chunk list for ``fmt `` (byte rate at chunk offset 8)
    and ``data`` (payload size); duration = data_size / byte_rate.
    """
    if not payload:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid, size = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 20 <= len(b):
            byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return data_size / byte_rate
    return None


def decode_real(payload: bytes, kind: str):  # pragma: no cover - stub
    """Full pixel/sample decode — intentionally unimplemented here.

    Header-level metadata (dimensions, WAV duration) IS decoded for
    real by :func:`parse_image_header` / :func:`parse_wav_header`;
    this stub marks the remaining gap: pixel data, audio samples, and
    video frames need PIL / soundfile / ffmpeg, none of which ship in
    this environment.
    """
    raise NotImplementedError(
        "pixel/sample decode requires PIL (image), soundfile (audio) or "
        "ffmpeg (video), none of which ship in this environment; header "
        "metadata is decoded by parse_image_header/parse_wav_header and "
        "unrecognized payloads fall back to the deterministic _decode_stub"
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

    def decode_one(payload, kind: str) -> dict:
        if kind == "image":
            parsed = parse_image_header(payload)
            if parsed is not None:
                fmt, w, h = parsed
                return {
                    "width": w, "height": h, "duration_s": 0.0,
                    "n_frames": 1, "decoder": f"header:{fmt}",
                }
        elif kind == "audio":
            dur = parse_wav_header(payload)
            if dur is not None:
                return {
                    "width": 0, "height": 0, "duration_s": round(dur, 3),
                    "n_frames": 0, "decoder": "header:wav",
                }
        return {**_decode_stub(payload, kind), "decoder": "stub"}

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_one(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
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
                    "decoder": [d["decoder"] for d in decoded],
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
