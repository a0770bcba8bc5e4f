"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decoding has two tiers:

- **Header decode (real)** — :func:`decode_media_header` parses PNG IHDR
  (width/height) and WAV RIFF fmt (sample rate/channels) headers in pure
  Python; unknown magic raises ``NotImplementedError`` (pixel/sample-level
  decode genuinely needs PIL/ffmpeg, absent in this sandbox).
- **Fake decode (stub)** — ``fake=True`` produces deterministic dims/
  features derived from the payload hash, so the Spark-side plumbing —
  schema, Arrow binary round-trip, partitioning, UDF signature — is
  testable on arbitrary blobs. Pixel-level feature extraction remains a
  hash-derived stub in BOTH tiers (declared, tested).

At scale the pattern is: binary column stays columnar parquet; decode runs
in ``mapInPandas`` (Arrow ships the bytes zero-copy to the worker) with
the heavy library loaded once per executor (the Spark analog of the
reference's Dask WorkerPlugin model preloads,
`cosmos/ingestion/ingest/preload_plugins/process_setup.py:8-19`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

_DECODER_SINGLETON = {}  # per-executor lazy "model" slot

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_media_header(payload: bytes) -> tuple[int, int]:
    """Real pure-Python header decode -> (width, height)-shaped dims.

    PNG: IHDR width/height (big-endian u32 at bytes 16..24 — the IHDR
    chunk is mandated first by the spec). WAV: RIFF/WAVE fmt chunk ->
    (sample_rate, n_channels) as the dims analog. Anything else raises
    ``NotImplementedError`` — sample-level decode needs PIL/ffmpeg."""
    if payload[:8] == _PNG_MAGIC and payload[12:16] == b"IHDR":
        if len(payload) < 24:  # truncated after the IHDR tag
            raise ValueError("truncated PNG: IHDR dims missing")
        return (int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"))
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        if len(payload) < 28:  # truncated before the fmt fields
            raise ValueError("truncated WAV: fmt chunk missing")
        sample_rate = int.from_bytes(payload[24:28], "little")
        channels = int.from_bytes(payload[22:24], "little")
        return sample_rate, channels
    raise NotImplementedError(
        "unknown media magic — pixel/sample decode needs PIL/ffmpeg, "
        "not present in this environment")


def _get_decoder(fake: bool):
    """Executor-side singleton load (amortized once per worker process)."""
    key = "fake" if fake else "real"
    if key not in _DECODER_SINGLETON:
        _DECODER_SINGLETON[key] = ("fake-decoder-v1" if fake
                                   else decode_media_header)
    return _DECODER_SINGLETON[key]


def decode_image_stub(payload: bytes,
                      digest: bytes | None = None
                      ) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims + 8-dim feature from the bytes.
    ``digest`` lets a caller that already sha256'd the payload reuse it
    (the feature-extraction hot path hashes each blob exactly once)."""
    h = digest if digest is not None else hashlib.sha256(payload).digest()
    width = 64 + h[0] % 64
    height = 64 + h[1] % 64
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``fake=False`` uses the real header decoder for dims (PNG/WAV; unknown
    formats fail the task — the honest behavior for undecodable media);
    the 8-dim feature vector is hash-derived in both modes (pixel-level
    features are the declared stub)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_decoder(fake)
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dig = hashlib.sha256(b).digest()  # hash each blob ONCE
                w, hgt, feat = decode_image_stub(b, digest=dig)
                if not fake:
                    w, hgt = decode_media_header(b)
                rows.append((mid, kind, len(b), dig.hex(), w, hgt, feat))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media: DataFrame, frame_size: int = 16,
                  every: int = 2) -> DataFrame:
    """Frame sampling over binary payloads: treat the payload as a
    sequence of fixed-size frame records and keep every ``every``-th one
    (the video frame-sample analog; with a real container format the
    chunking would come from the demuxer index instead of fixed strides).
    Real byte plumbing — frames are actual payload slices, shipped back
    through Arrow as binary."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every):
                    fr = b[i * frame_size:(i + 1) * frame_size]
                    rows.append((mid, i, len(fr),
                                 hashlib.sha256(fr).hexdigest(), fr))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(fn, FRAME_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize step: for PNG payloads this performs REAL byte surgery —
    rewrites the IHDR width/height fields and recomputes the chunk CRC
    (zlib.crc32), so the output header is a valid PNG header at the
    target dims; pixel resampling itself needs PIL and is the declared
    stub (the payload body passes through untouched). Non-PNG payloads
    pass through with dims stamped in metadata only."""
    import struct
    import zlib

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, mime, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["mime"],
                    pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if b[:8] == _PNG_MAGIC and b[12:16] == b"IHDR":
                    ln = int.from_bytes(b[8:12], "big")
                    body = struct.pack(">II", width, height) + b[24:16 + ln]
                    chunk = b"IHDR" + body
                    b = (b[:8] + b[8:12] + chunk
                         + struct.pack(">I", zlib.crc32(chunk))
                         + b[16 + ln + 4:])
                out.append((mid, kind, mime, b))
            yield pd.DataFrame(out, columns=["media_id", "kind", "mime",
                                             "payload"])

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: payload =
    utf-8 bytes of the text (a deterministic opaque blob for plumbing
    tests)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
