"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extract steps are STUBBED (the sandbox has no image or
audio libraries): :func:`decode_image_stub` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
(dims/hash derived from the bytes) so the Spark-side plumbing — schema,
Arrow batch shape, partitioning, UDF signature — is real and tested.

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


def _get_decoder(fake: bool):
    """Executor-side singleton load (amortized once per worker process)."""
    if "decoder" not in _DECODER_SINGLETON:
        if not fake:
            raise NotImplementedError(
                "real image/audio decode needs PIL/ffmpeg — not present in "
                "this environment; pass fake=True for the deterministic stub")
        _DECODER_SINGLETON["decoder"] = "fake-decoder-v1"
    return _DECODER_SINGLETON["decoder"]


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims + 8-dim feature from the bytes."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 64
    height = 64 + h[1] % 64
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real batch
    plumbing with the stubbed decoder."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _get_decoder(fake)
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, hgt, feat = decode_image_stub(b)
                rows.append((mid, kind, len(b),
                             hashlib.sha256(b).hexdigest(), w, hgt, feat))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(fn, FEATURE_SCHEMA)


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
