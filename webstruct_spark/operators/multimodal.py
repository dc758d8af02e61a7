# -*- coding: utf-8 -*-
"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub: :func:`decode_asset` raises ``NotImplementedError``
for real codecs and supports only the deterministic synthetic "WSRB"
container produced by :func:`synth_assets` (a length-prefixed header +
payload — enough to exercise real Spark-side concerns: binary Arrow
transfer, per-batch decode, schema, partitioning, frame sampling).

Swap ``decode_asset`` for a PIL/ffmpeg call in production; every other
line is codec-agnostic.
"""
from __future__ import annotations

import hashlib
import struct
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"WSRB"

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _blob(asset_id: int, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(
            b"asset-%d-%d" % (asset_id, i), digest_size=64
        ).digest()
        i += 1
    return bytes(out[:n])


def synth_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic assets in the WSRB container: header =
    MAGIC + u16 width + u16 height + u16 n_frames, then
    width*height bytes per frame."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        frames = 1 if kind == "image" else 4 + i % 4
        payload = _blob(i, w * h * frames)
        media = MAGIC + struct.pack("<HHH", w, h, frames) + payload
        rows.append(
            (i, kind, bytearray(media),
             (w, h, frames, 16000 if kind == "audio" else None))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_asset(media: bytes):
    """Decode a binary asset to a (n_frames, h, w) uint8 array.

    STUB: only the synthetic WSRB container is supported in this
    environment; real codecs are deliberately not implemented here.
    """
    if media[:4] != MAGIC:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "container; only synthetic WSRB assets decode"
        )
    w, h, frames = struct.unpack("<HHH", bytes(media[4:10]))
    arr = np.frombuffer(bytes(media[10 : 10 + w * h * frames]), dtype=np.uint8)
    return arr.reshape(frames, h, w)


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset features via mapInPandas: decode → per-frame mean /
    std / histogram-ish summary (the stand-in for a real embedding
    model)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "kind": [], "n_bytes": [],
                "checksum": [], "features": [],
            }
            for aid, kind, media in zip(
                pdf["asset_id"], pdf["kind"], pdf["media"]
            ):
                arr = decode_asset(media).astype(np.float32)
                feats = [
                    float(arr.mean()),
                    float(arr.std()),
                    float(arr.min()),
                    float(arr.max()),
                    float(np.median(arr)),
                ]
                out["asset_id"].append(aid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(media))
                out["checksum"].append(
                    hashlib.blake2b(bytes(media), digest_size=8).hexdigest()
                )
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video assets: emit every ``every_n``-th frame
    as its own binary row (downstream models consume frames, not
    clips)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, media in zip(pdf["asset_id"], pdf["media"]):
                arr = decode_asset(media)
                for fi in range(0, arr.shape[0], every_n):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(fi)
                    out["frame"].append(arr[fi].tobytes())
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, FRAME_SCHEMA)
