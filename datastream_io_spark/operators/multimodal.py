"""Multimodal columns (task brief): image/audio/video as opaque
``binary`` columns with typed metadata. The Spark-side plumbing —
schema, Arrow batching through ``mapInPandas``, partitioning, UDF
signatures — is real and tested; the actual media decode is STUBBED
(`use_real_decoder=False` default) because no image/audio libraries
exist in this container. The stub is a deterministic fake decoder so
downstream shapes/statistics are testable; flipping one flag plugs in
a real decoder with an identical dataflow.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta string"
)  # meta: JSON {width,height,channels,sample_rate,...}

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, feat array<float>"
)


def synth_media_df(spark: SparkSession, n: int = 64,
                   n_partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (stands in for a real
    ingest; payload bytes are seeded per id)."""

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(1000 + i)
                kind = ["image", "audio", "video"][i % 3]
                w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
                payload = rng.integers(0, 256, size=w * h, dtype=np.uint8)
                meta = {"width": w, "height": h, "channels": 1}
                rows.append((i, kind, payload.tobytes(), json.dumps(meta)))
            yield pd.DataFrame(rows, columns=["media_id", "kind",
                                              "payload", "meta"])

    return spark.range(0, n, 1, n_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for image decode: interpret raw bytes as a
    (h, w) uint8 array. A real decoder (PIL/libvips/ffmpeg) drops in
    here unchanged — same input columns, same output shape contract."""
    w, h = int(meta["width"]), int(meta["height"])
    arr = np.frombuffer(payload, np.uint8)
    need = w * h
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    return arr[:need].reshape(h, w)


def extract_features(media: DataFrame, feat_dim: int = 8,
                     use_real_decoder: bool = False) -> DataFrame:
    """Decode → downsample → feature vector, per Arrow batch via
    ``mapInPandas`` (bounded memory: one batch of payloads at a time;
    at scale, repartition by size so a batch of 4K videos can't OOM an
    executor — binary payload columns make input-size-aware
    ``maxRecordsPerBatch`` tuning the relevant knob)."""
    if use_real_decoder:
        raise NotImplementedError(
            "no media codecs in this container — plug a real decoder "
            "into _fake_decode's slot (PIL.Image.open / soundfile / "
            "pyav) and delete this guard")

    def fn(it):
        for pdf in it:
            feats, widths, heights, shas = [], [], [], []
            for payload, meta_s in zip(pdf["payload"], pdf["meta"]):
                meta = json.loads(meta_s)
                img = _fake_decode(payload, meta)
                # "feature": row-mean profile resampled to feat_dim
                prof = img.mean(axis=1).astype(np.float64)
                idx = np.linspace(0, prof.size - 1, feat_dim)
                feat = np.interp(idx, np.arange(prof.size), prof)
                feats.append([float(v) for v in feat])
                widths.append(meta["width"])
                heights.append(meta["height"])
                shas.append(hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "sha256": shas,
                "width": widths,
                "height": heights,
                "feat": feats,
            })

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int, target_h: int,
                 use_real_decoder: bool = False) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, per Arrow batch
    (the task brief's resize op). The RESIZE math is real numpy index
    sampling; only the byte→pixels decode is the stubbed step (same
    guard as extract_features). Output keeps the media schema with the
    payload replaced and meta updated, so resize composes with
    extract_features / frame_sample_plan downstream."""
    if use_real_decoder:
        raise NotImplementedError(
            "no media codecs in this container — plug a real decoder "
            "into _fake_decode's slot and delete this guard")

    def fn(it):
        for pdf in it:
            payloads, metas = [], []
            for payload, meta_s in zip(pdf["payload"], pdf["meta"]):
                meta = json.loads(meta_s)
                img = _fake_decode(payload, meta)
                ys = np.linspace(0, img.shape[0] - 1, target_h).round()
                xs = np.linspace(0, img.shape[1] - 1, target_w).round()
                out = img[ys.astype(np.int64)][:, xs.astype(np.int64)]
                payloads.append(out.tobytes())
                metas.append(json.dumps({**meta, "width": target_w,
                                         "height": target_h}))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "meta": metas,
            })

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: pure Column ops computing which
    frame offsets a decoder would extract (the decode itself is the
    stubbed step). Demonstrates metadata-driven fan-out: one row per
    sampled frame."""
    meta = F.from_json("meta", "width INT, height INT, channels INT")
    n_frames = (F.length("payload") /
                (meta["width"] * meta["height"])).cast("int")
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", n_frames.alias("n_frames"))
        .select(
            "media_id", "n_frames",
            F.explode(
                F.sequence(F.lit(0),
                           F.greatest(F.col("n_frames") - 1, F.lit(0)),
                           F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
