"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference pipelines are text-only; a 100 TB training-data pipeline also
carries media. Design: media payloads are opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas`` stages so
bytes never round-trip through Python row-at-a-time.

The actual codec work (JPEG decode, resample, frame extraction) requires
libraries not present in this container, so the decode kernel is STUBBED:
``decode_kernel`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it produces a seeded, shape-correct
fake feature vector from the payload hash — letting every piece of real Spark
plumbing (schema, partition sizing, UDF signature, batch shape, output
contract) be exercised and tested end-to-end.

Scale notes:
- media rows are FAT: repartition by size budget before mapInPandas so one
  Arrow batch ≈ tens of MB, not GB (``partition_by_size_budget``);
- featurization output is narrow (id + vector) — project early, never carry
  the binary past the stage that consumes it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int, sample_rate:int>"
)

FEATURE_DIM = 32


def make_synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture: seeded binary payloads + coherent metadata."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    h = F.abs(F.xxhash64("id", F.lit(seed)))
    kind = F.element_at(kinds, (h % 3 + 1).cast("int"))
    payload = F.unhex(F.sha2(F.concat(F.lit("payload-"), F.col("id").cast("string")), 512))
    meta = F.struct(
        F.when(kind == "image", F.lit("image/jpeg"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.when(kind != "audio", (64 + h % 512).cast("int")).alias("width"),
        F.when(kind != "audio", (64 + h % 384).cast("int")).alias("height"),
        F.when(kind != "image", (1000 + h % 60000).cast("int")).alias("duration_ms"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
    )
    return spark.range(n).select(
        F.concat(F.lit("m-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap native metadata: payload size + content digest (no decode)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha1", F.sha1(F.col(payload_col))
    )


def partition_by_size_budget(
    df: DataFrame, bytes_col: str, target_partition_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Repartition fat rows so each task carries ~target bytes of payload."""
    total = df.agg(F.sum(bytes_col)).collect()[0][0] or 0
    nparts = max(int(total // target_partition_bytes) + 1, 1)
    return df.repartition(nparts)


def decode_kernel(payload: bytes, kind: str, deterministic_fake: bool) -> np.ndarray:
    """THE STUB: real implementation would decode via PIL/librosa/ffmpeg.

    ``deterministic_fake=True`` derives a FEATURE_DIM float32 vector from the
    payload digest — stable across runs/machines, so tests can assert exact
    plumbing behavior without codecs."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/librosa/ffmpeg) "
            "not present in this environment; pass deterministic_fake=True "
            "to exercise the pipeline plumbing"
        )
    digest = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "kind",
    id_col: str = "media_id",
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas featurization: binary in, (id, kind, feature vector) out.

    Output is narrow on purpose — the binary column dies here.
    """
    dtypes = dict(df.dtypes)
    out_schema = (
        f"{id_col} {dtypes[id_col]}, {kind_col} {dtypes[kind_col]}, "
        "feature array<float>"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_kernel(p, k, deterministic_fake).tolist()
                for p, k in zip(pdf[payload_col], pdf[kind_col])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    kind_col: pdf[kind_col],
                    "feature": feats,
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(
        _featurize, schema=out_schema
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling PLAN: one row per sampled frame timestamp.

    The frame extraction itself is the stubbed decode; the Spark side —
    exploding a frame-timestamp grid from duration metadata so each frame is
    an independent row for downstream decode tasks — is the real pattern for
    distributing video work."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    )
    return (
        df.withColumn("frame_ms", F.explode(frames))
        .select(id_col, "kind", "frame_ms", "payload", "meta")
    )


def resize_kernel(
    payload: bytes, width: int, height: int, deterministic_fake: bool
) -> bytes:
    """Image resize kernel. REAL decode/resize needs an image codec
    (Pillow/opencv — not in this container); the deterministic fake
    produces a payload whose bytes derive from (content md5, target dims)
    so the plumbing is testable end to end and replayable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; "
            "plug Pillow/cv2 here (payload -> decode -> resize -> encode)"
        )
    import hashlib

    seed = hashlib.md5(
        bytes(payload or b"") + f"|{width}x{height}".encode()
    ).digest()
    reps = (width * height * 3) // len(seed) + 1
    return (seed * reps)[: width * height * 3]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Distributed image resize: binary in → binary out at (width, height),
    kind/meta preserved, meta.width/height updated. Arrow-batched
    mapInPandas — payload bytes never hit the driver; non-image rows pass
    through untouched. The codec itself is the stubbed kernel."""
    dtypes = dict(df.dtypes)
    out_schema = (
        f"{id_col} {dtypes[id_col]}, kind {dtypes['kind']}, "
        f"{payload_col} binary, meta {dtypes['meta']}"
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, k in zip(pdf[payload_col], pdf["kind"]):
                if k == "image":
                    out.append(resize_kernel(p, width, height, deterministic_fake))
                else:
                    out.append(p)
            pdf = pdf[[id_col, "kind", payload_col, "meta"]].copy()
            pdf[payload_col] = out
            pdf["meta"] = [
                {**(m or {}), "width": width, "height": height}
                if k == "image" else m
                for m, k in zip(pdf["meta"], pdf["kind"])
            ]
            yield pdf

    return df.select(id_col, "kind", payload_col, "meta").mapInPandas(
        _resize, schema=out_schema
    )
