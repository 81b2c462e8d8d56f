"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-friendly layout, Arrow
batch shapes, mapInPandas signatures — is real and tested; the actual
media decoding is STUBBED because no image/audio libraries exist in
this container:

- ``decode_media``          raises NotImplementedError (the real decode
                            slot: swap in PIL/av per executor)
- ``fake_features``         deterministic feature extractor from the
                            raw bytes (sha-seeded), preserving the
                            exact UDF interface the real extractor
                            would have: binary -> array<float>[dim]
- ``frame_sample_stub``     deterministic "frame offsets" for video
                            rows, byte-sliced from the payload

Asset synthesis is expression-only (sha2/unhex over spark.range) so the
fixture table scales like every other synthetic source here.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = (
    "asset_id long, kind string, data binary, "
    "meta map<string,string>"
)

KINDS = ["image", "audio", "video"]


def synthesize_assets(spark: SparkSession, n: int = 100,
                      seed: int = 42) -> DataFrame:
    """Deterministic opaque binary assets with typed metadata."""
    # kind is derived from the first sha2 byte (NOT xxhash64) so the
    # whole synthesis is reproducible in ANSI SQL / DuckDB — the driver
    # oracle re-derives it cell-exact (plans/oracle_sql.py)
    kind_idx = F.pmod(
        F.conv(
            F.substring(
                F.sha2(F.concat_ws(":", F.col("id"), F.lit(seed)), 256), 1, 2
            ),
            16,
            10,
        ).cast("int"),
        F.lit(len(KINDS)),
    )
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]), kind_idx + 1
        ).alias("kind"),
        # 64 deterministic bytes: sha2 of (id, seed) twice
        F.unhex(
            F.concat(
                F.sha2(F.concat_ws(":", F.col("id"), F.lit(seed)), 256),
                F.sha2(F.concat_ws(";", F.col("id"), F.lit(seed)), 256),
            )
        ).alias("data"),
    )
    return base.select(
        "asset_id", "kind", "data",
        F.create_map(
            F.lit("width"), (F.pmod(F.col("asset_id"), F.lit(1920)) + 1).cast("string"),
            F.lit("height"), (F.pmod(F.col("asset_id"), F.lit(1080)) + 1).cast("string"),
            F.lit("codec"), F.when(F.col("kind") == "video", F.lit("h264"))
            .when(F.col("kind") == "audio", F.lit("opus"))
            .otherwise(F.lit("png")),
        ).alias("meta"),
    )


def decode_media(data: bytes, kind: str):
    """The real decode slot — requires PIL / soundfile / av, which are
    not available in this container. Cited so callers fail loudly
    rather than silently skipping the decode step."""
    raise NotImplementedError(
        "media decoding requires PIL/soundfile/av; install per-executor "
        "and replace decode_media — the Spark plumbing around it "
        "(fake_features / extract_features) is the tested interface"
    )


def _bytes_features(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: expand
    sha256 digests of the payload into `dim` floats in [-1, 1).

    The digest input is the lowercase HEX of the payload plus an ASCII
    ':<counter>' suffix (not the raw bytes) so the exact same values
    are expressible in DuckDB SQL — sha256() there is VARCHAR-only.
    Every value is k/128 - 1 for a byte k, exactly representable in
    float32, so the driver oracle matches bit-for-bit with no rounding.
    """
    out = np.empty(dim, dtype=np.float32)
    hx = (data or b"").hex()
    i = 0
    counter = 0
    while i < dim:
        digest = hashlib.sha256(f"{hx}:{counter}".encode()).digest()
        block = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        take = min(dim - i, block.size)
        out[i : i + take] = block[:take] / 128.0 - 1.0
        i += take
        counter += 1
    return out


def extract_features(assets: DataFrame, dim: int = 64,
                     batch_note: int = 0) -> DataFrame:
    """(asset_id, kind, features array<float>) via mapInPandas.

    The iterator-of-batches shape is the real contract: a production
    extractor initializes its model once per python worker (before the
    loop) and streams Arrow batches through it."""
    schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model init would happen HERE, once per worker
        for pdf in batches:
            feats = [
                _bytes_features(bytes(d) if d is not None else b"", dim)
                for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return assets.mapInPandas(run, schema=schema)


def feature_rows(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Hashable projection of extract_features for driver/oracle
    comparison: one (asset_id, kind, dim_idx, value) row per feature
    dimension. value is the exact float32 → double cast (k/128 − 1,
    no rounding needed — exactly representable in both engines)."""
    feats = extract_features(assets, dim=dim)
    return feats.select(
        "asset_id",
        "kind",
        F.posexplode("features").alias("dim_idx", "value"),
    ).select(
        "asset_id", "kind", F.col("dim_idx").cast("int").alias("dim_idx"),
        F.col("value").cast("double").alias("value"),
    )


def resize_images(assets: DataFrame, out_w: int = 4,
                  out_h: int = 4) -> DataFrame:
    """Image-resize plumbing: (asset_id, out_w, out_h, pixels binary).

    The Spark-side contract is real — metadata-driven source
    dimensions (meta['width'/'height']), Arrow-batched mapInPandas, a
    nearest-neighbor index grid computed in numpy exactly as a real
    resizer would address decoded pixels — but the 'decoded image' is
    the deterministic sha-expansion of the payload (no PIL in this
    container; swap ``_fake_pixels`` for a real decode per executor).
    """
    schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ])

    def _fake_pixels(data: bytes, w: int, h: int) -> np.ndarray:
        """Deterministic stand-in for a decoded grayscale image."""
        flat = _bytes_features(data or b"", w * h)
        return ((flat + 1.0) * 128.0).astype(np.uint8).reshape(h, w)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "out_w": [], "out_h": [], "pixels": []}
            for aid, kind, data, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["data"], pdf["meta"]
            ):
                if kind != "image":
                    continue
                # cap fake source dims; a real decoder uses them as-is
                src_w = min(int(meta.get("width", "8")), 64)
                src_h = min(int(meta.get("height", "8")), 64)
                img = _fake_pixels(
                    bytes(data) if data is not None else b"", src_w, src_h
                )
                # nearest-neighbor resize — the real addressing math
                ys = (np.arange(out_h) * src_h // out_h).clip(0, src_h - 1)
                xs = (np.arange(out_w) * src_w // out_w).clip(0, src_w - 1)
                small = img[np.ix_(ys, xs)]
                rows["asset_id"].append(int(aid))
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["pixels"].append(small.tobytes())
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=schema)


def frame_sample_stub(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic 'frame sampling' for video assets: n byte-slices
    of the payload standing in for decoded frames. Real frame decode
    goes through the same (asset_id, frame_idx, frame_bytes) shape."""
    videos = assets.filter(F.col("kind") == "video")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    with_idx = videos.select("asset_id", "data", idx)
    frame = F.substring(
        F.col("data"), (F.col("frame_idx") * 8 + 1).cast("int"), 8
    )
    return with_idx.select(
        "asset_id", "frame_idx", frame.alias("frame_bytes")
    )
