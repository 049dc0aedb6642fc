"""Multimodal operators over the input_hint image table
(image_id, bytes binary, w, h, fmt, caption, phash).

Image decode / feature-extract run as ``mapInPandas`` (Arrow batches
of binary columns — the schema, partitioning and batch shape are the
real 100 TB plumbing). Codecs: real for png/qjpg (crawlspark.
imagecodec, dependency-free); jpeg/webp/audio/video decode is STUBBED
behind NotImplementedError per the build brief (no codec libs in this
container) — the operator surface and plumbing are identical either
way.

phash near-dup is pure column bit math (xor + bit_count), portable to
the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["decode_stats", "image_features", "phash_neardup", "frame_sample"]

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("psnr_vs_truth", T.DoubleType()),
        T.StructField("phash_match", T.BooleanType()),
        T.StructField("caption_len", T.IntegerType()),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image, per-channel means + PSNR vs the seeded
    ground truth + phash re-check — the per-row payload invariant as
    a distributed operator."""

    def fn(batches):
        from crawlspark import imagecodec

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = imagecodec.decode(bytes(r.bytes), r.fmt)
                truth = imagecodec.synth_image(r.image_id, int(r.w), int(r.h))
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": int(r.w),
                        "h": int(r.h),
                        "mean_r": round(float(arr[:, :, 0].mean()), 4),
                        "mean_g": round(float(arr[:, :, 1].mean()), 4),
                        "mean_b": round(float(arr[:, :, 2].mean()), 4),
                        "psnr_vs_truth": round(min(imagecodec.psnr(truth, arr), 99.0), 2),
                        "phash_match": imagecodec.phash64(arr) == int(r.phash)
                        if r.fmt == "png"
                        else abs(
                            bin(
                                (imagecodec.phash64(arr) ^ int(r.phash)) & ((1 << 64) - 1)
                            ).count("1")
                        )
                        <= 4,
                        "caption_len": len(r.caption or ""),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _STATS_SCHEMA.fields])

    return images.mapInPandas(fn, _STATS_SCHEMA).orderBy("image_id")


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def image_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Feature extraction: grid-pooled mean intensities -> a
    grid*grid*3 float vector (the embedding-column producer for
    ops/similarity over image corpora)."""

    def fn(batches):
        import numpy as np

        from crawlspark import imagecodec

        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                arr = imagecodec.decode(bytes(r.bytes), r.fmt).astype(np.float32)
                h, w, _ = arr.shape
                ys = (np.arange(grid + 1) * h) // grid
                xs = (np.arange(grid + 1) * w) // grid
                v = []
                for i in range(grid):
                    for j in range(grid):
                        block = arr[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
                        v.extend((block.mean(axis=(0, 1)) / 255.0).tolist())
                ids.append(r.image_id)
                feats.append([float(x) for x in v])
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return images.mapInPandas(fn, _FEAT_SCHEMA).orderBy("image_id")


def phash_neardup(images: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Perceptual-hash near-duplicate pairs: hamming distance via
    xor + bit_count — pure JVM bit math, oracle-portable."""
    a = images.select(F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"))
    b = images.select(F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("hamming", "id_a", "id_b")
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Decode -> block-mean resize (pure numpy) -> re-encode PNG.
    The thumbnail stage of an image-training pipeline; Arrow-batched
    mapInPandas, output is a valid input_hint-shaped table."""

    def fn(batches):
        import numpy as np

        from crawlspark import imagecodec

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = imagecodec.decode(bytes(r.bytes), r.fmt).astype(np.float64)
                h, w, _ = arr.shape
                ys = (np.arange(out_h + 1) * h) // out_h
                xs = (np.arange(out_w + 1) * w) // out_w
                out = np.empty((out_h, out_w, 3), dtype=np.uint8)
                for i in range(out_h):
                    for j in range(out_w):
                        block = arr[
                            ys[i] : max(ys[i + 1], ys[i] + 1),
                            xs[j] : max(xs[j + 1], xs[j] + 1),
                        ]
                        out[i, j] = block.mean(axis=(0, 1)).round().clip(0, 255)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": out_w,
                        "h": out_h,
                        "bytes": imagecodec.encode_png(out),
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return images.mapInPandas(fn, _RESIZE_SCHEMA).orderBy("image_id")


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB (no video codecs in this sandbox).
    The plumbing (schema, mapInPandas shape) is real; decode raises."""

    schema = T.StructType(
        [
            T.StructField("video_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_png", T.BinaryType()),
        ]
    )

    def fn(batches):
        for _pdf in batches:
            raise NotImplementedError(
                "video decode requires codec libraries not present in this sandbox; "
                "plumbing (schema/batching) is real — swap fn body when codecs exist"
            )
        yield  # pragma: no cover

    return videos.mapInPandas(fn, schema)
