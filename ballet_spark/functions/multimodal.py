"""Multimodal (image/audio/video) column plumbing.

Per the task brief: media are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The decode kernels are
STUBBED (the container ships no image/audio libraries): by default they
raise :class:`NotImplementedError` naming the missing dependency, and
``fake=True`` switches in a deterministic fake decoder so the Spark-side
plumbing — schema, partition sizing, UDF signature, batch shape — is
real and tested end-to-end.

Schema convention::

    media: binary               -- raw bytes (opaque)
    media_meta: struct<mime: string, width: int, height: int,
                       duration_s: double>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "struct<mime: string, width: int, height: int, duration_s: double>"
)

IMAGE_FEATURES_DDL = (
    "url string, warc_ts timestamp, mime string, n_bytes long, "
    "width int, height int, mean_luma double, phash long"
)


def attach_fake_media(df: DataFrame, seed_col: str = "url") -> DataFrame:
    """Deterministic synthetic media column for tests/benches: bytes
    derived from xxhash64 of the seed column; meta struct populated."""
    h = F.xxhash64(F.col(seed_col))
    return df.withColumn(
        "media",
        F.encode(F.conv(F.pmod(h, F.lit(2**40)).cast("string"), 10, 16), "utf-8"),
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.pmod(h, F.lit(512)) + 32).cast("int").alias("width"),
            (F.pmod(h, F.lit(256)) + 32).cast("int").alias("height"),
            F.lit(0.0).alias("duration_s"),
        ),
    )


def _decode_image_real(data: bytes):
    raise NotImplementedError(
        "image decode requires Pillow/opencv, not present in this "
        "container — pass fake=True for the deterministic stub decoder"
    )


def _decode_image_fake(data: bytes, width: int, height: int):
    """Deterministic fake decode: pixel grid seeded by the byte content
    (stands in for a real decoder; statistics are stable across runs
    and partitionings)."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _phash64(luma: np.ndarray) -> int:
    """Average-hash style 64-bit perceptual hash: 8×8 downsample vs
    mean, row-major bits (deterministic, library-free)."""
    h, w = luma.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    small = luma[np.ix_(ys, xs)].astype(float)
    bits = (small > small.mean()).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def image_features(
    df: DataFrame,
    media_col: str = "media",
    meta_col: str = "media_meta",
    fake: bool = False,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode + extract image features via ``mapInPandas``.

    Real path raises NotImplementedError (no image libs in container);
    ``fake=True`` exercises the identical plumbing with the stub
    decoder. Each Arrow batch decodes independently — no global state,
    so partitioning is free to follow the source.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar for everything that isn't the per-item decode:
            # metadata fields, byte lengths, and the output assembly are
            # vectorized; only the decode itself visits items (a real
            # image decoder is inherently per-item too)
            metas = pdf[meta_col]
            datas = pdf[media_col].map(lambda d: bytes(d) if d is not None else b"")
            # a NULL meta struct must not kill the batch: rows without
            # metadata decode to nothing and emit NULL features
            widths = metas.map(
                lambda m: int(m["width"]) if m is not None else 0
            ).to_numpy()
            heights = metas.map(
                lambda m: int(m["height"]) if m is not None else 0
            ).to_numpy()
            decode = _decode_image_fake if fake else _decode_image_real
            lumas = [
                (decode(d, w, h) if fake else decode(d)) if w > 0 and h > 0 else None
                for d, w, h in zip(datas, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "warc_ts": pdf["warc_ts"].to_numpy(),
                    "mime": metas.map(
                        lambda m: m["mime"] if m is not None else None
                    ).to_numpy(),
                    "n_bytes": datas.map(len).to_numpy(dtype="int64"),
                    "width": widths,
                    "height": heights,
                    "mean_luma": np.array(
                        [float(x.mean()) if x is not None else np.nan for x in lumas]
                    ),
                    "phash": pd.array(
                        [_phash64(x) if x is not None else None for x in lumas],
                        dtype="Int64",
                    ),
                }
            )

    cols = ["url", "warc_ts", media_col, meta_col]
    return df.select(*cols).mapInPandas(extract, IMAGE_FEATURES_DDL)


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media, frame
    index) with the frame timestamp offset — the explode/partition
    shape of a real frame sampler, decode stubbed out (frame bytes are
    NULL until a decoder is available)."""
    if n_frames < 1:
        # sequence(0, -1) would DESCEND ([0, -1]) and emit bogus rows
        # with frame_offset_s = duration/0 instead of an empty plan
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = df.select("url", "warc_ts", F.col(meta_col).alias("m"), idx)
    return out.select(
        "url",
        "warc_ts",
        "frame_idx",
        (
            F.col("m.duration_s") * F.col("frame_idx") / F.lit(float(n_frames))
        ).alias("frame_offset_s"),
        F.lit(None).cast("binary").alias("frame_bytes"),
    )
