"""Multimodal (image/audio/video) column plumbing.

Per the task brief: media are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The REAL decode path
handles uncompressed binary netpbm (PPM ``P6`` / PGM ``P5``,
:func:`decode_ppm`) AND compressed 8-bit PNG (stdlib zlib + numpy
unfiltering, :func:`decode_png`) — no image library needed; dispatch
by magic via :func:`decode_image`. Formats needing a codec library
the container doesn't ship (JPEG/MP3/video) raise
:class:`NotImplementedError` naming the dependency, and ``fake=True``
switches in a deterministic fake decoder so the Spark-side plumbing —
schema, partition sizing, UDF signature, batch shape — is exercisable
on any bytes.

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


def _ppm_header(data: bytes):
    """Parse a netpbm header (magic, width, height, maxval) and return
    the raster offset. Whitespace and ``#`` comments between tokens per
    the spec; exactly ONE whitespace byte separates maxval from the
    raster."""
    pos = 0

    def token():
        nonlocal pos
        while pos < len(data):
            c = data[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                    pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        return data[start:pos]

    magic = token()
    if magic not in (b"P5", b"P6"):
        # validate the magic BEFORE parsing dimensions: arbitrary bytes
        # must fail with the "unsupported format" error, not an int()
        # ValueError from garbage header tokens
        raise NotImplementedError(
            f"unsupported image magic {magic[:16]!r}: binary PPM/PGM and "
            "8-bit PNG decode in-container; JPEG/etc. require "
            "Pillow/opencv (not present) — pass fake=True for the "
            "deterministic stub decoder"
        )
    w, h, maxval = int(token()), int(token()), int(token())
    pos += 1  # the single whitespace after maxval
    return magic, w, h, maxval, pos


def decode_ppm(data: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary netpbm images — PPM (``P6``, RGB)
    and PGM (``P5``, grayscale) — the uncompressed formats a real
    pipeline uses for intermediate image shards. Returns a 2-D float
    luma array (BT.601 weights for RGB). No image library needed, so
    the REAL decode path of :func:`image_features` is exercisable in
    this container; compressed formats still raise
    :class:`NotImplementedError` naming the missing dependency."""
    magic, w, h, maxval, off = _ppm_header(data)
    if maxval > 255:
        raise NotImplementedError(
            f"16-bit netpbm (maxval={maxval}) not supported by the "
            "pure-numpy decoder"
        )
    # netpbm spec: sample values are fractions of maxval — scale to the
    # standard 0-255 range so features match reference decoders for
    # files with maxval != 255 (e.g. 4-bit scans with maxval=15)
    scale = 255.0 / maxval
    if magic == b"P6":
        n = w * h * 3
        if len(data) - off < n:
            raise ValueError(f"truncated P6 raster: need {n} bytes, have {len(data) - off}")
        rgb = np.frombuffer(data, dtype=np.uint8, count=n, offset=off).reshape(h, w, 3)
        luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return luma * scale
    n = w * h
    if len(data) - off < n:
        raise ValueError(f"truncated P5 raster: need {n} bytes, have {len(data) - off}")
    gray = np.frombuffer(data, dtype=np.uint8, count=n, offset=off).reshape(h, w)
    return gray.astype(float) * scale


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Pure-Python PNG decoder (stdlib ``zlib`` + numpy unfiltering) —
    a COMPRESSED format exercising the real decode path in-container.
    Supports non-interlaced 8-bit images of every color type
    (grayscale, RGB, palette, gray+alpha, RGBA); 16-bit and Adam7
    interlacing raise :class:`NotImplementedError`. Returns the same
    2-D float luma array as :func:`decode_ppm` (BT.601 for color;
    alpha ignored). Chunk lengths are validated against the buffer —
    truncated files fail with a clear ValueError, never an opaque
    numpy/zlib abort.

    Performance honesty: None/Sub/Up scanlines unfilter vectorized,
    but Average/Paeth carry a left-neighbor recurrence and fall back
    to a per-byte Python loop — correct but slow on large
    adaptive-filtered PNGs (libpng output is mostly Paeth). This
    decoder's job is exercising the REAL decode path in a container
    with no image libraries; a production corpus of big PNGs should
    route through Pillow/opencv when available (gate on import, keep
    this as the fallback)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise NotImplementedError(
            f"unsupported image magic {data[:8]!r}: expected a PNG "
            "signature (decode_png) or netpbm P5/P6 (decode_ppm)"
        )
    pos, ihdr, plte, idat = 8, None, None, []
    seen_iend = False
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError(
                f"truncated PNG: chunk {typ!r} declares {ln} bytes but "
                f"only {len(data) - pos - 12} remain"
            )
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            seen_iend = True
            break
        pos += 12 + ln
    if not seen_iend and pos < len(data):
        raise ValueError(
            f"truncated PNG: {len(data) - pos} trailing bytes are a "
            "partial chunk header"
        )
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("malformed PNG: missing IHDR or IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit, ct, interlace = ihdr[8], ihdr[9], ihdr[12]
    if bit != 8:
        raise NotImplementedError(f"{bit}-bit PNG not supported (8-bit only)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if ct not in _PNG_CHANNELS:
        raise ValueError(f"malformed PNG: color type {ct}")
    if w < 1 or h < 1:
        raise ValueError(f"malformed PNG: {w}x{h}")
    ch = _PNG_CHANNELS[ct]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"malformed PNG: IDAT inflate failed ({exc})") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"malformed PNG: raster is {len(raw)} bytes, expected "
            f"{h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        row = np.frombuffer(raw, np.uint8, stride, rpos + 1)
        rpos += stride + 1
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub — per-channel-lane modular prefix sum
            rec = row.copy()
            for j in range(ch):
                rec[j::ch] = (
                    np.cumsum(row[j::ch], dtype=np.uint64) % 256
                ).astype(np.uint8)
        elif f == 2:  # Up — uint8 addition wraps mod 256
            rec = row + prev
        elif f in (3, 4):  # Average / Paeth: left-dependent, sequential
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"malformed PNG: filter type {f}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if ct == 0:
        return px[:, :, 0].astype(float)
    if ct == 4:
        return px[:, :, 0].astype(float)  # gray, alpha dropped
    if ct == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("malformed PNG: palette image without valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("malformed PNG: palette index out of range")
        px = pal[idx]
    else:  # 2 (RGB) or 6 (RGBA)
        px = px[:, :, :3]
    return (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    ).astype(float)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Inverse of :func:`decode_png` for tests/benches: a 2-D uint8
    array becomes 8-bit grayscale PNG, an ``(h, w, 3)`` array 8-bit
    RGB. ``filter_type`` applies that PNG filter (0–4) to every
    scanline so each unfilter path is exercisable."""
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        ct, ch = 0, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        ct, ch = 2, 3
        h, w, _ = a.shape
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8 array, got {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    rows = a.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    lines = []
    for y in range(h):
        rec = rows[y]
        if filter_type == 0:
            filt = rec
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
            filt = (rec - left) % 256
        elif filter_type == 2:
            filt = (rec - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
            filt = (rec - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (rec - pred) % 256
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = rec

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + typ + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ct, 0, 0, 0])
    )
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_image(data: bytes) -> np.ndarray:
    """Magic-dispatched real decode: PNG (:func:`decode_png`), baseline
    JPEG (:func:`ballet_spark.functions.jpeg.decode_jpeg` — pure
    Python huffman + numpy IDCT; Y channel IS the BT.601 luma) or
    binary netpbm (:func:`decode_ppm`) → 2-D float luma."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from ballet_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    return decode_ppm(data)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` for tests/benches: a 2-D uint8
    array becomes binary PGM (P5), a 3-D ``(h, w, 3)`` array binary
    PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()
    if a.ndim == 3 and a.shape[2] == 3:
        h, w, _ = a.shape
        return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()
    raise ValueError(f"expected (h,w) or (h,w,3) uint8 array, got shape {arr.shape}")


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

    Real path decodes binary PPM/PGM with the pure-numpy decoder
    (:func:`decode_ppm`); compressed formats raise
    NotImplementedError (no image libs in container). ``fake=True``
    exercises the identical plumbing with the stub decoder. Each Arrow
    batch decodes independently — no global state, so partitioning is
    free to follow the source. Rows with a NULL meta struct emit NULL
    features (nullable Int32/Float64/Int64, never 0/NaN sentinels —
    downstream missingness checks must see missing, not a 0-sized
    image)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # byte lengths / output assembly stay vectorized; the
            # decode itself visits items (a real image decoder is
            # inherently per-item too)
            metas = pdf[meta_col]
            datas = pdf[media_col].map(lambda d: bytes(d) if d is not None else b"")
            lumas: list = []
            widths: list = []
            heights: list = []
            mimes: list = []
            for d, m in zip(datas, metas):
                # NULL meta OR NULL/empty media must not kill the
                # batch: such rows decode to nothing and emit NULLs
                # (feeding b'' to a real decoder would raise
                # 'unsupported format' and fail the whole job)
                if m is None or not d:
                    lumas.append(None)
                    widths.append(None)
                    heights.append(None)
                    mimes.append(m["mime"] if m is not None else None)
                    continue
                mimes.append(m["mime"])
                if fake:
                    w, h = int(m["width"]), int(m["height"])
                    lumas.append(_decode_image_fake(d, w, h) if w > 0 and h > 0 else None)
                    widths.append(w)
                    heights.append(h)
                else:
                    luma = decode_image(d)
                    lumas.append(luma)
                    # real path: dimensions come from the file header,
                    # which is authoritative over the meta struct
                    heights.append(int(luma.shape[0]))
                    widths.append(int(luma.shape[1]))
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "warc_ts": pdf["warc_ts"].to_numpy(),
                    "mime": pd.array(mimes, dtype="string"),
                    "n_bytes": datas.map(len).to_numpy(dtype="int64"),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "mean_luma": pd.array(
                        [float(x.mean()) if x is not None else None for x in lumas],
                        dtype="Float64",
                    ),
                    "phash": pd.array(
                        [_phash64(x) if x is not None else None for x in lumas],
                        dtype="Int64",
                    ),
                }
            )

    cols = ["url", "warc_ts", media_col, meta_col]
    return df.select(*cols).mapInPandas(extract, IMAGE_FEATURES_DDL)


RESIZED_DDL = "url string, warc_ts timestamp, media binary, width int, height int"


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Nearest-neighbor resize of PPM/PGM media to ``width×height``,
    re-encoded as PGM bytes (luma) — the uniform-shape preprocessing
    step before batched feature extraction / model input. Pure numpy
    fancy-indexing per item inside one ``mapInPandas`` pass; rows with
    NULL meta pass through with NULL media."""
    if width < 1 or height < 1:
        raise ValueError(f"target size must be >= 1x1, got {width}x{height}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grids: dict = {}  # (h, w) -> index grid; shapes repeat per shard
        for pdf in batches:
            out_media: list = []
            for d, m in zip(pdf[media_col], pdf[meta_col]):
                if m is None or not d:
                    out_media.append(None)
                    continue
                luma = decode_image(bytes(d))
                h, w = luma.shape
                if (h, w) not in grids:
                    grids[(h, w)] = (
                        (np.arange(height) * h) // height,
                        (np.arange(width) * w) // width,
                    )
                ys, xs = grids[(h, w)]
                small = luma[np.ix_(ys, xs)]
                out_media.append(
                    encode_ppm(np.clip(np.round(small), 0, 255).astype(np.uint8))
                )
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "warc_ts": pdf["warc_ts"].to_numpy(),
                    "media": pd.Series(out_media, dtype=object),
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                }
            )

    cols = ["url", "warc_ts", media_col, meta_col]
    return df.select(*cols).mapInPandas(kernel, RESIZED_DDL)


AUDIO_FEATURES_DDL = (
    "url string, warc_ts timestamp, mime string, n_bytes long, "
    "sample_rate int, n_samples long, duration_s double, "
    "rms double, peak double, zero_cross_rate double"
)


def decode_wav(data: bytes):
    """Pure-numpy decoder for RIFF/WAVE PCM audio (8-bit unsigned /
    16-bit signed, any channel count) — the uncompressed format a real
    pipeline uses for intermediate audio shards, so the REAL decode
    path runs in-container. Returns ``(samples, sample_rate)`` with
    samples float64 in [-1, 1], shape (n_frames, n_channels).
    Compressed codecs raise :class:`NotImplementedError` naming the
    missing dependency."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio magic {data[:8]!r}: only RIFF/WAVE PCM "
            "decodes in-container; MP3/AAC/OGG require an audio codec "
            "library (not present) — pass fake=True for the stub decoder"
        )
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(data):
            # the size field is untrusted input: a value past the
            # buffer must fail loudly, not silently truncate the body
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes "
                f"but only {len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"malformed WAV: fmt chunk too short ({len(fmt)} bytes)")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if n_channels < 1:
        raise ValueError("malformed WAV: zero channels in fmt chunk")
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} (non-PCM) needs a codec "
            "library; only PCM decodes in-container"
        )
    if bits == 16:
        if len(raw) % 2:
            raise ValueError(
                "truncated WAV: 16-bit data chunk has odd byte length"
            )
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported (8/16 only)")
    n_frames = len(x) // n_channels
    return x[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def encode_wav(samples: "np.ndarray", sample_rate: int = 16_000) -> bytes:
    """Inverse of :func:`decode_wav` for tests/benches: float samples
    in [-1, 1] (1-D or (n, ch)) → 16-bit PCM RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    block = n_ch * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _audio_fake(data: bytes):
    """Deterministic stub: samples seeded by byte content."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(1600, 1)), 16_000


def audio_features(
    df: DataFrame,
    media_col: str = "media",
    meta_col: str = "media_meta",
    fake: bool = False,
) -> DataFrame:
    """Decode + extract audio features via ``mapInPandas``: duration,
    RMS energy, peak amplitude, zero-crossing rate (mono-mixed).
    Same plumbing contract as :func:`image_features` — per-batch,
    stateless, NULL meta → NULL features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[meta_col]
            datas = pdf[media_col].map(lambda d: bytes(d) if d is not None else b"")
            rows: dict[str, list] = {
                k: [] for k in ("mime", "sr", "ns", "dur", "rms", "peak", "zcr")
            }
            for d, m in zip(datas, metas):
                # NULL meta or NULL/empty media → NULL features (b''
                # through the real decoder would fail the whole job)
                if m is None or not d:
                    rows["mime"].append(m["mime"] if m is not None else None)
                    for k in ("sr", "ns", "dur", "rms", "peak", "zcr"):
                        rows[k].append(None)
                    continue
                rows["mime"].append(m["mime"])
                samples, sr = _audio_fake(d) if fake else decode_wav(d)
                mono = samples.mean(axis=1)
                n = len(mono)
                rows["sr"].append(sr)
                rows["ns"].append(n)
                rows["dur"].append(n / sr if sr else None)
                rows["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else None)
                rows["peak"].append(float(np.abs(mono).max()) if n else None)
                rows["zcr"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else None
                )
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "warc_ts": pdf["warc_ts"].to_numpy(),
                    "mime": pd.array(rows["mime"], dtype="string"),
                    "n_bytes": datas.map(len).to_numpy(dtype="int64"),
                    "sample_rate": pd.array(rows["sr"], dtype="Int32"),
                    "n_samples": pd.array(rows["ns"], dtype="Int64"),
                    "duration_s": pd.array(rows["dur"], dtype="Float64"),
                    "rms": pd.array(rows["rms"], dtype="Float64"),
                    "peak": pd.array(rows["peak"], dtype="Float64"),
                    "zero_cross_rate": pd.array(rows["zcr"], dtype="Float64"),
                }
            )

    cols = ["url", "warc_ts", media_col, meta_col]
    return df.select(*cols).mapInPandas(extract, AUDIO_FEATURES_DDL)


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
