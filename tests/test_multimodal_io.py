"""Multimodal plumbing, io sources/sinks, encoder pipeline, C9 bundle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballet_spark.core import (
    EncoderPipeline,
    Feature,
    engineer_features,
)
from ballet_spark.functions.multimodal import (
    attach_fake_media,
    frame_sample_plan,
    image_features,
)
from ballet_spark.functions.text import char_count
from ballet_spark.operators.base import SparkFunctionTransformer
from ballet_spark.sources.io import (
    load_features,
    load_table_from_config,
    save_features,
    table,
)


def test_image_features_fake_decoder(spark, webtext_df):
    media = attach_fake_media(webtext_df.limit(50))
    out = image_features(media, fake=True).toPandas()
    assert len(out) == 50
    assert set(out.columns) == {
        "url", "warc_ts", "mime", "n_bytes", "width", "height",
        "mean_luma", "phash",
    }
    assert (out["n_bytes"] > 0).all()
    assert out["mean_luma"].between(0, 255).all()
    # deterministic across repartitionings (no partition-dependent state)
    out2 = image_features(media.repartition(7), fake=True).toPandas()
    a = out.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = out2.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert (a["phash"].to_numpy() == b["phash"].to_numpy()).all()
    assert np.allclose(a["mean_luma"].to_numpy(), b["mean_luma"].to_numpy())


def test_image_features_real_path_raises(spark, webtext_df):
    media = attach_fake_media(webtext_df.limit(2))
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        image_features(media, fake=False).collect()


def test_frame_sample_plan(spark, webtext_df):
    media = attach_fake_media(webtext_df.limit(10))
    out = frame_sample_plan(media, n_frames=4).toPandas()
    assert len(out) == 40
    assert set(out["frame_idx"]) == {0, 1, 2, 3}
    assert out["frame_bytes"].isna().all()  # decode stubbed


def test_load_table_from_config(spark, tmp_path, webtext_pdf):
    pq = str(tmp_path / "t.parquet")
    csv = str(tmp_path / "t.csv")
    df = spark.createDataFrame(webtext_pdf[["url", "lang"]].head(20))
    df.write.parquet(pq)
    df.write.option("header", "true").csv(csv)
    got_pq = load_table_from_config(spark, {"name": "t", "path": pq})
    got_csv = load_table_from_config(
        spark, {"name": "t", "path": csv, "format": "csv"}
    )
    assert got_pq.count() == 20 and got_csv.count() == 20
    with pytest.raises(ValueError, match="unsupported format"):
        load_table_from_config(spark, {"path": pq, "format": "avro"})


def test_save_load_features_roundtrip(spark, webtext_df, tmp_path):
    m = webtext_df.select("url", "warc_ts", F.length("text").alias("tl"))
    save_features(m, str(tmp_path / "m"))
    back = load_features(spark, str(tmp_path / "m"))
    assert back.count() == m.count()


def test_iceberg_table_degrades_clearly(spark):
    with pytest.raises(RuntimeError, match="Iceberg"):
        table(spark, "web.pages", snapshot_id=123)


def test_encoder_pipeline_and_engineer_features(spark, webtext_df):
    from ballet_spark.operators.fitted import StandardScaler

    labels = webtext_df.select(
        "url", "warc_ts", F.length("text").cast("double").alias("y")
    )
    enc = EncoderPipeline([StandardScaler()], y_col="y")
    encoded = enc.fit_transform(labels)
    assert "y_encoded" in encoded.columns
    stats = encoded.agg(F.avg("y_encoded"), F.stddev_pop("y_encoded")).first()
    assert abs(stats[0]) < 1e-9 and abs(stats[1] - 1.0) < 1e-6

    res = engineer_features(
        webtext_df,
        [Feature("text", SparkFunctionTransformer(char_count), output="tl")],
        y_df=labels,
        encoder=EncoderPipeline([StandardScaler()], y_col="y"),
    )
    assert res.X.count() == webtext_df.count()
    assert "tl" in res.X.columns
    assert res.y is not None and "y_encoded" in res.y.columns


def test_cached_memoizes_and_persists(spark):
    from ballet_spark.sources import io as io_mod

    df1 = spark.range(100)
    a = io_mod.cached("t_cached_key", df1)
    b = io_mod.cached("t_cached_key", spark.range(5))  # ignored: memo hit
    assert a is b
    assert a.storageLevel.useMemory  # persisted
    assert a.count() == 100
    # keys are scoped per SparkSession (stale-session handles must
    # never be served to a fresh session)
    sid = spark.sparkContext.applicationId
    assert (sid, "t_cached_key") in io_mod._CACHE
    io_mod.uncache("t_cached_key")
    assert not any(k[1] == "t_cached_key" for k in io_mod._CACHE)


def test_decode_ppm_roundtrip_numpy_oracle():
    """Real decode path: encode with encode_ppm, decode with decode_ppm,
    features match a direct numpy computation (the oracle)."""
    from ballet_spark.functions.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    luma = decode_ppm(encode_ppm(rgb))
    expect = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert luma.shape == (13, 9)
    assert np.allclose(luma, expect)

    gray = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray.astype(float))

    # header comments + multi-digit dims survive the parser
    with_comment = b"P5\n# a comment\n6 6\n255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(with_comment), gray.astype(float))

    with pytest.raises(NotImplementedError, match="unsupported image magic"):
        decode_ppm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_ppm(b"P5\n2 2\n65535\n" + b"\0" * 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\nshort")


def test_image_features_real_ppm_path(spark):
    """image_features fake=False runs end-to-end in-container on real
    PPM/PGM bytes; mean_luma and phash oracle-checked against numpy."""
    import pandas as pd

    from ballet_spark.functions.multimodal import (
        _phash64,
        decode_ppm,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(11)
    rows, oracle = [], {}
    for i in range(8):
        if i % 2:
            arr = rng.integers(0, 256, size=(16 + i, 12 + i, 3), dtype=np.uint8)
        else:
            arr = rng.integers(0, 256, size=(16 + i, 12 + i), dtype=np.uint8)
        data = encode_ppm(arr)
        luma = decode_ppm(data)
        url = f"http://x.test/{i}"
        oracle[url] = (
            luma.shape[1], luma.shape[0], float(luma.mean()), _phash64(luma), len(data)
        )
        rows.append((url, pd.Timestamp("2024-01-01").to_pydatetime(), data,
                     ("image/x-portable", 0, 0, 0.0)))
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    out = {r["url"]: r for r in image_features(df, fake=False).collect()}
    assert len(out) == 8
    for url, (w, h, ml, ph, nb) in oracle.items():
        r = out[url]
        # real path: dims come from the file header, not the meta struct
        assert (r["width"], r["height"], r["n_bytes"], r["phash"]) == (w, h, nb, ph)
        assert abs(r["mean_luma"] - ml) < 1e-9
        assert r["mime"] == "image/x-portable"


def test_image_features_null_meta_emits_nulls(spark):
    """ADVICE r2: NULL meta struct must emit NULL width/height/mean_luma,
    not 0/NaN sentinels."""
    import pandas as pd

    df = spark.createDataFrame(
        [
            ("u1", pd.Timestamp("2024-01-01").to_pydatetime(), b"P5\n1 1\n255\nx", None),
        ],
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    r = image_features(df, fake=False).collect()[0]
    assert r["width"] is None and r["height"] is None
    assert r["mean_luma"] is None and r["phash"] is None and r["mime"] is None


def test_decode_wav_roundtrip_numpy_oracle():
    from ballet_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    mono = rng.uniform(-0.9, 0.9, size=800)
    out, sr = decode_wav(encode_wav(mono, 8000))
    assert sr == 8000 and out.shape == (800, 1)
    # encode scales by 32767, decode divides by 32768: bound 2/32768
    assert np.allclose(out[:, 0], mono, atol=2.0 / 32768, rtol=0)

    stereo = rng.uniform(-0.5, 0.5, size=(400, 2))
    out2, sr2 = decode_wav(encode_wav(stereo, 44100))
    assert sr2 == 44100 and out2.shape == (400, 2)
    assert np.allclose(out2, stereo, atol=2.0 / 32768, rtol=0)

    with pytest.raises(Exception, match="unsupported audio magic"):
        decode_wav(b"ID3\x04....mp3data")
    with pytest.raises(Exception, match="non-PCM"):
        # format 85 = MP3-in-WAV
        bad = bytearray(encode_wav(mono, 8000))
        bad[20:22] = (85).to_bytes(2, "little")
        decode_wav(bytes(bad))


def test_audio_features_real_wav_path(spark):
    import pandas as pd

    from ballet_spark.functions.multimodal import audio_features, encode_wav

    rng = np.random.default_rng(5)
    rows, oracle = [], {}
    for i in range(5):
        n = 500 + 100 * i
        mono = rng.uniform(-1, 1, size=n)
        data = encode_wav(mono, 8000)
        url = f"http://a.test/{i}"
        q = np.round(np.clip(mono * 32767, -32768, 32767)) / 32768.0
        oracle[url] = (n, float(np.sqrt(np.mean(q**2))), float(np.abs(q).max()))
        rows.append((url, pd.Timestamp("2024-01-01").to_pydatetime(), data,
                     ("audio/wav", 0, 0, 0.0)))
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    out = {r["url"]: r for r in audio_features(df, fake=False).collect()}
    for url, (n, rms, peak) in oracle.items():
        r = out[url]
        assert r["n_samples"] == n and r["sample_rate"] == 8000
        assert abs(r["duration_s"] - n / 8000.0) < 1e-12
        assert abs(r["rms"] - rms) < 1e-9 and abs(r["peak"] - peak) < 1e-9
        assert 0.0 < r["zero_cross_rate"] < 1.0


def test_audio_features_null_meta_and_fake(spark):
    import pandas as pd

    from ballet_spark.functions.multimodal import audio_features

    df = spark.createDataFrame(
        [
            ("u1", pd.Timestamp("2024-01-01").to_pydatetime(), b"xx", None),
            ("u2", pd.Timestamp("2024-01-01").to_pydatetime(), b"yy",
             ("audio/fake", 0, 0, 0.0)),
        ],
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    out = {r["url"]: r for r in audio_features(df, fake=True).collect()}
    assert out["u1"]["rms"] is None and out["u1"]["sample_rate"] is None
    assert out["u2"]["rms"] is not None and out["u2"]["n_samples"] == 1600


def test_resize_images_real_path(spark):
    import pandas as pd

    from ballet_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
    )

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(32, 24), dtype=np.uint8)
    rows = [
        ("u1", pd.Timestamp("2024-01-01").to_pydatetime(), encode_ppm(arr),
         ("image/x-portable", 24, 32, 0.0)),
        ("u2", pd.Timestamp("2024-01-01").to_pydatetime(), b"zz", None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    out = {r["url"]: r for r in resize_images(df, 8, 8).collect()}
    got = decode_ppm(bytes(out["u1"]["media"]))
    assert got.shape == (8, 8)
    # numpy oracle: same nearest-neighbor grid
    ys, xs = (np.arange(8) * 32) // 8, (np.arange(8) * 24) // 8
    assert np.array_equal(got, arr[np.ix_(ys, xs)].astype(float))
    assert out["u2"]["media"] is None  # NULL meta passes through
    with pytest.raises(ValueError, match=">= 1x1"):
        resize_images(df, 0, 8)


def test_decode_ppm_maxval_scaling():
    """netpbm samples are fractions of maxval — a maxval=15 scan must
    decode to the standard 0-255 range like reference decoders."""
    from ballet_spark.functions.multimodal import decode_ppm

    data = b"P5\n2 1\n15\n" + bytes([0, 15])
    out = decode_ppm(data)
    assert out[0, 0] == 0.0 and out[0, 1] == 255.0


def test_media_null_bytes_with_meta_emit_nulls(spark):
    """A row with NULL media but populated meta must emit NULL features,
    not crash the decode kernel with 'unsupported format b\\'\\''."""
    import pandas as pd

    from ballet_spark.functions.multimodal import audio_features, image_features

    df = spark.createDataFrame(
        [("u1", pd.Timestamp("2024-01-01").to_pydatetime(), None,
          ("image/x-portable", 4, 4, 0.0))],
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    r = image_features(df, fake=False).collect()[0]
    assert r["phash"] is None and r["mean_luma"] is None
    assert r["mime"] == "image/x-portable"  # meta itself still surfaces
    a = audio_features(df, fake=False).collect()[0]
    assert a["rms"] is None and a["sample_rate"] is None


def test_decode_wav_zero_channels_rejected():
    import numpy as np

    from ballet_spark.functions.multimodal import decode_wav, encode_wav

    bad = bytearray(encode_wav(np.zeros(16), 8000))
    bad[22:24] = (0).to_bytes(2, "little")  # fmt n_channels = 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero channels"):
        decode_wav(bytes(bad))


def test_decode_wav_rejects_truncated_chunks():
    """ADVICE r4: untrusted RIFF size fields must fail with a clear
    'truncated WAV' error, not an opaque np.frombuffer abort."""
    import numpy as np
    import pytest as _pytest

    from ballet_spark.functions.multimodal import decode_wav, encode_wav

    good = encode_wav(np.zeros(16), 8000)

    # data-chunk size field extends past the buffer
    over = bytearray(good)
    data_pos = good.index(b"data")
    over[data_pos + 4 : data_pos + 8] = (10**6).to_bytes(4, "little")
    with _pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(bytes(over))

    # 16-bit data chunk trimmed to an odd byte count (size field kept
    # consistent so the chunk walk succeeds)
    odd = bytearray(good[:-1])
    n = len(good) - data_pos - 8 - 1
    odd[data_pos + 4 : data_pos + 8] = n.to_bytes(4, "little")
    with _pytest.raises(ValueError, match="odd byte length"):
        decode_wav(bytes(odd))

    # consistent chunk walk, but fmt chunk shorter than the 16-byte
    # PCM header
    body = b"fmt " + (8).to_bytes(4, "little") + b"\x01\x00\x01\x00@\x1f\x00\x00"
    body += b"data" + (0).to_bytes(4, "little")
    short = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    with _pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(short)


def test_png_decode_matches_ppm_and_numpy():
    """VERDICT r3 ask #6: compressed PNG exercises the real decode path
    — every filter type, every 8-bit color type, luma equal to the
    PPM decode of the same pixels."""
    from ballet_spark.functions.multimodal import (
        decode_image,
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
    for ft in range(5):
        assert np.allclose(
            decode_png(encode_png(gray, filter_type=ft)), gray.astype(float)
        )
        assert np.allclose(
            decode_png(encode_png(rgb, filter_type=ft)),
            decode_ppm(encode_ppm(rgb)),
        )
    # magic dispatch
    assert np.allclose(decode_image(encode_png(gray)), gray.astype(float))
    assert np.allclose(decode_image(encode_ppm(gray)), gray.astype(float))

    # truncated chunk / bad raster fail clearly
    good = encode_png(gray)
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(good[:40])
    import zlib as _z

    bad = bytearray(good)
    idat_pos = good.index(b"IDAT")
    bad[idat_pos + 4] ^= 0xFF  # corrupt the deflate stream
    with pytest.raises(ValueError, match="malformed PNG"):
        decode_png(bytes(bad))
    with pytest.raises(NotImplementedError, match="magic"):
        decode_png(b"JFIF....not a png....")


def test_png_through_spark_image_features(spark):
    """Real (non-fake) mapInPandas path over PNG media: features equal
    the PPM encoding of the same pixels, and resize_images handles PNG
    inputs."""
    import datetime as dt

    from ballet_spark.functions.multimodal import (
        encode_png,
        encode_ppm,
        image_features,
        resize_images,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, size=(16 + i, 20, 3), dtype=np.uint8)
        enc = encode_png(px, filter_type=i % 5) if i % 2 else encode_ppm(px)
        rows.append(
            (
                f"https://img{i}.example/",
                dt.datetime(2024, 1, 1 + i),
                bytearray(enc),
                ("image/png" if i % 2 else "image/x-portable", 20, 16 + i, 0.0),
            )
        )
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, "
        "duration_s: double>",
    )
    out = image_features(df, fake=False).toPandas().set_index("url")
    for i in range(12):
        r = out.loc[f"https://img{i}.example/"]
        assert r["width"] == 20 and r["height"] == 16 + i
        assert 0 <= r["mean_luma"] <= 255
    # png and ppm encodings of identical pixels give identical features
    px = rng.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)
    both = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1), bytearray(encode_png(px, 4)),
             ("image/png", 20, 16, 0.0)),
            ("b", dt.datetime(2024, 1, 1), bytearray(encode_ppm(px)),
             ("image/x-portable", 20, 16, 0.0)),
        ],
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, "
        "duration_s: double>",
    )
    fp = image_features(both, fake=False).toPandas().set_index("url")
    assert fp.loc["a", "phash"] == fp.loc["b", "phash"]
    assert np.isclose(fp.loc["a", "mean_luma"], fp.loc["b", "mean_luma"])

    rs = resize_images(df, 8, 8).toPandas()
    assert (rs["width"] == 8).all() and rs["media"].notna().all()


# ------------------------------------------------------ baseline JPEG
def test_jpeg_roundtrip_gray_color_restarts():
    """Pure-Python baseline JPEG: with a flat quant table the
    encode→decode roundtrip is near-lossless, pinning huffman, zigzag,
    dequant, IDCT and MCU assembly; restart intervals exercise the
    decoder resync path."""
    from ballet_spark.functions.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:23]
    gray = (100 + 80 * np.sin(yy / 7) + 60 * np.cos(xx / 5)).clip(0, 255)
    for ri in (0, 1, 3):
        dec = decode_jpeg(encode_jpeg(gray, quant=1, restart_interval=ri))
        assert dec.shape == gray.shape
        assert np.abs(dec - gray).max() < 1.0, ri

    yy, xx = np.mgrid[0:41, 0:30]
    rgb = np.stack(
        [100 + 50 * np.sin(xx / 4), 120 + 40 * np.cos(yy / 6),
         90 + 30 * np.sin((xx + yy) / 5)], -1
    ).clip(0, 255)
    ytrue = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for ri in (0, 2):
        dec = decode_jpeg(encode_jpeg(rgb, quant=2, restart_interval=ri))
        assert dec.shape == ytrue.shape
        # 4:2:0 chroma never feeds luma: Y roundtrips at quant error
        assert np.abs(dec - ytrue).max() < 2.0, ri


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code; some encoders/cameras pad segments this way."""
    from ballet_spark.functions.jpeg import decode_jpeg, encode_jpeg

    gray = np.full((16, 16), 77.0)
    data = encode_jpeg(gray)
    ref = decode_jpeg(data)
    # splice an extra fill 0xFF before the first post-SOI marker and
    # two before the SOS marker
    padded = bytearray(data)
    i = padded.find(b"\xff\xda")
    padded[i:i] = b"\xff\xff"
    padded[2:2] = b"\xff"
    assert np.array_equal(decode_jpeg(bytes(padded)), ref)


def test_jpeg_error_paths():
    from ballet_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(NotImplementedError, match="magic"):
        decode_jpeg(b"nope not a jpeg")
    # 8-bit DQT cannot represent quant outside 1..255; >255 would
    # silently wrap in the written table (all-zero reconstruction)
    gray8 = np.full((8, 8), 128.0)
    for bad in (0, 256, -3):
        with pytest.raises(ValueError, match="quant"):
            encode_jpeg(gray8, quant=bad)
    # progressive: patch the SOF0 marker to SOF2 in a real file
    gray = np.full((8, 8), 128.0)
    data = bytearray(encode_jpeg(gray))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(data))
    # truncated entropy stream fails clearly
    good = encode_jpeg(gray)
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4] + b"\xff\xd9")  # chop entropy, keep EOI


def test_jpeg_through_real_image_features_path(spark):
    """decode_image dispatches FFD8 to the JPEG decoder inside the
    actual mapInPandas kernel; features match the SAME image shipped
    as lossless PPM within quantization tolerance (phash exactly —
    quant=1 perturbs luma < 1 level, far under phash's DCT-median
    threshold for a smooth image)."""
    import pandas as pd

    from ballet_spark.functions.jpeg import encode_jpeg
    from ballet_spark.functions.multimodal import (
        encode_ppm,
        image_features,
    )

    yy, xx = np.mgrid[0:24, 0:18]
    gray = (110 + 70 * np.sin(yy / 5) + 50 * np.cos(xx / 4)).clip(0, 255)
    rows = [
        ("http://x.test/jpg", pd.Timestamp("2024-01-01").to_pydatetime(),
         encode_jpeg(gray, quant=1), ("image/jpeg", 0, 0, 0.0)),
        ("http://x.test/ppm", pd.Timestamp("2024-01-01").to_pydatetime(),
         encode_ppm(gray.astype(np.uint8)), ("image/x-portable", 0, 0, 0.0)),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, media binary, "
        "media_meta struct<mime: string, width: int, height: int, duration_s: double>",
    )
    out = {r["url"]: r for r in image_features(df, fake=False).collect()}
    j, p = out["http://x.test/jpg"], out["http://x.test/ppm"]
    assert (j["width"], j["height"]) == (p["width"], p["height"]) == (18, 24)
    # uint8 cast in the PPM twin loses < 1 level; JPEG quant=1 < 1 level
    assert abs(j["mean_luma"] - p["mean_luma"]) < 1.5
    assert j["phash"] == p["phash"]
