import pytest

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.multimodal import (
    decode_media,
    dedup_media_exact,
    frame_sample,
    media_table,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(b"payload-one",), (b"payload-two",), (b"payload-one",)],
        "raw binary",
    )
    return media_table(df, "raw", modality="image", mime="image/png")


def test_media_table_layout(media):
    assert set(media.columns) == {"media_id", "payload", "meta", "sha256"}
    row = media.first()
    assert row["meta"]["modality"] == "image"
    assert len(row["sha256"]) == 64


def test_decode_without_libs_raises(media):
    with pytest.raises(Exception) as exc_info:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_fake_decode_deterministic_distributed(media):
    out1 = {r["media_id"]: r.asDict() for r in decode_media(media, fake=True).collect()}
    out2 = {r["media_id"]: r.asDict() for r in decode_media(media, fake=True).collect()}
    assert out1 == out2
    any_row = next(iter(out1.values()))
    assert 64 <= any_row["width"] < 256 and len(any_row["feature"]) == 16


def test_frame_sample(media):
    decoded = decode_media(media, fake=True)
    frames = frame_sample(decoded, every_n=2)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    by_id = {r["media_id"]: r["n"] for r in got}
    dec = {r["media_id"]: r["n_frames"] for r in decoded.collect()}
    for mid, nf in dec.items():
        assert by_id[mid] == (nf + 1) // 2  # frames 0,2,4,...


def test_media_exact_dedup(media):
    out = dedup_media_exact(media).collect()
    counts = sorted(r["n_copies"] for r in out)
    assert counts == [1, 2]  # payload-one duplicated


def _make_ppm(width, height, rgb):
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def _make_wav(n_frames=8000, rate=16000, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        for i in range(n_frames):
            v = int(16000 * math.sin(2 * math.pi * 440 * i / rate))
            w.writeframes(struct.pack("<h", v) * channels)
    return buf.getvalue()


def test_real_ppm_decode_distributed(spark):
    """P6 PPM payloads decode for real (no fake flag): header dims
    and per-channel pixel stats, through the mapInPandas plumbing."""
    from parquet_pipeline_spark.operators.multimodal import media_table

    img = _make_ppm(12, 8, (255, 0, 0))  # solid red
    df = spark.createDataFrame([(img,)], "payload binary")
    media = media_table(df, "payload", "image", "image/x-portable-pixmap")
    [row] = decode_media(media, fake=False).collect()
    assert (row["width"], row["height"], row["n_frames"]) == (12, 8, 1)
    r_mean, g_mean, b_mean = row["feature"][:3]
    assert r_mean > 0.99 and g_mean < 0.01 and b_mean < 0.01


def test_real_wav_decode_distributed(spark):
    """WAV payloads decode via the stdlib wave module: frame count,
    (channels, kHz) metadata, non-zero RMS bands for a sine tone."""
    from parquet_pipeline_spark.operators.multimodal import media_table

    wav = _make_wav(n_frames=8000, rate=16000)
    df = spark.createDataFrame([(wav,)], "payload binary")
    media = media_table(df, "payload", "audio", "audio/wav")
    [row] = decode_media(media, fake=False).collect()
    assert row["n_frames"] == 8000
    assert (row["width"], row["height"]) == (1, 16)  # channels, kHz
    assert len(row["feature"]) == 8
    # sine RMS = amp/sqrt(2) = (16000/32768)*0.707 ~= 0.345
    assert all(0.3 < f < 0.4 for f in row["feature"])


def test_resize_ppm_real_distributed(spark):
    """P6 PPM payloads resize FOR REAL via mapInPandas: a 4x4 image
    with distinct quadrant colors downsamples to 2x2 keeping one
    pixel per quadrant (nearest-neighbor picks the top-left sample
    of each cell), and the output is itself a decodable P6."""
    from parquet_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        media_table,
        resize_media,
    )

    # quadrants: red  | green
    #            blue | white
    rows_px = [
        (255, 0, 0), (255, 0, 0), (0, 255, 0), (0, 255, 0),
        (255, 0, 0), (255, 0, 0), (0, 255, 0), (0, 255, 0),
        (0, 0, 255), (0, 0, 255), (255, 255, 255), (255, 255, 255),
        (0, 0, 255), (0, 0, 255), (255, 255, 255), (255, 255, 255),
    ]
    payload = b"P6\n4 4\n255\n" + b"".join(bytes(p) for p in rows_px)
    media = media_table(
        spark.createDataFrame([(payload,)], "img binary"), "img", "image", "image/x-ppm"
    )
    out = resize_media(media, 2, 2).collect()
    assert len(out) == 1 and out[0]["width"] == 2 and out[0]["height"] == 2
    resized = bytes(out[0]["payload"])
    w, h, _, _ = _decode_ppm(resized)
    assert (w, h) == (2, 2)
    body = resized[resized.index(b"255\n") + 4 :]
    assert body == bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))


def test_resize_without_libs_raises_and_fake_path(spark):
    """Non-PPM payloads: honest NotImplementedError by default; with
    fake=True a deterministic target-size P6 flows through the same
    distributed plumbing."""
    import pytest as _pytest

    from parquet_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        media_table,
        resize_media,
    )

    media = media_table(
        spark.createDataFrame([(b"\xff\xd8\xff notjpeg",)], "img binary"),
        "img",
        "image",
        "image/jpeg",
    )
    with _pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_media(media, 2, 2).collect()
    got = resize_media(media, 3, 2, fake=True).collect()
    assert len(got) == 1
    w, h, _, _ = _decode_ppm(bytes(got[0]["payload"]))
    assert (w, h) == (3, 2)
    again = resize_media(media, 3, 2, fake=True).collect()
    assert bytes(again[0]["payload"]) == bytes(got[0]["payload"])


def test_extract_raw_frames_slices_exact_bytes(spark):
    """Synthetic 'video': 6 raw 4x2 RGB frames, each filled with its
    frame index; every-2nd sampling must return frames 0/2/4 with
    byte-exact slices, JVM-side only."""
    from parquet_pipeline_spark.operators.multimodal import extract_raw_frames

    w, h, n = 4, 2, 6
    fsize = w * h * 3
    payload = b"".join(bytes([k]) * fsize for k in range(n))
    df = spark.createDataFrame(
        [(1, payload), (2, payload[: 2 * fsize])],  # 6-frame and 2-frame videos
        "media_id long, payload binary",
    )
    out = extract_raw_frames(df, w, h, every_n=2)
    rows = {(r["media_id"], r["frame_idx"]): bytes(r["frame_bytes"]) for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 2), (1, 4), (2, 0)}
    for (mid, k), b in rows.items():
        assert b == bytes([k]) * fsize


def test_frame_sample_zero_frames_emits_nothing(spark):
    """n_frames = 0 must yield zero rows, not a bogus frame_idx 0
    (descending-sequence guard, same class as extract_raw_frames)."""
    from parquet_pipeline_spark.operators.multimodal import frame_sample

    decoded = spark.createDataFrame(
        [(1, "video", 4, 4, 0, []), (2, "video", 4, 4, 3, [])],
        "media_id long, modality string, width int, height int, n_frames int, feature array<float>",
    )
    out = frame_sample(decoded, every_n=1).toPandas()
    assert sorted(out[out["media_id"] == 2]["frame_idx"]) == [0, 1, 2]
    assert len(out[out["media_id"] == 1]) == 0
