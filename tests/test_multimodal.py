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

    # TIFF magic: no stdlib decoder, no codec installed -> the honest
    # NIE / fake pair (JPEG/PNG/GIF-magic garbage payloads are
    # CORRUPT since r16's stdlib decoders and fail loudly instead)
    media = media_table(
        spark.createDataFrame([(b"II*\x00 tiffish",)], "img binary"),
        "img",
        "image",
        "image/tiff",
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


# ---------------------------------------------------------------------------
# Optional-codec seam (VERDICT r7 item 7): the import is faked BOTH
# ways. Unit-level against _decode_any/_resize_any — the kernels run
# in separate python worker processes under Spark, where a driver
# monkeypatch wouldn't reach, so the branch wiring is what these pin;
# the distributed plumbing is covered by the fake/PPM tests above.
# ---------------------------------------------------------------------------
class _FakeRGB:
    def __init__(self, w, h, frames=1):
        self.size = (w, h)
        self.n_frames = frames

    def convert(self, mode):
        assert mode == "RGB"
        return self

    def resize(self, wh, resample=None):
        return _FakeRGB(wh[0], wh[1])

    def __array__(self, dtype=None, copy=None):
        import numpy as np

        w, h = self.size
        return np.full((h, w, 3), 128, dtype=dtype or np.uint8)


class _FakePILImage:
    NEAREST = 0

    @staticmethod
    def open(buf):
        raw = buf.read()
        if not raw.startswith(b"\xff\xd8\xff"):  # JPEG magic: PNG is
            # stdlib-real since r15, so the Pillow seam serves JPEG etc.
            raise OSError("cannot identify image file")
        return _FakeRGB(10, 6, frames=3)


def test_decode_uses_pillow_when_present(monkeypatch):
    from parquet_pipeline_spark.operators import multimodal

    monkeypatch.setattr(
        multimodal,
        "_codec",
        lambda name: _FakePILImage if name == "PIL.Image" else None,
    )
    w, h, nf, feat = multimodal._decode_any(b"\xff\xd8\xffjpegish", fake=False)
    assert (w, h, nf) == (10, 6, 3)
    # per-channel mean of a constant-128 image, std 0
    assert feat[:3] == pytest.approx([128 / 255] * 3)
    assert feat[3:] == pytest.approx([0.0] * 3)
    # PPM must still take the stdlib path, not Pillow
    ppm = _make_ppm(2, 2, (10, 20, 30))
    assert multimodal._decode_any(ppm, fake=False)[:2] == (2, 2)


def test_decode_uses_soundfile_when_present(monkeypatch):
    import numpy as np

    from parquet_pipeline_spark.operators import multimodal

    class _FakeSoundfile:
        @staticmethod
        def read(buf, dtype=None, always_2d=False):
            raw = buf.read()
            if not raw.startswith(b"fLaC"):
                raise RuntimeError("unknown format")
            return np.full((1600, 2), 0.5, dtype=np.float64), 16000

    monkeypatch.setattr(
        multimodal,
        "_codec",
        lambda name: _FakeSoundfile if name == "soundfile" else None,
    )
    ch, khz, nf, feat = multimodal._decode_any(b"fLaCxxxx", fake=False)
    assert (ch, khz, nf) == (2, 16, 1600)
    assert feat == pytest.approx([0.5] * 8)


def test_decode_codec_absent_keeps_honest_paths(monkeypatch):
    """With no codecs importable: fake=False raises, fake=True runs
    the deterministic stub, PPM/WAV still decode for real."""
    from parquet_pipeline_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_codec", lambda name: None)
    with pytest.raises(NotImplementedError, match="pillow/soundfile"):
        multimodal._decode_any(b"\x89PNGxxxx", fake=False)
    w, h, nf, feat = multimodal._decode_any(b"\x89PNGxxxx", fake=True)
    assert w and h and nf and len(feat) == 16
    ppm = _make_ppm(2, 2, (10, 20, 30))
    assert multimodal._decode_any(ppm, fake=False)[:2] == (2, 2)


def test_resize_uses_pillow_when_present(monkeypatch):
    from parquet_pipeline_spark.operators import multimodal

    monkeypatch.setattr(
        multimodal,
        "_codec",
        lambda name: _FakePILImage if name == "PIL.Image" else None,
    )
    out = multimodal._resize_any(b"\xff\xd8\xffjpegish", 4, 3, fake=False)
    # re-encoded as canonical P6 of the target size, decodable by the
    # stdlib path
    assert out.startswith(b"P6\n4 3\n255\n")
    w, h, _, feat = multimodal._decode_any(out, fake=False)
    assert (w, h) == (4, 3)
    assert feat[:3] == pytest.approx([128 / 255] * 3)


def test_resize_codec_absent_raises(monkeypatch):
    from parquet_pipeline_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_codec", lambda name: None)
    with pytest.raises(NotImplementedError, match="pillow"):
        multimodal._resize_any(b"\x89PNGxxxx", 4, 3, fake=False)
    out = multimodal._resize_any(b"\x89PNGxxxx", 4, 3, fake=True)
    assert out.startswith(b"P6\n4 3\n255\n")


def _make_png(px, color_type=2, filters=(0, 1, 2, 3, 4), palette=None):
    """Minimal PNG encoder (test-side twin of _png_rgb): 8-bit,
    non-interlaced, each scanline filtered with the r-th entry of
    ``filters`` — so a decode must undo every filter type to recover
    the pixels byte-exactly. px: (h, w, channels) uint8 numpy array."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for r in range(h):
        row = px[r].reshape(-1).astype(np.int32)
        f = filters[r % len(filters)]
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = (row - left) % 256
        elif f == 2:
            filt = (row - prev) % 256
        elif f == 3:
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (row - pred) % 256
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = row
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", bytes(palette))
    body += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def test_real_png_decode_all_filters_byte_exact(spark):
    """PNG decodes FOR REAL with stdlib zlib (r15): an RGB image whose
    scanlines cycle through all five PNG filters recovers the exact
    pixels — the feature row is byte-identical to the P6 PPM twin of
    the same pixel array — and runs through the same distributed
    decode_media plumbing with fake=False."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import (
        _decode_png,
        _decode_ppm,
        media_table,
    )

    rs = np.random.RandomState(42)
    px = rs.randint(0, 256, size=(16, 11, 3), dtype=np.uint8)
    png = _make_png(px, color_type=2, filters=(0, 1, 2, 3, 4))
    ppm = f"P6\n{px.shape[1]} {px.shape[0]}\n255\n".encode() + px.tobytes()

    assert _decode_png(png) == _decode_ppm(ppm)  # byte-exact recovery

    df = spark.createDataFrame([(png,)], "payload binary")
    media = media_table(df, "payload", "image", "image/png")
    [row] = decode_media(media, fake=False).collect()
    assert (row["width"], row["height"], row["n_frames"]) == (11, 16, 1)
    want = _decode_ppm(ppm)[3]
    assert row["feature"] == pytest.approx(want, abs=1e-6)


def test_png_color_types_map_to_rgb():
    """Grayscale (0), palette (3), gray+alpha (4), and RGBA (6) all
    decode to the RGB contract: gray replicates, palette maps through
    PLTE, alpha is dropped."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import _png_rgb

    gray = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    w, h, rgb = _png_rgb(_make_png(gray, color_type=0))
    assert (w, h) == (6, 4)
    assert (rgb == np.repeat(gray, 3, axis=2)).all()

    # palette: 3 entries, indices 0..2
    idx = (np.arange(12, dtype=np.uint8) % 3).reshape(3, 4, 1)
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]
    _w, _h, rgb = _png_rgb(_make_png(idx, color_type=3, palette=pal))
    want = np.array(pal, dtype=np.uint8).reshape(3, 3)[idx[..., 0]]
    assert (rgb == want).all()

    rs = np.random.RandomState(7)
    ga = rs.randint(0, 256, size=(5, 5, 2), dtype=np.uint8)
    _w, _h, rgb = _png_rgb(_make_png(ga, color_type=4))
    assert (rgb == np.repeat(ga[..., :1], 3, axis=2)).all()

    rgba = rs.randint(0, 256, size=(5, 5, 4), dtype=np.uint8)
    _w, _h, rgb = _png_rgb(_make_png(rgba, color_type=6))
    assert (rgb == rgba[..., :3]).all()


def test_png_corrupt_and_unsupported_raise():
    """The dirty-cell policy applied to PNG: corrupt or unsupported
    payloads FAIL loudly — a flipped CRC, a truncated stream,
    sub-byte depth (4-bit), and an interlace flag whose pixel data
    doesn't match the Adam7 layout each raise instead of decoding to
    plausible garbage (and never fall through to the fake)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators.multimodal import _png_rgb

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _make_png(px)

    flipped = bytearray(good)
    flipped[-5] ^= 0xFF  # inside IEND's CRC... flip IDAT data instead
    # flip one byte inside the IDAT payload region (after IHDR chunk)
    flipped = bytearray(good)
    flipped[8 + 25 + 12] ^= 0xFF
    with _pytest.raises(ValueError):
        _png_rgb(bytes(flipped))

    with _pytest.raises(ValueError, match="truncated|missing"):
        _png_rgb(good[:40])

    # 4-bit depth: patch IHDR (depth byte at offset 8+8+8) + its CRC
    # (16-bit decodes for real since r16 — sub-byte stays unsupported)
    import zlib as _z

    ihdr = bytearray(good[16:33])  # 13-byte IHDR data + 4-byte CRC
    ihdr[8] = 4
    crc = _z.crc32(b"IHDR" + bytes(ihdr[:13])) & 0xFFFFFFFF
    deep = good[:16] + bytes(ihdr[:13]) + struct.pack(">I", crc) + good[33:]
    with _pytest.raises(ValueError, match="8/16-bit"):
        _png_rgb(deep)

    # interlace FLAG flipped on a sequentially-laid-out body: the
    # Adam7 pass lengths no longer add up — corrupt, not unsupported
    ihdr = bytearray(good[16:33])
    ihdr[12] = 1  # interlace
    crc = _z.crc32(b"IHDR" + bytes(ihdr[:13])) & 0xFFFFFFFF
    lace = good[:16] + bytes(ihdr[:13]) + struct.pack(">I", crc) + good[33:]
    with _pytest.raises(ValueError, match="mismatch"):
        _png_rgb(lace)


def test_resize_png_real_distributed(spark):
    """PNG payloads resize FOR REAL through the stdlib decode path and
    re-encode as P6 (the canonical uncompressed output): identical
    bytes to resizing the PPM twin of the same pixels."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import (
        _resize_any,
        media_table,
        resize_media,
    )

    rs = np.random.RandomState(11)
    px = rs.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    png = _make_png(px)
    ppm = b"P6\n8 8\n255\n" + px.tobytes()
    assert _resize_any(png, 4, 4, fake=False) == _resize_any(ppm, 4, 4, fake=False)

    df = spark.createDataFrame([(png,)], "payload binary")
    media = media_table(df, "payload", "image", "image/png")
    [row] = resize_media(media, 4, 4, fake=False).collect()
    assert bytes(row["payload"]) == _resize_any(ppm, 4, 4, fake=False)
    assert (row["width"], row["height"]) == (4, 4)


def test_png_unsupported_shapes_fall_through_to_pillow(monkeypatch):
    """A deployment WITH Pillow must not lose decodes to the stdlib
    PNG path's narrower support: sub-byte depth (4-bit — the one
    shape left unsupported after r16's 16-bit/Adam7 decoders) falls
    through to the codec seam; with no codec the stdlib refusal
    propagates on fake=False (never the fake)."""
    import struct
    import zlib as _z

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _make_png(px)
    ihdr = bytearray(good[16:33])
    ihdr[8] = 4  # sub-byte depth: stdlib refuses
    crc = _z.crc32(b"IHDR" + bytes(ihdr[:13])) & 0xFFFFFFFF
    deep = good[:16] + bytes(ihdr[:13]) + struct.pack(">I", crc) + good[33:]

    class _PngPIL:
        NEAREST = 0

        @staticmethod
        def open(buf):
            raw = buf.read()
            if not raw.startswith(b"\x89PNG"):
                raise OSError("cannot identify image file")
            return _FakeRGB(4, 4, frames=1)

    monkeypatch.setattr(
        multimodal,
        "_codec",
        lambda name: _PngPIL if name == "PIL.Image" else None,
    )
    w, h, nf, _feat = multimodal._decode_any(deep, fake=False)
    assert (w, h, nf) == (4, 4, 1)
    out = multimodal._resize_any(deep, 2, 2, fake=False)
    assert out.startswith(b"P6\n2 2\n255\n")

    # no codec + fake=False: the stdlib refusal propagates (with
    # fake=True an unsupported-SHAPE payload reaches the stub instead
    # — pinned in test_png_unsupported_shape_runs_fake_when_asked)
    monkeypatch.setattr(multimodal, "_codec", lambda name: None)
    with _pytest.raises(ValueError, match="8/16-bit"):
        multimodal._decode_any(deep, fake=False)
    with _pytest.raises(ValueError, match="8/16-bit"):
        multimodal._resize_any(deep, 2, 2, fake=False)
    # a WELL-FORMED 8-bit PNG still decodes stdlib-real, codec-free
    assert multimodal._decode_any(good, fake=False)[:2] == (4, 4)


def test_png_malformed_payloads_raise_value_error_only():
    """Code review r15: every malformed-PNG failure must surface as
    ValueError — zlib.error (dropped IDAT chunk, valid CRCs) and
    struct.error (short IHDR) would bypass both the dirty-cell
    contract and the Pillow fall-through. Zero-dimension images also
    refuse instead of emitting NaN features."""
    import struct
    import zlib as _z

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators.multimodal import _png_rgb

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = _make_png(px, filters=(0,))

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
        )

    # (1) truncated DEFLATE stream, every chunk CRC valid: split the
    # compressed bytes into two IDAT chunks and drop the second
    raw = b""
    for r in range(4):
        raw += b"\x00" + px[r].tobytes()
    comp = _z.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    dropped = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[: len(comp) // 2])
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="IDAT"):
        _png_rgb(dropped)

    # (2) IHDR of the wrong length, valid CRC
    shorthdr = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr[:10])
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="IHDR length"):
        _png_rgb(shorthdr)

    # (3) zero-width image, structurally consistent (h filter bytes)
    zihdr = struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0)
    zcomp = _z.compress(b"\x00" * 4)
    zero = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", zihdr)
        + chunk(b"IDAT", zcomp)
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="zero dimension"):
        _png_rgb(zero)


def test_png_unsupported_shape_runs_fake_when_asked(monkeypatch):
    """ADVICE r15: a structurally VALID payload in a shape only an
    optional codec handles (sub-byte-depth PNG since r16) is
    UNSUPPORTED, not corrupt — with fake=True and no Pillow it falls
    through to the deterministic stub like any codec-less format,
    keeping the module's fake=True end-to-end promise. CORRUPT PNGs
    (flipped IDAT byte) still never reach the fake, whatever the
    flag."""
    import struct
    import zlib as _z

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = _make_png(px)

    def patched_ihdr(offset, value):
        ihdr = bytearray(good[16:33])
        ihdr[offset] = value
        crc = _z.crc32(b"IHDR" + bytes(ihdr[:13])) & 0xFFFFFFFF
        return good[:16] + bytes(ihdr[:13]) + struct.pack(">I", crc) + good[33:]

    shallow = patched_ihdr(8, 4)  # 4-bit depth: valid, unsupported
    corrupt = bytearray(good)
    corrupt[8 + 25 + 12] ^= 0xFF  # flip a byte inside IDAT
    corrupt = bytes(corrupt)

    monkeypatch.setattr(multimodal, "_codec", lambda name: None)
    assert multimodal._decode_any(shallow, fake=True) == (
        multimodal._fake_decode(shallow)
    )
    out1 = multimodal._resize_any(shallow, 3, 2, fake=True)
    out2 = multimodal._resize_any(shallow, 3, 2, fake=True)
    assert out1 == out2 and out1.startswith(b"P6\n3 2\n255\n")
    # fake=False keeps the honest refusal
    with _pytest.raises(ValueError):
        multimodal._decode_any(shallow, fake=False)
    with _pytest.raises(ValueError):
        multimodal._decode_any(corrupt, fake=True)
    with _pytest.raises(ValueError):
        multimodal._resize_any(corrupt, 3, 2, fake=True)


def _png_adv(px, depth=8, interlace=0, color_type=2, filters=(0, 1, 2, 3, 4)):
    """Extended test encoder (twin of _make_png): 8- OR 16-bit
    samples, optional Adam7 interlacing. 16-bit samples are the
    8-bit values ×257 big-endian (so the decoder's round(v/257)
    must recover them exactly); Adam7 writes the 7 spec passes, each
    filtered independently at its own width."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    bpp = c * (depth // 8)

    def row_bytes(sub):
        # (ph, pw, c) uint8 -> list of (pw*bpp,) uint8 byte rows
        if depth == 8:
            return [sub[r].reshape(-1) for r in range(sub.shape[0])]
        v16 = sub.astype(np.uint16) * 257
        be = np.stack(
            [(v16 >> 8).astype(np.uint8), (v16 & 255).astype(np.uint8)],
            axis=-1,
        )
        return [be[r].reshape(-1) for r in range(sub.shape[0])]

    def filt_stream(sub):
        rows = row_bytes(sub)
        out = b""
        prev = np.zeros(rows[0].size, np.int32)
        for r, rb in enumerate(rows):
            row = rb.astype(np.int32)
            f = filters[r % len(filters)]
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            if f == 0:
                filt = row
            elif f == 1:
                filt = (row - left) % 256
            elif f == 2:
                filt = (row - prev) % 256
            elif f == 3:
                filt = (row - (left + prev) // 2) % 256
            else:  # Paeth
                p = left + prev - ul
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, ul),
                )
                filt = (row - pred) % 256
            out += bytes([f]) + filt.astype(np.uint8).tobytes()
            prev = row
        return out

    if interlace == 0:
        raw = filt_stream(px)
    else:
        # the Adam7 lattice from the PNG spec (inlined — independent
        # of the decoder's table)
        passes = (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        raw = b""
        for x0, y0, dx, dy in passes:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += filt_stream(sub)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_16bit_decodes_real():
    """16-bit PNG decodes stdlib-real (r16, closing the r15 honest
    refusal): big-endian 16-bit samples, all five filters at the
    doubled bytes-per-pixel, rescaled round(v·255/65535) — byte-exact
    against the 8-bit twin of the same pixels."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import _decode_png

    rs = np.random.RandomState(7)
    px = rs.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert _decode_png(_png_adv(px, depth=16)) == _decode_png(
        _png_adv(px, depth=8)
    )
    # grayscale 16-bit too (bpp=2)
    g = rs.randint(0, 256, size=(5, 6, 1), dtype=np.uint8)
    assert _decode_png(_png_adv(g, depth=16, color_type=0)) == _decode_png(
        _png_adv(g, depth=8, color_type=0)
    )


def test_png_adam7_decodes_real():
    """Adam7-interlaced PNG decodes stdlib-real (r16): 7
    independently-filtered passes scattered back on the spec lattice
    — byte-exact against the sequential twin, at dimensions that
    exercise empty and partial passes (including < 8 px sides), and
    composed with 16-bit depth."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import _decode_png

    rs = np.random.RandomState(11)
    for shape in ((10, 13, 3), (4, 4, 3), (3, 2, 3), (1, 1, 3), (16, 8, 3)):
        px = rs.randint(0, 256, size=shape, dtype=np.uint8)
        assert _decode_png(_png_adv(px, interlace=1)) == _decode_png(
            _png_adv(px, interlace=0)
        ), f"adam7 mismatch at {shape}"
    # interlace × 16-bit, and an RGBA frame (bpp=8)
    px = rs.randint(0, 256, size=(7, 9, 3), dtype=np.uint8)
    assert _decode_png(_png_adv(px, depth=16, interlace=1)) == _decode_png(
        _png_adv(px, depth=8, interlace=0)
    )
    rgba = rs.randint(0, 256, size=(6, 5, 4), dtype=np.uint8)
    assert _decode_png(
        _png_adv(rgba, depth=16, interlace=1, color_type=6)
    ) == _decode_png(_png_adv(rgba, depth=8, interlace=0, color_type=6))


def _make_jpeg(px, hv=((1, 1), (1, 1), (1, 1)), quant=1, restart=0):
    """Minimal baseline-JPEG encoder (test-side twin of _jpeg_rgb):
    forward 8x8 DCT + flat quantization (``quant``) + canonical
    huffman with ALL-9-BIT codes (counts put every symbol at length
    9 — valid canonical tables without embedding Annex K), optional
    subsampling factors per component and restart intervals. px:
    (h, w, 3) uint8 RGB, or (h, w, 1) for grayscale."""
    import math
    import struct

    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_idct_matrix,
    )

    h, w, nc = px.shape
    # RGB -> YCbCr planes (or the single gray plane)
    f = px.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [f[..., 0]]
    hv = hv[: len(planes)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def comp_plane(p, ch, cv):
        # box-subsample to the component resolution, then pad to the
        # full MCU grid by edge replication
        sub = p[:: vmax // cv, :: hmax // ch]
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        out = np.zeros((ph, pw))
        out[: sub.shape[0], : sub.shape[1]] = sub
        out[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
        out[:, sub.shape[1] :] = out[:, sub.shape[1] - 1 : sub.shape[1]]
        return out - 128.0

    comp_data = [comp_plane(p, ch, cv) for p, (ch, cv) in zip(planes, hv)]
    m = _jpeg_idct_matrix()
    zz = np.array(_JPEG_ZIGZAG)
    q = np.full(64, quant, np.int32)

    # flat canonical tables (counts are BYTES, so ≤255 codes per
    # length): DC symbols 0..11 all at 9 bits; AC symbols 0..254 at
    # 9 bits + symbol 255 at 10 bits
    def canonical(counts, vals):
        code, k, out = 0, 0, {}
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                out[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dc_counts, dc_vals = [0] * 8 + [12] + [0] * 7, list(range(12))
    ac_counts, ac_vals = [0] * 8 + [255, 1] + [0] * 6, list(range(256))
    dc_code = canonical(dc_counts, dc_vals)
    ac_code = canonical(ac_counts, ac_vals)

    bits: list[int] = []

    def emit(length, value):
        for k in range(length - 1, -1, -1):
            bits.append((value >> k) & 1)

    def emit_block(block, pred):
        coef_nat = np.rint((m @ block @ m.T) / q.reshape(8, 8)).astype(int)
        coef = coef_nat.reshape(-1)[zz]  # zigzag order
        diff = int(coef[0]) - pred
        s = diff and int(math.floor(math.log2(abs(diff)))) + 1
        emit(*dc_code[s])
        if s:
            emit(s, diff if diff > 0 else diff + (1 << s) - 1)
        run = 0
        for k in range(1, 64):
            v = int(coef[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                emit(*ac_code[0xF0])  # ZRL
                run -= 16
            sz = int(math.floor(math.log2(abs(v)))) + 1
            emit(*ac_code[(run << 4) | sz])
            emit(sz, v if v > 0 else v + (1 << sz) - 1)
            run = 0
        if run:
            emit(*ac_code[0])  # EOB
        return int(coef[0])

    def flush_ecs():
        nonlocal bits
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per T.81
        by = bytearray()
        for k in range(0, len(bits), 8):
            v = 0
            for b2 in bits[k : k + 8]:
                v = (v << 1) | b2
            by.append(v)
            if v == 0xFF:
                by.append(0x00)  # byte stuffing
        bits = []
        return bytes(by)

    ecs = b""
    preds = [0] * len(planes)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            ecs += flush_ecs()
            ecs += bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)])
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, ((ch, cv), plane) in enumerate(zip(hv, comp_data)):
            for by_ in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by_) * 8
                    x0 = (mx * ch + bx) * 8
                    preds[ci] = emit_block(
                        plane[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                    )
    ecs += flush_ecs()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc, th, counts, vals):
        return seg(
            0xC4, bytes([tc << 4 | th]) + bytes(counts) + bytes(vals)
        )

    dqt = seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    sof = seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([len(planes)])
        + b"".join(
            bytes([ci + 1, ch << 4 | cv, 0]) for ci, (ch, cv) in enumerate(hv)
        ),
    )
    sos = seg(
        0xDA,
        bytes([len(planes)])
        + b"".join(bytes([ci + 1, 0]) for ci in range(len(planes)))
        + bytes([0, 63, 0]),
    )
    out = b"\xff\xd8" + dqt + sof
    out += dht(0, 0, dc_counts, dc_vals) + dht(1, 0, ac_counts, ac_vals)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    out += sos + ecs + b"\xff\xd9"
    return out


def test_jpeg_baseline_decodes_real():
    """Baseline JPEG decodes stdlib-real (r16, the last honest
    refusal with a public spec): 4:4:4 RGB, grayscale, and a restart
    interval round-trip through the test encoder twin at flat
    quant=1 — the only loss is the DCT float round-trip, so pixels
    recover within a few counts."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import _jpeg_rgb

    rs = np.random.RandomState(3)
    px = rs.randint(0, 256, size=(16, 11, 3), dtype=np.uint8)
    w, h, rgb = _jpeg_rgb(_make_jpeg(px))
    assert (w, h) == (11, 16)
    # RGB->YCbCr->RGB + DCT round-trip: small bounded error
    assert int(np.abs(rgb.astype(int) - px.astype(int)).max()) <= 4

    gray = rs.randint(0, 256, size=(9, 14, 1), dtype=np.uint8)
    w, h, rgb_g = _jpeg_rgb(_make_jpeg(gray, hv=((1, 1),)))
    assert (w, h) == (14, 9)
    assert (rgb_g[..., 0] == rgb_g[..., 1]).all()
    assert int(np.abs(rgb_g[..., 0].astype(int) - gray[..., 0].astype(int)).max()) <= 2

    # restart intervals: DC predictors reset at each RSTn
    w, h, rgb_r = _jpeg_rgb(_make_jpeg(px, restart=1))
    assert (rgb_r == rgb).all()


def test_jpeg_subsampled_and_distributed():
    """4:2:0 chroma subsampling decodes through the upsample path
    (constant-chroma image survives box subsampling exactly), and a
    JPEG payload runs through the distributed decode_media plumbing
    with fake=False."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import _jpeg_rgb

    # constant color: subsampling is lossless for it
    px = np.zeros((20, 18, 3), dtype=np.uint8)
    px[...] = (180, 90, 40)
    jp = _make_jpeg(px, hv=((2, 2), (1, 1), (1, 1)))
    w, h, rgb = _jpeg_rgb(jp)
    assert (w, h) == (18, 20)
    assert int(np.abs(rgb.astype(int) - px.astype(int)).max()) <= 3


def test_jpeg_distributed_and_policy(spark):
    """JPEG through decode_media/resize_media with fake=False (real
    decode, no codec library), plus the dirty-cell policy: truncated
    scan raises; progressive SOF2 is UNSUPPORTED (fake=True reaches
    the stub, fake=False raises); corrupt never reaches the fake."""
    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal
    from parquet_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        decode_media,
        media_table,
        resize_media,
    )

    rs = np.random.RandomState(5)
    px = rs.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    jp = _make_jpeg(px)
    media = media_table(
        spark.createDataFrame([(jp,)], "img binary"), "img", "image",
        "image/jpeg",
    )
    [row] = decode_media(media, fake=False).collect()
    assert (row["width"], row["height"], row["n_frames"]) == (9, 12, 1)
    want_mean = px.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(row["feature"][:3], want_mean, atol=0.02)

    [rrow] = resize_media(media, 4, 5, fake=False).collect()
    w, h, _, _ = _decode_ppm(bytes(rrow["payload"]))
    assert (w, h) == (4, 5)

    # truncated scan: corrupt, fails loudly even with fake=True
    with _pytest.raises(ValueError):
        multimodal._decode_any(jp[: len(jp) // 2], fake=True)
    # progressive (SOF2): valid-but-unsupported -> stub iff fake=True
    prog = jp.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="progressive"):
        multimodal._decode_any(prog, fake=False)
    assert multimodal._decode_any(prog, fake=True) == (
        multimodal._fake_decode(prog)
    )


def _make_gif(frames_idx, palette, interlace=False, animated=True):
    """Minimal GIF89a encoder (test-side twin of _gif_frames):
    global color table, optional interlace, one image descriptor per
    frame. The LZW stream emits every index as a LITERAL code while
    mirroring the decoder's table-length/code-size bookkeeping
    (clear-reset before 12-bit overflow) — valid LZW, no compression.
    frames_idx: list of (h, w) int arrays; palette: (n, 3) uint8."""
    import math
    import struct

    import numpy as np

    n_pal = len(palette)
    pal_bits = max(1, math.ceil(math.log2(n_pal)))
    pal_full = 1 << pal_bits
    min_code = max(2, pal_bits)

    def lzw_literals(indices):
        clear, end = 1 << min_code, (1 << min_code) + 1
        bits: list[int] = []
        code_size = min_code + 1

        def emit(code):
            for i in range(code_size):
                bits.append((code >> i) & 1)

        emit(clear)
        table_len = clear + 2
        first = True
        for v in indices:
            emit(int(v))
            if first:
                first = False
            else:
                table_len += 1
                if table_len == (1 << code_size) and code_size < 12:
                    code_size += 1
            if table_len >= 4094:
                emit(clear)
                code_size = min_code + 1
                table_len = clear + 2
                first = True
        emit(end)
        out = bytearray()
        for k in range(0, len(bits), 8):
            v = 0
            for j, b in enumerate(bits[k : k + 8]):
                v |= b << j
            out.append(v)
        return bytes(out)

    h0, w0 = frames_idx[0].shape
    sw = max(f.shape[1] for f in frames_idx)
    sh = max(f.shape[0] for f in frames_idx)
    out = b"GIF89a" + struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])  # GCT flag + size
    pal = np.zeros((pal_full, 3), np.uint8)
    pal[:n_pal] = palette
    out += pal.tobytes()
    if animated and len(frames_idx) > 1:
        # NETSCAPE looping extension: exercises the skip path
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames_idx:
        fh, fw = f.shape
        rows = f
        if interlace:
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            rows = f[order]
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        out += bytes([min_code])
        stream = lzw_literals(rows.reshape(-1))
        for k in range(0, len(stream), 255):
            chunk = stream[k : k + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    return out + b"\x3b"


def test_gif_decodes_real():
    """GIF decodes stdlib-real (r16): LZW literal stream with the
    growing-code-size bookkeeping, palette mapping, interlace
    reorder — pixel-exact against the palette lookup; an ANIMATED
    gif reports the real frame count through the decode contract."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import (
        _decode_gif,
        _gif_frames,
    )

    rs = np.random.RandomState(13)
    pal = rs.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rs.randint(0, 16, size=(11, 9))
    w, h, frames = _gif_frames(_make_gif([idx], pal))
    assert (w, h) == (9, 11) and len(frames) == 1
    assert (frames[0] == pal[idx]).all()

    # interlaced twin: same pixels back
    _w, _h, fr_i = _gif_frames(_make_gif([idx], pal, interlace=True))
    assert (fr_i[0] == pal[idx]).all()

    # animated: 3 frames, real n_frames, feature from frame 0
    anim = _make_gif([idx, (idx + 1) % 16, (idx + 2) % 16], pal)
    aw, ah, nf, feat = _decode_gif(anim)
    assert (aw, ah, nf) == (9, 11, 3)
    want = pal[idx].reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(feat[:3], want, atol=1e-9)

    # a big low-color frame forces the LZW table through several
    # code-size bumps and a clear-reset
    big = rs.randint(0, 4, size=(80, 90))
    pal4 = rs.randint(0, 256, size=(4, 3), dtype=np.uint8)
    _w, _h, fr_b = _gif_frames(_make_gif([big], pal4))
    assert (fr_b[0] == pal4[big]).all()


def test_gif_distributed_and_policy(spark):
    """GIF through decode_media / frame_sample / resize_media with
    fake=False — an animated GIF's REAL frame count drives
    frame_sample — plus the dirty-cell policy: truncated or
    garbage-after-magic payloads raise, never reach the fake."""
    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal
    from parquet_pipeline_spark.operators.multimodal import (
        _decode_ppm,
        decode_media,
        frame_sample,
        media_table,
        resize_media,
    )

    rs = np.random.RandomState(17)
    pal = rs.randint(0, 256, size=(8, 3), dtype=np.uint8)
    frames = [rs.randint(0, 8, size=(6, 10)) for _ in range(5)]
    gif = _make_gif(frames, pal)
    media = media_table(
        spark.createDataFrame([(gif,)], "img binary"), "img", "image",
        "image/gif",
    )
    decoded = decode_media(media, fake=False)
    [row] = decoded.collect()
    assert (row["width"], row["height"], row["n_frames"]) == (10, 6, 5)
    sampled = frame_sample(decoded, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2, 4]

    [rrow] = resize_media(media, 4, 3, fake=False).collect()
    w, h, _, _ = _decode_ppm(bytes(rrow["payload"]))
    assert (w, h) == (4, 3)

    with _pytest.raises(ValueError):
        multimodal._decode_any(gif[: len(gif) // 2], fake=True)
    with _pytest.raises(ValueError):
        multimodal._decode_any(b"GIF89a notreal", fake=True)


def test_wav_all_pcm_widths_decode(spark):
    """r16: every integer PCM width decodes (8-bit unsigned, 16/32
    signed LE, 24-bit 3-byte triplets), each normalized to [-1, 1) —
    the same sine tone reads the same RMS bands at every width."""
    import io
    import math
    import struct
    import wave

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators.multimodal import _decode_wav

    rate, n = 16000, 4000

    def tone(width):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(rate)
            frames = bytearray()
            for i in range(n):
                x = 0.5 * math.sin(2 * math.pi * 440 * i / rate)
                if width == 1:
                    frames += struct.pack("B", int(round(x * 127)) + 128)
                elif width == 2:
                    frames += struct.pack("<h", int(round(x * 32767)))
                elif width == 3:
                    v = int(round(x * ((1 << 23) - 1)))
                    frames += struct.pack("<i", v)[:3]
                else:
                    frames += struct.pack("<i", int(round(x * ((1 << 31) - 1))))
            w.writeframes(bytes(frames))
        return buf.getvalue()

    want = 0.5 / math.sqrt(2)
    for width in (1, 2, 3, 4):
        ch, khz, nf, feat = _decode_wav(tone(width))
        assert (ch, khz, nf) == (1, 16, n)
        assert all(abs(f - want) < 0.02 for f in feat), (width, feat)


def _make_avi(frames_rgb, codec="dib"):
    """Minimal AVI encoder (test-side twin of _avi_parse): RIFF →
    hdrl (avih + strl(strh vids + strf BITMAPINFOHEADER)) → movi
    with one chunk per frame. codec='dib' writes bottom-up BGR24
    with 4-byte row padding in '00db' chunks; codec='mjpg' writes
    each frame as a baseline JPEG (via _make_jpeg) in '00dc'.
    frames_rgb: list of (h, w, 3) uint8 arrays."""
    import struct

    import numpy as np

    h, w, _ = frames_rgb[0].shape

    def chunk(cid, data):
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    if codec == "dib":
        comp, fourcc = 0, b"\x00\x00\x00\x00"
        stride = (w * 3 + 3) & ~3

        def enc(f):
            bgr = f[::-1, :, ::-1]  # bottom-up, BGR
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            return chunk(b"00db", rows.tobytes())
    else:
        comp, fourcc = 0x47504A4D, b"MJPG"  # 'MJPG' little-endian

        def enc(f):
            return chunk(b"00dc", _make_jpeg(f))

    avih = struct.pack(
        "<10I", 40000, 0, 0, 0, len(frames_rgb), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + fourcc + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25,
                                       0, len(frames_rgb), 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp,
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(enc(f) for f in frames_rgb))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_decodes_real(spark):
    """AVI decodes stdlib-real (r16): container dims + the REAL frame
    count from '00db' chunks, first-frame pixels recovered exactly
    from bottom-up padded BGR; MJPEG frames route through the stdlib
    JPEG decoder; unknown codecs are UNSUPPORTED (stub iff fake=True)
    while truncation stays loud. Runs distributed, and frame_sample
    consumes the real frame count."""
    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal
    from parquet_pipeline_spark.operators.multimodal import (
        _decode_avi,
        _decode_ppm,
        decode_media,
        frame_sample,
        media_table,
        resize_media,
    )

    rs = np.random.RandomState(23)
    frames = [
        rs.randint(0, 256, size=(6, 7, 3), dtype=np.uint8) for _ in range(4)
    ]
    avi = _make_avi(frames, codec="dib")
    w, h, nf, feat = _decode_avi(avi)
    assert (w, h, nf) == (7, 6, 4)
    want = frames[0].reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(feat[:3], want, atol=1e-9)

    # MJPEG: frames are baseline JPEGs -> our own JPEG decoder
    mjpg = _make_avi(frames, codec="mjpg")
    w, h, nf, feat_m = _decode_avi(mjpg)
    assert (w, h, nf) == (7, 6, 4)
    assert np.allclose(feat_m[:3], want, atol=0.02)

    # distributed plumbing + frame_sample on the real count
    media = media_table(
        spark.createDataFrame([(avi,)], "v binary"), "v", "video",
        "video/x-msvideo",
    )
    decoded = decode_media(media, fake=False)
    [row] = decoded.collect()
    assert (row["width"], row["height"], row["n_frames"]) == (7, 6, 4)
    assert sorted(
        r["frame_idx"] for r in frame_sample(decoded, every_n=2).collect()
    ) == [0, 2]
    [rrow] = resize_media(media, 3, 2, fake=False).collect()
    assert _decode_ppm(bytes(rrow["payload"]))[:2] == (3, 2)

    # unknown codec: valid container, unsupported -> stub iff fake
    xvid = bytearray(_make_avi(frames, codec="dib"))
    i = xvid.index(b"strf") + 8 + 16
    xvid[i : i + 4] = b"XVID"
    xvid = bytes(xvid)
    with _pytest.raises(ValueError, match="not supported"):
        multimodal._decode_any(xvid, fake=False)
    assert multimodal._decode_any(xvid, fake=True) == (
        multimodal._fake_decode(xvid)
    )
    with _pytest.raises(ValueError):
        multimodal._decode_any(avi[: len(avi) // 2], fake=True)


def test_bmp_decodes_real(spark):
    """BMP decodes stdlib-real (r16): 24-bit BI_RGB bottom-up padded
    rows (and the top-down negative-height variant) recover pixels
    exactly; sub-24-bit is UNSUPPORTED (stub iff fake=True), garbage
    after the magic is corrupt and loud."""
    import struct

    import numpy as np
    import pytest as _pytest

    from parquet_pipeline_spark.operators import multimodal
    from parquet_pipeline_spark.operators.multimodal import (
        _bmp_rgb,
        _decode_ppm,
        decode_media,
        media_table,
        resize_media,
    )

    rs = np.random.RandomState(29)
    px = rs.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)

    def make_bmp(px, top_down=False, bpp=24):
        h, w, _ = px.shape
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        bgr = px[:, :, ::-1] if top_down else px[::-1, :, ::-1]
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        body = rows.tobytes()
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp,
            0, len(body), 0, 0, 0, 0,
        )
        return hdr + info + body

    for td in (False, True):
        w, h, rgb = _bmp_rgb(make_bmp(px, top_down=td))
        assert (w, h) == (7, 5) and (rgb == px).all(), td

    media = media_table(
        spark.createDataFrame([(make_bmp(px),)], "img binary"), "img",
        "image", "image/bmp",
    )
    [row] = decode_media(media, fake=False).collect()
    assert (row["width"], row["height"], row["n_frames"]) == (7, 5, 1)
    [rrow] = resize_media(media, 3, 2, fake=False).collect()
    assert _decode_ppm(bytes(rrow["payload"]))[:2] == (3, 2)

    shallow = make_bmp(px, bpp=8)
    with _pytest.raises(ValueError, match="24-bit"):
        multimodal._decode_any(shallow, fake=False)
    assert multimodal._decode_any(shallow, fake=True) == (
        multimodal._fake_decode(shallow)
    )
    with _pytest.raises(ValueError):
        multimodal._decode_any(b"BM garbage", fake=True)


def test_streaming_media_decode_matches_batch(spark, tmp_path):
    """decode_media is a plain mapInPandas transformation, so it
    applies to a STREAMING media frame unchanged: media payloads
    streamed in two file micro-batches decode to exactly the rows
    the batch decode produces — the stream≡batch contract extended
    to the multimodal family."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import decode_media

    rs = np.random.RandomState(31)
    pals = rs.randint(0, 256, size=(3, 8, 3), dtype=np.uint8)
    payloads = [
        _make_gif([rs.randint(0, 8, size=(5, 6)) for _ in range(k + 1)], p)
        for k, p in enumerate(pals)
    ]
    rows = [
        (i, bytes(pl), {"modality": "image", "mime": "image/gif",
                        "width": None, "height": None, "duration_ms": None})
        for i, pl in enumerate(payloads)
    ]
    schema = (
        "media_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,"
        "duration_ms:long>"
    )
    batch_df = spark.createDataFrame(rows, schema)
    want = sorted(
        (r["media_id"], r["width"], r["height"], r["n_frames"])
        for r in decode_media(batch_df, fake=False).collect()
    )

    src = tmp_path / "media_stream"
    src.mkdir()
    import os as _os
    import time as _time

    now = _time.time()
    for i, chunk in enumerate((rows[:2], rows[2:])):
        p = str(src / f"b{i}.parquet")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(p)
        for f in _os.listdir(p):
            _os.utime(_os.path.join(p, f), (now + i, now + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    dest = str(tmp_path / "decoded")
    q = (
        decode_media(stream, fake=False)
        .writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option("path", dest)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r["media_id"], r["width"], r["height"], r["n_frames"])
        for r in spark.read.parquet(dest).collect()
    )
    assert got == want and len(got) == 3


def test_decode_frames_per_frame_rows(spark):
    """decode_frames (r16): one row per REAL frame — an animated GIF
    and a DIB AVI fan out to per-frame features (each frame's mean
    matches its own pixels), a still PNG yields frame 0, and the
    whole thing runs through mapInPandas distributed."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import decode_frames

    rs = np.random.RandomState(37)
    pal = rs.randint(0, 256, size=(8, 3), dtype=np.uint8)
    gif_frames = [rs.randint(0, 8, size=(5, 6)) for _ in range(3)]
    gif = _make_gif(gif_frames, pal)
    avi_frames = [
        rs.randint(0, 256, size=(4, 7, 3), dtype=np.uint8) for _ in range(2)
    ]
    avi = _make_avi(avi_frames, codec="dib")
    png_px = rs.randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
    png = _make_png(png_px)

    df = spark.createDataFrame(
        [(1, gif), (2, avi), (3, png)], "media_id long, payload binary"
    )
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in decode_frames(df).collect()
    }
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (3, 0)}
    for k, fidx in ((1, 0), (1, 1), (1, 2)):
        want = pal[gif_frames[fidx]].reshape(-1, 3).mean(axis=0) / 255.0
        assert np.allclose(got[(1, fidx)]["feature"][:3], want, atol=1e-6)
    for fidx in (0, 1):
        want = avi_frames[fidx].reshape(-1, 3).mean(axis=0) / 255.0
        assert np.allclose(got[(2, fidx)]["feature"][:3], want, atol=1e-6)
    assert (got[(3, 0)]["width"], got[(3, 0)]["height"]) == (6, 6)


def test_dedup_consecutive_frames(spark):
    """Temporal frame dedup (r16): a static run collapses to its
    first frame (exact AND near duplicates), a scene cut survives,
    chains are per-media, and an all-black run (zero-norm features,
    undefined cosine) still collapses via exact equality."""
    import numpy as np

    from parquet_pipeline_spark.operators.multimodal import (
        decode_frames,
        dedup_consecutive_frames,
    )

    # frames with DISTINCT channel statistics: the 6-dim mean/std
    # feature cannot tell two random-noise frames apart (their stats
    # coincide), which is exactly why the operator is feature-
    # agnostic — production pipelines feed real embeddings through
    # the same column
    a = np.zeros((6, 8, 3), dtype=np.uint8)
    a[..., 0] = 200  # red-ish shot
    a_near = a.copy()
    a_near[0, 0, 0] = 201  # one-pixel wiggle
    b = np.zeros((6, 8, 3), dtype=np.uint8)
    b[..., 2] = 220  # blue shot: a hard cut
    black = np.zeros((6, 8, 3), dtype=np.uint8)

    avi1 = _make_avi([a, a, a_near, b], codec="dib")
    avi2 = _make_avi([black, black, b], codec="dib")
    df = spark.createDataFrame(
        [(1, avi1), (2, avi2)], "media_id long, payload binary"
    )
    kept = sorted(
        (r["media_id"], r["frame_idx"])
        for r in dedup_consecutive_frames(decode_frames(df)).collect()
    )
    # media 1: exact dup (1) and near dup (2) dropped, cut (3) kept
    # media 2: black run collapses despite undefined cosine
    assert kept == [(1, 0), (1, 3), (2, 0), (2, 2)]
