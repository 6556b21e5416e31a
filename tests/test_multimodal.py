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
