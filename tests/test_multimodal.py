from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_frame_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def binary_df(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\nfakepngdata"),
        (2, b"\xff\xd8\xff\xe0somejpegdata"),
        (3, b"RIFF....WAVEfmt fakewav"),
        (4, b"\x00" * 64),
        (5, bytes(range(256))),
    ]
    return spark.createDataFrame(rows, ["doc_id", "payload"])


def test_sniff_format_and_metadata(spark, binary_df):
    out = MM.attach_metadata(binary_df, "payload")
    rows = {r["doc_id"]: r["meta"] for r in out.collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "riff"
    assert rows[4]["format"] == "unknown"
    assert rows[1]["n_bytes"] == 19
    assert len(rows[1]["content_md5"]) == 32


def test_byte_features(spark, binary_df):
    out = {r["doc_id"]: r for r in MM.byte_features(binary_df, "payload").collect()}
    # all-zero payload: single bucket, zero entropy
    assert out[4]["entropy"] == 0.0
    assert out[4]["byte_hist"][0] == pytest.approx(1.0)
    # uniform payload: maximal entropy (4 bits over 16 buckets)
    assert out[5]["entropy"] == pytest.approx(4.0, abs=1e-9)
    assert sum(out[5]["byte_hist"]) == pytest.approx(1.0, abs=1e-6)
    assert out[5]["n_bytes"] == 256


def test_decode_image_stub_raises_without_pil(spark, binary_df):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(Exception) as exc:
        MM.decode_image(binary_df, "payload").collect()
    assert "NotImplementedError" in str(exc.value) or "decode_image" in str(exc.value)


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, 25), (2, 5)], ["vid", "n_frames"])
    out = MM.sample_frames(df, "n_frames", every_k=10)
    got = {(r["vid"], r["frame_idx"]) for r in out.collect()}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}
