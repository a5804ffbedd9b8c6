"""Tests for binary/multimodal column operators (mapInPandas plumbing runs
with a deterministic fake decoder — no codecs in this container)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nrest-of-png"),
        (1, b"\xff\xd8\xff\xe0JFIFjpegbody"),
        (2, b"GIF89a-tiny"),
        (3, b"RIFF\x00\x00\x00\x00WAVEfmt "),
        (4, b"\x00\x00\x00\x18ftypmp42moreatoms"),
        (5, b"just plain bytes"),
    ]
    return spark.createDataFrame(rows, ["id", "payload"])


def test_sniff_media_type(spark, media):
    got = {
        r["id"]: r["mt"]
        for r in media.select(
            "id", multimodal.sniff_media_type(F.col("payload")).alias("mt")
        ).collect()
    }
    assert got == {
        0: "image/png",
        1: "image/jpeg",
        2: "image/gif",
        3: "audio/wav",
        4: "video/mp4",
        5: "application/octet-stream",
    }


def test_payload_metadata(spark, media):
    out = {r["id"]: r for r in
           multimodal.payload_metadata(media, "payload").collect()}
    raw = {r["id"]: bytes(r["payload"]) for r in media.collect()}
    for i, b in raw.items():
        assert out[i]["n_bytes"] == len(b)
        assert out[i]["digest"] == hashlib.md5(b).hexdigest()


def test_decode_media_features_fake_decoder(spark, media):
    out = {r["id"]: r for r in
           multimodal.decode_media_features(media, "payload", "id").collect()}
    assert set(out) == set(range(6))
    # exact expected values from the deterministic fake
    for i, b in {r["id"]: bytes(r["payload"]) for r in media.collect()}.items():
        exp = multimodal.fake_decode(b)
        got = out[i]
        assert (got["width"], got["height"], got["n_channels"], got["duration_ms"]) == (
            exp["width"], exp["height"], exp["n_channels"], exp["duration_ms"]
        )
        assert got["media_type"] == "fake/decoded"


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="decode_fn"):
        multimodal.real_decode(b"anything")


def test_sample_frames_row_expansion(spark):
    payload = bytes(range(256)) * 2  # 512 bytes → 8 chunks of 64
    df = spark.createDataFrame([(7, payload)], ["id", "payload"])
    out = multimodal.sample_frames(df, "payload", "id", frame_bytes=64, stride=2)
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    assert all(r["id"] == 7 for r in rows)
    assert bytes(rows[0]["frame"]) == payload[:64]
    assert bytes(rows[1]["frame"]) == payload[128:192]


def test_resize_image_deterministic(spark, media):
    a = multimodal.resize_image(media, "payload", "id", 32, 32).collect()
    b = multimodal.resize_image(media, "payload", "id", 32, 32).collect()
    assert sorted((r["id"], bytes(r["resized"])) for r in a) == sorted(
        (r["id"], bytes(r["resized"])) for r in b
    )
    assert all(len(bytes(r["resized"])) == 32 * 32 for r in a)


def _wav_bytes(channels=2, rate=44100, bits=16, n_frames=44100) -> bytes:
    """Canonical 44-byte PCM WAV header + silent data."""
    import struct

    data_size = n_frames * channels * bits // 8
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * bits // 8,
                                channels * bits // 8, bits)
        + b"data" + struct.pack("<I", data_size) + b"\x00" * min(data_size, 64)
    )


def test_wav_metadata_native_parse(spark):
    df = spark.createDataFrame(
        [
            (1, _wav_bytes(channels=2, rate=44100, bits=16, n_frames=44100)),
            (2, _wav_bytes(channels=1, rate=16000, bits=8, n_frames=8000)),
            (3, b"not a wav at all"),
        ],
        ["id", "payload"],
    )
    out = {r["id"]: r for r in multimodal.wav_metadata(df, "payload").collect()}
    assert (out[1]["wav_channels"], out[1]["wav_sample_rate"],
            out[1]["wav_bits"], out[1]["wav_duration_ms"]) == (2, 44100, 16, 1000)
    assert (out[2]["wav_channels"], out[2]["wav_sample_rate"],
            out[2]["wav_bits"], out[2]["wav_duration_ms"]) == (1, 16000, 8, 500)
    assert out[3]["wav_channels"] is None and out[3]["wav_duration_ms"] is None


def test_binary_from_text_rotating_magic(spark):
    df = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: bytes(r["payload"]) for r in
           multimodal.binary_from_text(df, "text", "doc_id").collect()}
    assert out[0][:4] == bytes.fromhex("89504E47") and out[0][4:] == b"zero"
    assert out[1][:4] == bytes.fromhex("FFD8FFE0") and out[1][4:] == b"one"
    assert out[2] == b"two"


def test_png_metadata_native_header_parse(spark):
    import struct

    def png_bytes(w, h):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
        return sig + ihdr + b"\x00" * 8

    from opendosm_parquet_to_sqlite_spark.operators.multimodal import png_metadata

    rows = [
        (1, bytearray(png_bytes(640, 480))),
        (2, bytearray(png_bytes(1, 1_000_000))),  # >16-bit dims parse fine
        (3, bytearray(b"\xff\xd8\xff\xe0 not a png")),
        (4, bytearray(b"\x89PNG\r\n\x1a\n")),  # truncated before IHDR
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: (r.png_width, r.png_height)
           for r in png_metadata(df, "payload").collect()}
    assert out[1] == (640, 480)
    assert out[2] == (1, 1_000_000)
    assert out[3] == (None, None)
    assert out[4] == (None, None)
