"""Multimodal (binary) column operators — images/audio/video as opaque
`binary` payloads with typed metadata.

North-star extension (no analog in the reference, which is text/number-only:
src/main.rs:20,30,48). Contract:

- A media row is (id, payload: binary, + metadata columns derived here).
- Cheap metadata (size, digest, container sniff) is NATIVE column
  expressions — magic-byte dispatch runs inside whole-stage codegen over a
  12-byte prefix, never touching Python.
- Decode-class work (pixel decode, feature extraction, resize, frame
  sampling) runs as Arrow-batched mapInPandas: the ONLY sane shape for
  per-payload Python at scale — payload bytes stream executor-side in Arrow
  batches, one Python worker per core, no driver involvement. The actual
  codec call is pluggable; this container has no image/audio libs, so the
  default decoder is a DETERMINISTIC FAKE (bytes → stable pseudo-features)
  and `real_decode` raises NotImplementedError with the plug-in contract.
  The Spark-side plumbing — schemas, UDF signatures, batch iteration,
  row-expansion — is real and tested either way.

Scale notes: metadata ops are narrow maps (zero shuffle). mapInPandas ops
are embarrassingly parallel; size `spark.sql.execution.arrow.maxRecordsPerBatch`
down (e.g. 64) when payloads are MBs so a batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- native metadata ----------------------------------------------------------


def sniff_media_type(payload: Column) -> Column:
    """Container sniff from magic bytes — native when-chain over a 12-byte
    hex prefix (PNG/JPEG/GIF/RIFF-WAVE/MP4-ftyp), no Python, no shuffle."""
    magic = F.hex(F.substring(payload, 1, 12))
    return (
        F.when(magic.startswith("89504E47"), F.lit("image/png"))
        .when(magic.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(magic.startswith("47494638"), F.lit("image/gif"))
        .when(
            magic.startswith("52494646")
            & (F.substring(magic, 17, 8) == "57415645"),
            F.lit("audio/wav"),
        )
        .when(F.substring(magic, 9, 8) == "66747970", F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
    )


def _le_uint(payload: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int from payload bytes [pos, pos+nbytes)
    (1-based pos), as a native expression: hex the slice, reverse the byte
    pairs, parse base-16. No Python, runs in codegen."""
    h = F.hex(F.substring(payload, pos, nbytes))
    pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    return F.conv(F.concat(*pairs), 16, 10).cast("long")


def wav_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Typed audio metadata from a canonical RIFF/WAVE header — entirely
    native expressions (the header is a fixed-layout struct, so 'decoding'
    it needs byte surgery, not a codec): channels, sample rate, bits per
    sample, and duration derived from the data-chunk size. Non-WAV payloads
    yield nulls. Assumes the canonical 44-byte header (fmt chunk first) —
    exotic chunk orders belong to the mapInPandas decoder path."""
    p = F.col(payload_col)
    is_wav = sniff_media_type(p) == "audio/wav"
    channels = _le_uint(p, 23, 2)
    rate = _le_uint(p, 25, 4)
    bits = _le_uint(p, 35, 2)
    data_size = _le_uint(p, 41, 4)
    bytes_per_sec = rate * channels * (bits / F.lit(8))
    duration_ms = F.round(data_size * 1000 / bytes_per_sec).cast("long")
    null_l = F.lit(None).cast("long")
    return df.withColumns(
        {
            "wav_channels": F.when(is_wav, channels).otherwise(null_l),
            "wav_sample_rate": F.when(is_wav, rate).otherwise(null_l),
            "wav_bits": F.when(is_wav, bits).otherwise(null_l),
            "wav_duration_ms": F.when(is_wav, duration_ms).otherwise(null_l),
        }
    )


def _be_uint(payload: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from payload bytes [pos, pos+nbytes)
    (1-based pos) — hex the slice, parse base-16. Codegen, no Python."""
    return F.conv(F.hex(F.substring(payload, pos, nbytes)), 16, 10).cast("long")


def png_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Image dimensions from the PNG IHDR chunk — native byte surgery,
    the image analog of wav_metadata: the 8-byte signature is followed by
    the IHDR length/type (8 bytes), then width and height as big-endian
    uint32 at offsets 16 and 20 (0-based). IHDR is REQUIRED first by the
    PNG spec, so a fixed-offset read is spec-correct, not a heuristic.
    Non-PNG payloads (and PNGs truncated before the IHDR) yield nulls."""
    p = F.col(payload_col)
    is_png = (sniff_media_type(p) == "image/png") & (
        F.octet_length(p) >= 24
    ) & (F.hex(F.substring(p, 13, 4)) == "49484452")  # 'IHDR'
    null_l = F.lit(None).cast("long")
    return df.withColumns(
        {
            "png_width": F.when(is_png, _be_uint(p, 17, 4)).otherwise(null_l),
            "png_height": F.when(is_png, _be_uint(p, 21, 4)).otherwise(null_l),
        }
    )


def payload_metadata(
    df: DataFrame, payload_col: str, hex_digest: bool = False
) -> DataFrame:
    """Attach (n_bytes, digest, media_type) typed metadata columns.

    hex_digest=True routes the md5 through a hex string for engines whose
    md5 is VARCHAR-only (the DuckDB oracle); default hashes the raw bytes.
    """
    p = F.col(payload_col)
    digest = F.md5(F.hex(p)) if hex_digest else F.md5(p)
    return df.withColumns(
        {
            "n_bytes": F.octet_length(p).cast("long"),
            "digest": digest,
            "media_type": sniff_media_type(p),
        }
    )


def binary_from_text(
    df: DataFrame, text_col: str, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic synthetic payloads for fixtures: text bytes prefixed
    with a rotating magic (PNG / JPEG / none) keyed by id % 3. Lets every
    binary operator be exercised — and oracle-checked — on the text-only
    testdata tables."""
    body = F.encode(F.col(text_col), "utf-8")
    mod = F.col(id_col) % 3
    payload = (
        F.when(mod == 0, F.concat(F.expr("X'89504E47'"), body))
        .when(mod == 1, F.concat(F.expr("X'FFD8FFE0'"), body))
        .otherwise(body)
    )
    return df.withColumn(payload_col, payload)


# --- mapInPandas decode plumbing ---------------------------------------------

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def real_decode(payload: bytes) -> dict:
    """Plug-in point for an actual codec (PIL / libav / soundfile).

    Not available in this environment — STUBBED by design. A real
    deployment replaces this with e.g.
    ``Image.open(io.BytesIO(payload))`` and returns
    {media_type, width, height, n_channels, duration_ms}."""
    raise NotImplementedError(
        "no media codecs in this container; pass decode_fn=... with "
        "signature bytes -> dict(media_type, width, height, n_channels, "
        "duration_ms)"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic pseudo-decoder: stable features derived from a sha1 of
    the payload. Keeps the full mapInPandas pipeline testable (exact
    expected values) without codecs; clearly NOT real pixel data."""
    h = hashlib.sha1(payload).digest()
    return {
        "media_type": "fake/decoded",
        "width": 16 + h[0] % 240,
        "height": 16 + h[1] % 240,
        "n_channels": 1 + h[2] % 4,
        "duration_ms": int.from_bytes(h[3:5], "big"),
    }


def decode_media_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """payload → typed feature row via Arrow-batched mapInPandas.

    One output row per input row; the decoder sees raw bytes, the executor
    streams pandas batches — the canonical shape for CPU-bound per-item
    Python (decode, embed, OCR) at cluster scale."""
    decode = decode_fn or fake_decode

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "media_type": [f["media_type"] for f in feats],
                    "width": pd.array([f["width"] for f in feats], dtype="int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="int32"),
                    "n_channels": pd.array(
                        [f["n_channels"] for f in feats], dtype="int32"
                    ),
                    "duration_ms": pd.array(
                        [f["duration_ms"] for f in feats], dtype="int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_FEATURES_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Row-EXPANDING mapInPandas: emit every stride-th fixed-size chunk of
    the payload as a 'frame' (the video frame-sampling batch shape — a real
    deployment swaps the chunker for a container demuxer). One input row →
    ceil(n_chunks/stride) output rows; Arrow batches both ways."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                chunks = range(0, max(len(data), 1), frame_bytes)
                for fi, off in enumerate(chunks):
                    if fi % stride:
                        continue
                    ids.append(int(pid))
                    idxs.append(fi)
                    frames.append(data[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def resize_image(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """payload → resized payload (same row count). Default resizer is a
    deterministic fake (sha1-seeded bytes of the requested size, capped);
    a real deployment passes resize_fn backed by PIL/libvips."""

    def fake_resize(data: bytes, w: int, h: int) -> bytes:
        seed = hashlib.sha1(data + f"{w}x{h}".encode()).digest()
        return (seed * (min(w * h, 4096) // len(seed) + 1))[: min(w * h, 4096)]

    resize = resize_fn or fake_resize
    schema = StructType(
        [StructField("id", LongType()), StructField("resized", BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "resized": [
                        resize(bytes(b), width, height) for b in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
