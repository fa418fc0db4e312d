"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the 100 TB brief): image/audio/video live as ``binary`` columns
with a typed metadata struct alongside.  Decode / feature-extraction runs as
Arrow-batched pandas iterators over ``mapInPandas`` — the payload bytes
never round-trip through Python row objects, and batches stream (bounded
memory regardless of partition size).  Codec calls route through
:func:`register_decoder`; formats needing external libs (jpeg/mp3/...)
stay STUBBED (libs absent in this container), but binary PPM has a REAL
pure-numpy decoder registered out of the box — decode → channel stats →
nearest-neighbor resize are exercised end-to-end on real pixels, so the
Spark-side schema, partitioning, UDF signature and batch shape are
proven, not just typed.

Scale notes:
* payload columns are pruned unless referenced — metadata-only queries
  never read the bytes (parquet column pruning);
* ``mapInPandas`` preserves partitioning — no shuffle to decode;
* per-batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
  set it low (e.g. 64) for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_payload",
    "extract_features",
    "register_decoder",
    "fake_decoder",
    "encode_ppm",
    "ppm_decoder",
    "decode_ppm_pixels",
    "image_stats",
    "image_thumbnails",
    "encode_wav",
    "wav_decoder",
    "decode_wav_samples",
    "audio_stats",
    "frame_sample",
]

# Canonical media-table shape: id, modality, payload, typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video|text
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

# decoder registry: modality -> bytes -> (width, height, duration_ms)
_DECODERS: dict[str, Callable[[bytes], tuple[int, int, int]]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], tuple[int, int, int]]) -> None:
    """Plug a real codec (PIL/libav/...) in deployments that have one."""
    _DECODERS[modality] = fn


def fake_decoder(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives fake dimensions from the
    byte length (STUB — image/audio libraries are not in this container).
    """
    n = len(payload)
    return (n % 1920 + 1, (n // 7) % 1080 + 1, (n * 33) % 600000)


def attach_payload(
    df: DataFrame,
    id_col: str,
    text_col: str,
    modality: str = "text",
    source_col: str | None = None,
) -> DataFrame:
    """Build a media table from a string column (fixture path: the
    `documents` table stands in for a binary corpus via utf-8 encoding)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            (F.col(source_col) if source_col else F.lit("unknown")).alias("source"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Decode payloads to features via Arrow-batched ``mapInPandas``.

    Uses the registered decoder per modality, else :func:`fake_decoder`.
    Streaming iterator-of-batches: memory is bounded by the Arrow batch
    size, not the partition size.
    """
    decoders = dict(_DECODERS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload → NULL features (never bytes(None)): one
            # missing/corrupt media row must not kill a petabyte decode
            # job — the SQL-NULL propagation the oracle mirror applies
            # (nullvals edge axis)
            dec: list[tuple[int | None, int | None, int | None]] = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                if payload is None:
                    dec.append((None, None, None))
                    continue
                fn = decoders.get(modality, fake_decoder)
                dec.append(fn(bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": [d[0] for d in dec],
                    "height": [d[1] for d in dec],
                    "duration_ms": [d[2] for d in dec],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def features_sql(table: str = "documents") -> str:
    """DuckDB mirror of attach_payload→extract_features with fake_decoder.

    Byte length via ``strlen`` (DuckDB: UTF-8 BYTE count, vs ``length``'s
    character count) — the former ``text::BLOB`` cast errors on any
    non-ASCII character (DuckDB requires ``encode()`` for that cast),
    found by the unicode-text edge sweep."""
    n = f"strlen({table}.text)"
    return f"""
SELECT doc_id AS media_id,
       'text' AS modality,
       CAST({n} AS BIGINT) AS n_bytes,
       CAST({n} % 1920 + 1 AS INT) AS width,
       CAST(({n} // 7) % 1080 + 1 AS INT) AS height,
       CAST(({n} * 33) % 600000 AS BIGINT) AS duration_ms
FROM {table}
"""


# --- real lib-free image codec: binary PPM (netpbm P6) ---------------------
#
# The container has no PIL/libav, so the general registry stays stubbed for
# jpeg/mp3/..., but PPM (P6) is decodable with numpy alone — a REAL decoder
# proving the registry + pixel pipeline end-to-end: header parse → pixel
# ndarray → channel stats → nearest-neighbor resize, all Arrow-batched.


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 ndarray → binary PPM bytes (test/fixture helper)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM P6 is RGB — expected (h, w, 3)")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm_pixels(payload: bytes):
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 ndarray.

    Pure header parse + ``np.frombuffer`` — zero-copy over the payload
    bytes.  Comment lines (#) per the netpbm spec are honored.
    """
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments run #..newline); pixel data starts after the single
    # whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    return np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(
        h, w, 3
    )


def ppm_decoder(payload: bytes) -> tuple[int, int, int]:
    """Registry-compatible decoder: PPM → (width, height, 0)."""
    px = decode_ppm_pixels(payload)
    return (px.shape[1], px.shape[0], 0)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """Per-image channel means over REAL decoded pixels (PPM payloads) —
    the feature-extraction stage, Arrow-batched, partition-preserving
    (no shuffle); means are exact sums of uint8 over a single division.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list[Any]] = {k.name: [] for k in IMAGE_STATS_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm_pixels(bytes(payload))
                # sum in int64 (exact), ONE division per channel
                means = px.reshape(-1, 3).sum(axis=0, dtype=np.int64) / (
                    px.shape[0] * px.shape[1]
                )
                rows["media_id"].append(int(mid))
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_STATS_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def image_thumbnails(df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Deterministic nearest-neighbor resize (index sampling — no
    interpolation libs, bit-reproducible) → re-encoded PPM thumbnails.
    Decode → resize → encode streams batch-at-a-time; the output payload
    is bounded at out_w·out_h·3 bytes per image regardless of input size.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list[Any]] = {k.name: [] for k in THUMB_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm_pixels(bytes(payload))
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                thumb = px[yi][:, xi]
                rows["media_id"].append(int(mid))
                rows["thumb"].append(encode_ppm(thumb))
                rows["thumb_w"].append(out_w)
                rows["thumb_h"].append(out_h)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, THUMB_SCHEMA)


# a real decoder exists for PPM images out of the box
register_decoder("image/ppm", ppm_decoder)


# --- real lib-free audio codec: WAV (RIFF PCM 16-bit) ----------------------


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """1-D int16 ndarray → mono 16-bit PCM WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav_samples(payload: bytes):
    """WAV bytes → (samples int16 ndarray flattened across channels,
    sample_rate, n_channels).  stdlib ``wave`` + ``np.frombuffer``."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate, nch = w.getframerate(), w.getnchannels()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype=np.int16), rate, nch


def wav_decoder(payload: bytes) -> tuple[int, int, int]:
    """Registry-compatible: WAV → (0, 0, duration_ms)."""
    samples, rate, nch = decode_wav_samples(payload)
    return (0, 0, int(len(samples) // nch * 1000 // rate))


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_stats(df: DataFrame) -> DataFrame:
    """Per-clip loudness features over REAL decoded PCM: peak |amplitude|
    and RMS (int64 sum of squares → one sqrt).  Arrow-batched,
    partition-preserving."""
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list[Any]] = {f.name: [] for f in AUDIO_STATS_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate, nch = decode_wav_samples(bytes(payload))
                n = len(s)
                sq = int((s.astype(np.int64) ** 2).sum())
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(int(n // nch * 1000 // rate))
                rows["peak"].append(int(np.abs(s.astype(np.int32)).max()) if n else 0)
                rows["rms"].append(math.sqrt(sq / n) if n else 0.0)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, AUDIO_STATS_SCHEMA)


# --- video-as-frame-stream: concatenated P6 (ffmpeg image2pipe) ------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def frame_sample(df: DataFrame, every: int = 5) -> DataFrame:
    """Sample every ``every``-th frame from concatenated-PPM video streams
    (the byte format ``ffmpeg -f image2pipe -c:v ppm`` emits): walk the
    payload frame by frame — each P6 header gives the exact frame length,
    so skipped frames are never materialized — and emit the kept frames
    as standalone PPM payloads.

    One row in, ~n_frames/every rows out; Arrow-batched, no shuffle; peak
    memory = one frame, not one video.
    """

    def split_frames(payload: bytes):
        pos, idx = 0, 0
        while pos < len(payload):
            if payload[pos : pos + 2] != b"P6":
                raise ValueError(f"bad frame header at byte {pos}")
            # reuse the PPM header walk to find pixel-data start + dims
            hdr_pos, fields = pos + 2, []
            while len(fields) < 3:
                while payload[hdr_pos : hdr_pos + 1].isspace():
                    hdr_pos += 1
                if payload[hdr_pos : hdr_pos + 1] == b"#":
                    hdr_pos = payload.index(b"\n", hdr_pos) + 1
                    continue
                start = hdr_pos
                while not payload[hdr_pos : hdr_pos + 1].isspace():
                    hdr_pos += 1
                fields.append(int(payload[start:hdr_pos]))
            hdr_pos += 1
            w, h, _ = fields
            end = hdr_pos + w * h * 3
            yield idx, payload[pos:end], w, h
            pos, idx = end, idx + 1

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list[Any]] = {f.name: [] for f in FRAME_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, frame, w, h in split_frames(bytes(payload)):
                    if idx % every:
                        continue
                    rows["media_id"].append(int(mid))
                    rows["frame_no"].append(idx)
                    rows["frame"].append(frame)
                    rows["width"].append(w)
                    rows["height"].append(h)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


# real lib-free audio decoder registered alongside the PPM one
register_decoder("audio/wav", wav_decoder)
