"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the 100 TB brief): image/audio/video live as ``binary`` columns
with a typed metadata struct alongside.  Decode / feature-extraction runs as
Arrow-batched pandas iterators over ``mapInPandas`` — the payload bytes
never round-trip through Python row objects, and batches stream (bounded
memory regardless of partition size).  The actual codec call is STUBBED
(image/audio libs absent in this container) behind
:func:`register_decoder` — the Spark-side schema, partitioning, UDF
signature and batch shape are real and tested.

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
            dec: list[tuple[int, int, int]] = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                fn = decoders.get(modality, fake_decoder)
                dec.append(fn(bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in dec],
                    "height": [d[1] for d in dec],
                    "duration_ms": [d[2] for d in dec],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def features_sql(table: str = "documents") -> str:
    """DuckDB mirror of attach_payload→extract_features with fake_decoder."""
    n = f"octet_length({table}.text::BLOB)"
    return f"""
SELECT doc_id AS media_id,
       'text' AS modality,
       CAST({n} AS BIGINT) AS n_bytes,
       CAST({n} % 1920 + 1 AS INT) AS width,
       CAST(({n} // 7) % 1080 + 1 AS INT) AS height,
       CAST(({n} * 33) % 600000 AS BIGINT) AS duration_ms
FROM {table}
"""
