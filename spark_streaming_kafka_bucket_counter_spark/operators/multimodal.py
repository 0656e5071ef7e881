"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Beyond-reference scope (BASELINE.json north star). Design for 100 TB
multimodal datasets:

- media lives in BINARY columns (or object-store URIs) beside typed
  metadata; Spark shuffles/partitions the binary blobs like any column,
  and parquet stores them page-compressed.
- decode / feature-extract / resize / frame-sample are *per-row Python*
  by nature (codec libraries), so they run as ``mapInPandas`` — Arrow
  batches in, Arrow batches out, no per-row serialization. Partition
  sizing keeps each Arrow batch in memory (`maxRecordsPerBatch`).
- the actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container:
  ``decoder='stub'`` computes deterministic pseudo-metadata from the
  bytes (so the plumbing — schema, batching, partitioning — is fully
  testable and oracle-checkable); ``decoder='real'`` raises
  NotImplementedError at the import-gate with the dependency named.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, n_bytes long, width long, height long, channels long"
AUDIO_META_SCHEMA = "doc_id long, n_bytes long, n_frames long, sample_rate long"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media column: utf-8 bytes of ``text_col`` as the payload.

    Stand-in for reading real media bytes; everything downstream treats
    it as an opaque BINARY column.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _require_real_decoder(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding needs a codec library (e.g. PIL/ffmpeg) that "
        "is not installed in this environment; use decoder='stub' for the "
        "deterministic plumbing path"
    )


def decode_image_meta(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """Binary payload -> image metadata via Arrow-batched mapInPandas.

    Stub decode (deterministic, oracle-checkable):
      width = n_bytes % 640 + 1; height = (n_bytes * 7) % 480 + 1;
      channels = 3.
    """
    if decoder == "real":  # pragma: no cover - env gated
        _require_real_decoder("image")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "width": n % 640 + 1,
                    "height": (n * 7) % 480 + 1,
                    "channels": 3,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, IMAGE_META_SCHEMA)


def sample_audio_frames(df: DataFrame, frame_bytes: int = 160, decoder: str = "stub") -> DataFrame:
    """Binary payload -> frame-sampling metadata (stub: fixed-size frames).

    Stub: n_frames = n_bytes // frame_bytes; sample_rate = 16000.
    """
    if decoder == "real":  # pragma: no cover - env gated
        _require_real_decoder("audio")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "n_frames": n // frame_bytes,
                    "sample_rate": 16000,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, AUDIO_META_SCHEMA)
