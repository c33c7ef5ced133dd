"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct alongside. The Spark-side machinery — schema, Arrow
batch shape, `mapInPandas` signatures, partitioning — is real and
tested; the actual media decode is STUBBED (the decode libraries are
not in this environment): `decode_image_batch(real=True)` raises
NotImplementedError, while the default deterministic fake derives
features from the byte payload so the full pipeline is checkable
end-to-end (including against a SQL oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, format string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media column: utf-8 bytes of the text as the payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_batch(real: bool = False):
    """Return a mapInPandas function decoding `payload` → features.

    real=True is the production path (PIL/libjpeg etc.) — stubbed here.
    The fake path is deterministic in the payload bytes, so results are
    reproducible and oracle-checkable.
    """
    if real:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "plug a PIL/torchvision decoder into this batch signature"
        )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "fake_width": (16 + n_bytes % 32).astype("int32"),
                    "fake_height": (16 + (n_bytes // 32) % 32).astype("int32"),
                    "format": "fake/png",
                }
            )

    return fake_decode


def decode_documents(df: DataFrame) -> DataFrame:
    """documents table → fake-decoded feature table via Arrow batches."""
    payloads = with_binary_payload(df).select("doc_id", "payload")
    return payloads.mapInPandas(decode_image_batch(), DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, n_tiles int"


def resize_batch(target: int = 16):
    """Fake resize: derive tile grid from the fake decode dimensions.
    Real path would call PIL.Image.resize — same batch signature."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            w = (16 + n_bytes % 32).astype("int64")
            h = (16 + (n_bytes // 32) % 32).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": target,
                    "height": target,
                    "n_tiles": (((w + target - 1) // target)
                                * ((h + target - 1) // target)).astype("int32"),
                }
            )

    return fn


def resize_documents(df: DataFrame, target: int = 16) -> DataFrame:
    payloads = with_binary_payload(df).select("doc_id", "payload")
    return payloads.mapInPandas(resize_batch(target), RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int"


def frame_sample_batch(frame_size: int = 256, stride: int = 4):
    """Fake video frame sampling: the payload is split into fixed-size
    frames and every ``stride``-th frame is emitted with its true byte
    length (the tail frame may be short) — the row-explosion shape of
    real frame extraction."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_len = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    out_ids.append(int(doc_id))
                    out_idx.append(i)
                    out_len.append(min(frame_size, n - i * frame_size))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_len, dtype="int32"),
                }
            )

    return fn


def frame_sample_documents(
    df: DataFrame, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    payloads = with_binary_payload(df).select("doc_id", "payload")
    return payloads.mapInPandas(frame_sample_batch(frame_size, stride), FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id long, n_bytes long, first_byte int, last_byte int, loudness_fake double"


def audio_features_batch():
    """Fake audio feature extraction: first/last byte + their midpoint
    as a stand-in loudness — deterministic in the payload, same batch
    signature a librosa-backed extractor would use."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            firsts = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
            lasts = pdf["payload"].map(lambda b: b[-1] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "first_byte": firsts.astype("int32"),
                    "last_byte": lasts.astype("int32"),
                    "loudness_fake": (firsts + lasts).astype("float64") / 2.0,
                }
            )

    return fn


def audio_features_documents(df: DataFrame) -> DataFrame:
    payloads = with_binary_payload(df).select("doc_id", "payload")
    return payloads.mapInPandas(audio_features_batch(), AUDIO_SCHEMA)
