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
