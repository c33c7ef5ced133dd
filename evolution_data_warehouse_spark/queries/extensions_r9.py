"""Round-9 query batch: new operator families only — image
near-duplicate detection (perceptual dHash over the engine's real
decoders, Hamming-banded candidate join) and the end-to-end web-corpus
curation composite (WARC ingestion → strip → language/quality gates →
dedup → funnel report, one scan feeding every stage).

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float aggregation, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
treats media as opaque blobs and ingests curated CSV/JSON — both
batches here extend the engine's LLM-training-pipeline surface beyond
reference parity (the declared SURVEY §7 growth direction), composing
operators that are each already oracle-proven.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import (
    register,
    t,
)

# ---------------------------------------------------------------------------
# Image near-duplicate detection — perceptual dHash + banded pairs
# ---------------------------------------------------------------------------

# Near-dup image families, closed-form in doc_id (the mm_decode_real
# fixture discipline): docs in the same `doc_id div 10` family render
# the SAME pseudo-random 9x8 cell pattern, subjected to per-doc
# transformations dHash is exactly invariant to — uniform brightness
# shift (doc_id % 5)*10 and pixel-replication upscaling (sx=1+d%3,
# sy=1+d%2) — through three REAL lossless codecs (BMP/PPM/PNG by
# d % 3). Every 10th doc (d % 10 == 5) additionally swaps two pinned
# cell pairs, flipping EXACTLY dHash bits 0 and 56 (the swap changes
# one adjacent comparison each; the next comparison is unchanged
# because the third pinned cell exceeds both swapped values), so the
# family contains true near-duplicates at Hamming distance 2, not just
# exact copies. The oracle states the expected pair set in closed
# form. Cross-family hash collisions within distance 2 are ~2e-12
# likely for pseudo-random 64-bit hashes and the data is fixed —
# verified absent at the tested SFs, cannot flake.


def _phash_payload_batch():
    """mapInPandas fn: doc_id → a REAL encoded image payload from the
    near-dup family construction above."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from evolution_data_warehouse_spark.operators.multimodal import (
            encode_bmp,
            encode_png,
            encode_ppm,
        )

        mask = (1 << 64) - 1

        def mix(n: int) -> int:
            # splitmix64-style finalizer: a LINEAR formula here is not
            # enough — (base*c + y*a + x*b) mod 96 has at most 96
            # distinct patterns, so distinct families would collide
            # within the Hamming threshold (observed: 5498 pairs vs
            # the expected 2250 at sf0.01)
            n = (n * 0x9E3779B97F4A7C15) & mask
            n ^= n >> 29
            n = (n * 0xBF58476D1CE4E5B9) & mask
            n ^= n >> 32
            return n

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d // 10
                cells = np.zeros((8, 9), dtype=np.int64)
                for y in range(8):
                    for x in range(9):
                        cells[y, x] = 32 + mix(base * 72 + y * 9 + x) % 96
                # pinned triples controlling bits 0 and 56
                cells[0, 0:3] = (10, 20, 30)
                cells[7, 0:3] = (10, 20, 30)
                if d % 10 == 5:
                    cells[0, 0], cells[0, 1] = 20, 10
                    cells[7, 0], cells[7, 1] = 20, 10
                cells = cells + (d % 5) * 10  # brightness: dHash-invariant
                sx, sy = 1 + d % 3, 1 + d % 2
                gray = np.repeat(np.repeat(cells, sy, axis=0), sx, axis=1)
                px = np.repeat(
                    gray.astype(np.uint8)[:, :, None], 3, axis=2
                )
                enc = (encode_bmp, encode_ppm, encode_png)[d % 3]
                payloads.append(enc(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    return gen


_PHASH_ORACLE = """
SELECT a.doc_id AS doc_a,
       b.doc_id AS doc_b,
       CAST(CASE WHEN (a.doc_id % 10 = 5) <> (b.doc_id % 10 = 5)
                 THEN 2 ELSE 0 END AS INT) AS hamming
FROM documents a
JOIN documents b
  ON a.doc_id // 10 = b.doc_id // 10 AND a.doc_id < b.doc_id
"""


@register(
    "dedup_image_phash",
    _PHASH_ORACLE,
    doc="Image near-duplicate detection (operators/phash.py): per-doc "
    "REAL image payloads (near-dup families closed-form in doc_id, "
    "encoded through the engine's own BMP/PPM/PNG codecs) → 64-bit "
    "perceptual difference hash (integer block-mean dHash — exactly "
    "invariant to the family's brightness/upscale variations) → "
    "Hamming-banded candidate join (4x16-bit bands, pigeonhole-exact "
    "recall for distance<=3, default-ON hot-bucket guard) → JVM-side "
    "bit_count(XOR) verification. Two narrow Arrow stages + one "
    "band-bucketed equi-join — never all-pairs; the brightness-shifted "
    "copies land at distance 0 and the two-cell-swapped variants at "
    "exactly distance 2, so the oracle enumerates the expected pairs "
    "in closed form.",
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from evolution_data_warehouse_spark.operators.phash import (
        dhash_pairs,
        image_dhash_batch,
    )

    ids = t(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        _phash_payload_batch(), "doc_id long, payload binary"
    )
    hashes = payloads.mapInPandas(
        image_dhash_batch(), "doc_id long, dhash long"
    )
    return dhash_pairs(hashes, max_dist=2)
