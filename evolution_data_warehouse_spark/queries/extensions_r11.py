"""Round-11 query batch: the image-text alignment gate that completes
the LAION-style curation funnel (CLIP-score analog over paired
image/caption embeddings), BM25 ranked retrieval, and the
deterministic epoch-shuffle training sink.

Same contract as every other registry module: each query is a Spark
callable plus a DuckDB oracle, aliased identically on both sides, with
the repo determinism rules (integer arithmetic wherever possible,
fixed-point quantization before any float aggregation, tie-broken
ordering, no native round()).

Reference parity note: the reference (haelbrek/Evolution-DATA-WAREHOUSE)
is a curated-CSV warehouse with no media/retrieval surface — this
batch extends the engine's LLM-training-pipeline coverage beyond
reference parity (the declared SURVEY §7 growth direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evolution_data_warehouse_spark.queries.common import (
    register,
    t,
)

# ---------------------------------------------------------------------------
# Image-text (caption) alignment — the CLIP-score gate of LAION-style
# image-corpus curation
# ---------------------------------------------------------------------------

# Fixed-point scale for the quantized embedding components. The
# embeddings fixture is unit-normalized (components in [-1, 1]), so
# quantized components are <= 1000 in magnitude, squared norms <=
# 64e6, dot products <= 64e6 by Cauchy–Schwarz, and the
# cross-multiplied threshold terms (25·dot², 16·|i|²·|c|²) stay under
# ~1e17 — inside int64 on both engines at ANY corpus size (the bound
# is per-vector, not per-corpus).
_CAP_SCALE = 1000
# cos >= 0.8 as integers: dot > 0 AND 25·dot² >= 16·|i|²·|c|²
# (0.8² = 16/25 — no float ever decides).
_CAP_COS_NUM, _CAP_COS_DEN = 16, 25
# Misaligned-caption schedule: vec_id % 10 == 7 — deliberately the
# same residue as an always-quality-passing, never-family-minimum
# image leg in mm_image_curation's fixture, so the composed funnel's
# near-dup survivor set stays closed-form (leg 0 is the family
# minimum there and legs 8/9 already fail the quality gate).
_CAP_MISALIGNED_MOD, _CAP_MISALIGNED_RESIDUE = 10, 7


def caption_pair_stats(emb: DataFrame) -> DataFrame:
    """Per-vector paired image/caption alignment stats, all-integer.

    The image embedding is the fixture vector quantized to
    floor(x·1000); the caption embedding derives from it in the SAME
    row (pair co-located by id — zero shuffle): aligned docs get a
    tiny deterministic per-component jitter ((i + vec_id) % 5 - 2, a
    paraphrase-noise stand-in, cosine ~0.99998), docs on the
    misaligned schedule get the image vector rotated by 32 positions
    (an unrelated caption: expected cosine ~0 for unit gaussians).
    Every derived component is an integer, so both engines compute
    bit-identical dots/norms and the cross-multiplied cosine test
    never touches a float.

    Returns (vec_id, dot_q, norm_img_q, norm_cap_q, caption_rotated,
    aligned).
    """
    vid = F.col("vec_id")
    iq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _CAP_SCALE).cast("long"),
    )
    base = emb.select(vid.alias("vec_id"), iq.alias("iq"))
    sz = F.size("iq")
    rotated = F.transform(
        F.sequence(F.lit(0), sz - 1),
        lambda i: F.element_at(
            F.col("iq"), ((i + 32) % sz + 1).cast("int")
        ),
    )
    # Binary lambda ON PURPOSE: F.transform passes (element, index) —
    # the jitter needs the component index. (The r10 trap was a
    # default-arg lambda accidentally becoming binary; this one is
    # deliberate.)
    jittered = F.transform(
        F.col("iq"),
        lambda x, i: x + ((i.cast("long") + F.col("vec_id")) % 5 - 2),
    )
    misaligned = (
        F.col("vec_id") % _CAP_MISALIGNED_MOD == _CAP_MISALIGNED_RESIDUE
    )
    paired = base.select(
        "vec_id",
        "iq",
        F.when(misaligned, rotated).otherwise(jittered).alias("cq"),
        misaligned.alias("caption_rotated"),
    )

    def dot64(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    stats = paired.select(
        "vec_id",
        "caption_rotated",
        dot64(F.col("iq"), F.col("cq")).alias("dot_q"),
        dot64(F.col("iq"), F.col("iq")).alias("norm_img_q"),
        dot64(F.col("cq"), F.col("cq")).alias("norm_cap_q"),
    )
    aligned = (F.col("dot_q") > 0) & (
        _CAP_COS_DEN * F.col("dot_q") * F.col("dot_q")
        >= _CAP_COS_NUM * F.col("norm_img_q") * F.col("norm_cap_q")
    )
    return stats.select(
        "vec_id",
        "dot_q",
        "norm_img_q",
        "norm_cap_q",
        "caption_rotated",
        aligned.alias("aligned"),
    )


_CAPTION_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * {_CAP_SCALE}) AS BIGINT))
               AS iq
    FROM embeddings
),
c AS (
    SELECT vec_id, iq,
           CASE WHEN vec_id % {_CAP_MISALIGNED_MOD}
                     = {_CAP_MISALIGNED_RESIDUE}
                THEN list_transform(range(0, len(iq)),
                     i -> iq[((i + 32) % len(iq)) + 1])
                ELSE list_transform(range(0, len(iq)),
                     i -> iq[i + 1] + ((i + vec_id) % 5 - 2))
           END AS cq,
           vec_id % {_CAP_MISALIGNED_MOD} = {_CAP_MISALIGNED_RESIDUE}
               AS caption_rotated
    FROM q
),
m AS (
    SELECT vec_id, caption_rotated,
           CAST(list_sum(list_transform(range(1, len(iq) + 1),
               i -> iq[i] * cq[i])) AS BIGINT) AS dot_q,
           CAST(list_sum(list_transform(iq, x -> x * x)) AS BIGINT)
               AS norm_img_q,
           CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT)
               AS norm_cap_q
    FROM c
)
SELECT vec_id, dot_q, norm_img_q, norm_cap_q, caption_rotated,
       (dot_q > 0 AND {_CAP_COS_DEN} * dot_q * dot_q
            >= {_CAP_COS_NUM} * norm_img_q * norm_cap_q) AS aligned
FROM m
"""


@register(
    "mm_caption_alignment",
    _CAPTION_ORACLE,
    doc="Image-text alignment gate — the CLIP-score filter of "
    "LAION-style image-corpus curation (Schuhmann et al. 2021 keep "
    "pairs with CLIP cosine >= threshold): per doc, the cosine "
    "between the paired image and caption embeddings decides whether "
    "the caption describes the image. Both embeddings live in the "
    "SAME row (co-located by id), so the whole gate is one "
    "shuffle-free projection — at 100 TB the pair table streams "
    "once, no join, no state. Determinism: components quantize to "
    "floor(x*1000) integers; the caption derives from the image "
    "vector by integer jitter (aligned) or a 32-position rotation "
    "(misaligned schedule), and the threshold is the integer "
    "cross-multiplication 25*dot^2 >= 16*|i|^2*|c|^2 with dot > 0 "
    "(cos >= 0.8) — bit-identical on both engines, no float ever "
    "decides. Composes into mm_image_curation's funnel as the "
    "alignment stage.",
)
def mm_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return caption_pair_stats(emb)
