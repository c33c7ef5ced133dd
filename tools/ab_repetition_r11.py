"""A/B harness (r11, ADOPTED): text_repetition_gopher former shape (9-way
(n, gram) explode + two hash aggregates, ~22M-row shuffle at sf1) vs a
zero-shuffle per-doc variant that never leaves the JVM: per n, sort the
doc's gram array and run-length-encode it in ONE F.aggregate pass
(accumulator = (prev_gram, run_len, stat)), so gram counts never cross
rows at all. The r10 verdict suggested a mapInPandas counter; the
higher-order-function form is strictly better (no Arrow transfer, no
Python in the hot path).

The RLE arm is the REGISTERED query (adopted in d6d552b); the
explode arm is the pre-adoption implementation kept verbatim below.

Usage: python tools/ab_repetition_r11.py [--check-only]
  --check-only: equivalence check at sf0.01 only (no sf1 timing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def repetition_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORICAL baseline (pre-d6d552b registered implementation):
    9-way (n, gram) explode + two hash aggregates — kept verbatim so
    the 75.8s-vs-14.8s A/B stays reproducible after the registered
    query adopted the RLE shape (review finding: comparing the
    registered fn against repetition_rle had become RLE-vs-RLE)."""
    from evolution_data_warehouse_spark.operators.gopher import (
        DUP_NGRAM_MAX_PCT,
        TOP_NGRAM_MAX_PCT,
    )

    from evolution_data_warehouse_spark.queries.common import t

    ns = sorted(TOP_NGRAM_MAX_PCT) + sorted(DUP_NGRAM_MAX_PCT)
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.lower(text), " ")
    sz = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    gram_struct = "array<struct<n:int,gram:string>>"

    def gram_array(n: int):
        # NOTE: the index must bind via this closure, NOT a lambda
        # default arg — `lambda i, n=n:` is a BINARY lambda, which
        # Spark's transform() calls as (element, array_index), silently
        # rebinding n to the position column.
        # The gram ships as its STRING — an md5-hashed 8-byte group key
        # was A/B-measured 75% SLOWER at sf1 (22M md5 computations
        # dominate what the narrower shuffle saves; string keys
        # combine map-side just as well).
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", F.slice(toks, i + 1, n)).alias(
                        "gram"
                    ),
                ),
            ),
        ).otherwise(F.array().cast(gram_struct))

    per_n_arrays = [gram_array(n) for n in ns]
    exploded = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            total_chars.alias("total_chars"),
            F.explode(F.flatten(F.array(*per_n_arrays))).alias("g"),
        )
        .select(
            "doc_id", "total_chars", F.col("g.n").alias("n"),
            F.col("g.gram").alias("gram"),
        )
    )
    counted = exploded.groupBy("doc_id", "total_chars", "n", "gram").agg(
        F.count("*").alias("c")
    )
    charlen = F.length("gram").cast("long") - (F.col("n") - 1)
    per_n = counted.groupBy("doc_id", "total_chars", "n").agg(
        F.max(F.col("c") * charlen).alias("top_cov"),
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * charlen).otherwise(0)
        ).alias("dup_chars"),
    )
    top_aggs = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, F.col("top_cov"))), F.lit(0)
        )
        .cast("bigint")
        .alias(f"top_cov_{n}")
        for n in sorted(TOP_NGRAM_MAX_PCT)
    ]
    dup_aggs = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, F.col("dup_chars"))), F.lit(0)
        )
        .cast("bigint")
        .alias(f"dup_chars_{n}")
        for n in sorted(DUP_NGRAM_MAX_PCT)
    ]
    wide = per_n.groupBy("doc_id", "total_chars").agg(
        *top_aggs, *dup_aggs
    )
    flags = [
        (100 * F.col(f"top_cov_{n}") <= pct * F.col("total_chars")).alias(
            f"r_top_{n}"
        )
        for n, pct in sorted(TOP_NGRAM_MAX_PCT.items())
    ] + [
        (
            100 * F.col(f"dup_chars_{n}") <= pct * F.col("total_chars")
        ).alias(f"r_dup_{n}")
        for n, pct in sorted(DUP_NGRAM_MAX_PCT.items())
    ]
    verdict = None
    for c in flags:
        verdict = c if verdict is None else verdict & c
    return wide.select(
        "doc_id",
        "total_chars",
        *[f"top_cov_{n}" for n in sorted(TOP_NGRAM_MAX_PCT)],
        *[f"dup_chars_{n}" for n in sorted(DUP_NGRAM_MAX_PCT)],
        *flags,
        verdict.alias("repetition_pass"),
    )


def main() -> None:
    from evolution_data_warehouse_spark.queries import REGISTRY
    from evolution_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="ab_repetition_r11")
    registered = REGISTRY["text_repetition_gopher"].fn  # RLE since d6d552b

    # Equivalence at sf0.01: identical rows (sorted) between shapes.
    sf001 = "/root/testdata/sf0.01"
    a = sorted(map(tuple, repetition_explode(spark, sf001).collect()))
    b = sorted(map(tuple, registered(spark, sf001).collect()))
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, "variant diverges from registered query"
    print(f"equivalence at sf0.01: OK ({len(a)} rows identical)")

    if "--check-only" in sys.argv:
        return

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench/sf1")
    assert os.path.exists(f"{sf1}/_DONE"), "run bench.py once to gen sf1"
    for label, fn in (("explode+shuffle", repetition_explode),
                      ("rle-zeroshuffle", registered)):
        fn(spark, sf1).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        fn(spark, sf1).write.mode("overwrite").format("noop").save()
        print(f"{label}: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
