"""A/B harness (r11, ADOPTED): text_repetition_gopher former shape (9-way
(n, gram) explode + two hash aggregates, ~22M-row shuffle at sf1) vs a
zero-shuffle per-doc variant that never leaves the JVM: per n, sort the
doc's gram array and run-length-encode it in ONE F.aggregate pass
(accumulator = (prev_gram, run_len, stat)), so gram counts never cross
rows at all. The r10 verdict suggested a mapInPandas counter; the
higher-order-function form is strictly better (no Arrow transfer, no
Python in the hot path).

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


def repetition_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle variant: per-doc sorted-run-length n-gram stats."""
    from evolution_data_warehouse_spark.operators.gopher import (
        DUP_NGRAM_MAX_PCT,
        TOP_NGRAM_MAX_PCT,
    )
    from evolution_data_warehouse_spark.queries.common import t

    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.lower(text), " ")
    sz = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def sorted_grams(n: int):
        return F.array_sort(
            F.when(
                sz >= n,
                F.transform(
                    F.sequence(F.lit(0), sz - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )

    def zero():
        return F.lit(0).cast("long")

    # Accumulator: (prev gram, current run length, stat so far). The
    # empty-string sentinel for "no previous gram" is safe because
    # every gram with n >= 2 contains at least one space. Runs flush
    # when the gram changes; finish() flushes the last run.
    def run_stats(n: int, want_top: bool):
        def charlen(prev):
            return F.length(prev).cast("long") - F.lit(n - 1)

        def flushed(acc, closing_run):
            cov = closing_run * charlen(acc["prev"])
            if want_top:
                return F.greatest(acc["stat"], cov)
            return acc["stat"] + F.when(closing_run >= 2, cov).otherwise(
                zero()
            )

        def merge(acc, x):
            same = x == acc["prev"]
            return F.struct(
                x.alias("prev"),
                F.when(same, acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.when(same, acc["stat"])
                .otherwise(flushed(acc, acc["run"]))
                .alias("stat"),
            )

        def finish(acc):
            return F.when(acc["run"] >= 1, flushed(acc, acc["run"])).otherwise(
                acc["stat"]
            )

        init = F.struct(
            F.lit("").alias("prev"),
            zero().alias("run"),
            zero().alias("stat"),
        )
        return F.aggregate(sorted_grams(n), init, merge, finish)

    stats = [
        run_stats(n, True).alias(f"top_cov_{n}")
        for n in sorted(TOP_NGRAM_MAX_PCT)
    ] + [
        run_stats(n, False).alias(f"dup_chars_{n}")
        for n in sorted(DUP_NGRAM_MAX_PCT)
    ]
    # Docs with zero grams at every n (fewer than 2 tokens) are absent
    # from the exploded shape and the oracle's inner join — match that.
    from evolution_data_warehouse_spark.queries.common import (
        cpu_repartition,
    )

    wide = (
        cpu_repartition(
            t(spark, sf_dir, "documents").select("doc_id", "text")
        )
        .where(sz >= 2)
        .select("doc_id", total_chars.alias("total_chars"), *stats)
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
    current = REGISTRY["text_repetition_gopher"].fn

    # Equivalence at sf0.01: identical rows (sorted) between shapes.
    sf001 = "/root/testdata/sf0.01"
    a = sorted(map(tuple, current(spark, sf001).collect()))
    b = sorted(map(tuple, repetition_rle(spark, sf001).collect()))
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, "variant diverges from registered query"
    print(f"equivalence at sf0.01: OK ({len(a)} rows identical)")

    if "--check-only" in sys.argv:
        return

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench/sf1")
    assert os.path.exists(f"{sf1}/_DONE"), "run bench.py once to gen sf1"
    for label, fn in (("explode+shuffle", current), ("rle-zeroshuffle",
                                                     repetition_rle)):
        fn(spark, sf1).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        fn(spark, sf1).write.mode("overwrite").format("noop").save()
        print(f"{label}: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
