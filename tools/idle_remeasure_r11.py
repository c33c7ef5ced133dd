"""Idle re-measure protocol (r11 start) for the 4 sf1 legs that drifted
in the r10 in-sweep bench: mm_video_frames (graded weak), sim_semantic_dedup,
text_lm_score, dedup_substring_spans. Same steady-state methodology as
bench.py::_sf1_timings: tuned session, one untimed warm-up, one timed run,
against /root/repo/.bench/sf1. Results go to BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

LEGS = sys.argv[1:] or [
    "mm_video_frames",
    "sim_semantic_dedup",
    "text_lm_score",
    "dedup_substring_spans",
]


def main() -> None:
    from evolution_data_warehouse_spark.session import get_spark
    from evolution_data_warehouse_spark.queries import REGISTRY

    spark = get_spark(app_name="idle_remeasure_r11")
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench/sf1")
    assert os.path.exists(f"{sf1_dir}/_DONE"), "run bench.py once to gen sf1"
    load1 = os.getloadavg()[0]
    print(f"load1 at start: {load1:.2f}")
    for name in LEGS:
        fn = REGISTRY[name].fn
        fn(spark, sf1_dir).write.mode("overwrite").format("noop").save()
        t0 = time.time()
        fn(spark, sf1_dir).write.mode("overwrite").format("noop").save()
        print(f"{name}: {time.time() - t0:.2f}s")
    print(f"load1 at end: {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
