"""Regenerate the COVERAGE.md evidence ledger from CORRECTNESS_r*.json.

Latest driver verdict per registry query, in registry order. Rewrites
everything in COVERAGE.md from the ledger table header to EOF, plus the
pass/err/never-verified summary line.

Usage: python tools/gen_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from evolution_data_warehouse_spark.queries import REGISTRY

    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            ok = (
                rec.get("err") is None
                and rec.get("rows_match")
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            # keep the highest round, not file order (lexicographic
            # glob order breaks at r10 vs r2 / r100 vs r99)
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, bool(ok))

    rows = []
    n_pass = n_err = n_never = 0
    for name, q in REGISTRY.items():
        check = "oracle" if q.oracle is not None else "rows-only"
        if name in latest:
            rnd, ok = latest[name]
            verdict, rtag = ("pass" if ok else "FAIL"), f"r{rnd}"
            n_pass += ok
            n_err += not ok
        else:
            verdict, rtag = "never in window", "—"
            n_never += 1
        rows.append(f"| {name} | {check} | {verdict} | {rtag} |")

    summary = (
        f"**{n_pass} pass / {n_err} err / {n_never} never-verified "
        f"of {len(REGISTRY)} registry queries.**"
    )
    table = (
        "| query | check | latest verdict | round |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )

    cov_path = f"{REPO}/COVERAGE.md"
    with open(cov_path) as f:
        text = f.read()
    text = re.sub(r"\*\*\d+ pass / \d+ err / \d+ never-verified[^*]*\*\*", summary, text)
    head = text[: text.index("| query | check | latest verdict | round |")]
    with open(cov_path, "w") as f:
        f.write(head + table)
    print(summary)


if __name__ == "__main__":
    main()
