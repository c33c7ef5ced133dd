#!/usr/bin/env python
"""Bench-band regression detector (VERDICT r11 item 7).

Compares a bench result against the committed reference band
(BENCH_BAND.json: per-query idle-estimate reference = min across recent
official benches, separate headline/sf1 sections because the two run at
different scales) and flags any query slower than ``drift_ratio`` ×
its reference, printing the run's load context so contention-driven
drift (the BENCH_r03 and BENCH_r11 story) is distinguishable from code
regressions without a forensic session.

Usage:
  python tools/check_bench.py BENCH_r12.json    # a driver artifact
  python tools/check_bench.py bench_out.json    # a raw bench.py line
  python bench.py | python tools/check_bench.py -

bench.py also calls :func:`check_bench` in-process and embeds the
verdict in its JSON line as ``band_check``.
"""
from __future__ import annotations

import json
import os
import re
import sys

BAND_PATH = os.path.join(os.path.dirname(__file__), "..", "BENCH_BAND.json")


def load_band(path: str = BAND_PATH) -> dict | None:
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _drifted(measured: dict, refs: dict, ratio: float) -> dict:
    out = {}
    for name, sec in (measured or {}).items():
        ref = refs.get(name)
        if ref and sec > ratio * ref:
            out[name] = {"sec": sec, "ref": ref, "x": round(sec / ref, 2)}
    return out


def check_bench(
    headline: dict,
    sf1_queries: dict | None,
    load1: float | None,
    band: dict | None = None,
) -> dict:
    """One-line-able verdict dict: ok/drift + the offending queries.

    A contended run (load far above the core count) is labeled
    ``context: contended`` — its drift is expected and not a code
    signal; an idle run with drift is the real alarm."""
    band = band if band is not None else load_band()
    if not band:
        return {"verdict": "no-band"}
    ratio = float(band.get("drift_ratio", 1.5))
    drift = _drifted(headline, band.get("headline", {}), ratio)
    drift_sf1 = _drifted(sf1_queries or {}, band.get("sf1", {}), ratio)
    # the bench's own local[32] work puts end-of-run load1 around 10-11
    # on this box (BENCH_r09/r10); r11's co-tenant run sat at 20.5 —
    # half the core count separates the two regimes cleanly
    cpus = os.cpu_count() or 1
    contended = load1 is not None and load1 > 0.5 * cpus
    # sf1 legs are single-timed-run (vs the headline's min-of-3) and run
    # inside a 60+-leg sweep under the bench's own load, so their drift
    # is dominated by host/self-contention noise (6 spurious flags in
    # r14 alone — ADVICE r14). Report it, but only HEADLINE drift flips
    # the verdict; sf1 drift is informational.
    verdict = "ok" if not drift else "drift"
    out = {
        "verdict": verdict,
        "drift_ratio": ratio,
        "context": "contended" if contended else "idle-ish",
        "load_avg_1m": load1,
    }
    if drift:
        out["headline_drift"] = drift
    if drift_sf1:
        out["sf1_drift"] = drift_sf1
        out["sf1_drift_informational"] = True
    return out


def _parse_input(text: str) -> tuple[dict, dict, float | None]:
    """Accept either a raw bench.py JSON line or a driver BENCH_r{N}
    artifact ({n, rc, tail, parsed}); tolerate front-truncated tails
    (the r10/r11 artifacts) by regex-scraping what survives."""
    try:
        d = json.loads(text)
    except ValueError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return (
            d.get("queries", {}),
            (d.get("sf1") or {}).get("queries", {}),
            d.get("load_avg_1m"),
        )
    if isinstance(d, dict) and ("tail" in d or "parsed" in d):
        if d.get("parsed"):
            p = d["parsed"]
            return (
                p.get("queries", {}),
                (p.get("sf1") or {}).get("queries", {}),
                p.get("load_avg_1m"),
            )
        t = d.get("tail", "")
        # the headline dict is flat, so [^{}]* is exact; the old
        # `, "sf":` anchor predates the r14 key reorder (queries_run2
        # now sits between queries and sf)
        hm = re.search(r'"queries": (\{[^{}]*\})', t)
        head = json.loads(hm.group(1)) if hm else {}
        if not head:  # truncated mid-dict: scrape name/sec pairs
            # stop the scrape at queries_run2 — its keys shadow the
            # min-of-3 queries dict and a dict comprehension would keep
            # the later run-2 values (ADVICE r14)
            pre = t.split('"queries_run2":')[0].split('"sf":')[0]
            head = {
                k: float(v)
                for k, v in re.findall(r'"(\w+)": ([0-9.]+)', pre)
            }
        sm = re.search(
            r'"sf1": \{"sf": [0-9.]+, "queries": (\{.*?\}), "total"', t
        )
        sf1 = json.loads(sm.group(1)) if sm else {}
        lm = re.search(r'"load_avg_1m": ([0-9.-]+)', t)
        return head, sf1, float(lm.group(1)) if lm else None
    raise SystemExit("unrecognized input: not a bench line or artifact")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "-"
    text = (
        sys.stdin.read()
        if src == "-"
        else open(src, encoding="utf-8").read()
    )
    # whole input first (artifact files are multi-line JSON); else a
    # piped bench run may print progress lines — take the JSON line
    try:
        json.loads(text)
    except ValueError:
        for line in reversed(text.strip().splitlines()):
            if line.lstrip().startswith("{"):
                text = line
                break
    head, sf1, load1 = _parse_input(text)
    result = check_bench(head, sf1, load1)
    print(json.dumps({"band_check": result}))
    if "--strict" in sys.argv and result.get("verdict") == "drift":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
