#!/usr/bin/env python
"""Measure PQ vs OPQ ADC-shortlist recall at equal code budget.

The registry entry sim_pq_opq_recall oracle-checks the MACHINERY on
one pinned query; this tool measures the METRIC on a proper query
sample (n=64 seeded Gaussian queries, the table's own generating
distribution), using the exact same integer pipeline as the engine
(shared operator functions), so the SCALE.md numbers are the numbers
the engine would produce.

Usage: python tools/eval_opq_recall.py [sf_dir]
"""
from __future__ import annotations

import sys

import duckdb
import numpy as np

from evolution_data_warehouse_spark.operators.similarity import (
    OPQ_R_SCALE,
    PQ_SCALE,
    opq_quantize_rotation,
    pq_quantize_codebooks,
)
from evolution_data_warehouse_spark.queries.opq_model import (
    OPQ_BOOKS,
    OPQ_R,
)
from evolution_data_warehouse_spark.queries.pq_codebooks import PQ_BOOKS

N_QUERIES, TRUTH_K, SHORTLIST = 64, 10, 50
M, DSUB = 8, 8


def codes_and_luts(V: np.ndarray, queries: np.ndarray):
    vq = np.floor(V * PQ_SCALE).astype(np.int64)
    qq = np.round(queries * PQ_SCALE).astype(np.int64)

    def assign(Z: np.ndarray, books) -> np.ndarray:
        qb = np.array(pq_quantize_codebooks(books), dtype=np.int64)
        codes = np.empty((len(Z), M), dtype=np.int64)
        for j in range(M):
            sub = Z[:, j * DSUB : (j + 1) * DSUB]
            d = ((sub[:, None, :] - qb[j][None]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return codes

    def adc(codesM: np.ndarray, books, QZ: np.ndarray) -> np.ndarray:
        qb = np.array(pq_quantize_codebooks(books), dtype=np.int64)
        out = np.zeros((len(QZ), len(codesM)), dtype=np.int64)
        for j in range(M):
            # lut: n_queries × k
            lut = (
                (QZ[:, None, j * DSUB : (j + 1) * DSUB] - qb[j][None])
                ** 2
            ).sum(axis=2)
            out += lut[:, codesM[:, j]]
        return out

    R = np.array(opq_quantize_rotation(OPQ_R), dtype=np.int64)
    zv = (vq @ R.T) // OPQ_R_SCALE
    zq = (qq @ R.T) // OPQ_R_SCALE
    pq_codes = assign(vq, PQ_BOOKS)
    opq_codes = assign(zv, OPQ_BOOKS)
    return (
        adc(pq_codes, PQ_BOOKS, qq),
        adc(opq_codes, OPQ_BOOKS, zq),
        vq,
        qq,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    V = np.array(
        [
            e[0]
            for e in duckdb.sql(
                f"select embedding from '{sf_dir}/embeddings.parquet' "
                "order by vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    rng = np.random.default_rng(4242)
    queries = rng.normal(0, 0.125, (N_QUERIES, V.shape[1]))
    pq_adc, opq_adc, vq, qq = codes_and_luts(V, queries)
    exact = ((vq[None] - qq[:, None, :]) ** 2).sum(axis=2)
    rec = {"pq": [], "opq": []}
    for qi in range(N_QUERIES):
        truth = set(np.argsort(exact[qi], kind="stable")[:TRUTH_K])
        for name, a in (("pq", pq_adc), ("opq", opq_adc)):
            sl = set(np.argsort(a[qi], kind="stable")[:SHORTLIST])
            rec[name].append(len(truth & sl) / TRUTH_K)
    print(
        f"{sf_dir}: n_queries={N_QUERIES} truth_k={TRUTH_K} "
        f"shortlist={SHORTLIST}"
    )
    for name in ("pq", "opq"):
        r = np.array(rec[name])
        print(
            f"  {name:4s} recall@{TRUTH_K}: mean={r.mean():.3f} "
            f"median={np.median(r):.3f} min={r.min():.2f} "
            f"max={r.max():.2f}"
        )


if __name__ == "__main__":
    main()
