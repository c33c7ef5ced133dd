"""Driver-sim: verify every registry query against its DuckDB oracle.

Mimics the round driver's verification pass: a *vanilla* SparkSession
(no repo-side session tuning — queries must set any knob they need at
runtime, see queries/common.py::t), DuckDB views over the same parquet
tables, then per-query row-count + schema-arity + order-insensitive
value-hash comparison with columns sorted by name.

Usage:
    python tools/drive_contract.py                 # all queries, sf0.01
    python tools/drive_contract.py name1 name2 ... # subset
    python tools/drive_contract.py --out LOCAL_CONTRACT_r06.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/drive_contract.py

`--out PATH` additionally writes the per-query result JSON to PATH —
the committed full-registry evidence artifact (LOCAL_CONTRACT_r{N}.json)
each round, since the official driver window covers only 50 entries.

Exit code 0 iff every checked query matches (rows-only for queries
without an oracle).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _canon(v):
    """Canonicalize one cell so Spark and DuckDB values hash alike."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(f)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    return str(v)


def _hash_rows(cols: list[str], rows) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(lines), h


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)

    # 32 shuffle partitions for speed by default; SPARK_GRAFT_SHUFFLE=200
    # runs the truly-vanilla partitioning to prove the determinism rules
    # are partition-count-independent (the r5/r6 spot-check procedure).
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.driver.memory", "16g")
        .appName("drive-contract")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{sf_dir}/{tbl}.parquet"
        if os.path.isdir(path):  # Spark-written dir (e.g. .bench/sf1)
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')"
        )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2

    # the driver also smoke-checks entry(spark): must run and return rows
    entry_df = entrymod.entry(spark)
    n_entry = entry_df.count()
    print(f"entry() smoke: {n_entry} rows, schema {len(entry_df.columns)} cols")
    if n_entry <= 0:
        print("entry() returned no rows", file=sys.stderr)
        return 2

    results: dict[str, dict] = {}
    fails = []
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            rec["spark_rows"] = len(srows)
            if name in oracles:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                _, sh = _hash_rows(scols, srows)
                _, oh = _hash_rows(ocols, orows)
                rec["hash_match"] = sh == oh
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                if not ok and not rec["schema_match"]:
                    rec["spark_cols"] = sorted(scols)
                    rec["oracle_cols"] = sorted(ocols)
            else:
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = True
                rec["rows_only"] = True
                ok = True
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
            ok = False
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:32s} {rec['sec']:6.2f}s", flush=True)
        if not ok:
            fails.append(name)

    print(f"\n{len(results) - len(fails)}/{len(results)} pass "
          f"in {time.time() - t_start:.0f}s; fails: {fails}")
    with open("/tmp/drive_contract_results.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": len(results) - len(fails),
                    "n_total": len(results),
                    "fails": fails,
                    "results": results,
                },
                f,
                indent=1,
                default=str,
            )
        print(f"wrote {out_path}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
