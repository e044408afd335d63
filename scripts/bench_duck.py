#!/usr/bin/env python3
"""Dev-only DuckDB-side bench: times each oracle SQL statement from a prior
`graft.Verify` dump against the same parquet fixtures, best-of-N, and writes
a JSON map Bench.scala merges into its output line — so BENCH_r{N}.json
carries BOTH engines' per-query times and the 2x-gate is machine-checkable
per query (VERDICT round-3 task 2).

NOT part of the engine (the Scala library has zero Python deps) — DuckDB is
a driver-side oracle tool only.

Usage: python3 scripts/bench_duck.py [sfDir] [oracle_sql.json] [outPath] [runs]
Defaults: /root/testdata/sf0.1  /tmp/verify_out/oracle_sql.json
          bench/duck_times.json  2
"""
import json
import sys
import time

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "bench/duck_times.json"
RUNS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # Spark-written replicas (graft.Replicate) are DIRECTORIES of
        # part files; the driver fixtures are single files. Glob the dir
        # form so 100x replica pairing works in-band.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(ORACLES) as f:
        oracles = json.load(f)
    best = {}
    for name, sql in sorted(oracles.items()):
        times = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
                times.append(time.monotonic() - t0)
            except Exception as e:
                print(f"[duck] {name} FAILED: {e}", file=sys.stderr)
        best[name] = round(min(times), 4) if times else -1.0
        print(f"{name}: {best[name]}s", file=sys.stderr)
    ok = [v for v in best.values() if v >= 0]
    out = {"queries": best, "total": round(sum(ok), 3), "sf": SF_DIR,
           "runs": RUNS, "engine": "duckdb"}
    import os
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"duck_total": out["total"], "n": len(best)}))


if __name__ == "__main__":
    main()
