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

Serve mode (interleaved per-cell pairing, VERDICT r16 item 1):
  python3 scripts/bench_duck.py sfDir oracle_sql.json outPath runs --serve
reads one query NAME per stdin line, runs that oracle ONCE, and prints
"<name>\t<seconds>" (-1 on failure/unknown) to stdout immediately — so
Bench.scala can run each query's spark and duck cells ADJACENT in one
window instead of comparing two block measurements taken minutes apart
under drifting host load. On stdin EOF it writes the per-name MIN map to
outPath in the same shape as batch mode.
"""
import json
import sys
import time

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "bench/duck_times.json"
RUNS = int(sys.argv[4]) if len(sys.argv) > 4 else 2
SERVE = "--serve" in sys.argv[5:]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect():
    import os
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # Spark-written replicas (graft.Replicate) are DIRECTORIES of
        # part files; the driver fixtures are single files. Glob the dir
        # form so 100x replica pairing works in-band.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def write_out(best, runs):
    import os
    ok = [v for v in best.values() if v >= 0]
    out = {"queries": best, "total": round(sum(ok), 3), "sf": SF_DIR,
           "runs": runs, "engine": "duckdb"}
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return out


def run_once(con, sql):
    t0 = time.monotonic()
    con.sql(sql).fetchall()
    return time.monotonic() - t0


def serve(con, oracles):
    """One request per stdin line; per-name min written to OUT at EOF."""
    best = {}
    seen_runs = {}
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        sec = -1.0
        if name in oracles:
            try:
                sec = round(run_once(con, oracles[name]), 4)
            except Exception as e:
                print(f"[duck] {name} FAILED: {e}", file=sys.stderr)
        else:
            print(f"[duck] {name}: no oracle", file=sys.stderr)
        if sec >= 0:
            # the -1 failure sentinel must never win the min: a query that
            # fails once then succeeds records the success (ADVICE r17 —
            # batch mode already mins over successful runs only)
            prev = best.get(name, -1.0)
            best[name] = sec if prev < 0 else min(prev, sec)
            seen_runs[name] = seen_runs.get(name, 0) + 1
        elif name not in best:
            best[name] = -1.0
        print(f"{name}\t{sec}", flush=True)
    runs = max(seen_runs.values()) if seen_runs else 0
    out = write_out(best, runs)
    print(json.dumps({"duck_total": out["total"], "n": len(best)}),
          file=sys.stderr)


def main():
    con = connect()
    with open(ORACLES) as f:
        oracles = json.load(f)
    if SERVE:
        serve(con, oracles)
        return
    best = {}
    for name, sql in sorted(oracles.items()):
        times = []
        for _ in range(RUNS):
            try:
                times.append(run_once(con, sql))
            except Exception as e:
                print(f"[duck] {name} FAILED: {e}", file=sys.stderr)
        best[name] = round(min(times), 4) if times else -1.0
        print(f"{name}: {best[name]}s", file=sys.stderr)
    out = write_out(best, RUNS)
    print(json.dumps({"duck_total": out["total"], "n": len(best)}))


if __name__ == "__main__":
    main()
