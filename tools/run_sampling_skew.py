"""Skew campaign #2: top-fanout neighbor sampling over a planted hub SRC,
two-level salting ON (n_salts=32) vs OFF (n_salts=1).

This is the gather shape where salting is load-bearing: the per-src
top-fanout rank is NOT combinable, so map-side partial aggregation cannot
pre-reduce a hub's adjacency the way it does for PageRank's per-dst SUM
(see the first skew campaign in BENCH/BASELINE.md). Unsalted, ONE window
task sorts the hub's entire adjacency; salted, n_salts tasks each rank a
hash slice and the exact final rank sees <= n_salts * fanout survivors.
Output is invariant to n_salts (invariance-tested in test_sampling.py) —
this campaign measures only the physical plan difference.

Input: lineitem x copies with a deterministic ``pct``% of edges re-pointed
at src=0 (the hub) and per-copy-unique dsts, so the hub's out-degree
survives the operator's internal distinct(). Seeds = the hub + 7 normal
vertices, fanout 16.

Usage: python tools/run_sampling_skew.py [copies=32] [pct=50] [reps=3]
       [level=32]
Appends a section to BENCH/BASELINE.md, writes BENCH/sampling_skew.json.
Worker mode (internal): ... --worker <n_salts>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FANOUT = 16
MOD = 1 << 20


def worker(level: str, copies: int, pct: int, n_salts: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pagerank_spark.operators.sampling import sample_neighbors
    from pagerank_spark.session import get_spark

    spark = get_spark(f"sampskew_{n_salts}", cpus=int(level),
                      shuffle_partitions=64)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        "l_partkey", "l_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k"),
    ).select(
        F.when(F.pmod(F.xxhash64("l_partkey", "l_orderkey", "k"),
                      F.lit(100)) < pct, F.lit(0))
        .otherwise((F.col("l_partkey") + F.col("k") * 131071) % MOD)
        .alias("src"),
        # per-copy-unique dst: the hub's adjacency survives distinct()
        (F.col("l_orderkey") * copies + F.col("k")).alias("dst"),
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    hub_deg = edges.filter(F.col("src") == 0).count()
    seeds = spark.createDataFrame([(i,) for i in range(8)], "id long")

    t0 = time.monotonic()
    # dsts are per-copy-unique so rows are already distinct: skip the O(E)
    # dedup shuffle and time the gather itself (join + two-level rank)
    out = sample_neighbors(edges, seeds, [FANOUT], n_salts=n_salts,
                           assume_distinct=True)
    rows = out.count()
    dt = time.monotonic() - t0
    print(json.dumps({
        "n_salts": n_salts, "n_edges": n_edges, "hub_out_degree": hub_deg,
        "sampled_rows": rows, "sec": round(dt, 3),
    }))


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        level, copies, pct = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
        worker(level, copies, pct, int(sys.argv[i + 1]))
        return

    args = sys.argv[1:]
    copies = int(args[0]) if len(args) > 0 else 32
    pct = int(args[1]) if len(args) > 1 else 50
    reps = int(args[2]) if len(args) > 2 else 3
    level = args[3] if len(args) > 3 else "32"

    modes = {"salted": 32, "unsalted": 1}
    results: dict[str, list[dict]] = {m: [] for m in modes}
    for r in range(reps):
        for mode, ns in modes.items():
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 level, str(copies), str(pct), "--worker", str(ns)],
                capture_output=True, text=True, timeout=3600, check=True)
            res = json.loads(out.stdout.strip().splitlines()[-1])
            results[mode].append(res)
            print(f"rep {r + 1} {mode}: {res['sec']}s "
                  f"(hub_deg={res['hub_out_degree']:,})", flush=True)

    best = {m: min(v, key=lambda x: x["sec"]) for m, v in results.items()}
    sal, uns = best["salted"], best["unsalted"]
    speedup = uns["sec"] / sal["sec"]
    lines = [
        "",
        "## Skew campaign #2: top-fanout sampling on a planted hub src,",
        "## two-level salting ON vs OFF",
        "",
        f"Input: {sal['n_edges']:,} edges, hub out-degree "
        f"{sal['hub_out_degree']:,} (per-copy-unique dsts), seeds = hub + 7",
        f"normal vertices, fanout {FANOUT}, local[{level}], best of {reps}",
        "alternating fresh-JVM reps. The per-src top-fanout rank is not",
        "combinable, so this is the gather where the K2 salting discipline",
        "(SURVEY §2.6) is load-bearing: unsalted = ONE window task sorts the",
        "hub's whole adjacency; salted = 32 partial slices + exact final",
        "rank over <= 32*fanout survivors. Output identical in both modes.",
        "",
        "| mode | best sec | all reps (sec) |",
        "|---|---|---|",
    ]
    for m, ns in modes.items():
        allr = ", ".join(str(r["sec"]) for r in results[m])
        lines.append(f"| {m} (n_salts={ns}) | {best[m]['sec']} | {allr} |")
    lines += ["", f"**salted speedup on the hub gather: {speedup:.2f}x**", ""]

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    with open(os.path.join(REPO, "BENCH", "sampling_skew.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"appended sampling-skew section; salted speedup = {speedup:.3f}x")


if __name__ == "__main__":
    main()
