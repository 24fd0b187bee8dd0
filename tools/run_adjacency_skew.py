"""Skew campaign #3: adjacency_index on a planted hub SRC, degree-adaptive
banded prefix sum (hot srcs only) vs the single-window plan.

The prefix-sum window is the gather Spark CANNOT rescue with
InferWindowGroupLimit (campaign #2): every output row keeps a running
sum, so there is no top-k to push below the exchange — unbanded, ONE
window task sorts and scans the hub's whole adjacency. Banding EVERY src
was measured 2.4x SLOWER than the single window (the band-total/offset
exchanges touch the full table), so adjacency_index routes per src: only
srcs past ``hot_threshold`` distinct neighbors take the banded two-level
path; the rest keep the one-exchange single window. Output is invariant
to both knobs (invariance pytest).

Usage: python tools/run_adjacency_skew.py [copies=32] [pct=50] [reps=3]
       [level=32]
Appends a section to BENCH/BASELINE.md, writes BENCH/adjacency_skew.json.
Worker mode (internal): ... --worker <hot_threshold>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOD = 1 << 20


def worker(level: str, copies: int, pct: int, hot_threshold: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from pagerank_spark.operators.walks import adjacency_index
    from pagerank_spark.session import get_spark

    spark = get_spark(f"adjskew_{hot_threshold}", cpus=int(level),
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
        # per-copy-unique dst: the hub keeps a multi-million-row adjacency
        (F.col("l_orderkey") * copies + F.col("k")).alias("dst"),
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    hub_deg = edges.filter(F.col("src") == 0).count()

    t0 = time.monotonic()
    idx = adjacency_index(edges, hot_threshold=hot_threshold)
    idx.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(json.dumps({
        "hot_threshold": hot_threshold, "n_edges": n_edges,
        "hub_out_degree": hub_deg, "sec": round(dt, 3),
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

    modes = {"adaptive": 100_000, "single_window": 1 << 62}
    results: dict[str, list[dict]] = {m: [] for m in modes}
    for r in range(reps):
        for mode, thr in modes.items():
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 level, str(copies), str(pct), "--worker", str(thr)],
                capture_output=True, text=True, timeout=3600, check=True)
            res = json.loads(out.stdout.strip().splitlines()[-1])
            results[mode].append(res)
            print(f"rep {r + 1} {mode}: {res['sec']}s "
                  f"(hub_deg={res['hub_out_degree']:,})", flush=True)

    best = {m: min(v, key=lambda x: x["sec"]) for m, v in results.items()}
    ban, single = best["adaptive"], best["single_window"]
    speedup = single["sec"] / ban["sec"]
    lines = [
        "",
        "## Skew campaign #3: adjacency_index on the planted hub src,",
        "## degree-adaptive banded prefix sum vs single window",
        "",
        f"Input: {ban['n_edges']:,} edges, hub out-degree "
        f"{ban['hub_out_degree']:,}; full index build (count+prefix sum+",
        f"unroll) timed end to end, local[{level}], best of {reps}",
        "alternating fresh-JVM reps. Adaptive = only srcs past the hot",
        "threshold take the banded two-level path (the K2 small/large",
        "split); cold srcs keep the one-exchange single window.",
        "",
        "| plan | best sec | all reps (sec) |",
        "|---|---|---|",
    ]
    for m, thr in modes.items():
        allr = ", ".join(str(r["sec"]) for r in results[m])
        lines.append(
            f"| {m} (hot_threshold={thr}) | {best[m]['sec']} | {allr} |")
    lines += ["",
              f"**adaptive speedup on the hub prefix sum: {speedup:.2f}x**",
              ""]

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    with open(os.path.join(REPO, "BENCH", "adjacency_skew.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"appended adjacency-skew section; adaptive speedup = {speedup:.3f}x")


if __name__ == "__main__":
    main()
