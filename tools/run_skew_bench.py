"""Skew campaign: PageRank on a planted-hub graph, salting ON vs OFF.

Evidence for the K2 salting path (SURVEY §2.6): the sf0.1-derived scaled
graph gets a deterministic fraction of its edges redirected to ONE hub
destination (tools/scale_worker.py SCALE_HUB_FRACTION), so the hub's
in-degree is hub_fraction*E — far past the 100k salting threshold. The
same job then runs with the engine's salted two-level aggregation enabled
(threshold 100k → hub split into ~in_deg/50k buckets) and disabled
(threshold 2^62 → plain one-level groupBy), alternating reps.

Whatever the measurement shows is what gets recorded: Spark's map-side
partial aggregation already collapses per-task duplicates of a hot SUM
key, so the one-level plan may hold up on pure-sum skew; the salted path
is load-bearing where combine can't pre-reduce (top-fanout sampling,
collect-shaped gathers). The table reports both, honestly.

Usage: python tools/run_skew_bench.py [copies=128] [iters=8] [reps=3]
       [level=32] [hub_fraction=0.3]
Appends a section to BENCH/BASELINE.md, writes BENCH/skew_runs.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NO_SALT = str(1 << 62)


def run_once(level: str, copies: int, iters: int, hub: float,
             salt_threshold: str) -> dict:
    env = dict(os.environ,
               SCALE_HUB_FRACTION=str(hub),
               SCALE_SALT_THRESHOLD=salt_threshold)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_worker.py"),
         level, str(copies), str(iters)],
        capture_output=True, text=True, timeout=3600, check=True, env=env)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    args = sys.argv[1:]
    copies = int(args[0]) if len(args) > 0 else 128
    iters = int(args[1]) if len(args) > 1 else 8
    reps = int(args[2]) if len(args) > 2 else 3
    level = args[3] if len(args) > 3 else "32"
    hub = float(args[4]) if len(args) > 4 else 0.3

    modes = {"salted": "100000", "unsalted": NO_SALT}
    results: dict[str, list[dict]] = {m: [] for m in modes}
    for r in range(reps):
        for mode, thr in modes.items():
            res = run_once(level, copies, iters, hub, thr)
            results[mode].append(res)
            print(f"rep {r + 1} {mode}: median_iter={res['median_iter_sec']}s "
                  f"eps_iter={res['edges_per_sec_per_iter']:.3e}", flush=True)

    best = {m: max(v, key=lambda x: x["edges_per_sec_per_iter"])
            for m, v in results.items()}
    n_edges = best["salted"]["n_edges"]
    hub_deg = int(hub * n_edges)
    ratio = (best["salted"]["edges_per_sec_per_iter"]
             / best["unsalted"]["edges_per_sec_per_iter"])

    lines = [
        "",
        "## Skew campaign: planted hub destination, salting ON vs OFF",
        "",
        f"Input: the {n_edges:,}-edge scaled graph with hub_fraction={hub}",
        f"of edges redirected to ONE destination (in-degree ~{hub_deg:,},",
        "~3000x past the 100k salting threshold). Same pinned merge-join",
        f"plan, local[{level}], {iters} iterations, best of {reps}",
        "alternating reps.",
        "",
        "| mode | median sec/superstep | edges/sec/iteration | reps |",
        "|---|---|---|---|",
    ]
    for m in modes:
        b = best[m]
        lines.append(f"| {m} (threshold={results[m][0]['salt_threshold']}) | "
                     f"{b['median_iter_sec']} | "
                     f"{b['edges_per_sec_per_iter']:,.0f} | {len(results[m])} |")
    lines += [
        "",
        f"**salted/unsalted throughput ratio: {ratio:.2f}**",
        "",
        "All reps (edges/sec/iteration):",
        "",
    ]
    for m, v in results.items():
        vals = ", ".join(f"{r['edges_per_sec_per_iter']:,.0f}" for r in v)
        lines.append(f"- {m}: {vals}")
    lines.append("")

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    with open(os.path.join(REPO, "BENCH", "skew_runs.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"appended skew section; salted/unsalted ratio = {ratio:.3f}")


if __name__ == "__main__":
    main()
