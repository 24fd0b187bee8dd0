#!/usr/bin/env python
"""File-sharded parallel pytest runner: the <12-minute feedback loop.

``python -m pytest tests/ -x -q`` is latency-bound on this host — a bare
1-task Spark job costs ~160 ms fixed (JVM-side scheduling; measured with
py4j round-trips at 0.3 ms and Python thread wake-ups at 62 us, so it is
not IPC and not the kernel), and the suite is thousands of tiny jobs on
one session. pytest-xdist is not installed (and the environment is
pip-frozen), so this runner shards test FILES across K independent
pytest processes, each with its own JVM/session — the per-job latency is
paid K ways in parallel.

Workers pull files from a shared queue, heaviest-first (greedy LPT), so
exact weights barely matter; weights below are measured per-file walls
from a full profiled run and only set the pull order. Unknown files get
a mid-tail default.

Usage: python tools/partest.py [-n WORKERS] [pytest args...]
Exit code: 0 iff every shard passed. Prints per-shard tails + total wall.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading
import time
from queue import Queue

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

# measured file walls (seconds) from a clean profiled full run; pull-order
# hints only — workers rebalance dynamically
WEIGHTS = {
    "test_neighborhood.py": 95, "test_sources_cli.py": 90,
    "test_pagerank.py": 75, "test_properties.py": 65,
    "test_ppr_push.py": 55, "test_pagerank_variants.py": 55,
    "test_graph_algos.py": 55, "test_ingest_stream.py": 50,
    "test_walks.py": 45, "test_bowtie.py": 40, "test_scc.py": 38,
    "test_webgraph_ops.py": 38, "test_packaging.py": 36,
    "test_dedup.py": 35, "test_centrality.py": 35,
    "test_sssp.py": 25, "test_streaming.py": 25,
    "test_betweenness.py": 22, "test_katz_redirects.py": 20,
    "test_textops.py": 20, "test_splits.py": 18, "test_graph.py": 15,
}
DEFAULT_WEIGHT = 12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int,
                    default=min(6, max(2, (os.cpu_count() or 8) // 5)))
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    files = sorted((f for f in os.listdir(TESTS)
                    if f.startswith("test_") and f.endswith(".py")),
                   key=lambda f: -WEIGHTS.get(f, DEFAULT_WEIGHT))
    q: Queue[str] = Queue()
    for f in files:
        q.put(f)

    results: dict[str, tuple[int, str]] = {}
    lock = threading.Lock()

    def worker(wid: int) -> None:
        env = dict(os.environ)
        # each shard gets its own warehouse/derby dir to avoid metastore
        # lock collisions between concurrent sessions
        env["SPARK_GRAFT_TEST_TMP"] = f"/tmp/partest-{os.getpid()}-{wid}"
        while True:
            try:
                f = q.get_nowait()
            except Exception:
                return
            t0 = time.monotonic()
            p = subprocess.run(
                [sys.executable, "-m", "pytest", os.path.join(TESTS, f),
                 "-q", "-p", "no:cacheprovider", *args.pytest_args],
                capture_output=True, text=True, cwd=REPO, env=env)
            dt = time.monotonic() - t0
            tail = (p.stdout or "").strip().splitlines()
            tail = tail[-1] if tail else (p.stderr or "")[-200:]
            with lock:
                results[f] = (p.returncode, tail)
                print(f"[w{wid}] {f}: rc={p.returncode} {dt:.1f}s  {tail}",
                      flush=True)

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(args.workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    # pytest rc 5 = no tests collected (an empty shard is not a failure)
    failed = [f for f, (rc, _) in results.items() if rc not in (0, 5)]
    print(f"\npartest: {len(results)} files, {args.workers} workers, "
          f"wall {wall:.1f}s, failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
