"""One scaling-run worker: PageRank on an expanded derived graph at a given
parallelism, fixed iteration budget. Prints one JSON line.

Usage: python tools/scale_worker.py <level> [copies=16] [iters=10] [sf_dir]
``level`` is either an integer N (-> master local[N], threads in one JVM)
or WxC (-> master local-cluster[W,C,mem], W separate executor JVMs with C
cores each and a real serialized network shuffle between them — the
closest in-sandbox analogue of N vs 4N executors).
Run in a FRESH process per parallelism level (the Spark session is
JVM-cached; the master cannot change within a process).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOD = 1 << 20


def main() -> None:
    from pyspark.sql import functions as F

    from pagerank_spark.operators.graph import build_graph
    from pagerank_spark.operators.pagerank import pagerank
    from pagerank_spark.session import get_spark

    level = sys.argv[1]
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if "x" in level:  # WxC -> W executor JVMs x C cores (multi-JVM shuffle)
        workers, cores = (int(v) for v in level.split("x"))
        cpus = workers * cores
        mem_mb = int(os.environ.get("SCALE_EXECUTOR_MEM_MB", "16384"))
        master = f"local-cluster[{workers},{cores},{mem_mb}]"
    else:
        cpus = int(level)
        master = None  # local[cpus]

    # Same PHYSICAL job at every parallelism level: pin the partition count
    # (else partial-agg output and shuffle layout differ between N and 4N
    # runs and the comparison measures different plans, not different
    # parallelism).
    parts = os.environ.get("SCALE_SHUFFLE_PARTITIONS", "64")
    spark = get_spark(f"scale_{level}", cpus=cpus, shuffle_partitions=int(parts),
                      master=master)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # deterministic x`copies` expansion of the derived link graph: each copy
    # shifts ids by coprime strides, preserving the degree structure
    edges = li.select(
        "l_partkey", "l_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k"),
    ).select(
        ((F.col("l_partkey") + F.col("k") * 131071) % MOD).alias("src"),
        ((F.col("l_orderkey") + F.col("k") * 524287) % MOD).alias("dst"),
    )
    # skew knobs (SCALE_HUB_FRACTION in [0,1]): redirect a deterministic
    # slice of edges at ONE planted hub destination, preserving edge count
    # and src structure — a power-law head vertex whose in-degree is
    # hub_fraction * E, far past any salting threshold
    hub_fraction = float(os.environ.get("SCALE_HUB_FRACTION", "0"))
    if hub_fraction > 0:
        cut = int(hub_fraction * 1_000_000)
        edges = edges.select(
            "src",
            F.when(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000)) < cut,
                   F.lit(0)).otherwise(F.col("dst")).alias("dst"))
    salt_threshold = int(os.environ.get("SCALE_SALT_THRESHOLD", "100000"))
    g = build_graph(spark, edges)

    t0 = time.monotonic()
    # pin the merge-join (at-scale) physical plan: the scaling evidence must
    # measure the strategy a 10^12-vertex run would use, not the broadcast
    # shortcut that only exists while the rank table fits on the driver
    res = pagerank(g, alpha=0.85, tol=None, max_iter=iters, join_strategy="merge",
                   salt_hot_threshold=salt_threshold)
    res.ranks.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0

    # steady-state: median per-iteration wall from the metrics table,
    # skipping the first two supersteps (codegen + AQE warmup)
    walls = sorted(m["wall_ms"] for m in res.metrics[2:]) or [dt * 1000 / iters]
    med_ms = walls[len(walls) // 2]

    print(json.dumps({
        "level": level,
        "master": master or f"local[{cpus}]",
        "cpus": cpus,
        "n_edges": g.n_edges,
        "n_vertices": g.n_vertices,
        "iterations": res.iterations,
        "sec_total": round(dt, 2),
        "sec_per_iter": round(dt / res.iterations, 3),
        "median_iter_sec": round(med_ms / 1000, 3),
        "edges_per_sec_per_iter": round(g.n_edges / (med_ms / 1000), 1),
        "hub_fraction": hub_fraction,
        "salt_threshold": salt_threshold,
    }))


if __name__ == "__main__":
    main()
