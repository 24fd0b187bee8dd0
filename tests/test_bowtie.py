from __future__ import annotations

from pagerank_spark.operators.bowtie import (bowtie_decomposition,
                                             bowtie_sizes)

# canonical Broder bow-tie: core cycle {0,1,2}; IN chain 4->3->core;
# OUT chain core->5->6; TUBE 3->7->5 (bypasses the core); TENDRIL 8
# (forward of IN), 9 (backward of OUT); DISCONNECTED 2-cycle {10,11}
BOWTIE_EDGES = [
    (0, 1), (1, 2), (2, 0),
    (3, 0), (4, 3),
    (2, 5), (5, 6),
    (3, 7), (7, 5),
    (4, 8), (9, 6),
    (10, 11), (11, 10),
]
EXPECTED = {
    0: "CORE", 1: "CORE", 2: "CORE",
    3: "IN", 4: "IN",
    5: "OUT", 6: "OUT",
    7: "TUBE",
    8: "TENDRIL", 9: "TENDRIL",
    10: "DISCONNECTED", 11: "DISCONNECTED",
}


def test_bowtie_canonical(spark):
    df = spark.createDataFrame(BOWTIE_EDGES, "src long, dst long")
    res = bowtie_decomposition(df)
    assert res.converged
    assert res.core_label == 0 and res.core_size == 3
    got = {r.id: r.region for r in res.regions.collect()}
    assert got == EXPECTED
    sizes = {r.region: r.n for r in bowtie_sizes(res).collect()}
    assert sizes == {"CORE": 3, "IN": 2, "OUT": 2, "TUBE": 1,
                     "TENDRIL": 2, "DISCONNECTED": 2}


def test_bowtie_pure_cycle_all_core(spark):
    """Single cycle: everything CORE; the IN/OUT-seeded sweeps start from
    empty frontiers and must exhaust cleanly."""
    n = 7
    df = spark.createDataFrame([(i, (i + 1) % n) for i in range(n)],
                               "src long, dst long")
    res = bowtie_decomposition(df)
    assert res.converged
    got = {r.id: r.region for r in res.regions.collect()}
    assert got == {i: "CORE" for i in range(n)}


def test_bowtie_universe_isolated(spark):
    """Universe-only vertices (no edges at all) land in DISCONNECTED."""
    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    res = bowtie_decomposition(df, universe=spark.range(4))
    got = {r.id: r.region for r in res.regions.collect()}
    assert got == {0: "CORE", 1: "CORE",
                   2: "DISCONNECTED", 3: "DISCONNECTED"}


def test_bowtie_deterministic(spark):
    df = spark.createDataFrame(BOWTIE_EDGES, "src long, dst long")
    a = {(r.id, r.region) for r in bowtie_decomposition(df).regions.collect()}
    b = {(r.id, r.region) for r in bowtie_decomposition(df).regions.collect()}
    assert a == b


def test_bowtie_plan_is_window_free_jvm_only(spark):
    """Region pick is a union+groupBy+left-join — no Window, no per-row
    Python anywhere in the assembled plan."""
    from pagerank_spark.plans.inspect import python_nodes, simple_plan
    df = spark.createDataFrame(BOWTIE_EDGES, "src long, dst long")
    res = bowtie_decomposition(df)
    assert python_nodes(res.regions) == []
    assert "Window" not in simple_plan(res.regions)


def _py_bowtie(edges, n):
    """Pure-Python oracle: closures by BFS, regions per Broder definitions."""
    from collections import defaultdict
    fwd, bwd = defaultdict(set), defaultdict(set)
    for s, d in edges:
        if s != d:
            fwd[s].add(d)
            bwd[d].add(s)

    def reach(srcs, adj):
        seen, stack = set(srcs), list(srcs)
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        return seen

    # SCCs via double reachability (fine at test size)
    sccs = {}
    for v in range(n):
        mutual = reach([v], fwd) & reach([v], bwd)
        sccs[v] = min(mutual)
    sizes = defaultdict(int)
    for lab in sccs.values():
        sizes[lab] += 1
    core_lab = min(sorted(sizes, key=lambda l: (-sizes[l], l))[:1])
    core = {v for v, l in sccs.items() if l == core_lab}
    f, b = reach(core, fwd), reach(core, bwd)
    outs, ins = f - core, b - core
    fin, bout = reach(ins, fwd), reach(outs, bwd)
    regions = {}
    for v in range(n):
        if v in core:
            regions[v] = "CORE"
        elif v in ins:
            regions[v] = "IN"
        elif v in outs:
            regions[v] = "OUT"
        elif v in fin and v in bout:
            regions[v] = "TUBE"
        elif v in fin or v in bout:
            regions[v] = "TENDRIL"
        else:
            regions[v] = "DISCONNECTED"
    return core_lab, len(core), regions


def test_bowtie_matches_python_oracle_random(spark):
    import numpy as np
    # denser graph: few condensation layers, so the SCC peel
    # (documented O(chain) worst case) stays to a few rounds; one random
    # instance — the canonical/cycle/deterministic tests cover the other
    # shapes, and a second seed re-runs the same ~5 fixpoints for ~17s
    for seed, n, m in [(2, 30, 90)]:
        rng = np.random.default_rng(seed)
        edges = list({(int(a), int(b)) for a, b in
                      zip(rng.integers(0, n, m), rng.integers(0, n, m))})
        df = spark.createDataFrame(edges, "src long, dst long")
        res = bowtie_decomposition(df, universe=spark.range(n))
        assert res.converged, seed
        lab, size, want = _py_bowtie(edges, n)
        assert (res.core_label, res.core_size) == (lab, size), seed
        got = {r.id: r.region for r in res.regions.collect()}
        assert got == want, seed
