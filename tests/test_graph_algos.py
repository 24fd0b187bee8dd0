"""Connected components, label propagation, triangle counting vs exact oracles."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.functions.hashing import mix2
from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.labelprop import label_propagation
from pagerank_spark.operators.triangles import triangle_count, triangles_per_vertex
from pagerank_spark.oracle import components_oracle, label_prop_oracle, triangles_oracle
from pagerank_spark.sources import synth


def _random_edges(n: int, m: int, seed_tag: int) -> list[tuple[int, int]]:
    ids = np.arange(m, dtype=np.uint64)
    src = mix2(ids, seed_tag) % np.uint64(n)
    dst = mix2(ids, seed_tag ^ 0xBEEF) % np.uint64(n)
    return [(int(s), int(d)) for s, d in zip(src, dst)]


@pytest.fixture(scope="module")
def f7(spark):
    return synth.components_fixture_edges(spark)


def test_components_f7_exact(spark, f7):
    res = connected_components(f7, universe=spark.range(synth.F7_N_VERTICES))
    assert res.converged
    got = {r.id: r.component for r in res.labels.collect()}
    edges = [(r.src, r.dst) for r in f7.collect()]
    want = components_oracle(edges, synth.F7_N_VERTICES)
    assert got == {i: int(want[i]) for i in range(synth.F7_N_VERTICES)}
    # structure: ring+clique merged by bridge -> component 0; star -> 58; isolated self
    assert got[55] == 0 and got[70] == 58 and got[80] == 80


@pytest.mark.parametrize("n,m,tag", [(200, 150, 1), (300, 600, 2), (50, 20, 3)])
def test_components_random_exact(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = connected_components(df, universe=spark.range(n))
    got = {r.id: r.component for r in res.labels.collect()}
    want = components_oracle(edges, n)
    assert got == {i: int(want[i]) for i in range(n)}


def test_labelprop_f7_exact(spark, f7):
    res = label_propagation(f7, universe=spark.range(synth.F7_N_VERTICES), max_rounds=25)
    got = {r.id: r.label for r in res.labels.collect()}
    edges = [(r.src, r.dst) for r in f7.collect()]
    want = label_prop_oracle(edges, synth.F7_N_VERTICES, max_iter=25)
    assert got == {i: int(want[i]) for i in range(synth.F7_N_VERTICES)}


@pytest.mark.parametrize("n,m,tag", [(120, 200, 7), (80, 400, 8)])
def test_labelprop_random_exact(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = label_propagation(df, universe=spark.range(n), max_rounds=8)
    got = {r.id: r.label for r in res.labels.collect()}
    want = label_prop_oracle(edges, n, max_iter=8)
    assert got == {i: int(want[i]) for i in range(n)}


def test_triangles_f7(spark, f7):
    # clique of 8 -> C(8,3)=56; ring/star/bridge contribute none
    assert triangle_count(f7) == 56
    assert triangle_count(f7, order_by_degree=False) == 56
    per_v = {r.id: r.triangles for r in triangles_per_vertex(f7).collect()}
    # every clique vertex is in C(7,2)=21 triangles
    assert all(per_v[50 + i] == 21 for i in range(8))
    assert set(per_v) == {50 + i for i in range(8)}


@pytest.mark.parametrize("n,m,tag", [(60, 300, 11), (40, 500, 12)])
def test_triangles_random(spark, n, m, tag):
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    want = triangles_oracle(edges)
    assert triangle_count(df) == want
    per_v = triangles_per_vertex(df)
    total3 = sum(r.triangles for r in per_v.collect())
    assert total3 == 3 * want


def test_degree_orientation_bounds_hub_fanout(spark):
    """Power-law skew discipline: a star hub of degree 400 (plus a few
    triangles through it) must generate ZERO wedges under degree
    orientation — every hub edge points INTO the hub, so the O(d_hub^2)
    wedge blow-up of id-orientation cannot happen. Results stay equal."""
    from pagerank_spark.operators.triangles import _oriented

    hub = 0  # lowest id = worst case for id-orientation
    edges = [(hub, i) for i in range(1, 401)]
    edges += [(1, 2), (3, 4), (5, 6)]  # triangles through the hub
    df = spark.createDataFrame(edges, "src long, dst long")

    fan = {r.a: r["count"] for r in
           _oriented(df, order_by_degree=True).groupBy("a").count().collect()}
    assert hub not in fan, f"hub still has oriented out-edges: {fan.get(hub)}"
    assert max(fan.values()) <= 2

    fan_id = {r.a: r["count"] for r in
              _oriented(df, order_by_degree=False).groupBy("a").count().collect()}
    assert fan_id[hub] == 400  # what we would have suffered

    assert triangle_count(df) == triangle_count(df, order_by_degree=False) == 3
    per_v = {r.id: r.triangles for r in triangles_per_vertex(df).collect()}
    assert per_v[hub] == 3 and per_v[1] == 1
    per_v_id = {r.id: r.triangles
                for r in triangles_per_vertex(df, order_by_degree=False).collect()}
    assert per_v == per_v_id


def weighted_lp_oracle(wedges, n, max_iter):
    """Synchronous weighted LP: label with max total incident weight,
    ties -> smallest label; undirected weight sums both directions."""
    wmap = {}
    for s, d, w in wedges:
        if s == d:
            continue
        key = (min(s, d), max(s, d))
        wmap[key] = wmap.get(key, 0) + w
    nbrs = {}
    for (a, b), w in wmap.items():
        nbrs.setdefault(a, []).append((b, w))
        nbrs.setdefault(b, []).append((a, w))
    labels = list(range(n))
    for _ in range(max_iter):
        nxt = list(labels)
        changed = False
        for v in range(n):
            tot = {}
            for u, w in nbrs.get(v, ()):
                lab = labels[u]
                tot[lab] = tot.get(lab, 0) + w
            if tot:
                best = max(tot.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if best != labels[v]:
                    nxt[v] = best
                    changed = True
        labels = nxt
        if not changed:
            break
    return labels


def test_weighted_labelprop_hand_case(spark):
    from pagerank_spark.operators.labelprop import weighted_label_propagation

    # vertex 2 sees label 0 with weight 1 and label 1 with weight 5:
    # unweighted LP ties to min (0); weight must pull it to 1
    wedges = [(0, 2, 1), (1, 2, 5)]
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    res = weighted_label_propagation(df, universe=spark.range(3), max_rounds=1)
    got = {r.id: r.label for r in res.labels.collect()}
    assert got[2] == 1


@pytest.mark.parametrize("n,m,tag", [(100, 250, 21), (60, 400, 22)])
def test_weighted_labelprop_random_exact(spark, n, m, tag):
    from pagerank_spark.operators.labelprop import weighted_label_propagation

    edges = _random_edges(n, m, tag)
    wedges = [(s, d, 1 + (s * 7 + d) % 5) for s, d in edges]
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    res = weighted_label_propagation(df, universe=spark.range(n), max_rounds=6)
    got = {r.id: r.label for r in res.labels.collect()}
    want = weighted_lp_oracle(wedges, n, max_iter=6)
    assert got == {i: want[i] for i in range(n)}


def test_components_checkpoint_resume_identical(spark, tmp_path):
    """Kill the star-contraction loop after round k; resume -> identical
    labels to a straight run (same superstep-resume contract as pagerank)."""
    from pagerank_spark.plans.checkpoint import SuperstepCheckpointer

    # long path + a ring: several contraction rounds before the fixpoint
    edges = [(i, i + 1) for i in range(30)] + [(40, 41), (41, 42), (42, 40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    straight = connected_components(df)
    want = {r.id: r.component for r in straight.labels.collect()}

    d = str(tmp_path / "cc_ck")
    ck1 = SuperstepCheckpointer(spark, d)
    killed = connected_components(df, max_rounds=1, checkpointer=ck1)
    assert not killed.converged
    ck2 = SuperstepCheckpointer(spark, d)
    assert ck2.last_committed() == 1
    resumed = connected_components(df, checkpointer=ck2, resume=True)
    got = {r.id: r.component for r in resumed.labels.collect()}
    assert got == want
    assert resumed.converged
    assert resumed.rounds > 1  # actually continued, not restarted
    rows = ck2.load_metrics()
    assert rows and all("partition_rows" in m and "state_hash" in m
                        for m in rows)


def test_labelprop_checkpoint_resume_identical(spark, tmp_path):
    """Same kill/resume contract for label propagation's (id, label) state."""
    from pagerank_spark.plans.checkpoint import SuperstepCheckpointer

    edges = ([(i, i + 1) for i in range(8)]            # path community
             + [(20, 21), (21, 22), (22, 20), (20, 22)])  # triangle community
    df = spark.createDataFrame(edges, "src long, dst long")
    straight = label_propagation(df, max_rounds=12)
    want = {r.id: r.label for r in straight.labels.collect()}

    d = str(tmp_path / "lp_ck")
    ck1 = SuperstepCheckpointer(spark, d)
    label_propagation(df, max_rounds=2, checkpointer=ck1)  # "killed" at 2
    ck2 = SuperstepCheckpointer(spark, d)
    assert ck2.last_committed() == 2
    resumed = label_propagation(df, max_rounds=12, checkpointer=ck2,
                                resume=True)
    got = {r.id: r.label for r in resumed.labels.collect()}
    assert got == want
    rows = ck2.load_metrics()
    assert rows and all("changed" in m and "partition_rows" in m for m in rows)


def test_components_incremental_warm_start(spark):
    """prior_labels warm start on an add-only delta: identical labels to a
    cold run on the full edge set, reached in fewer contraction rounds."""
    base = [(i, i + 1) for i in range(24)] + [(30, 31), (32, 33)]
    delta = [(24, 30), (31, 32)]  # merges the tail fragments into the path
    df_full = spark.createDataFrame(base + delta, "src long, dst long")

    cold = connected_components(df_full)
    prior = connected_components(spark.createDataFrame(
        base, "src long, dst long"))
    warm = connected_components(df_full, prior_labels=prior.labels)

    want = {r.id: r.component for r in cold.labels.collect()}
    got = {r.id: r.component for r in warm.labels.collect()}
    assert got == want
    assert warm.converged
    assert warm.rounds < cold.rounds  # the prior structure contracted in round 1


def _mis_python_oracle(edges, n):
    """Reference deterministic-Luby MIS (same md5 priority)."""
    import hashlib

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def pri(v, r):
        return (int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:15], 16), v)

    active, out, r = set(range(n)), {}, 0
    while active:
        p = {v: pri(v, r) for v in active}
        winners = {v for v in active
                   if all(p[v] < p[u] for u in adj.get(v, ()) if u in active)}
        losers = set()
        for w in winners:
            losers |= adj.get(w, set()) & active
        losers -= winners
        for v in winners:
            out[v] = (True, r)
        for v in losers:
            out[v] = (False, r)
        active -= winners | losers
        r += 1
    return out


@pytest.mark.parametrize("n,m,tag", [(150, 400, 21), (80, 60, 22)])
def test_mis_random_exact(spark, n, m, tag):
    from pagerank_spark.operators.mis import maximal_independent_set
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_independent_set(df, universe=spark.range(n))
    assert res.converged
    got = {r_.id: (r_.in_mis, r_.round) for r_ in res.members.collect()}
    assert got == _mis_python_oracle(edges, n)


def test_mis_is_independent_and_maximal(spark):
    from pagerank_spark.operators.mis import maximal_independent_set
    edges = _random_edges(100, 300, 33)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_independent_set(df, universe=spark.range(100))
    mis = {r.id for r in res.members.filter("in_mis").collect()}
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    for v, ns in adj.items():
        if v in mis:
            assert not (ns & mis), (v, ns & mis)   # independence
    for v in range(100):
        assert v in mis or (adj.get(v, set()) & mis), v  # maximality


def _kruskal(edges_w):
    """Reference MSF under the (w, a, b) total order (union-find)."""
    verts = {v for a, b, _ in edges_w for v in (a, b)}
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for a, b, w in sorted(edges_w, key=lambda t: (t[2], t[0], t[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _canonical_weighted(edges):
    from collections import Counter
    cnt = Counter()
    for s, d in edges:
        if s != d:
            cnt[(min(s, d), max(s, d))] += 1
    return [(a, b, float(w)) for (a, b), w in cnt.items()]


@pytest.mark.parametrize("n,m,tag", [(120, 300, 41), (60, 40, 42)])
def test_msf_matches_kruskal(spark, n, m, tag):
    from pagerank_spark.operators.mst import minimum_spanning_forest
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = minimum_spanning_forest(df)
    assert res.converged
    got = sorted((r.a, r.b, r.w) for r in res.edges.collect())
    assert got == _kruskal(_canonical_weighted(edges))


def test_msf_explicit_weights_and_forest_shape(spark):
    from pagerank_spark.operators.mst import minimum_spanning_forest
    # two components: a 4-cycle with one heavy edge, plus a separate pair
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 5.0), (3, 0, 1.0),
            (10, 11, 2.0), (11, 10, 7.0)]   # parallel edge: min wins
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    res = minimum_spanning_forest(df, weight_col="w")
    got = sorted((r.a, r.b, r.w) for r in res.edges.collect())
    # spanning forest: 4-vertex comp -> 3 edges (heavy 2-3 excluded),
    # pair comp -> 1 edge at its min parallel weight
    assert got == [(0, 1, 1.0), (0, 3, 1.0), (1, 2, 1.0), (10, 11, 2.0)]


def test_msf_converged_when_finishing_in_exactly_max_rounds(spark):
    from pagerank_spark.operators.mst import minimum_spanning_forest
    # a 4-cycle with light opposite edges needs exactly 2 Borůvka rounds
    # (round 1 pairs {0,1} and {2,3}; round 2 bridges them); with
    # max_rounds=2 the forest completes in the LAST allowed round, which
    # must still report converged=True via the final crossing-edge probe
    # (round-4 advice)
    rows = [(0, 1, 1.0), (2, 3, 1.0), (1, 2, 10.0), (3, 0, 10.0)]
    df = spark.createDataFrame(rows, "src long, dst long, w double")
    res = minimum_spanning_forest(df, weight_col="w", max_rounds=2)
    assert res.rounds == 2
    assert res.converged
    got = sorted((r.a, r.b, r.w) for r in res.edges.collect())
    assert got == [(0, 1, 1.0), (0, 3, 10.0), (2, 3, 1.0)]
    # and a genuinely unfinished run still reports converged=False
    res1 = minimum_spanning_forest(df, weight_col="w", max_rounds=1)
    assert res1.rounds == 1 and not res1.converged


def _densest_python_oracle(edges, eps):
    """Reference Bahmani peel: per-round (nv, ne, rho) + best round."""
    import collections

    e = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    v = {x for p in e for x in p}
    stats = []
    while v:
        deg = collections.Counter()
        for a, b in e:
            deg[a] += 1
            deg[b] += 1
        rho = len(e) / len(v)
        stats.append((len(v), len(e), rho))
        thr = 2 * (1 + eps) * rho
        v = {x for x in v if deg[x] > thr}
        e = {(a, b) for a, b in e if a in v and b in v}
    best = max(range(len(stats)), key=lambda i: (stats[i][2], -i))
    return stats, best


@pytest.mark.parametrize("n,m,tag,eps", [(100, 400, 51, 0.1),
                                         (60, 90, 52, 0.5)])
def test_densest_matches_python_oracle(spark, n, m, tag, eps):
    from pagerank_spark.operators.densest import densest_subgraph
    edges = _random_edges(n, m, tag)
    df = spark.createDataFrame(edges, "src long, dst long")
    res = densest_subgraph(df, epsilon=eps)
    want, best = _densest_python_oracle(edges, eps)
    got = sorted((r["round"], r.n_vertices, r.n_edges, r.density)
                 for r in res.stats.collect())
    assert [(nv, ne) for _, nv, ne, _ in got] == [(nv, ne) for nv, ne, _ in want]
    for (_, _, _, rho_g), (_, _, rho_w) in zip(got, want):
        assert rho_g == pytest.approx(rho_w, abs=1e-12)
    assert res.best_round == best


def test_densest_finds_planted_clique(spark):
    from pagerank_spark.operators.densest import densest_subgraph
    # sparse random background + K20: the clique is the densest iterate
    bg = [(a, b) for a, b in _random_edges(400, 300, 53) if a != b]
    clique = [(i, j) for i in range(500, 520) for j in range(i + 1, 520)]
    df = spark.createDataFrame(bg + clique, "src long, dst long")
    res = densest_subgraph(df, epsilon=0.1)
    assert res.best_density == pytest.approx(19 / 2, abs=1e-9)
    assert {r.id for r in res.best_vertices.collect()} == set(range(500, 520))
    assert res.stats.filter("is_best").count() == 1


def test_densest_rejects_bad_epsilon(spark):
    from pagerank_spark.operators.densest import densest_subgraph
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        densest_subgraph(df, epsilon=0.0)


def _rich_club_ref(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in {d - 1 for d in deg.values()}:
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for a, b in und if a in rich and b in rich)
        out[k] = (len(rich), ek,
                  round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6))
    return out


def test_rich_club_matches_reference(spark):
    import random
    from pagerank_spark.operators.graphstats import rich_club
    rng = random.Random(61)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.k: (r.n_rich, r.e_rich, r.phi) for r in rich_club(df).collect()}
    assert got == _rich_club_ref(edges)


def test_rich_club_clique_plus_pendants_is_one_at_top(spark):
    from pagerank_spark.operators.graphstats import rich_club
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pendants = [(0, 10), (1, 11), (2, 12)]
    df = spark.createDataFrame(clique + pendants, "src long, dst long")
    got = {r.k: r.phi for r in rich_club(df).collect()}
    # above k=2 only the three degree-4 clique vertices remain, fully linked
    assert got[2] == 1.0
