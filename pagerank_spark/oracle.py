"""Pure-NumPy oracles implementing the reference's exact math contract.

Used only by tests — never by the engine. The PageRank oracle reproduces
the semantics of /root/reference/kernel_bblock.cu:949-1085 (power iteration,
w=1/out_deg with edge multiplicity, dangling-mass redistribution
remain = alpha*mass/n + (1-alpha)/n, L1 stop), in the Σ=1 convention the
engine uses internally.
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]],
    n: int,
    alpha: float = 0.85,
    tol: float | None = 1e-6,
    max_iter: int = 100,
    p: np.ndarray | None = None,
    weights: list[float] | None = None,
) -> np.ndarray:
    """``p``: optional personalization vector (Σp=1) — the lightSpMV
    personalization slot (PageRank.h:314-343) with dangling mass
    re-injected proportionally to p. ``weights``: optional explicit edge
    weights (one per edge) — the P9 path (PageRank.h:256-274): transition
    weight |w|/row-sum; a source with zero row-sum is dangling."""
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    if weights is not None:
        aw = np.abs(np.asarray(weights, dtype=np.float64))
        rowsum = np.zeros(n)
        np.add.at(rowsum, src, aw)
        dangling = rowsum == 0
        keep = aw > 0
        src, dst = src[keep], dst[keep]
        w = aw[keep] / rowsum[src]
    else:
        out_deg = np.bincount(src, minlength=n).astype(np.float64)
        w = 1.0 / out_deg[src]
        dangling = out_deg == 0
    if p is None:
        p = np.full(n, 1.0 / n)

    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        mass = r[dangling].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * w)
        r_new = alpha * contrib + (alpha * mass + 1.0 - alpha) * p
        l1 = np.abs(r_new - r).sum()
        r = r_new
        if tol is not None and l1 <= tol:
            break
    return r


def components_oracle(edges: list[tuple[int, int]], n: int) -> np.ndarray:
    """Union-find; component label = min vertex id in component."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    labels = np.array([find(i) for i in range(n)])
    # normalize to min-id-in-component
    comp_min: dict[int, int] = {}
    for i, c in enumerate(labels):
        comp_min[c] = min(comp_min.get(c, i), i)
    return np.array([comp_min[c] for c in labels])


def triangles_oracle(edges: list[tuple[int, int]]) -> int:
    """Total triangle count on the undirected simple graph induced by edges."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b])
    return count // 3


def label_prop_oracle(
    edges: list[tuple[int, int]], n: int, max_iter: int = 20
) -> np.ndarray:
    """Synchronous label propagation on the undirected graph.

    Per round, each vertex with neighbors takes the most frequent neighbor
    label, ties broken by MIN label (determinism). Stops at fixpoint.
    Mirrors operators/labelprop.py exactly.
    """
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    neigh: dict[int, list[int]] = {i: [] for i in range(n)}
    for a, b in und:
        neigh[a].append(b)
        neigh[b].append(a)
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not neigh[v]:
                continue
            counts: dict[int, int] = {}
            for u in neigh[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if (new == labels).all():
            break
        labels = new
    return labels


def hits_oracle(edges: list[tuple[int, int]], n: int,
                iterations: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Dense HITS with L1 normalization per half-iteration (hub, authority)."""
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iterations):
        auth = np.zeros(n, dtype=np.float64)
        for s, d in edges:
            auth[d] += hub[s]
        t = np.abs(auth).sum()
        if t > 0:
            auth = auth / t
        hub = np.zeros(n, dtype=np.float64)
        for s, d in edges:
            hub[s] += auth[d]
        t = np.abs(hub).sum()
        if t > 0:
            hub = hub / t
    return hub, auth


def bfs_oracle(edges: list[tuple[int, int]], sources: list[int],
               max_hops: int = 20) -> dict[int, int]:
    """Directed min-hop distance from the source set (reachable only)."""
    from collections import deque
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {int(s): 0 for s in sources}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def kcore_oracle(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Peel the undirected simple graph; returns {id: in-core degree}."""
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    while True:
        deg: dict[int, int] = {}
        for a, b in simple:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        doomed = {v for v, c in deg.items() if c < k}
        if not doomed:
            return deg
        simple = {(a, b) for a, b in simple if a not in doomed and b not in doomed}


def coreness_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Exact core numbers by classic min-degree peeling."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    k = 0
    while deg:
        v = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u in deg and u != v:
                deg[u] -= 1
                adj[u].discard(v)
        del deg[v]
    return core


def scc_oracle(edges: list[tuple[int, int]], n: int) -> dict[int, int]:
    """SCC label (= min id in the SCC) per vertex in [0, n), via iterative
    Tarjan (explicit stack, no recursion limit)."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = 0
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            ns = adj.get(v, [])
            while pi < len(ns):
                w = ns[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
    return label


def neighborhood_oracle(edges: list[tuple[int, int]], n: int,
                        max_t: int | None = None) -> list[int]:
    """Exact directed neighborhood function: N[t] = #{(u,v): dist(u,v)<=t}
    over vertices [0, n), via BFS from every vertex. Stops at the flat
    point (or after max_t hops)."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append(d)
    from collections import deque
    hist: dict[int, int] = {}     # dist -> pair count at exactly dist
    diam = 0
    for v in range(n):
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            if max_t is not None and dist[x] >= max_t:
                continue
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for dv in dist.values():
            hist[dv] = hist.get(dv, 0) + 1
            diam = max(diam, dv)
    out, acc = [], 0
    for t in range(diam + 1):
        acc += hist.get(t, 0)
        out.append(acc)
    return out


def harmonic_oracle(edges: list[tuple[int, int]], n: int, max_t: int,
                    direction: str = "in") -> dict[int, int]:
    """Exact truncated harmonic centrality, lcm-scaled to integers:
    hc_num(v) = sum over u with 0 < d <= max_t of lcm(1..max_t)/d, where
    d = d(u,v) for direction='in' (classic) or d(v,u) for 'out'."""
    import math
    from collections import deque
    lcm = math.lcm(*range(1, max_t + 1))
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        if s != d:
            if direction == "in":
                adj.setdefault(d, []).append(s)   # reversed walk
            else:
                adj.setdefault(s, []).append(d)
    out = {}
    for v in range(n):
        dist = {v: 0}
        q = deque([v])
        acc = 0
        while q:
            x = q.popleft()
            if dist[x] >= max_t:
                continue
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    acc += lcm // dist[y]
                    q.append(y)
        out[v] = acc
    return out
