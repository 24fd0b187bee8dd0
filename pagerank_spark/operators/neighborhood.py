"""Neighborhood function, effective diameter, and mean distance.

Absent from the reference (it computes PageRank only; SURVEY.md §2.9) but a
canonical link-graph analytic: N(t) = #{(u,v) : dist(u,v) <= t} counted
over directed paths, from which the effective diameter (smallest t with
N(t) >= alpha * N(inf), Boldi-Vigna-style interpolated) and the mean
finite-pair distance follow.

Two implementations sharing one superstep shape (ball(v, t+1) =
ball(v, t) ∪ ⋃_{(v,w)∈E} ball(w, t)):

* ``neighborhood_function_exact`` — balls as an explicit (id, r) pair
  table; one join + unionAll + distinct per hop. O(V·V) state worst case:
  the small-scale truth used by tests and the DuckDB oracle query.
* ``neighborhood_function_hll`` — HyperANF (Boldi, Rosa, Vigna, "HyperANF:
  approximating the neighbourhood function of very large graphs on a
  budget", WWW 2011): each vertex carries a HyperLogLog sketch of its
  ball, a fixed array of m = 2^b byte-sized registers; the hop union
  becomes an elementwise register max. State is O(V·m) and each hop is one
  edges⋈sketches join + per-register max aggregate — the J1/A2 shuffle
  shape the engine already optimizes, so this is the 10^12-edge path.

HLL details (all JVM-side, no Python in the loop):
  register index j = low b bits of xxhash64(id); rho = (#trailing zeros of
  the remaining 64-b bits) + 1 — computed exactly as log2(w & -w) + 1
  (w & -w is a power of two, so the double log2 is exact). The estimator
  is standard HLL with the small-range linear-counting correction; the
  64-bit hash makes large-range correction unnecessary. Per-round sums of
  the per-vertex estimates and of all registers ride the materialization
  as observed metrics — one Spark job per hop. The register sum is a
  monotone non-decreasing integer, so an unchanged sum is an exact
  saturation fixpoint and termination needs no tolerance; ``rel_tol``
  just stops earlier once N(t) plateaus. Self-loops added to the edge
  set fold each vertex's own ball into the gather join, so a hop is one
  join + one aggregate with the sketch table referenced exactly once (no
  merge-back outer join — which also sidesteps a Spark 4.1 analyzer bug
  that mis-binds a pushed join-key filter when the sketch relation
  appears twice under USING-join dedup).

Scale note: the sketch join moves O(E·m) bytes per hop — b trades accuracy
(rel. std. err. ~1.04/sqrt(2^b)) against shuffle volume. The per-register
max aggregate gets map-side partial aggregation and whole-stage codegen
(m plain MAX columns, no UDF); skew follows the out-degree head, the same
profile as the PageRank contribution aggregate (AQE skew handling applies).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class NeighborhoodResult:
    nf: DataFrame          # (t int, n_pairs) — cumulative pairs within t hops
    counts: list[float]    # counts[t] = N(t), t = 0..rounds
    rounds: int
    converged: bool


def _simple(edges: DataFrame) -> DataFrame:
    return (edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst")).distinct())


def _verts(e: DataFrame, universe: DataFrame | None) -> DataFrame:
    members = e.select(F.col("src").alias("id")).unionAll(
        e.select(F.col("dst").alias("id")))
    if universe is not None:
        members = members.unionAll(universe.select("id"))
    return members.distinct()


def neighborhood_function_exact(
    edges: DataFrame,
    max_t: int = 32,
    universe: DataFrame | None = None,
) -> NeighborhoodResult:
    """Exact N(t) by materializing every ball as (id, r) pairs.

    Truth oracle for the HLL path; usable directly where V is small enough
    that reachable-pair state (<= V^2 rows) is acceptable."""
    spark = edges.sparkSession
    e = _simple(edges).localCheckpoint(eager=True)
    verts = _verts(e, universe)

    reach = verts.select("id", F.col("id").alias("r")) \
                 .localCheckpoint(eager=True)
    counts = [float(reach.count())]
    rounds, converged = 0, False
    for rounds in range(1, max_t + 1):
        grown = e.join(reach.select(F.col("id").alias("dst"), "r"), "dst") \
                 .select(F.col("src").alias("id"), "r")
        obs = Observation(f"nf_exact_{rounds}")
        nxt = (reach.unionAll(grown).distinct()
               .observe(obs, F.count(F.lit(1)).alias("n"))
               .localCheckpoint(eager=True))
        n = float(obs.get["n"])
        reach.unpersist()
        reach = nxt
        counts.append(n)
        if n == counts[-2]:
            converged = True
            counts.pop()          # last hop added nothing; N already flat
            rounds -= 1
            break
    reach.unpersist()
    nf = spark.createDataFrame(
        [(t, int(n)) for t, n in enumerate(counts)], "t int, n_pairs long")
    return NeighborhoodResult(nf=nf, counts=counts,
                              rounds=rounds, converged=converged)


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate_expr(m: int):
    """Per-row HLL estimate of the register array `regs` (standard
    estimator + small-range linear counting)."""
    z = F.aggregate(F.col("regs"), F.lit(0.0),
                    lambda acc, x: acc + F.pow(F.lit(2.0),
                                               -x.cast("double")))
    # NB: no CASE WHEN inside higher-order lambdas — Spark 4.1 mis-binds
    # attributes when such a lambda is later composed with GetArrayItem
    v0 = F.aggregate(F.col("regs"), F.lit(0),
                     lambda acc, x: acc + (x == 0).cast("int"))
    raw = F.lit(_alpha(m) * m * m) / z
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double"))
    return F.when((raw <= F.lit(2.5 * m)) & (v0 > 0), lin).otherwise(raw)


def neighborhood_function_hll(
    edges: DataFrame,
    max_t: int = 64,
    b: int = 6,
    universe: DataFrame | None = None,
    rel_tol: float = 1e-4,
) -> NeighborhoodResult:
    """HyperANF: approximate N(t) with per-vertex HyperLogLog ball
    sketches of m = 2^b registers (rel. std. err. ~1.04/sqrt(m))."""
    if not 4 <= b <= 10:
        raise ValueError(f"b must be in [4, 10], got {b}")
    m = 1 << b
    spark = edges.sparkSession
    e = _simple(edges)
    verts = _verts(e, universe)
    # Self-loops fold each vertex's own ball into the same gather join:
    # ball(v,t+1) = ⋃_{w ∈ N+(v) ∪ {v}} ball(w,t). One join + one aggregate
    # per hop, sketches referenced exactly once — no merge-back outer join.
    e2 = e.unionAll(verts.select(F.col("id").alias("src"),
                                 F.col("id").alias("dst"))) \
          .localCheckpoint(eager=True)

    # init: one element (the vertex itself) per sketch
    h = F.xxhash64(F.col("id"))
    w = F.shiftrightunsigned(h, b)
    rho = F.when(w == 0, F.lit(64 - b + 1)).otherwise(
        (F.log2((w.bitwiseAND(-w)).cast("double")) + 1.0).cast("int"))
    j = h.bitwiseAND(m - 1).cast("int")
    # plain m-element array (no transform lambda — see NB above): register
    # j gets rho, the rest 0
    sk = verts.select(
        "id",
        F.array(*[F.when(F.lit(i) == j, rho).otherwise(0).cast("tinyint")
                  for i in range(m)]).alias("regs"),
    ).localCheckpoint(eager=True)

    # the per-vertex estimate is deterministic (fixed in-array fold order);
    # summing through DECIMAL keeps the total independent of partition /
    # combine order, so repeated runs agree bit-for-bit
    est = _estimate_expr(m).cast("decimal(30,8)")
    # register sum is a monotone non-decreasing integer; equal consecutive
    # sums <=> no register moved anywhere <=> exact fixpoint
    reg_sum = F.sum(F.aggregate(F.col("regs"), F.lit(0).cast("long"),
                                lambda acc, x: acc + x)).alias("rsum")
    first = sk.select(F.sum(est).alias("n"), reg_sum).first()
    counts = [float(first["n"])]
    prev_rsum = int(first["rsum"])
    rounds, converged = 0, False
    for rounds in range(1, max_t + 1):
        obs = Observation(f"nf_hll_{rounds}")
        nxt = (
            e2.join(sk.select(F.col("id").alias("dst"), "regs"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.max(F.col("regs")[i]).alias(f"_r{i}") for i in range(m)])
            .select("id", F.array(*[F.col(f"_r{i}") for i in range(m)])
                    .alias("regs"))
            .observe(obs, F.sum(est).alias("n"), reg_sum)
            .localCheckpoint(eager=True)
        )
        got = obs.get
        sk.unpersist()
        sk = nxt
        counts.append(float(got["n"]))
        rsum = int(got["rsum"])
        if rsum == prev_rsum:
            converged = True            # register saturation: exact fixpoint
            counts.pop()
            rounds -= 1
            break
        prev_rsum = rsum
        # registers are monotone, so a NEGATIVE delta is estimator noise
        # (the linear-counting -> raw-estimator crossover can dip), not
        # saturation — require the delta to be non-negative AND small
        if 0.0 <= counts[-1] - counts[-2] <= rel_tol * counts[-1]:
            converged = True
            break
    sk.unpersist()
    nf = spark.createDataFrame(
        [(t, n) for t, n in enumerate(counts)], "t int, n_pairs double")
    return NeighborhoodResult(nf=nf, counts=counts,
                              rounds=rounds, converged=converged)


@dataclass
class HarmonicResult:
    scores: DataFrame      # exact: (id, hc_num long, hc double); hll: (id, hc double)
    rounds: int
    converged: bool


def _directed(edges: DataFrame, direction: str) -> DataFrame:
    """Ball direction: 'in' computes hc(v) = Σ 1/d(u,v) (classic harmonic
    centrality — balls grow over reversed edges); 'out' uses d(v,u)."""
    e = _simple(edges)
    if direction == "in":
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if direction == "out":
        return e
    raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")


def harmonic_centrality_exact(
    edges: DataFrame,
    max_t: int = 8,
    universe: DataFrame | None = None,
    direction: str = "in",
) -> HarmonicResult:
    """Exact harmonic centrality truncated at ``max_t`` hops.

    Integer-exact: contributions are accumulated as lcm(1..max_t)/t, so
    ``hc_num`` is an order-independent BIGINT (``hc = hc_num / lcm``).
    Truth oracle for the sketch path; O(V^2) pair state worst case."""
    if not 1 <= max_t <= 25:
        raise ValueError("exact mode supports 1 <= max_t <= 25 "
                         "(lcm-scaled integer weights)")
    lcm = math.lcm(*range(1, max_t + 1))
    e = _directed(edges, direction).localCheckpoint(eager=True)
    verts = _verts(e, universe).localCheckpoint(eager=True)

    reach = verts.select("id", F.col("id").alias("r")) \
                 .localCheckpoint(eager=True)
    fresh_counts = []          # per-round (id, s) contributions, kept cached
    keep = []
    rounds, converged = 0, False
    for rounds in range(1, max_t + 1):
        grown = (e.join(reach.select(F.col("id").alias("dst"), "r"), "dst")
                 .select(F.col("src").alias("id"), "r").distinct())
        obs = Observation(f"hc_exact_{rounds}")
        fresh = (grown.join(reach, ["id", "r"], "left_anti")
                 .observe(obs, F.count(F.lit(1)).alias("n"))
                 .localCheckpoint(eager=True))
        if int(obs.get["n"] or 0) == 0:
            fresh.unpersist()
            rounds -= 1
            converged = True
            break
        keep.append(fresh)
        fresh_counts.append(
            fresh.groupBy("id")
            .agg((F.count(F.lit(1)) * F.lit(lcm // rounds)).alias("s")))
        nxt = reach.unionAll(fresh).localCheckpoint(eager=True)
        reach.unpersist()
        reach = nxt
    if fresh_counts:
        allc = fresh_counts[0]
        for fc in fresh_counts[1:]:
            allc = allc.unionAll(fc)
        sums = allc.groupBy("id").agg(F.sum("s").alias("hc_num"))
    else:
        sums = verts.sparkSession.createDataFrame([], "id long, hc_num long")
    scores = (verts.join(sums, "id", "left")
              .select("id",
                      F.coalesce("hc_num", F.lit(0)).alias("hc_num"))
              .withColumn("hc", F.col("hc_num") / F.lit(float(lcm)))
              .localCheckpoint(eager=True))
    reach.unpersist()
    for df in keep:
        df.unpersist()
    return HarmonicResult(scores=scores, rounds=rounds, converged=converged)


@dataclass
class ClosenessResult:
    # (id, n_reached long, dist_sum long, closeness double)
    scores: DataFrame
    rounds: int
    converged: bool


def closeness_centrality_exact(
    edges: DataFrame,
    max_t: int = 8,
    universe: DataFrame | None = None,
    direction: str = "in",
) -> ClosenessResult:
    """Wasserman-Faust closeness truncated at ``max_t`` hops:
    c(v) = (n_reached / (n - 1)) · (n_reached / dist_sum), the reach-scaled
    form that stays comparable across disconnected components (Wasserman &
    Faust 1994; the convention NetworkX ships as ``closeness_centrality``).

    Same truncated-BFS growth as ``harmonic_centrality_exact`` (per hop:
    one gather join + anti-join against the reached set — the J1 shuffle
    shape), but the per-round first-reach counts accumulate the two
    EXACT integers (#reached, Σ distance) and the single double division
    happens once per vertex at the end, so the result value-hash matches
    any engine computing the same expression. ``direction='in'`` grows
    balls over reversed edges (who can reach v — the classic centrality);
    ``'out'`` measures v's reach."""
    e = _directed(edges, direction).localCheckpoint(eager=True)
    verts = _verts(e, universe).localCheckpoint(eager=True)
    n_minus_1 = float(verts.count() - 1)

    reach = verts.select("id", F.col("id").alias("r")) \
                 .localCheckpoint(eager=True)
    fresh_counts = []          # per-round (id, cnt, t*cnt) contributions
    keep = []
    rounds, converged = 0, False
    for rounds in range(1, max_t + 1):
        grown = (e.join(reach.select(F.col("id").alias("dst"), "r"), "dst")
                 .select(F.col("src").alias("id"), "r").distinct())
        obs = Observation(f"cc_exact_{rounds}")
        fresh = (grown.join(reach, ["id", "r"], "left_anti")
                 .observe(obs, F.count(F.lit(1)).alias("n"))
                 .localCheckpoint(eager=True))
        if int(obs.get["n"] or 0) == 0:
            fresh.unpersist()
            rounds -= 1
            converged = True
            break
        keep.append(fresh)
        cnt = F.count(F.lit(1))
        fresh_counts.append(
            fresh.groupBy("id").agg(cnt.alias("c"),
                                    (cnt * F.lit(rounds)).alias("d")))
        nxt = reach.unionAll(fresh).localCheckpoint(eager=True)
        reach.unpersist()
        reach = nxt
    spark = verts.sparkSession
    if fresh_counts:
        allc = fresh_counts[0]
        for fc in fresh_counts[1:]:
            allc = allc.unionAll(fc)
        sums = allc.groupBy("id").agg(F.sum("c").alias("n_reached"),
                                      F.sum("d").alias("dist_sum"))
    else:
        sums = spark.createDataFrame([], "id long, n_reached long, dist_sum long")
    nr = F.coalesce("n_reached", F.lit(0)).cast("long")
    ds = F.coalesce("dist_sum", F.lit(0)).cast("long")
    closeness = F.when(
        ds > 0,
        (nr / F.lit(n_minus_1)) * (nr / ds)).otherwise(F.lit(0.0))
    scores = (verts.join(sums, "id", "left")
              .select("id", nr.alias("n_reached"), ds.alias("dist_sum"),
                      closeness.alias("closeness"))
              .localCheckpoint(eager=True))
    reach.unpersist()
    for df in keep:
        df.unpersist()
    return ClosenessResult(scores=scores, rounds=rounds, converged=converged)


def harmonic_centrality_hll(
    edges: DataFrame,
    max_t: int = 64,
    b: int = 6,
    universe: DataFrame | None = None,
    direction: str = "in",
    rel_tol: float = 1e-4,
) -> HarmonicResult:
    """HyperANF-style harmonic centrality (Boldi-Vigna, "Axioms for
    centrality", Internet Math. 2014): hc(v) ≈ Σ_t (|B(v,t)|-|B(v,t-1)|)/t
    with ball sizes from the per-vertex HLL sketches.

    The per-vertex running (estimate, hc) pair rides the gather join on the
    vertex's own self-loop row and is picked out of the aggregate with a
    keyed MAX — the sketch relation is still referenced exactly once per
    hop. All per-vertex arithmetic is per-row, so results are deterministic
    across partitionings."""
    if not 4 <= b <= 10:
        raise ValueError(f"b must be in [4, 10], got {b}")
    m = 1 << b
    e = _directed(edges, direction)
    verts = _verts(e, universe)
    e2 = e.unionAll(verts.select(F.col("id").alias("src"),
                                 F.col("id").alias("dst"))) \
          .localCheckpoint(eager=True)

    h = F.xxhash64(F.col("id"))
    w = F.shiftrightunsigned(h, b)
    rho = F.when(w == 0, F.lit(64 - b + 1)).otherwise(
        (F.log2((w.bitwiseAND(-w)).cast("double")) + 1.0).cast("int"))
    j = h.bitwiseAND(m - 1).cast("int")
    est = _estimate_expr(m)
    sk = (verts.select(
            "id",
            F.array(*[F.when(F.lit(i) == j, rho).otherwise(0).cast("tinyint")
                      for i in range(m)]).alias("regs"))
          .select("id", "regs", est.alias("pest"), F.lit(0.0).alias("hc"))
          .localCheckpoint(eager=True))

    reg_sum = F.sum(F.aggregate(F.col("regs"), F.lit(0).cast("long"),
                                lambda acc, x: acc + x)).alias("rsum")
    dec_est = est.cast("decimal(30,8)")
    first = sk.select(F.sum(dec_est).alias("n"), reg_sum).first()
    prev_n, prev_rsum = float(first["n"]), int(first["rsum"])
    rounds, converged = 0, False
    self_row = F.col("dst") == F.col("src")
    for rounds in range(1, max_t + 1):
        obs = Observation(f"hc_hll_{rounds}")
        nxt = (
            e2.join(sk.select(F.col("id").alias("dst"), "regs",
                              "pest", "hc"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.max(F.col("regs")[i]).alias(f"_r{i}") for i in range(m)],
                 F.max(F.when(self_row, F.col("pest"))).alias("_pest"),
                 F.max(F.when(self_row, F.col("hc"))).alias("_hc"))
            .select("id",
                    F.array(*[F.col(f"_r{i}") for i in range(m)])
                    .alias("regs"),
                    F.col("_pest").alias("pest0"), F.col("_hc").alias("hc0"))
            .select("id", "regs", est.alias("pest"),
                    (F.col("hc0")
                     + F.greatest(est - F.col("pest0"), F.lit(0.0))
                     / F.lit(float(rounds))).alias("hc"))
            .observe(obs, F.sum(dec_est).alias("n"), reg_sum)
            .localCheckpoint(eager=True)
        )
        got = obs.get
        sk.unpersist()
        sk = nxt
        n, rsum = float(got["n"]), int(got["rsum"])
        if rsum == prev_rsum:
            converged = True
            rounds -= 1
            break
        # same guard as the neighborhood function: estimator dips
        # (negative delta) are noise, not convergence
        if 0.0 <= n - prev_n <= rel_tol * n:
            prev_n, prev_rsum = n, rsum
            converged = True
            break
        prev_n, prev_rsum = n, rsum
    scores = sk.select("id", "hc")
    return HarmonicResult(scores=scores, rounds=rounds, converged=converged)


def closeness_centrality_hll(
    edges: DataFrame,
    max_t: int = 64,
    b: int = 6,
    universe: DataFrame | None = None,
    direction: str = "in",
    rel_tol: float = 1e-4,
) -> ClosenessResult:
    """HyperANF-style closeness — the 10^12-edge scale path of
    ``closeness_centrality_exact`` (whose pair-table state is O(V·B(t))).

    Same loop as ``harmonic_centrality_hll`` but the per-hop ball GROWTH
    Δ_t = max(|B(v,t)| − |B(v,t−1)|, 0) accumulates two running per-vertex
    sums: n_reached ≈ Σ_t Δ_t and dist_sum ≈ Σ_t t·Δ_t, from which the
    Wasserman-Faust closeness (n/(N−1))·(n/dist_sum) is one final per-row
    expression. Sketch state O(V·2^b); each hop is one edges⋈sketch join +
    per-register max aggregate (the J1/A2 shape). Deterministic: all
    per-vertex arithmetic is per-row over the keyed-MAX-extracted running
    pair, so repeated runs agree bit-for-bit."""
    if not 4 <= b <= 10:
        raise ValueError(f"b must be in [4, 10], got {b}")
    m = 1 << b
    e = _directed(edges, direction)
    verts = _verts(e, universe)
    n_minus_1 = float(verts.count() - 1)
    e2 = e.unionAll(verts.select(F.col("id").alias("src"),
                                 F.col("id").alias("dst"))) \
          .localCheckpoint(eager=True)

    h = F.xxhash64(F.col("id"))
    w = F.shiftrightunsigned(h, b)
    rho = F.when(w == 0, F.lit(64 - b + 1)).otherwise(
        (F.log2((w.bitwiseAND(-w)).cast("double")) + 1.0).cast("int"))
    j = h.bitwiseAND(m - 1).cast("int")
    est = _estimate_expr(m)
    sk = (verts.select(
            "id",
            F.array(*[F.when(F.lit(i) == j, rho).otherwise(0).cast("tinyint")
                      for i in range(m)]).alias("regs"))
          .select("id", "regs", est.alias("pest"),
                  F.lit(0.0).alias("nr"), F.lit(0.0).alias("ds"))
          .localCheckpoint(eager=True))

    reg_sum = F.sum(F.aggregate(F.col("regs"), F.lit(0).cast("long"),
                                lambda acc, x: acc + x)).alias("rsum")
    dec_est = est.cast("decimal(30,8)")
    first = sk.select(F.sum(dec_est).alias("n"), reg_sum).first()
    prev_n, prev_rsum = float(first["n"]), int(first["rsum"])
    rounds, converged = 0, False
    self_row = F.col("dst") == F.col("src")
    for rounds in range(1, max_t + 1):
        obs = Observation(f"cc_hll_{rounds}")
        grow = F.greatest(est - F.col("pest0"), F.lit(0.0))
        nxt = (
            e2.join(sk.select(F.col("id").alias("dst"), "regs",
                              "pest", "nr", "ds"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.max(F.col("regs")[i]).alias(f"_r{i}") for i in range(m)],
                 F.max(F.when(self_row, F.col("pest"))).alias("_pest"),
                 F.max(F.when(self_row, F.col("nr"))).alias("_nr"),
                 F.max(F.when(self_row, F.col("ds"))).alias("_ds"))
            .select("id",
                    F.array(*[F.col(f"_r{i}") for i in range(m)])
                    .alias("regs"),
                    F.col("_pest").alias("pest0"), F.col("_nr").alias("nr0"),
                    F.col("_ds").alias("ds0"))
            .select("id", "regs", est.alias("pest"),
                    (F.col("nr0") + grow).alias("nr"),
                    (F.col("ds0") + grow * F.lit(float(rounds))).alias("ds"))
            .observe(obs, F.sum(dec_est).alias("n"), reg_sum)
            .localCheckpoint(eager=True)
        )
        got = obs.get
        sk.unpersist()
        sk = nxt
        n, rsum = float(got["n"]), int(got["rsum"])
        if rsum == prev_rsum:
            converged = True
            rounds -= 1
            break
        # estimator dips (negative delta) are noise, not convergence
        if 0.0 <= n - prev_n <= rel_tol * n:
            prev_n, prev_rsum = n, rsum
            converged = True
            break
        prev_n, prev_rsum = n, rsum
    closeness = F.when(
        F.col("ds") > 0,
        (F.col("nr") / F.lit(n_minus_1)) * (F.col("nr") / F.col("ds"))
    ).otherwise(F.lit(0.0))
    scores = sk.select("id", F.col("nr").alias("n_reached_est"),
                       F.col("ds").alias("dist_sum_est"),
                       closeness.alias("closeness"))
    return ClosenessResult(scores=scores, rounds=rounds, converged=converged)


def closeness_centrality(
    edges: DataFrame,
    max_t: int = 8,
    universe: DataFrame | None = None,
    direction: str = "in",
    mode: str = "auto",
    state_budget: int = 2_000_000,
    b: int = 6,
    rel_tol: float = 1e-4,
) -> ClosenessResult:
    """Front door: Wasserman-Faust closeness, dispatching between the exact
    pair-table plan and the HyperANF sketch plan by PROJECTED STATE SIZE —
    the same degree-adaptive routing the reference applies to its kernels
    (/root/reference/PageRankLightSpMV.cu:63-105: pick the plan the input's
    shape can afford, don't run the small-input plan at scale).

    ``mode='exact'`` / ``'hll'`` force a plan. ``'auto'`` runs one probe
    hop of the exact growth (a single gather join + distinct — the cheapest
    honest estimate of ball volume) and projects the final pair-table state
    as V · g^max_t with g the measured mean ball growth of hop 1, capped at
    V². Projection within ``state_budget`` rows → exact (it is the truth
    and its constants are lower); beyond it → HLL, whose state is O(V·2^b)
    regardless of ball volume. At 10^12 edges the projection overflows any
    budget after hop 1, so auto IS the sketch plan there; the exact plan
    survives as the small-graph/oracle path.

    Exact-mode results carry (n_reached, dist_sum) as exact integers; HLL
    results estimate them (rel. std. err. ~1.04/sqrt(2^b))."""
    if mode not in ("auto", "exact", "hll"):
        raise ValueError(f"mode must be auto|exact|hll, got {mode!r}")
    if mode == "auto":
        e = _directed(edges, direction).localCheckpoint(eager=True)
        verts = _verts(e, universe)
        n_v = verts.count()
        if n_v == 0:
            mode = "exact"
        else:
            # probe: |{(v, r) : dist(v, r) <= 1}| = V + distinct edges
            s1 = float(n_v) + float(e.count())
            growth = s1 / float(n_v)
            projected = float(n_v) * min(growth ** max_t, float(n_v))
            mode = "exact" if projected <= state_budget else "hll"
        e.unpersist()
    if mode == "exact":
        return closeness_centrality_exact(edges, max_t=max_t,
                                          universe=universe,
                                          direction=direction)
    return closeness_centrality_hll(edges, max_t=max_t, b=b,
                                    universe=universe, direction=direction,
                                    rel_tol=rel_tol)


def distance_stats(counts: list[float], alpha: float = 0.9) -> dict:
    """Effective diameter (interpolated, Boldi-Vigna convention) and mean
    finite-pair distance from a neighborhood function N(0..T)."""
    if not counts:
        raise ValueError("empty neighborhood function")
    total = counts[-1]
    target = alpha * total
    eff = float(len(counts) - 1)
    for t in range(len(counts)):
        if counts[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                lo, hi = counts[t - 1], counts[t]
                eff = (t - 1) + (target - lo) / (hi - lo) if hi > lo else float(t)
            break
    reachable = total - counts[0]
    mean = (sum(t * (counts[t] - counts[t - 1])
                for t in range(1, len(counts))) / reachable
            if reachable > 0 else 0.0)
    return {"effective_diameter": eff, "mean_distance": mean,
            "n_pairs": total}
