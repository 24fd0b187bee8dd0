"""Label propagation: synchronous rounds over the undirected graph.

Absent from the reference (SURVEY.md §2.9); mandated by the north rule.
Semantics (deterministic, so results are exactly reproducible and the
NumPy oracle can assert equality):

  labels[v] := v initially
  per round, every vertex with >=1 neighbor takes the most frequent label
  among its neighbors' current labels; ties break to the SMALLEST label.
  Vertices with no neighbors keep their label. Stop at fixpoint or after
  ``max_rounds``.

DataFrame formulation per round (SURVEY.md §2.9): join labels onto the
symmetric edge list, count by (vertex, label), then one max_by aggregation
picking struct(count, -label) — no window function, so the round is two
shuffles on (vertex) and (vertex, label).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class LabelPropResult:
    labels: DataFrame      # (id long, label long)
    rounds: int
    converged: bool


def label_propagation(
    edges: DataFrame,
    universe: DataFrame | None = None,
    max_rounds: int = 20,
    checkpointer=None,
    resume: bool = False,
) -> LabelPropResult:
    """``checkpointer``: optional dir-backed
    :class:`~pagerank_spark.plans.checkpoint.SuperstepCheckpointer` — each
    round's (id, label) state commits to parquet with a metrics row
    (changed-vertex count, wall ms, per-partition lineage); ``resume=True``
    continues a killed run from the last committed round, the same
    superstep-resume contract as ``pagerank()``. ``None`` keeps the
    in-memory ``localCheckpoint`` path."""
    from pagerank_spark.plans.checkpoint import StageTimer

    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    sym = sym.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        sym.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)

    vertices = sym.select(F.col("src").alias("id")).distinct()
    if universe is not None:
        vertices = vertices.unionAll(universe.select("id")).distinct()
    vertices = vertices.localCheckpoint(eager=True)

    start_round = 0
    if checkpointer is not None and not resume:
        checkpointer.reset()
    if checkpointer is not None and resume and \
            (last := checkpointer.last_committed()) is not None:
        labels = checkpointer.load(last).localCheckpoint(eager=True)
        start_round = last
    else:
        labels = vertices.select("id", F.col("id").alias("label"))
    converged = False
    rounds = start_round
    timer = StageTimer()
    for rounds in range(start_round + 1, max_rounds + 1):
        # neighbor labels: for edge (src,dst), vertex src sees label(dst)
        neigh = sym.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        counts = neigh.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        # most frequent, ties -> min label: max over struct(c, -label)
        best = counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("s")
        ).select("id", (-F.col("s.nl")).alias("new_label"))
        # the fixpoint check rides the round's materialization as an
        # observed metric (count of vertices whose label moved) — one Spark
        # job per round, not a round job plus a compare-join job
        obs = Observation(f"lp_changed_{rounds}")
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id", F.coalesce("new_label", F.col("label")).alias("label"),
                (F.col("new_label") != F.col("label")).cast("int").alias("chg"))
            .observe(obs, F.sum("chg").alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        if checkpointer is not None:
            # durable commit off the in-memory blocks (no recompute); the
            # (id, label) frame is the full round state
            state = new_labels.select("id", "label")
            checkpointer.save(rounds, state)
            checkpointer.record(rounds, state, changed=changed,
                                converged=(changed == 0),
                                wall_ms=timer.lap_ms())
        # drop the previous round's checkpoint blocks (no-op on the lazy
        # initial select; frees the resumed checkpoint after round 1)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    return LabelPropResult(labels=labels.select("id", "label"), rounds=rounds,
                           converged=converged)


def weighted_label_propagation(
    edges: DataFrame,
    universe: DataFrame | None = None,
    max_rounds: int = 20,
    weight_col: str = "w",
) -> LabelPropResult:
    """Label propagation over a WEIGHTED undirected graph: per round each
    vertex takes the label with the largest total incident edge weight
    among its neighbors (ties -> smallest label) — anchor-quality or
    link-count weighted community detection for the webtext tier, where a
    heavily-linked neighbor should pull harder than a stray link.

    Undirected collapse: weight({a,b}) = Σ ``weight_col`` over ALL parallel
    rows in either direction (self-loops dropped), so a doubled link
    counts double — the categorical analogue of the reference's P9
    row-sum weight normalization (lightSpMV/PageRank.h:256-274).

    Determinism/oracle note: the argmax tie-break compares summed weights
    for exact equality, so weights should be exactly summable (integers,
    or doubles with exact binary representations) for cross-engine
    value-hash parity. Round shape matches ``label_propagation``: two
    hash-aggregate shuffles, no window, O(E)+O(V) state — the 100-TB plan
    is unchanged, only COUNT becomes SUM(w).
    """
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
                F.col(weight_col).cast("double").alias("w"))
        .groupBy("a", "b").agg(F.sum("w").alias("w"))
    )
    sym = sym.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionAll(
        sym.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    ).localCheckpoint(eager=True)

    vertices = sym.select(F.col("src").alias("id")).distinct()
    if universe is not None:
        vertices = vertices.unionAll(universe.select("id")).distinct()
    vertices = vertices.localCheckpoint(eager=True)

    labels = vertices.select("id", F.col("id").alias("label"))
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        neigh = sym.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label", "w")
        counts = neigh.groupBy("id", "label").agg(F.sum("w").alias("c"))
        best = counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("s")
        ).select("id", (-F.col("s.nl")).alias("new_label"))
        obs = Observation(f"wlp_changed_{rounds}")
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id", F.coalesce("new_label", F.col("label")).alias("label"),
                (F.col("new_label") != F.col("label")).cast("int").alias("chg"))
            .observe(obs, F.sum("chg").alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        if rounds > 1:
            labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    return LabelPropResult(labels=labels.select("id", "label"), rounds=rounds,
                           converged=converged)


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    universe: DataFrame | None = None,
    max_rounds: int = 20,
) -> LabelPropResult:
    """Semi-supervised label propagation: ``seeds (id, label)`` carry fixed
    class labels (spam/benign, topic ids); every round each NON-seed
    vertex takes the most frequent label among its LABELED neighbors
    (ties -> smallest label), or stays unlabeled (NULL) if it has none.
    Seeds never change — the categorical counterpart of TrustRank's
    continuous trust mass (Gyongyi et al., VLDB'04), and the classic
    guilt-by-association spam classifier over the host graph.

    Same round shape as ``label_propagation`` (two shuffles, no window);
    the only additions are a labeled-neighbor filter and the pinned-seed
    coalesce. Unreached vertices return ``label = NULL``.
    """
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    sym = sym.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        sym.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)

    vertices = sym.select(F.col("src").alias("id")).distinct()
    if universe is not None:
        vertices = vertices.unionAll(universe.select("id")).distinct()
    seed_tbl = seeds.select("id", F.col("label").cast("long").alias("seed_label"))
    state = (vertices.join(seed_tbl, "id", "left")
             .select("id", F.col("seed_label").alias("label"), "seed_label")
             .localCheckpoint(eager=True))
    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        neigh = sym.join(
            state.filter(F.col("label").isNotNull())
            .select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        counts = neigh.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        best = counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("s")
        ).select("id", (-F.col("s.nl")).alias("new_label"))
        obs = Observation(f"slp_changed_{rounds}")
        nxt = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("seed_label", "new_label", "label").alias("label"),
                "seed_label",
                (~F.coalesce("seed_label", "new_label", "label")
                 .eqNullSafe(F.col("label"))).cast("int").alias("chg"))
            .observe(obs, F.sum("chg").alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"] or 0)
        state.unpersist()
        state = nxt.select("id", "label", "seed_label")
        if changed == 0:
            converged = True
            break
    return LabelPropResult(labels=state.select("id", "label"), rounds=rounds,
                           converged=converged)
