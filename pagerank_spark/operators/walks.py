"""Deterministic random walks over the link graph (DeepWalk-style corpus).

Random-walk corpora are the standard input to graph-embedding training
(Perozzi et al., "DeepWalk", KDD 2014; Grover & Leskovec, "node2vec", KDD
2016) — for a web-scale training-data pipeline the walk generator IS the
dataset builder. This implementation makes the walks a pure function of
(start, walk serial, step, current vertex, seed): the "random" neighbor
choice is a hash mod out-degree, so the corpus is reproducible under any
partitioning and any cluster size, and the whole generator is expressible
in ANSI SQL for oracle checking (the same determinism discipline as the
engine's MinHash pipeline).

Scale shape: the adjacency index is built once — a banded two-level
prefix sum (see ``adjacency_index``), so no single task ranks a hub's
whole adjacency — and each step is two hash-joins:
walker-state x out-degree (V-scale both sides) then walker-state x
adjacency on the composite (src, idx) key (E-scale build side, equi-join,
no fan-out: exactly one neighbor row matches per walker). State never
exceeds |starts| x walks_per_vertex rows; per-step lineage is truncated
with localCheckpoint like every other iterative operator here. Walkers
that reach a dangling vertex stop (inner join against out-degree), the
reference's bookmark semantics (/root/reference/kernel_bblock.cu:606-609)
applied to walk termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import shared_hash60


def adjacency_index(edges: DataFrame, n_bands: int = 1024,
                    weight_col: str | None = None,
                    hot_threshold: int = 100_000) -> DataFrame:
    """(src, dst, idx, deg): neighbors of each source numbered 0..deg-1 in
    sorted-dst multiset order. Duplicate edges keep their multiplicity —
    a doubled link is twice as likely to be walked, matching the edge
    multiplicities that weight PageRank transitions.

    ``weight_col`` (small POSITIVE INTEGERS, e.g. an anchor-quality score
    1..K) generalizes multiplicity: an edge of weight w occupies w index
    slots, so a uniform pick over [0, deg) lands on it with probability
    w/Σw — weight-proportional transitions through the exact same integer
    machinery, still SQL-reproducible (no float cumulative sums whose
    addition order could differ across engines). deg becomes Σw and the
    index fan-out is Σw per source, so weights belong in a small range
    (validated by ``random_walks``), not raw counts.

    Scale shape — DEGREE-ADAPTIVE two-path prefix sum, the reference's
    small/large split (K2, kernel_bblock.cu:663-692) applied to full
    ranking. The prefix-sum window is the one gather Spark cannot rescue
    with InferWindowGroupLimit (every row keeps a running sum — nothing
    to push below the exchange), so a hub src would put its whole
    adjacency through ONE window task. But banding EVERY src was measured
    2.4x slower than the single window at 19.2M edges (the extra
    band-total/offset exchanges touch the full table — see
    BENCH/BASELINE.md skew campaign #3), so the split is routed per src:

      * srcs with <= ``hot_threshold`` distinct neighbors (webtext pages
        — out-degree bounded by page size) take the single-window plan:
        one exchange, running sum and unbounded total in the same sort;
      * hot srcs (found by one O(V)-row aggregate, bounded by pigeonhole
        at E/hot_threshold ids, routed via broadcast semi/anti joins)
        take the banded two-level plan: local running sums inside
        (src, band) — band = a dst-value range bucket, ~D/n_bands rows
        per window partition — then band totals -> base offsets via a
        window over <= n_bands rows, idx composed exactly.

    The output is invariant to ``n_bands`` AND ``hot_threshold`` (bands
    partition the dst ORDER, so offsets compose exactly); the DuckDB
    oracle stays the plain single-window row_number. Adversarial worst
    case — all of a hub's neighbors inside one band's value range —
    degrades to the single-sort plan, bounded by span/n_bands of the id
    space."""
    if weight_col is None:
        e = edges.select("src", "dst", F.lit(1).cast("long").alias("_w"))
    else:
        e = edges.select("src", "dst",
                         F.col(weight_col).cast("long").alias("_w"))
    # cnt feeds BOTH the hot-src detection and the prefix-sum path: pin it
    # once so detection does not cost a second full groupBy shuffle (the
    # unpinned version measured +2s on the sf0.1 walk suite)
    cnt = (e.groupBy("src", "dst").agg(F.sum("_w").alias("c"))
           .localCheckpoint(eager=True))
    hot_ids = (cnt.groupBy("src").agg(F.count(F.lit(1)).alias("nd"))
               .filter(F.col("nd") > hot_threshold)
               .select("src").localCheckpoint(eager=True))
    any_hot = bool(hot_ids.take(1))

    def _single_window(part: DataFrame) -> DataFrame:
        w_run = Window.partitionBy("src").orderBy("dst")
        w_all = Window.partitionBy("src")
        return part.select(
            "src", "dst",
            (F.sum("c").over(w_run) - F.col("c")).alias("first_idx"),
            "c", F.sum("c").over(w_all).alias("deg"))

    if not any_hot:
        start = _single_window(cnt)
    else:
        cold = cnt.join(F.broadcast(hot_ids), "src", "left_anti")
        hotc = cnt.join(F.broadcast(hot_ids), "src", "left_semi")
        span = hotc.agg(F.min("dst").alias("lo"),
                        F.max("dst").alias("hi")).first()
        lo, hi = int(span["lo"]), int(span["hi"])
        width = max(1, (hi - lo) // n_bands + 1)
        band = F.floor((F.col("dst") - F.lit(lo)) / F.lit(width)).cast("int")
        w_local = Window.partitionBy("src", "band").orderBy("dst")
        local = (hotc.withColumn("band", band)
                 .withColumn("lcum", F.sum("c").over(w_local)))
        band_tot = local.groupBy("src", "band").agg(F.sum("c").alias("bt"))
        w_band = Window.partitionBy("src").orderBy("band")
        w_src = Window.partitionBy("src")
        offs = band_tot.select(
            "src", "band",
            (F.sum("bt").over(w_band) - F.col("bt")).alias("boff"),
            F.sum("bt").over(w_src).alias("deg"))
        hot_start = (
            local.join(offs, ["src", "band"])
            .select("src", "dst",
                    (F.col("boff") + F.col("lcum") - F.col("c"))
                    .alias("first_idx"),
                    "c", "deg"))
        start = _single_window(cold).unionByName(hot_start)

    return start.select(
        "src", "dst", "deg",
        F.explode(F.sequence(
            F.col("first_idx"),
            F.col("first_idx") + F.col("c") - 1)).alias("idx"),
    ).select("src", "dst", F.col("idx").cast("int").alias("idx"), "deg")


MAX_WALK_WEIGHT = 10_000  # index fan-out per edge; keeps Σw ~ O(E)


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 42,
    starts: DataFrame | None = None,
    weight_col: str | None = None,
    coupled: bool = False,
) -> DataFrame:
    """Generate walks; returns ``(start_id, walk, step, vertex)`` rows.

    Every start vertex (default: all sources and destinations) emits
    ``walks_per_vertex`` walks of up to ``walk_length`` steps; step 0 is
    the start itself. The neighbor picked at step k is
    ``H(start:walk:k:cur:seed) mod out_deg(cur)`` with H the cross-engine
    60-bit md5 hash — deterministic and SQL-reproducible.

    ``coupled=True`` drops ``start`` from the hash: the pick becomes a
    function of (walk, step, CURRENT vertex) alone, so all serial-r
    walkers standing on the same vertex at the same step move together —
    the shared-randomness coupling of Fogaras-Racz fingerprints (WWW
    2005): two walks are independent while apart (different vertices ->
    different hash inputs) and COALESCE forever once they meet, exactly
    the first-meeting-time semantics MC SimRank needs.

    ``weight_col``: integer edge weights 1..MAX_WALK_WEIGHT (e.g. an
    anchor-quality score) bias the pick weight-proportionally via the
    weighted adjacency index — ``deg`` becomes Σw and an edge of weight w
    owns w index slots, so determinism and the SQL oracle carry over
    unchanged (exact integer arithmetic, no float cumsum).
    """
    if weight_col is not None:
        wb = edges.agg(F.min(weight_col).alias("lo"),
                       F.max(weight_col).alias("hi")).first()
        if wb["lo"] is not None and (
                wb["lo"] < 1 or wb["hi"] > MAX_WALK_WEIGHT
                or any(v != int(v) for v in (wb["lo"], wb["hi"]))):
            raise ValueError(
                f"walk weights must be integers in [1, {MAX_WALK_WEIGHT}]; "
                f"got range [{wb['lo']}, {wb['hi']}]")
    adj = adjacency_index(
        edges, weight_col=weight_col).localCheckpoint(eager=True)
    deg = adj.select("src", "deg").distinct()
    if starts is None:
        starts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
        )
    # a duplicated start would spawn an identical walker under the same
    # (start_id, walk) key and double-count every co-visitation
    starts = starts.select("id").distinct()
    state = starts.select(
        F.col("id").alias("start_id"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
        F.lit(0).alias("step"),
        F.col("id").alias("vertex"),
    ).localCheckpoint(eager=True)
    out = [state]
    for k in range(1, walk_length + 1):
        hash_fields = [
            F.col("walk").cast("string"),
            F.lit(str(k)),
            F.col("vertex").cast("string"),
            F.lit(str(seed)),
        ]
        if not coupled:
            hash_fields.insert(0, F.col("start_id").cast("string"))
        pick = shared_hash60(F.concat_ws(":", *hash_fields)) % F.col("deg")
        nxt = (
            state.join(deg.hint("shuffle_hash"),
                       state.vertex == deg.src)
            .withColumn("pick_idx", pick)
            .select("start_id", "walk", "pick_idx", F.col("vertex").alias("cur"))
            .join(adj.hint("shuffle_hash"),
                  (F.col("cur") == adj.src) & (F.col("pick_idx") == adj.idx))
            .select("start_id", "walk", F.lit(k).alias("step"),
                    F.col("dst").alias("vertex"))
            .localCheckpoint(eager=True)
        )
        # every step stays materialized — each is a slice of the result;
        # the caller unpersists via the returned plan going cold.
        state = nxt
        out.append(state)
        if not state.take(1):      # every walker hit a dangling vertex
            break
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def covisit_similarity(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 4,
    seed: int = 42,
    top_k: int = 5,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Walk-co-visitation similarity (the Pixie recommendation scheme,
    Eksombatchai et al., WWW 2018): vertices visited most often by walks
    started at s are s's neighbors-by-structure. Returns
    ``(start_id, vertex, visits)`` — the ``top_k`` most-visited vertices
    per start (self excluded), ties broken by vertex id so the ranking is
    deterministic (visit counts are exact integers).

    One aggregation over the walk corpus: at scale the corpus is the
    expensive part and is shared with any embedding training run."""
    w = random_walks(edges, walk_length=walk_length,
                     walks_per_vertex=walks_per_vertex, seed=seed,
                     starts=starts)
    counts = (
        w.filter((F.col("step") > 0) & (F.col("vertex") != F.col("start_id")))
        .groupBy("start_id", "vertex")
        .agg(F.count(F.lit(1)).alias("visits"))
    )
    win = Window.partitionBy("start_id").orderBy(
        F.desc("visits"), F.asc("vertex"))
    return (
        counts.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= top_k)
        .drop("rk")
    )


def pagerank_monte_carlo(
    edges: DataFrame,
    alpha: float = 0.85,
    walks_per_vertex: int = 8,
    max_length: int = 16,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Monte-Carlo PageRank estimate from the walk corpus (Avrachenkov et
    al., "Monte Carlo methods in PageRank computation", 2007): every
    vertex launches R walks; a walk CONTINUES past step j with probability
    alpha (here a deterministic hash coin on (start, walk, j, seed), so
    the estimate is bit-reproducible and SQL-expressible like the corpus
    itself); the PageRank estimate is each vertex's share of all surviving
    visits. Dangling vertices terminate walks (random_walks semantics) —
    the estimator family that stops at dangling rather than teleporting.

    An ESTIMATOR, not the fixed point: truncation at ``max_length`` drops
    a geometric tail <= alpha^max_length of visit mass, and accuracy grows
    with ``walks_per_vertex`` (stderr ~ 1/sqrt(R)). Its production role is
    the cheap pre-pass: one reusable walk corpus + one count, no O(E)
    iteration — rank plausibility checks, hub shortlists, warm-start
    vectors (feed the exact engine via ``pagerank(init_ranks=...)``).

    Returns ``(id, visits, rank_est)`` for all visited vertices (vertices
    never visited have estimate 0 and are omitted; join your universe if
    zeros matter).
    """
    w = random_walks(edges, walk_length=max_length,
                     walks_per_vertex=walks_per_vertex, seed=seed,
                     starts=starts)
    thresh = int(round(alpha * 1_000_000))

    def coin(j):
        return F.pmod(
            shared_hash60(F.concat_ws(
                ":",
                F.col("start_id").cast("string"),
                F.col("walk").cast("string"),
                j.cast("string"),
                F.lit(str(seed)),
                F.lit("c"),
            )),
            F.lit(1_000_000),
        ) < F.lit(thresh)

    alive = (F.col("step") == 0) | F.forall(
        F.sequence(F.lit(1), F.col("step")), coin)
    visits = (w.filter(alive)
              .groupBy(F.col("vertex").alias("id"))
              .agg(F.count(F.lit(1)).alias("visits")))
    tot = visits.agg(F.sum("visits").alias("t"))
    return (visits.crossJoin(F.broadcast(tot))
            .select("id", "visits",
                    (F.col("visits") / F.col("t")).alias("rank_est")))


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec, "node2vec", KDD 2016)
    over the DIRECTED link graph; returns ``(start_id, walk, step,
    vertex)`` rows like ``random_walks``.

    From state (prev, cur), the candidate x in N_out(cur) carries integer
    weight round(1000/p) if x == prev (return), 1000 if the edge
    prev -> x exists (stay near prev), round(1000/q) otherwise (explore) —
    the node2vec p/q biases as exact rationals, so the deterministic pick
    ``H(start:walk:k:cur:seed:b) mod total_weight`` against the inclusive
    cumulative weight is bit-reproducible and SQL-expressible. Step 1 has
    no prev and picks uniformly (the random_walks rule).

    Scale shape: per step, one E-scale candidates join (J1), one left
    join against the simple edge set to classify prev -> x, and ONE
    window pass per walker ordered by the adjacency index computing both
    the cumulative and total weight. The window partition is a walker's
    CURRENT out-neighborhood — bounded by max out-degree, which on the
    webtext tier is bounded by page size (unlike in-degree); this is the
    same justification as the anchor extraction fan-out. Walkers at a
    dangling vertex stop (inner candidates join).
    """
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be > 0: p={p} q={q}")
    w_ret, w_bfs, w_dfs = round(1000 / p), 1000, round(1000 / q)
    if min(w_ret, w_dfs) < 1:
        raise ValueError(f"p/q too large (weights truncate to 0): p={p} q={q}")

    adj = adjacency_index(edges).localCheckpoint(eager=True)
    deg = adj.select("src", "deg").distinct()
    simple = (edges.select(F.col("src").alias("prev"),
                           F.col("dst").alias("x"))
              .distinct().withColumn("pb", F.lit(1))
              .localCheckpoint(eager=True))
    if starts is None:
        starts = (edges.select(F.col("src").alias("id"))
                  .unionByName(edges.select(F.col("dst").alias("id"))))
    starts = starts.select("id").distinct()

    state = starts.select(
        F.col("id").alias("start_id"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))).alias("walk"),
        F.col("id").alias("prev"),           # placeholder, unused at step 1
        F.col("id").alias("vertex"),
    ).localCheckpoint(eager=True)
    out = [state.select("start_id", "walk", F.lit(0).alias("step"), "vertex")]

    for k in range(1, walk_length + 1):
        if k == 1:
            # uniform first hop (no prev yet)
            pick = shared_hash60(F.concat_ws(
                ":", F.col("start_id").cast("string"),
                F.col("walk").cast("string"), F.lit("1"),
                F.col("vertex").cast("string"), F.lit(str(seed)))) % F.col("deg")
            nxt = (state.join(deg.hint("shuffle_hash"),
                              state.vertex == deg.src)
                   .withColumn("pick_idx", pick)
                   .select("start_id", "walk", "pick_idx",
                           F.col("vertex").alias("cur"))
                   .join(adj.hint("shuffle_hash"),
                         (F.col("cur") == adj.src)
                         & (F.col("pick_idx") == adj.idx))
                   .select("start_id", "walk",
                           F.col("cur").alias("prev"),
                           F.col("dst").alias("vertex"))
                   .localCheckpoint(eager=True))
        else:
            cand = (state.join(adj.hint("shuffle_hash"),
                               state.vertex == adj.src)
                    .select("start_id", "walk", "prev",
                            F.col("vertex").alias("cur"),
                            F.col("dst").alias("x"), "idx"))
            cand = cand.join(simple, ["prev", "x"], "left")
            wcol = (F.when(F.col("x") == F.col("prev"), w_ret)
                    .when(F.col("pb") == 1, w_bfs)
                    .otherwise(w_dfs))
            win = Window.partitionBy("start_id", "walk").orderBy("idx")
            tot = Window.partitionBy("start_id", "walk")
            scored = cand.select(
                "start_id", "walk", "cur", "x",
                F.sum(wcol).over(win).alias("cum"),
                wcol.alias("w"),
                F.sum(wcol).over(tot).alias("t"))
            r = shared_hash60(F.concat_ws(
                ":", F.col("start_id").cast("string"),
                F.col("walk").cast("string"), F.lit(str(k)),
                F.col("cur").cast("string"), F.lit(str(seed)),
                F.lit("b"))) % F.col("t")
            nxt = (scored
                   .filter((F.col("cum") - F.col("w") <= r)
                           & (r < F.col("cum")))
                   .select("start_id", "walk",
                           F.col("cur").alias("prev"),
                           F.col("x").alias("vertex"))
                   .localCheckpoint(eager=True))
        state = nxt
        out.append(state.select("start_id", "walk", F.lit(k).alias("step"),
                                "vertex"))
        if not state.take(1):
            break
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
