"""Graph operators over derived edge lists.

`llm/dedup.py` already runs min-label-propagation connected components
over the similarity graph; this module adds centrality (PageRank) over
the trade graph the relational tables imply.  The scale pattern is the
same Pregel-shaped loop: per-iteration cost = one edge join + one
map-side-combined aggregate, lineage truncated so iteration k never
replays iterations 1..k-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_embeddings, load_table
from snapshot_s3_util_spark.registry import register

_PR_ITERS = 3
_PR_DAMP = 0.85

# Edge-frame checkpoints are LAZY (r15, guide §2.4/§5 — the CC loop's
# lazy-checkpoint pattern applied to the graph inputs): an eager
# checkpoint runs a separate driver-blocking materialization job per
# frame before any real work — `_strong_und_edges` stacked TWO of them
# (dir + und) on every undirected-graph op; lazy folds each into the
# first consuming action (the keyed-frontier count probe, a loop
# round's count, or the final collect), saving 1-3 sequential job
# barriers per op with identical plans and results. Interleaved A/B
# (one session, arms alternated, results asserted identical, sf0.1):
# pagerank lazy 6/7 pairs (med 1.849 -> 1.675 s), triangle 4/7
# (1.585 -> 1.531), LPA 6/9 on the deciding re-run (min 1.677 ->
# 1.606), bfs/kcore a wash inside host noise — no op measured a real
# loss, and the barrier count drops at any scale. Cost: racing stages
# of the materializing job can transiently compute a partition twice
# ("Block already exists" warnings) — bounded by one stage's work,
# and every frame here is deterministic, so duplicated compute is
# consistent.
_EDGE_CKPT_EAGER = False

_EDGES_SQL = """
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
"""


def _pagerank_oracle() -> str:
    """Unroll the damped power iteration as chained CTEs (exact —
    every engine computes the identical fixed iteration count)."""
    sql = f"""
WITH edges AS MATERIALIZED ({_EDGES_SQL}),
norm AS MATERIALIZED (
  SELECT src, dst,
         CAST(w AS DOUBLE) / SUM(w) OVER (PARTITION BY src) AS p
  FROM edges
),
nodes AS (SELECT n_nationkey AS node FROM nation),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
r{i} AS (
  SELECT n.node,
         (1 - {_PR_DAMP}) / (SELECT n FROM nn)
         + {_PR_DAMP} * COALESCE(SUM(e.p * r.rank), 0) AS rank
  FROM nodes n
  LEFT JOIN norm e ON e.dst = n.node
  LEFT JOIN {prev} r ON r.node = e.src
  GROUP BY n.node
)"""
        prev = f"r{i}"
    sql += f"""
SELECT na.n_name AS nation, ROUND(r.rank, 6) AS pagerank
FROM {prev} r JOIN nation na ON na.n_nationkey = r.node
"""
    return sql


@register("graph_pagerank", oracle=_pagerank_oracle(), category="graph")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the trade
    graph: customer-nation -> supplier-nation edges weighted by how
    many lineitems flow between them.

    The edge list is built once by the 4-way relational join (the
    dimension legs broadcast; the fact-side joins shuffle on their
    keys), out-normalized with one window, then `localCheckpoint`ed —
    the iteration loop must NOT replay the join lineage every pass.
    Each iteration is the Pregel step: edges JOIN ranks on src (ranks
    is |nodes| rows — broadcast), then a map-side-combined sum by dst.
    Dangling-node mass is dropped (sum < 1), the common simplification
    when ranks are used ordinally; the damping floor keeps every node
    nonzero. Fixed iteration count (not convergence) so the oracle can
    unroll the exact same computation — `llm_dedup_components` is the
    convergence-detection sibling.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    norm = edges.select(
        "src",
        "dst",
        (
            F.col("w").cast("double")
            / F.sum("w").over(Window.partitionBy("src"))
        ).alias("p"),
    ).localCheckpoint(eager=_EDGE_CKPT_EAGER)

    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_nodes = nodes.count()
    ranks = nodes.select(
        "node", (F.lit(1.0) / n_nodes).alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            norm.join(
                F.broadcast(ranks), norm["src"] == ranks["node"]
            )
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("mass"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1 - _PR_DAMP) / n_nodes)
                + _PR_DAMP * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.join(
        F.broadcast(nation), ranks["node"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), F.round("rank", 6).alias("pagerank"))


_SPATIAL_R = 0.02

_SPATIAL_ORACLE = f"""
WITH p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(SQRT((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM p a JOIN p b ON a.vec_id < b.vec_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      < {_SPATIAL_R} * {_SPATIAL_R}
"""


@register("join_spatial_grid", oracle=_SPATIAL_ORACLE, category="join")
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join in 2-D (all point pairs within L2 distance
    {_SPATIAL_R}) via GRID-CELL blocking — the spatial sibling of the
    interval-bucket joins: decompose the continuous predicate onto an
    equi key so Catalyst plans a hash join, never a cartesian.

    Points (the embedding's first two dims) land in square cells of
    width = radius; the LEFT side keeps its home cell, the RIGHT side
    replicates to its 3x3 neighborhood (one copy per cell — exactly
    the cells any within-radius partner's home can be in, since
    |dx|,|dy| < r means cell offsets are at most 1). Each qualifying
    pair therefore meets EXACTLY once (left's single home cell), so no
    dedup pass; vec_id ordering fixes orientation. Work is sum of
    cell-pair products, never |points|^2 — the oracle IS the naive
    quadratic join, result-identical by construction. The exact
    distance test rides the hash join as a residual.
    """
    emb = load_embeddings(spark, sf_dir)
    pts = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    cell = lambda col: F.floor(col / _SPATIAL_R).cast("long")  # noqa: E731
    left = pts.select(
        F.col("vec_id").alias("vec_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    right = (
        pts.select(
            F.col("vec_id").alias("vec_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            F.explode(
                F.array(*[F.lit(d) for d in (-1, 0, 1)])
            ).alias("dx"),
            cell(F.col("y")).alias("cy0"),
        )
        .select(
            "vec_b",
            "xb",
            "yb",
            (F.floor(F.col("xb") / _SPATIAL_R).cast("long") + F.col("dx")).alias("cx"),
            F.explode(
                F.array(*[F.lit(d) for d in (-1, 0, 1)])
            ).alias("dy"),
            "cy0",
        )
        .select(
            "vec_b", "xb", "yb", "cx", (F.col("cy0") + F.col("dy")).alias("cy")
        )
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(
            right,
            (left["cx"] == right["cx"])
            & (left["cy"] == right["cy"])
            & (left["vec_a"] < right["vec_b"]),
        )
        .filter(d2 < F.lit(_SPATIAL_R * _SPATIAL_R))
        .select("vec_a", "vec_b", F.round(F.sqrt(d2), 6).alias("dist"))
    )



# Canonical strong-trade undirected edge set — the relative-threshold
# (w >= 1.5x mean) canonical (a < b) graph shared by the triangle and
# BFS operators.  ONE definition per engine: the SQL CTE chain below
# and the Spark builder `_strong_und_edges` must stay in lockstep.
#
# Top-K floor (round 7): the 1.5x-mean cutoff is an OUTLIER test, and
# the nation-trade matrix concentrates as data grows — at sf0.1 no
# pair exceeds ~2.8x/2 of the mean and the graph self-empties, turning
# every strong-graph op vacuous.  The {_STRONG_TOPK} heaviest directed
# edges (ties: src, dst) are therefore always kept.  At sf0.001/sf0.01
# the top-{_STRONG_TOPK} all pass the threshold anyway (37/100 directed
# edges pass there), so small-SF outputs are BIT-IDENTICAL to the
# pre-floor definition — only the converged regimes gain edges.
_STRONG_TOPK = 36
_STRONG_UND_CTES = f"""edges AS MATERIALIZED ({_EDGES_SQL}),
stats AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_e, CAST(SUM(w) AS BIGINT) AS tot
  FROM edges WHERE src <> dst
),
ranked AS MATERIALIZED (
  SELECT src, dst, w,
         ROW_NUMBER() OVER (ORDER BY w DESC, src, dst) AS wr
  FROM edges WHERE src <> dst
),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ranked, stats
  WHERE 2 * w * n_e >= 3 * tot OR wr <= {_STRONG_TOPK}
)"""


def _strong_dir_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded DIRECTED strong-trade edges (src, dst): 4-way
    relational join -> weighted directed edges -> relative threshold
    (2*w*n_e >= 3*tot, i.e. w >= 1.5x mean) OR top-{_STRONG_TOPK}
    weight floor.  The pre-canonicalization stage of
    `_strong_und_edges`, exposed for the directed algorithms
    (`graph_scc_fwbw`).  All rank/normalizer windows run on the
    <= |nations|^2 edge aggregate — catalog-bounded."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(F.col("w").desc(), "src", "dst")
    return (
        edges.withColumn("n_e", F.count(F.lit(1)).over(wall))
        .withColumn("tot", F.sum("w").over(wall))
        .withColumn("wr", F.row_number().over(wrank))
        .filter(
            (2 * F.col("w") * F.col("n_e") >= 3 * F.col("tot"))
            | (F.col("wr") <= _STRONG_TOPK)
        )
        .select("src", "dst")
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )


def _strong_und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected strong-trade edge frame (a < b, distinct),
    localCheckpoint'ed — `_strong_dir_edges` canonicalized; ONE
    definition per engine, in lockstep with _STRONG_UND_CTES."""
    return (
        _strong_dir_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )


def _und_degrees(und: DataFrame) -> DataFrame:
    """(node, deg) over the canonical undirected edge frame."""
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _triangles_per_node(und: DataFrame) -> DataFrame:
    """(node, n_triangles) via degree-ordered wedge enumeration — the
    O(m^1.5) orientation trick shared by `graph_triangle_count` and
    `graph_clustering_coefficient` (see the former's docstring)."""
    deg = _und_degrees(und)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.col("deg_b").alias("deg_dst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.col("deg_a").alias("deg_dst"),
                )
            )
            .alias("e")
        )
        .select("e.src", "e.dst", "e.deg_dst")
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = (
        o1.join(o2, F.col("o1.src") == F.col("o2.src"))
        .filter(
            (F.col("o1.deg_dst") < F.col("o2.deg_dst"))
            | (
                (F.col("o1.deg_dst") == F.col("o2.deg_dst"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        )
        .select(
            F.col("o1.src").alias("x"),
            F.col("o1.dst").alias("v"),
            F.col("o2.dst").alias("w"),
        )
    )
    tri = wedges.join(
        F.broadcast(und),
        (F.least("v", "w") == und["a"]) & (F.greatest("v", "w") == und["b"]),
        "semi",
    )
    return (
        tri.select(F.explode(F.array("x", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


_TRI_ORACLE = f"""
WITH {_STRONG_UND_CTES},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT UNNEST([x, y, z]) AS node FROM tri)
  GROUP BY node
)
SELECT na.n_name AS nation,
       COALESCE(p.n_triangles, 0) AS n_triangles
FROM nation na LEFT JOIN per_node p ON p.node = na.n_nationkey
"""


@register("graph_triangle_count", oracle=_TRI_ORACLE, category="graph")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting over the strong-trade graph (edges
    whose lineitem flow is >= 1.5x the mean — a relative threshold, so
    the graph sparsifies identically at every scale factor).  Per-
    nation triangle participation counts, zero-filled from the nation
    dimension.

    Implemented with DEGREE-ORDERED edge orientation (each undirected
    edge points from its lower-(degree, id) endpoint), the standard
    trick that bounds wedge generation by sum(min-degree) instead of
    sum(degree**2) — on a power-law graph at 100 TB this is the
    difference between the hub node exploding into |hub-degree|**2
    wedge candidates and the provable O(m**1.5) bound.  The closing-
    edge check is a broadcast-hash semi join on the canonical pair.
    The oracle counts the same triangles with the naive a<b triple
    self-join — two different enumeration orders, identical set.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    und = _strong_und_edges(spark, sf_dir)
    per_node = _triangles_per_node(und)
    return nation.join(
        F.broadcast(per_node), nation["n_nationkey"] == per_node["node"], "left"
    ).select(
        F.col("n_name").alias("nation"),
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
    )


_BFS_SRC = 0
_BFS_ROUNDS = 3

_UND_EDGES_SQL = f"""
  WITH {_STRONG_UND_CTES}
  SELECT a AS u, b AS v FROM und
  UNION ALL
  SELECT b AS u, a AS v FROM und
"""


def _bfs_oracle() -> str:
    sql = f"""
WITH sym AS MATERIALIZED ({_UND_EDGES_SQL}),
h0 AS (SELECT {_BFS_SRC} AS node, 0 AS hops)"""
    prev = "h0"
    for i in range(1, _BFS_ROUNDS + 1):
        sql += f""",
h{i} AS MATERIALIZED (
  SELECT node, MIN(hops) AS hops FROM (
    SELECT node, hops FROM {prev}
    UNION ALL
    SELECT e.v AS node, p.hops + 1 AS hops
    FROM {prev} p JOIN sym e ON e.u = p.node
  ) GROUP BY node
)"""
        prev = f"h{i}"
    sql += f"""
SELECT na.n_name AS nation,
       CAST(COALESCE(h.hops, -1) AS BIGINT) AS hops
FROM nation na LEFT JOIN {prev} h ON h.node = na.n_nationkey
"""
    return sql


@register("graph_bfs_hops", oracle=_bfs_oracle(), category="graph")
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path layers from nation {_BFS_SRC} over the same
    relative-threshold strong-trade graph as `graph_triangle_count`:
    {_BFS_ROUNDS} fixed frontier expansions (so the oracle can unroll
    the identical iteration as CTEs, like `graph_pagerank`), nodes
    still unreached report -1 — on a sparsified graph that's a real
    outcome, not a placeholder.

    Plan: the symmetric edge list is built once and localCheckpoint'ed
    (lineage truncation; each round must not replay the 4-way join);
    every round = frontier ⋈ broadcast edges + a map-side-combined
    MIN — the Pregel step.  At 100 TB the frontier frame is |V|-sized
    and the per-round shuffle carries only (node, hops) pairs;
    convergence-detection (as in `llm_dedup_components`) would replace
    the fixed unroll in production, traded here for an exact oracle.

    r15 (r14 verdict ask #8): past the `_use_keyed_frontier` breakeven
    the rounds dispatch to `_bfs_round_keyed` (the `_keyed` twin's
    rounds, output-identical) — see `graph_label_propagation`.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cano = _strong_und_edges(spark, sf_dir)
    keyed = _use_keyed_frontier(cano)
    sym = cano.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        cano.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    sym = (sym.repartition("u") if keyed else sym).localCheckpoint(
        eager=_EDGE_CKPT_EAGER
    )
    hops = spark.createDataFrame([(_BFS_SRC, 0)], "node int, hops int")
    for _ in range(_BFS_ROUNDS):
        if keyed:
            hops = _bfs_round_keyed(sym, hops).localCheckpoint()
            continue
        expanded = (
            sym.join(F.broadcast(hops), sym["u"] == hops["node"])
            .select(F.col("v").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        hops = (
            hops.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    return nation.join(
        F.broadcast(hops), nation["n_nationkey"] == hops["node"], "left"
    ).select(
        F.col("n_name").alias("nation"),
        F.coalesce("hops", F.lit(-1)).cast("bigint").alias("hops"),
    )


# --- r15 (r14 verdict ask #8): broadcast-vs-keyed frontier dispatch.
# The base LPA/BFS ops broadcast the per-round |V|-row label/frontier
# frame; the `_keyed` twins shuffle it by key. Measured at the stress
# tiers (STRESS.md r15 matrix), the keyed premium on these
# nation-derived graphs is ~0 (walls within host noise through 100x,
# |V| <= 2,500), so no wall crossover is reachable — the breakeven is
# set by broadcast SAFETY, not speed: a HashedRelation of the frontier
# costs ~50 B/node per round on the driver and every executor, and the
# guide's §3.1 bound ("a few hundred MB is fine; multiple GB is asking
# for OOMs", 8 GB hard cap) puts the flip at a few million nodes.
# Default: |E| >= 2M canonical edges (|V| <= 2|E|, frontier relation
# then approaching ~200 MB) routes the base op through the keyed
# rounds. The probe is one count() over the ALREADY-materialized
# checkpointed edge frame (Catalyst stats are unusable there — a
# checkpointed LogicalRDD reports the defaultSizeInBytes sentinel,
# measured 2.6e20 at sf0.1), bounded by the catalog (|E| <= |nations|^2
# here) and costing one near-empty job. Conf-overridable; <= 0 forces
# keyed (used by tests to pin the dispatch plan).
_KEYED_FRONTIER_MIN_EDGES = 2_000_000
_KEYED_FRONTIER_MIN_EDGES_CONF = (
    "spark.snapshot_s3_util.graph.keyedFrontierMinEdges"
)


def _use_keyed_frontier(und: DataFrame) -> bool:
    """True when the graph's canonical edge frame is large enough that
    the per-round |V| frontier must move by keyed shuffle instead of
    broadcast (see the constants block above for the breakeven)."""
    sess = und.sparkSession
    try:
        thr = int(
            sess.conf.get(
                _KEYED_FRONTIER_MIN_EDGES_CONF,
                str(_KEYED_FRONTIER_MIN_EDGES),
            )
        )
    except Exception:
        thr = _KEYED_FRONTIER_MIN_EDGES
    if thr <= 0:
        return True
    return und.count() >= thr


def _bfs_round_keyed(sym: DataFrame, hops: DataFrame) -> DataFrame:
    """One BFS frontier expansion with the hops frame joined by KEY
    (shuffle-hash hint) instead of broadcast. Factored out so
    tests/test_plans.py can assert the round plan contains no
    broadcast of the |V|-sized frontier."""
    expanded = sym.join(
        hops.hint("shuffle_hash"), sym["u"] == hops["node"]
    ).select(F.col("v").alias("node"), (F.col("hops") + 1).alias("hops"))
    return (
        hops.unionByName(expanded)
        .groupBy("node")
        .agg(F.min("hops").alias("hops"))
    )


@register("graph_bfs_hops_keyed", oracle=_bfs_oracle(), category="graph")
def graph_bfs_hops_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`graph_bfs_hops` with the per-round frontier joined by KEY
    instead of broadcast — the companion twin to
    `graph_label_propagation_keyed` (r13 verdict ask #6). The base
    plan broadcasts the accumulating (node, hops) frame every round;
    after enough expansions that frame is |V|-sized, and at web scale
    a |V| broadcast per round is the bottleneck the Pregel model
    exists to avoid. Here the symmetric edge list is hash-partitioned
    on u once and checkpointed; each round shuffle-hash-joins the
    frontier on its key (|frontier| rows of network, never a
    single-executor structure) and the MIN-combine shuffles at most
    |V| (node, hops) pairs with map-side partials. Same fixed
    {_BFS_ROUNDS}-round unroll, same oracle: output-identical to the
    base op; STRESS.md records the keyed premium on this small graph.
    """
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cano = _strong_und_edges(spark, sf_dir)
    sym = (
        cano.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(cano.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .repartition("u")
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )
    hops = spark.createDataFrame([(_BFS_SRC, 0)], "node int, hops int")
    for _ in range(_BFS_ROUNDS):
        hops = _bfs_round_keyed(sym, hops).localCheckpoint()
    # nation is a true O(|nations|) dimension; broadcasting IT stays
    # correct at any scale (see graph_label_propagation_keyed)
    return nation.join(
        F.broadcast(hops), nation["n_nationkey"] == hops["node"], "left"
    ).select(
        F.col("n_name").alias("nation"),
        F.coalesce("hops", F.lit(-1)).cast("bigint").alias("hops"),
    )


_ASSORT_ORACLE = f"""
WITH {_STRONG_UND_CTES},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
),
ends AS (
  SELECT da.d AS du, db.d AS dv
  FROM und e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
),
sym AS (
  SELECT du AS x, dv AS y FROM ends
  UNION ALL
  SELECT dv AS x, du AS y FROM ends
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM sym
)
SELECT n AS n_edge_ends,
       ROUND((n * sxy - sx * sy)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS assortativity
FROM m
"""


@register("graph_assortativity", oracle=_ASSORT_ORACLE, category="graph")
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the strong-trade graph — the Pearson
    correlation of degrees across edge endpoints (do high-degree hubs
    connect to hubs, or to leaves?), the graph-health statistic that
    predicts whether degree-ordered algorithms (triangle counting's
    orientation) will pay off.  Both edge directions enter the sum
    (the standard undirected convention); all moments are exact
    BIGINTs like `ts_cross_correlation`.

    Plan: edges come from the shared checkpointed builder; degrees,
    endpoint join and the moment reduce all run on |E|-sized frames.
    """
    und = _strong_und_edges(spark, sf_dir)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("dv"))
    ends = und.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    sym = ends.select(
        F.col("du").alias("x"), F.col("dv").alias("y")
    ).unionAll(ends.select(F.col("dv").alias("x"), F.col("du").alias("y")))
    m = sym.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return m.select(
        F.col("n").alias("n_edge_ends"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(
                    (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                        "double"
                    )
                )
            ),
            6,
        ).alias("assortativity"),
    )


_LINKPRED_ORACLE = f"""
WITH {_STRONG_UND_CTES},
adj AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL
  SELECT b AS node, a AS nbr FROM und
),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY node
),
cand AS MATERIALIZED (
  SELECT x.node AS u, y.node AS v, CAST(COUNT(*) AS BIGINT) AS common
  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY x.node, y.node
),
nonedge AS (
  SELECT c.u, c.v, c.common
  FROM cand c LEFT JOIN und e ON e.a = c.u AND e.b = c.v
  WHERE e.a IS NULL
)
SELECT ne.u, ne.v, ne.common AS common_neighbors,
       ROUND(CAST(ne.common AS DOUBLE) / (du.d + dv.d - ne.common), 6)
         AS jaccard
FROM nonedge ne
JOIN deg du ON du.node = ne.u
JOIN deg dv ON dv.node = ne.v
"""


@register("graph_link_prediction", oracle=_LINKPRED_ORACLE, category="graph")
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the strong-trade graph:
    for every NON-adjacent node pair that shares at least one
    neighbor, emit the common-neighbor count and the neighborhood
    Jaccard coefficient |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the classic
    "which edge forms next" baseline (Liben-Nowell & Kleinberg).

    Plan shape (the part that must survive 100 TB): candidate pairs
    come from a WEDGE self-join on the shared-neighbor key — work is
    Σ deg(n)², never |V|² — and existing edges are removed with a
    broadcast-able anti-join against the checkpointed edge frame.
    Degrees join back via broadcast; every frame after the wedge
    reduce is |candidates|-sized.
    """
    und = _strong_und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x = adj.select(F.col("node").alias("u"), F.col("nbr").alias("n"))
    y = adj.select(F.col("node").alias("v"), F.col("nbr").alias("n"))
    cand = (
        x.join(y, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    nonedge = cand.join(
        F.broadcast(und),
        (cand["u"] == und["a"]) & (cand["v"] == und["b"]),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        nonedge.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            F.col("common").alias("common_neighbors"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


_LPA_ROUNDS = 2


def _lpa_oracle() -> str:
    ctes = [
        f"WITH {_STRONG_UND_CTES}",
        """adj AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL
  SELECT b AS node, a AS nbr FROM und
)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj)",
    ]
    for k in range(1, _LPA_ROUNDS + 1):
        ctes.append(
            f"""l{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM (
      SELECT a.node, l.label, CAST(COUNT(*) AS BIGINT) AS c
      FROM adj a JOIN l{k - 1} l ON l.node = a.nbr
      GROUP BY a.node, l.label
    )
  ) WHERE rn = 1
)"""
        )
    return (
        ",\n".join(ctes)
        + f"""
SELECT na.n_name AS nation,
       CAST(l.label AS BIGINT) AS community,
       CAST(COUNT(*) OVER (PARTITION BY l.label) AS BIGINT)
         AS community_size
FROM l{_LPA_ROUNDS} l JOIN nation na ON na.n_nationkey = l.node
"""
    )


@register("graph_label_propagation", oracle=_lpa_oracle(), category="graph")
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    strong-trade graph: every node starts in its own community, then
    for a fixed 2 rounds adopts the MODE of its neighbors' labels
    (ties: highest count, then smallest label — fully deterministic,
    unlike classic randomized LPA).  The oracle unrolls the identical
    rounds as chained CTEs, so the check is exact, not rows-only
    (`graph_pagerank` discipline).

    Plan: the edge frame is built once and checkpointed; each round is
    one |E|-sized join against the BROADCAST current label frame
    (|V| rows) plus a map-side-combined (node, label) count and a
    per-node argmax window — per-round shuffle is bounded by
    |distinct (node, label)| ≤ |E|, and lineage stays flat because
    rounds are unrolled, not iterated driver-side.

    r15 (r14 verdict ask #8): past the `_use_keyed_frontier` breakeven
    the rounds dispatch to `_lpa_round_keyed` — the same rounds the
    `_keyed` twin runs, output-identical (shared oracle), so only the
    join strategy flips once |V| outgrows what a per-round broadcast
    should carry. On this catalog-bounded graph (|E| <= |nations|^2)
    the broadcast branch is always taken; the dispatch exists for the
    deployment where the edge frame is real.
    """
    und = _strong_und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    if _use_keyed_frontier(und):
        adj = adj.repartition("nbr").localCheckpoint(
            eager=_EDGE_CKPT_EAGER
        )
        labels = adj.select("node").distinct().withColumn(
            "label", F.col("node")
        )
        for _ in range(_LPA_ROUNDS):
            labels = _lpa_round_keyed(adj, labels)
    else:
        labels = adj.select("node").distinct().withColumn(
            "label", F.col("node")
        )
        for _ in range(_LPA_ROUNDS):
            nb = labels.select(
                F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
            )
            counts = (
                adj.join(F.broadcast(nb), "nbr")
                .groupBy("node", "nbr_label")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            )
            w = Window.partitionBy("node").orderBy(
                F.col("c").desc(), F.col("nbr_label").asc()
            )
            labels = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("nbr_label").alias("label"))
            )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sized = labels.withColumn(
        "community_size",
        F.count(F.lit(1)).over(Window.partitionBy("label")).cast("bigint"),
    )
    return sized.join(
        F.broadcast(nation), sized["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.col("label").cast("bigint").alias("community"),
        "community_size",
    )


def _lpa_round_keyed(adj: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round with the label frame joined by KEY
    (shuffle-hash hint) instead of broadcast — the web-scale frontier
    recipe. Factored out so tests/test_plans.py can assert the round
    plan contains no broadcast of the |V| frame."""
    nb = labels.select(
        F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
    )
    counts = (
        adj.join(nb.hint("shuffle_hash"), "nbr")
        .groupBy("node", "nbr_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("nbr_label").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("node", F.col("nbr_label").alias("label"))
    )


@register(
    "graph_label_propagation_keyed", oracle=_lpa_oracle(), category="graph"
)
def graph_label_propagation_keyed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`graph_label_propagation` with the per-round label frame joined
    by KEY instead of broadcast — the r13 verdict ask #6 twin that
    makes the base op's standing nit concrete. The base plan
    broadcasts the |V|-row label frame every round: fine for this
    dimension-derived graph (|V| <= |nations|), wrong at web scale,
    where |V| outgrows executor memory and the broadcast becomes the
    round's bottleneck. Here every round is a shuffle-hash join of
    the adjacency frame (hash-partitioned on nbr ONCE, checkpointed,
    so the edge side's partitioning is reusable across rounds)
    against the label frame shuffled on its key — per-round network
    is bounded by |V| label rows + |distinct (node, label)| combine
    output, with NO structure that must fit on one executor. Same
    rounds, same deterministic tie-break, same oracle: the twins are
    provably output-identical; STRESS.md records the keyed premium
    on these small graphs (the insurance cost) next to the base row.
    """
    und = _strong_und_edges(spark, sf_dir)
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(
            und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
        .repartition("nbr")
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )
    labels = adj.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(_LPA_ROUNDS):
        labels = _lpa_round_keyed(adj, labels)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    sized = labels.withColumn(
        "community_size",
        F.count(F.lit(1)).over(Window.partitionBy("label")).cast("bigint"),
    )
    # nation is a true O(|nations|) dimension — broadcasting IT is the
    # correct plan at any scale; the claim this twin retires is the
    # per-round |V| label-frame broadcast, not dimension broadcasts
    return sized.join(
        F.broadcast(nation), sized["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.col("label").cast("bigint").alias("community"),
        "community_size",
    )


_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    # Each round references the previous edge CTE three times (twice in
    # the degree union, once in the filter join); DuckDB inlines
    # non-materialized CTEs, so WITHOUT the MATERIALIZED hints the
    # 4-way-join edge builder would be re-evaluated O(3^rounds) times —
    # at sf0.1 that spilled >80 GB before failing.  Materializing each
    # round keeps the oracle linear in rounds.
    ctes = [
        f"WITH {_STRONG_UND_CTES}",
        "e0 AS MATERIALIZED (SELECT a, b FROM und)",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""deg{p} AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p}
  ) GROUP BY node
),
keep{r} AS MATERIALIZED (SELECT node FROM deg{p} WHERE d >= {_KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{p} e
  JOIN keep{r} ka ON ka.node = e.a
  JOIN keep{r} kb ON kb.node = e.b
)"""
        )
    last = _KCORE_ROUNDS
    return (
        ",\n".join(ctes)
        + f""",
fdeg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e{last} UNION ALL SELECT b AS node FROM e{last}
  ) GROUP BY node
)
SELECT na.n_name AS nation, f.d AS core_degree
FROM fdeg f JOIN nation na ON na.n_nationkey = f.node
WHERE f.d >= {_KCORE_K}
"""
    )


@register("graph_kcore", oracle=_kcore_oracle(), category="graph")
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2, 3 unrolled peeling rounds) of the
    strong-trade graph: repeatedly strip nodes of degree < k until
    (approximately) only the dense core survives — the community-core
    / influence-zone primitive, and the standard preprocessing cut
    before expensive clique-ish analytics.

    The oracle unrolls the IDENTICAL peel rounds as chained CTEs
    (`graph_pagerank` discipline) so the check is exact.  Fixed-round
    unrolling, like BFS/LPA here, keeps lineage flat; a
    run-to-convergence variant uses the `llm_dedup_components`
    checkpoint-per-round loop unchanged.

    Plan: each round is two broadcast semi joins of the (tiny,
    shrinking) keep-list against the edge frame plus one
    map-side-combined degree count — never a corpus-sized shuffle;
    the edge frame comes from the shared checkpointed builder.
    """
    edges = _strong_und_edges(spark, sf_dir)
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionAll(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        keep = deg.filter(F.col("d") >= _KCORE_K).select("node")
        edges = edges.join(
            F.broadcast(keep.withColumnRenamed("node", "a")), "a", "semi"
        ).join(F.broadcast(keep.withColumnRenamed("node", "b")), "b", "semi")
    fdeg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .filter(F.col("d") >= _KCORE_K)
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return fdeg.join(
        F.broadcast(nation), fdeg["node"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), F.col("d").alias("core_degree"))


_SSSP_SRC = 0
_SSSP_ROUNDS = 3


def _sssp_oracle() -> str:
    # weighted directed trade edges with an integer cost; every round
    # CTE is MATERIALIZED (graph_kcore lesson: DuckDB inlines CTEs and
    # re-evaluates the 4-way edge builder exponentially otherwise)
    ctes = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL}),",
        f"""we AS MATERIALIZED (
  SELECT src, dst, CAST(1 + 1000000 // w AS BIGINT) AS cost
  FROM edges WHERE src <> dst
),
d0 AS MATERIALIZED (
  SELECT CAST({_SSSP_SRC} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
)""",
    ]
    for r in range(1, _SSSP_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.cost AS dist
    FROM d{p} d JOIN we e ON e.src = d.node
  ) GROUP BY node
)"""
        )
    return (
        "\n".join(ctes[:1])
        + "\n"
        + ",\n".join(ctes[1:])
        + f"""
SELECT na.n_name AS nation, CAST(d.dist AS BIGINT) AS dist
FROM d{_SSSP_ROUNDS} d JOIN nation na ON na.n_nationkey = d.node
"""
    )


@register("graph_sssp_weighted", oracle=_sssp_oracle(), category="graph")
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford, 3 unrolled
    relaxation rounds) over the DIRECTED customer→supplier trade
    graph, edge cost = 1 + 1e6//volume — heavy trade lanes are cheap
    hops, so the distance is a trade-remoteness metric
    (`graph_bfs_hops` is the unweighted sibling; 3 rounds bound the
    path length exactly like its frontier unroll).

    Costs are EXACT integers (floor-div of constants by the BIGINT
    volume), so min-distance ties are impossible to get wrong across
    engines; the oracle unrolls identical MATERIALIZED round CTEs.

    Plan: the weighted edge list is built once from the 4-way join
    and checkpointed; each round is one broadcast-able |frontier|⋈|E|
    join plus a map-side-combined MIN — per-round shuffle is bounded
    by |V| after the combine.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    we = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .select(
            "src",
            "dst",
            (1 + F.floor(F.lit(1000000) / F.col("w"))).cast("bigint").alias(
                "cost"
            ),
        )
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )
    dist = (
        we.sparkSession.range(1)
        .select(
            F.lit(_SSSP_SRC).cast("bigint").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            F.broadcast(dist)
            .join(we, dist["node"] == we["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("cost")).alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return dist.join(
        F.broadcast(nation), dist["node"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), "dist")


_HITS_ROUNDS = 3


def _hits_oracle() -> str:
    # auth/hub power iteration over the DIRECTED weighted trade graph,
    # L1-normalized each round; every round CTE MATERIALIZED (the CTE
    # inlining lesson), every update an identical float expression.
    ctes = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL}),",
        """we AS MATERIALIZED (
  SELECT src, dst, CAST(w AS DOUBLE) AS w FROM edges WHERE src <> dst
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM we UNION ALL SELECT dst AS node FROM we
  )
),
h0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) AS h FROM nodes)""",
    ]
    prev_h = "h0"
    for r in range(1, _HITS_ROUNDS + 1):
        ctes.append(
            f"""a{r}raw AS MATERIALIZED (
  SELECT e.dst AS node, SUM(e.w * p.h) AS v
  FROM we e JOIN {prev_h} p ON p.node = e.src
  GROUP BY e.dst
),
a{r} AS MATERIALIZED (
  SELECT node, v / (SELECT SUM(v) FROM a{r}raw) AS a FROM a{r}raw
),
h{r}raw AS MATERIALIZED (
  SELECT e.src AS node, SUM(e.w * q.a) AS v
  FROM we e JOIN a{r} q ON q.node = e.dst
  GROUP BY e.src
),
h{r} AS MATERIALIZED (
  SELECT node, v / (SELECT SUM(v) FROM h{r}raw) AS h FROM h{r}raw
)"""
        )
        prev_h = f"h{r}"
    last = _HITS_ROUNDS
    return (
        "\n".join(ctes[:1])
        + "\n"
        + ",\n".join(ctes[1:])
        + f"""
SELECT na.n_name AS nation,
       ROUND(COALESCE(a.a, 0), 6) AS authority,
       ROUND(COALESCE(h.h, 0), 6) AS hub
FROM nation na
LEFT JOIN a{last} a ON a.node = na.n_nationkey
LEFT JOIN h{last} h ON h.node = na.n_nationkey
WHERE ROUND(COALESCE(a.a, 0), 6) > 0 OR ROUND(COALESCE(h.h, 0), 6) > 0
"""
    )


@register("graph_hits", oracle=_hits_oracle(), category="graph")
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities ({_HITS_ROUNDS} rounds, L1-normalized)
    over the DIRECTED weighted trade graph: authorities are nations
    whose SUPPLIERS absorb flow from strong buyers, hubs are nations
    whose CUSTOMERS drive flow to strong suppliers — the two-sided
    centrality PageRank's single score can't separate (an
    import-heavy nation can be a top hub and a nobody authority).

    Determinism: each round's updates are the same float expressions
    over the same operands on both engines (map-side-combined sums,
    L1 normalizer broadcast); rounded once at the end.

    Plan: weighted edges built once and checkpointed; per half-round
    one |E|⋈broadcast-score join + combine — the `graph_pagerank`
    Pregel shape with two alternating score frames.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    we = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=_EDGE_CKPT_EAGER)
    )
    nodes = (
        we.select(F.col("src").alias("node"))
        .unionAll(we.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = nodes.select("node", F.lit(1.0).alias("h"))
    a = None
    for _ in range(_HITS_ROUNDS):
        araw = (
            we.join(
                F.broadcast(h.select(F.col("node").alias("src"), "h")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("h")).alias("v"))
        )
        asum = araw.agg(F.sum("v").alias("s"))
        a = araw.crossJoin(F.broadcast(asum)).select(
            "node", (F.col("v") / F.col("s")).alias("a")
        )
        hraw = (
            we.join(
                F.broadcast(a.select(F.col("node").alias("dst"), "a")), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("w") * F.col("a")).alias("v"))
        )
        hsum = hraw.agg(F.sum("v").alias("s"))
        h = hraw.crossJoin(F.broadcast(hsum)).select(
            "node", (F.col("v") / F.col("s")).alias("h")
        )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    scores = (
        nation.join(
            a.withColumnRenamed("node", "n_nationkey"), "n_nationkey", "left"
        )
        .join(
            h.withColumnRenamed("node", "n_nationkey"), "n_nationkey", "left"
        )
        .select(
            F.col("n_name").alias("nation"),
            F.round(F.coalesce(F.col("a"), F.lit(0.0)), 6).alias("authority"),
            F.round(F.coalesce(F.col("h"), F.lit(0.0)), 6).alias("hub"),
        )
    )
    return scores.filter((F.col("authority") > 0) | (F.col("hub") > 0))


_WALK_STEPS = 3


def _walk_oracle() -> str:
    ctes = [
        f"WITH {_STRONG_UND_CTES}",
        """adj AS MATERIALIZED (
  SELECT a AS node, b AS nbr FROM und
  UNION ALL
  SELECT b AS node, a AS nbr FROM und
)""",
        """w0 AS MATERIALIZED (
  SELECT DISTINCT node AS start, node AS cur,
         CAST(node AS STRING) AS path
  FROM adj
)""",
    ]
    for k in range(1, _WALK_STEPS + 1):
        ctes.append(
            f"""w{k} AS MATERIALIZED (
  SELECT start, nbr AS cur, path || '->' || CAST(nbr AS STRING) AS path
  FROM (
    SELECT w.start, w.path, a.nbr,
           ROW_NUMBER() OVER (
             PARTITION BY w.start
             ORDER BY MD5(CAST({k} AS STRING) || ':'
                          || CAST(w.cur AS STRING) || ':'
                          || CAST(a.nbr AS STRING)), a.nbr) AS rn
    FROM w{k - 1} w JOIN adj a ON a.node = w.cur
  ) WHERE rn = 1
)"""
        )
    return (
        ",\n".join(ctes)
        + f"""
SELECT na.n_name AS start_nation, w.path,
       CAST(w.cur AS BIGINT) AS end_node
FROM w{_WALK_STEPS} w JOIN nation na ON na.n_nationkey = w.start
"""
    )


@register("graph_random_walk", oracle=_walk_oracle(), category="graph")
def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic "random" walks ({_WALK_STEPS} steps from every
    node of the strong-trade graph): each step hops to the neighbor
    with the minimal md5(step:cur:neighbor) hash — the node2vec/
    DeepWalk corpus-sampling primitive with the lottery replaced by a
    content-stable hash, so walks are IDENTICAL across re-runs,
    engines, and backfills (a seeded RNG walk changes with
    partitioning; these never do).  Emits the full path string and
    endpoint per start node.

    The oracle unrolls the identical steps as MATERIALIZED CTEs
    (`graph_kcore` discipline).

    Plan: per step one frontier⋈adjacency join (frontier = |V| rows,
    broadcast) + a per-start argmin window — the BFS/LPA Pregel shape
    with a hash-argmin instead of min-label.
    """
    und = _strong_und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    walk = adj.select("node").distinct().select(
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.col("node").cast("string").alias("path"),
    )
    for k in range(1, _WALK_STEPS + 1):
        cand = F.broadcast(walk).join(
            adj, walk["cur"] == adj["node"]
        ).select(
            "start",
            "path",
            "nbr",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(k)),
                    F.col("cur").cast("string"),
                    F.col("nbr").cast("string"),
                )
            ).alias("h"),
        )
        w = Window.partitionBy("start").orderBy("h", "nbr")
        walk = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "start",
                F.col("nbr").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("nbr").cast("string")
                ).alias("path"),
            )
        )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return walk.join(
        F.broadcast(nation), walk["start"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("start_nation"),
        "path",
        F.col("cur").cast("bigint").alias("end_node"),
    )


def _modularity_oracle() -> str:
    # reuse the LPA label CTE chain, then score the partition
    lpa = _lpa_oracle()
    head, _tail = lpa.rsplit("SELECT na.n_name", 1)
    # modularity references und and the final label CTE THREE times
    # each; DuckDB inlines plain CTEs (the graph_kcore 80 GB lesson),
    # so materialize every CTE in the reused LPA chain too
    for name in ("edges", "und", "adj", "l0") + tuple(
        f"l{k}" for k in range(1, _LPA_ROUNDS + 1)
    ):
        head = head.replace(f"{name} AS (", f"{name} AS MATERIALIZED (")
    return (
        head.rstrip()
        + ",\n"
        + f"""m AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und
),
internal AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_internal
  FROM und e
  JOIN l{_LPA_ROUNDS} la ON la.node = e.a
  JOIN l{_LPA_ROUNDS} lb ON lb.node = e.b
  WHERE la.label = lb.label
),
degsum AS MATERIALIZED (
  SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS dsum
  FROM l{_LPA_ROUNDS} l
  JOIN (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
    ) GROUP BY node
  ) d ON d.node = l.node
  GROUP BY l.label
)
SELECT (SELECT n_edges FROM m) AS n_edges,
       (SELECT n_internal FROM internal) AS n_internal_edges,
       CAST((SELECT COUNT(*) FROM degsum) AS BIGINT) AS n_communities,
       ROUND(CAST((SELECT n_internal FROM internal) AS DOUBLE)
               / (SELECT n_edges FROM m)
             - (SELECT SUM(CAST(dsum AS DOUBLE) * dsum) FROM degsum)
               / (4.0 * (SELECT n_edges FROM m)
                  * (SELECT n_edges FROM m)), 6) AS modularity
WHERE (SELECT n_edges FROM m) > 0
"""
    )


# patch: _lpa_oracle ends with the nation-name SELECT which we dropped;
# the comma chaining above needs the final CTE list intact, so rebuild
# explicitly instead of string surgery if the shape ever changes.


@register("graph_modularity", oracle=_modularity_oracle(), category="graph")
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the label-propagation partition: fraction of
    edges inside communities minus the degree-based expectation
    Σ(d_c/2m)² — the single number that says whether
    `graph_label_propagation`'s communities are real structure or
    noise (Q≈0 means the partition explains nothing; >0.3 is strong).

    Every input to Q is an exact integer (edge count, internal-edge
    count, per-community degree sums); one float expression at the
    end.  The oracle reuses the LPA round CTEs verbatim, so both ops
    score the IDENTICAL partition.

    Plan: labels from the broadcast-round LPA loop; internal-edge
    check is two broadcast label joins on the |E| frame; degree sums
    are |V|-sized.
    """
    und = _strong_und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    labels = adj.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(_LPA_ROUNDS):
        nb = labels.select(
            F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
        )
        counts = (
            adj.join(F.broadcast(nb), "nbr")
            .groupBy("node", "nbr_label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("nbr_label").asc()
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nbr_label").alias("label"))
        )
    m = und.count()
    if m == 0:  # Q undefined on an empty graph (sf0.1's threshold case)
        return und.sparkSession.createDataFrame(
            [],
            "n_edges long, n_internal_edges long, n_communities long,"
            " modularity double",
        )
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("lab_a"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lab_b"))
    internal = (
        und.join(F.broadcast(la), "a")
        .join(F.broadcast(lb), "b")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .count()
    )
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    degsum = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.sum("deg").cast("bigint").alias("dsum"))
    )
    [agg] = degsum.agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.sum(F.col("dsum").cast("double") * F.col("dsum")).alias("ss"),
    ).collect()
    q = internal / m - agg["ss"] / (4.0 * m * m)
    # round IN-ENGINE (F.round = SQL half-up, matching DuckDB ROUND):
    # Python round() is banker's, and q is dyadic when m is a power of
    # two, so a q*1e6 midpoint would diverge in the last digit
    return (
        und.sparkSession.createDataFrame(
            [(m, internal, agg["nc"], q)],
            "n_edges long, n_internal_edges long, n_communities long,"
            " modularity double",
        )
        .withColumn("modularity", F.round("modularity", 6))
    )


# --- strongly connected component (forward-backward) ----------------
_SCC_ROUNDS = 4


def _scc_oracle() -> str:
    """Unroll pivot-based FW-BW reachability as CTEs (exact — both
    engines run the identical fixed round count)."""
    sql = f"""
WITH {_STRONG_UND_CTES},
dire AS MATERIALIZED (
  SELECT src, dst FROM ranked, stats
  WHERE 2 * w * n_e >= 3 * tot OR wr <= {_STRONG_TOPK}
),
pv AS MATERIALIZED (
  SELECT MIN(node) AS p FROM (
    SELECT src AS node FROM dire UNION ALL SELECT dst AS node FROM dire
  )
),
f0 AS (SELECT p AS node FROM pv),
b0 AS (SELECT p AS node FROM pv)"""
    for i in range(1, _SCC_ROUNDS + 1):
        sql += f""",
f{i} AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT node FROM f{i - 1}
    UNION ALL
    SELECT e.dst AS node FROM f{i - 1} f JOIN dire e ON e.src = f.node
  )
),
b{i} AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT node FROM b{i - 1}
    UNION ALL
    SELECT e.src AS node FROM b{i - 1} b JOIN dire e ON e.dst = b.node
  )
)"""
    sql += f"""
SELECT na.n_name AS nation,
       CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'scc'
            WHEN f.node IS NOT NULL THEN 'fw_only'
            WHEN b.node IS NOT NULL THEN 'bw_only'
            ELSE 'out' END AS scc_class
FROM nation na
LEFT JOIN f{_SCC_ROUNDS} f ON f.node = na.n_nationkey
LEFT JOIN b{_SCC_ROUNDS} b ON b.node = na.n_nationkey
"""
    return sql


@register("graph_scc_fwbw", oracle=_scc_oracle(), category="graph")
def graph_scc_fwbw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot strongly-connected component via FORWARD-BACKWARD
    reachability (the FW-BW distributed-SCC step, Fleischer et al.):
    on the DIRECTED strong-trade graph, the deterministic pivot (the
    smallest participating nation) expands a forward frontier and a
    backward frontier for {_SCC_ROUNDS} fixed rounds; SCC(pivot) =
    F ∩ B, and every nation is classified scc / fw_only / bw_only /
    out — the reachability partition the full recursive FW-BW
    algorithm would refine next.  Fixed rounds (not convergence) keep
    the oracle exactly unrollable — the `graph_pagerank` discipline;
    at diameter ≤ {_SCC_ROUNDS} (always true on this 25-node catalog
    graph) the classification is the exact SCC answer.

    Plan: the directed edge frame is built once (4-way join, dimension
    legs broadcast) and localCheckpoint'ed; each round is frontier ⋈
    broadcast edges + DISTINCT — the Pregel step, per-round shuffle
    bounded by |V|.  Forward and backward frontiers share the pinned
    edge copy; at 100 TB the real FW-BW recursion would partition
    remaining vertices after this first pivot pass — this op IS that
    first pass.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dire = _strong_dir_edges(spark, sf_dir)
    pivot = dire.select(F.col("src").alias("node")).unionAll(
        dire.select(F.col("dst").alias("node"))
    ).agg(F.min("node").alias("p")).collect()[0][0]  # catalog-sized scalar
    fw = spark.createDataFrame([(pivot,)], "node int")
    bw = spark.createDataFrame([(pivot,)], "node int")
    for _ in range(_SCC_ROUNDS):
        fw = (
            fw.unionByName(
                dire.join(F.broadcast(fw), dire["src"] == fw["node"]).select(
                    F.col("dst").alias("node")
                )
            )
            .distinct()
            .localCheckpoint()
        )
        bw = (
            bw.unionByName(
                dire.join(F.broadcast(bw), dire["dst"] == bw["node"]).select(
                    F.col("src").alias("node")
                )
            )
            .distinct()
            .localCheckpoint()
        )
    f = fw.withColumn("in_f", F.lit(True))
    b = bw.withColumn("in_b", F.lit(True))
    return (
        nation.join(f, nation["n_nationkey"] == f["node"], "left")
        .drop("node")
        .join(b, nation["n_nationkey"] == b["node"], "left")
        .select(
            F.col("n_name").alias("nation"),
            F.when(F.col("in_f") & F.col("in_b"), "scc")
            .when(F.col("in_f"), "fw_only")
            .when(F.col("in_b"), "bw_only")
            .otherwise("out")
            .alias("scc_class"),
        )
    )


# ------------------------------------------------ Louvain move pass
_LOUVAIN_ORACLE = f"""
WITH edges AS MATERIALIZED ({_EDGES_SQL}),
und AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         CAST(SUM(w) AS BIGINT) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
adj AS (
  SELECT a AS i, b AS j, w FROM und
  UNION ALL
  SELECT b AS i, a AS j, w FROM und
),
deg AS (SELECT i AS node, CAST(SUM(w) AS BIGINT) AS d FROM adj GROUP BY i),
m2 AS (SELECT CAST(SUM(d) AS BIGINT) AS m2 FROM deg),
gain AS (
  SELECT ad.i, ad.j,
         m2.m2 * ad.w - di.d * dj.d AS num,
         m2.m2
  FROM adj ad
  JOIN deg di ON di.node = ad.i
  JOIN deg dj ON dj.node = ad.j
  CROSS JOIN m2
),
best AS (
  SELECT i, j, num, m2,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY num DESC, j ASC) AS rn
  FROM gain
)
SELECT na.n_name AS nation,
       CAST(CASE WHEN b.num > 0 THEN b.j ELSE b.i END AS BIGINT)
         AS community,
       ROUND(CAST(b.num AS DOUBLE) / (CAST(b.m2 AS DOUBLE) * b.m2 / 2), 6)
         AS gain,
       b.num > 0 AS moved
FROM best b JOIN nation na ON na.n_nationkey = b.i
WHERE b.rn = 1
"""


@register("graph_louvain_move", oracle=_LOUVAIN_ORACLE, category="graph")
def graph_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Louvain phase-1 move pass over the weighted
    nation trade graph, from the all-singletons start: each node
    evaluates the modularity gain of joining each neighbor's community
    (dQ = w_ij/m - d_i d_j / 2m^2 for singletons) and takes the best
    strictly-positive move — the building block modularity-refinement
    loops (`graph_modularity` scores the result of such passes)
    iterate to convergence.

    Determinism: moves are ranked by the EXACT BIGINT numerator
    2m*w_ij - d_i*d_j (the dQ ordering with the positive 2m^2
    denominator cleared), ties by neighbor id — no float enters the
    argmax.  At edge-weight sums beyond ~3e9 (where the product could
    overflow int64) widen to DECIMAL(38,0); the reported gain itself
    divides once into double and rounds.

    Plan: the |E|-sized symmetrized adjacency joins the BROADCAST
    |V|-row degree frame twice plus the 1-row 2m scalar; the argmax is
    one node-partitioned window.  One data-sized exchange total
    (building und); everything downstream is |E| rows max.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    adj = und.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "w"
    ).unionAll(und.select(F.col("b").alias("i"), F.col("a").alias("j"), "w"))
    deg = adj.groupBy(F.col("i").alias("node")).agg(
        F.sum("w").cast("bigint").alias("d")
    )
    m2 = deg.agg(F.sum("d").cast("bigint").alias("m2"))
    gain = (
        adj.join(
            F.broadcast(deg.select(F.col("node").alias("i"), F.col("d").alias("di"))),
            "i",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("j"), F.col("d").alias("dj"))),
            "j",
        )
        .crossJoin(F.broadcast(m2))
        .select(
            "i",
            "j",
            (F.col("m2") * F.col("w") - F.col("di") * F.col("dj")).alias("num"),
            "m2",
        )
    )
    w_best = Window.partitionBy("i").orderBy(F.col("num").desc(), F.col("j").asc())
    best = gain.withColumn("rn", F.row_number().over(w_best)).filter(
        F.col("rn") == 1
    )
    return best.join(
        F.broadcast(nation), best["i"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        F.when(F.col("num") > 0, F.col("j"))
        .otherwise(F.col("i"))
        .cast("bigint")
        .alias("community"),
        F.round(
            F.col("num").cast("double")
            / (F.col("m2").cast("double") * F.col("m2") / 2),
            6,
        ).alias("gain"),
        (F.col("num") > 0).alias("moved"),
    )


# ------------------------------------- local clustering coefficient
_CC_ORACLE = f"""
WITH {_STRONG_UND_CTES},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT UNNEST([x, y, z]) AS node FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
),
loc AS (
  SELECT d.node, d.deg, COALESCE(p.t, 0) AS t,
         CASE WHEN d.deg >= 2
              THEN 2.0 * COALESCE(p.t, 0) / (d.deg * (d.deg - 1))
              ELSE 0.0 END AS cc
  FROM deg d LEFT JOIN per_node p USING (node)
),
gsum AS (
  SELECT AVG(cc) AS avg_cc,
         CAST(SUM(t) AS DOUBLE) / SUM(deg * (deg - 1) // 2) AS transitivity
  FROM loc
)
SELECT na.n_name AS nation,
       COALESCE(l.deg, 0) AS degree,
       COALESCE(l.t, 0) AS n_triangles,
       ROUND(COALESCE(l.cc, 0.0), 6) AS local_cc,
       ROUND(g.avg_cc, 6) AS avg_cc,
       ROUND(g.transitivity, 6) AS transitivity
FROM nation na LEFT JOIN loc l ON l.node = na.n_nationkey, gsum g
ORDER BY nation
"""


@register("graph_clustering_coefficient", oracle=_CC_ORACLE, category="graph")
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation over the strong-trade
    graph — cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — plus the two
    global summaries every cohesion analysis wants side by side:
    average local cc (Watts–Strogatz, deg<2 counting 0, averaged over
    nodes WITH edges) and transitivity Σ T(v) / Σ wedges(v) (the
    triangle-weighted ratio; diverges from avg-cc exactly when hubs
    close fewer of their many wedges).

    Triangle counts ride the shared degree-ordered wedge enumeration
    (`_triangles_per_node`, O(m^1.5)); degrees and wedges are one
    groupBy over the checkpointed edge frame. All counts BIGINT; the
    per-node and global ratios divide once and round at the edge.
    Everything after the edge build is |nations|-bounded ledger math.
    """
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    und = _strong_und_edges(spark, sf_dir)
    per_node = _triangles_per_node(und)
    deg = _und_degrees(und).select(
        "node", F.col("deg").cast("bigint").alias("deg")
    )
    loc = deg.join(F.broadcast(per_node), "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("t"),
    ).withColumn(
        "cc",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("t") / (F.col("deg") * (F.col("deg") - 1)),
        ).otherwise(F.lit(0.0)),
    )
    glob = loc.agg(
        F.avg("cc").alias("avg_cc"),
        (
            F.sum("t").cast("double")
            / F.sum(F.expr("deg * (deg - 1) DIV 2"))
        ).alias("transitivity"),
    )
    return (
        nation.join(F.broadcast(loc), nation["n_nationkey"] == loc["node"], "left")
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("deg", F.lit(0)).cast("bigint").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.round(F.coalesce("cc", F.lit(0.0)), 6).alias("local_cc"),
            F.round("avg_cc", 6).alias("avg_cc"),
            F.round("transitivity", 6).alias("transitivity"),
        )
        .orderBy("nation")
    )


# -------------------------------------- bipartite projection (types)
_BIPROJ_ORACLE = f"""
WITH ue AS (
  SELECT DISTINCT user_id, event_type FROM {{EVENTS}}
),
deg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ue GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ue a JOIN ue b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_common,
       da.n_users AS n_users_a, db.n_users AS n_users_b,
       ROUND(CAST(p.n_common AS DOUBLE)
             / (da.n_users + db.n_users - p.n_common), 6) AS jaccard,
       ROUND(CAST(p.n_common AS DOUBLE)
             / SQRT(CAST(da.n_users AS DOUBLE) * db.n_users), 6) AS cosine
FROM pairs p
JOIN deg da ON da.event_type = p.type_a
JOIN deg db ON db.event_type = p.type_b
ORDER BY p.type_a, p.type_b
"""


@register(
    "graph_bipartite_projection",
    oracle=_BIPROJ_ORACLE.format(EVENTS="events"),
    category="graph",
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite user–event_type graph projected onto the event-type
    side: for every type pair, how many users touch both, with the
    Jaccard and cosine association strengths — the co-engagement
    backbone behind "users who X also Y" analyses and behavioral
    segment design.

    Scale shape: the corpus first collapses to the DISTINCT
    (user, type) incidence (<= |users| x |types| rows — the only
    data-sized exchange), and the projection self-join is keyed on
    user_id, so a user with d types expands to C(d,2) <= C(|types|,2)
    = 10 pairs, NEVER |corpus|^2 — the catalog bounds the fan-out,
    which is what makes bipartite projection safe here while generic
    graph projection (unbounded degree) needs sampling. The pair
    frame is |types|^2-bounded ledger math after that.
    """
    ue = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    deg = ue.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    a = ue.select("user_id", F.col("event_type").alias("type_a"))
    b = ue.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    da = deg.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a")
    )
    db = deg.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b")
    )
    return (
        pairs.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_users_a",
            "n_users_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_users_a") + F.col("n_users_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_common").cast("double")
                / F.sqrt(
                    F.col("n_users_a").cast("double") * F.col("n_users_b")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("type_a", "type_b")
    )
