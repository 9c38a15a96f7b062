"""Iterative graph dataflow: PageRank over a pair graph.

Companion to operators/dedup.py::connected_components — where CC labels
near-dup clusters, PageRank ranks nodes by link mass (canonical-document
selection inside big dup clusters, influence scoring over interaction
graphs). Same distributed loop discipline: the loop-INVARIANT edge+degree
table is materialized once (localCheckpoint), each round is one join + one
map-side-combined aggregate keyed by node, and rank lineage is truncated
per round. No driver-side graph, no cartesian; per-round cost is one
shuffle of (dst, contribution) partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "doc_id",
    iterations: int = 2,
    damping: float = 0.85,
    n: int | None = None,
    tolerance: float | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """PageRank on the UNDIRECTED graph induced by ``edges``, over the full
    ``nodes`` universe (isolated nodes keep teleport-only rank).

    Symmetric-graph formulation: every edge contributes both ways, so any
    node WITH an edge has out-degree ≥ 1 — but isolated nodes are still
    dangling, and their mass is redistributed uniformly (without this,
    total rank leaks by d·Σ_isolated rank per round — caught by the
    conservation test). rank⁰ = 1/N;
    rankⁱ⁺¹ = (1−d)/N + d·(Σ_in rankⁱ/degree + dangling_mass/N).

    Two stopping modes:

    - ``tolerance=None`` (default): exactly ``iterations`` rounds — the
      deterministic, SQL-oracle-able shape (the oracle unrolls the rounds
      as CTEs).
    - ``tolerance=ε``: iterate until the L1 rank movement Σ|Δrank| < ε,
      raising RuntimeError past ``max_iterations`` — the production shape.
      The probe follows connected_components' discipline: the step
      already carries each node's previous rank (contributions join onto
      the ranks frame itself), so convergence costs ONE 1-row aggregate
      over the just-checkpointed frame per round — no extra join.

    ``N`` comes from one count() (pass ``n`` if the caller already knows it
    — avoids a duplicate job) — a metadata-scale driver scalar, same class
    as the IVF probe. Deterministic given deterministic input; the float
    sums are order-sensitive in the last ulp, so compare externally after
    round(). Returns (node_id, rank).
    """
    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionAll(
        edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    # loop-invariant: edge list + per-source degree, materialized ONCE
    # (leaving it lazy re-executes upstream candidate generation per round —
    # the lesson measured on connected_components, SCALING.md)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    sym = sym.join(deg, "src").localCheckpoint(eager=True)
    # the isolated-node set is loop-invariant too — materialize it once
    # instead of re-deriving (distinct + anti-join over the edges) per round
    isolated = (
        nodes.select(F.col(node_id).alias("src"))
        .join(sym.select("src").distinct(), "src", "left_anti")
        .localCheckpoint(eager=True)
    )

    if n is None:
        n = nodes.count()
    base = float(1.0 - damping) / n
    ranks = nodes.select(F.col(node_id).alias("src")).withColumn(
        "rank", F.lit(1.0 / n)
    )
    rounds = max_iterations if tolerance is not None else iterations
    converged = tolerance is None
    for _ in range(rounds):
        # dangling (isolated-node) mass — a 1-row aggregate, broadcast back
        dm = ranks.join(isolated, "src", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            sym.join(ranks, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
            .withColumnRenamed("dst", "src")
        )
        new_rank = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("mass"), F.lit(0.0)) + F.col("dm") / F.lit(float(n))
        )
        # join contributions onto the ranks frame (same node universe as
        # `nodes`, invariantly): the step keeps the previous rank in reach,
        # so the convergence delta is a per-row expression, not a join
        stepped = (
            ranks.join(contrib, "src", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "src",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("rank")).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = stepped.select("src", "rank")
        if tolerance is not None:
            # 1-row aggregate over the already-materialized step — the
            # same probe discipline as connected_components' label checksum
            moved = stepped.agg(F.sum("delta")).first()[0]
            if moved is not None and moved < tolerance:
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"pagerank did not reach tolerance {tolerance} within "
            f"{max_iterations} iterations"
        )
    return ranks.select(F.col("src").alias(node_id), "rank")


def triangle_counts(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "doc_id",
) -> DataFrame:
    """Per-node triangle counts on the undirected graph given as DISTINCT
    ``(id_a < id_b)`` pairs — the local-clustering signal used to separate
    tight near-dup cliques (template/boilerplate families) from chains of
    borderline matches in a dedup pair graph.

    Degree-ordered orientation (the standard distributed formulation —
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): orient every edge from the endpoint with the
    smaller ``(degree, id)`` to the larger, making the graph acyclic with
    per-node out-degree bounded by O(√m). Each triangle then has exactly
    one apex with two out-edges, so candidate wedges are generated by a
    self-join of the oriented adjacency on the apex — the join fan-out is
    Σ outdeg², which degree-orientation keeps near-linear even on
    power-law graphs where a naive id-ordering would square the hottest
    hub. Wedges are closed by one equi-join (left-semi) against the
    oriented edge set.

    Three shuffles total (degree agg, wedge self-join, closing semi-join)
    plus the final per-node count; no cartesian, no driver-side state.
    Returns ``(node_id, n_triangles)`` for nodes in ≥1 triangle.
    """
    und = edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    sym = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orientation key: (degree, id) totally orders nodes; orient low → high
    keyed = (
        sym.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")), "v"
        )
        .filter(
            (F.col("deg") < F.col("deg_v"))
            | ((F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "deg_v")
    )
    # checkpoint KEYED (not just oriented): the wedge self-join branches
    # both derive from it, so an un-checkpointed lineage would re-execute
    # the degree joins once per branch (round-10 review)
    keyed = keyed.localCheckpoint(eager=True)
    oriented = keyed.select("u", "v")
    # wedges at apex u: pairs of out-neighbours (v, w), canonicalized by the
    # same (degree, id) order so each wedge is generated once
    a = keyed.select("u", F.col("v").alias("x"), F.col("deg_v").alias("dx"))
    b = keyed.select("u", F.col("v").alias("y"), F.col("deg_v").alias("dy"))
    wedges = a.join(b, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    triangles = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    ).select("u", "x", "y")
    member = (
        triangles.select(F.col("u").alias("node"))
        .unionAll(triangles.select(F.col("x").alias("node")))
        .unionAll(triangles.select(F.col("y").alias("node")))
    )
    return member.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    ).select(F.col("node").alias(node_id), "n_triangles")


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "doc_id",
) -> DataFrame:
    """Synchronous label propagation (fixed ``rounds``) on the undirected
    graph given as DISTINCT ``(id_a < id_b)`` pairs: every node starts as
    its own label; each round EVERY node simultaneously adopts the most
    frequent label among its neighbours, ties broken by the smallest
    label — the community-detection sibling of connected components
    (which only answers reachability; LPA separates densely-knit
    near-dup families that happen to share a bridge edge).

    Fixed synchronous rounds + the deterministic tie rule make the result
    engine-portable (the kmeans_fixed discipline — the q_kmeans-style
    convergence-loop variant would be rows-only). Per round: one
    neighbour-label join (labels keyed by node), one (node, label) count
    aggregate, one per-node argmax window — all keyed on the node, no
    all-pairs anywhere. The symmetric edge list is loop-invariant and
    localCheckpointed once; labels are checkpointed per round to keep the
    lineage flat (the pagerank/connected-components loop discipline).
    Isolated nodes never appear in ``edges`` — compose with a left join
    on the node table to carry them unchanged.

    Returns ``(node_id, label)``.
    """
    if rounds < 1:
        raise ValueError(f"invalid rounds={rounds}: need >= 1")
    # drop self-loops: a node voting for its own label through a loop
    # edge would bias every round (candidate-pair inputs are a<b clean,
    # but arbitrary edge lists aren't)
    und = edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    sym = (
        und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = sym.select("u").distinct().select(
        "u", F.col("u").alias("label")
    )
    w = Window.partitionBy("u").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        neigh = sym.join(
            labels.select(F.col("u").alias("v"), "label"), "v"
        ).select("u", "label")
        counted = neigh.groupBy("u", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("u", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("u").alias(node_id), "label")


def k_core(
    edges: DataFrame,
    k: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "doc_id",
    max_rounds: int | None = None,
) -> DataFrame:
    """k-core decomposition by synchronous peeling: repeatedly remove ALL
    nodes whose degree in the remaining subgraph is < k, until none
    violate. The standard graph-cleanup pass over a near-dup pair graph —
    the k-core separates dense template/boilerplate families from chains
    and stragglers that LSH noise strings together (CC alone cannot).

    Synchronous removal makes the fixpoint order-independent, hence
    deterministic and oracle-able (the DuckDB twin runs the same peeling
    as a recursive CTE). Same loop discipline as pagerank/CC: the edge
    list is checkpointed per round so lineage never stacks, each round is
    one degree aggregate + two semi-joins, and the stop probe is the
    violator count (a 1-row aggregate). Returns (node_id, core_degree)
    for surviving nodes — degree measured inside the final core.

    The round budget is derived from the DATA, not a constant: every
    non-terminal round removes at least one node (else the violator count
    is 0 and the loop returns), so node count + 1 bounds the rounds for
    ANY graph — including the adversarial chain shape, where synchronous
    peeling strips only the two endpoints per round and needs ~n/2 rounds
    (a fixed default of 50 raised a spurious RuntimeError on a 120-node
    path; round-6 advice). Pass ``max_rounds`` only to impose a stricter
    external budget; the fixpoint itself cannot run past the derived cap,
    so hitting it means the loop is genuinely broken."""
    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionAll(
        edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).localCheckpoint(eager=True)
    if max_rounds is None:
        # +1: the final no-violator probe round removes nothing
        max_rounds = sym.select("src").distinct().count() + 1
    for _ in range(max_rounds):
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        n_bad = deg.filter(F.col("degree") < k).count()
        if n_bad == 0:
            return deg.select(F.col("src").alias(node_id), F.col("degree").alias("core_degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not reach a fixpoint within {max_rounds} rounds")


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_id: str = "node",
    max_hops: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Multi-source breadth-first search: minimum hop count from ANY
    source node, out to ``max_hops`` (nodes farther than that are simply
    absent — at 100 TB the k-hop neighborhood is the tractable ask, the
    full transitive closure is not).

    Frontier formulation — the textbook distributed BFS (Pregel's hello
    world): the edge table is materialized once (localCheckpoint) and each
    round expands the CURRENT frontier only (one equi-join on ``src``),
    anti-joins the visited set (so a node's FIRST discovery wins, which is
    what makes the hop count minimal), and checkpoints the new frontier.
    Per-round cost is O(frontier ⋈ edges) — never proportional to the
    hop-reachable closure — and the visited set is carried as a
    DataFrame, not driver state. Deterministic: hop levels are exact
    integers, no float accumulation.

    ``directed=False`` (default) symmetrizes the edge list first, the
    same convention as pagerank/k_core above. Returns (node_id, hops)
    with one row per reached node, sources at hops=0."""
    if max_hops < 0:
        raise ValueError(f"bfs_distances needs max_hops >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not directed:
        e = e.unionAll(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.localCheckpoint(eager=True)
    frontier = (
        sources.select(F.col(node_id).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select(F.col("node").alias(node_id), "hops")


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_id: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Single/multi-source WEIGHTED shortest paths, synchronous
    Bellman-Ford with a fixed round budget — the weighted generalization
    of ``bfs_distances`` (k relaxation rounds find every shortest path
    that uses at most k edges; at 100 TB the bounded-depth ask is the
    tractable one, exactly as for BFS). Non-negative weights assumed —
    with a round budget the algorithm is still correct for negative
    edges but "shortest within k hops" is the only guarantee either way.

    Per round: one equi-join of the CURRENT tentative-distance table
    against the (once-materialized) edge table, then a min-combine —
    dist'(v) = min(dist(v), min over in-edges (dist(u) + w(u,v))). Both
    are key-partitioned shuffles; the distance table is checkpointed per
    round so lineage never stacks. Unlike BFS's frontier, the
    relaxation re-joins the full tentative table each round — the
    textbook cost of weighted paths (a found node's distance can still
    improve), which is why the round budget, not a convergence probe,
    bounds the work here. Integer weights stay exact end-to-end.

    Returns (node_id, dist) for every node reached within ``rounds``
    relaxations; sources at dist 0."""
    if rounds < 0:
        raise ValueError(f"sssp_bounded needs rounds >= 0, got {rounds}")
    from pyspark.sql.types import FractionalType

    if isinstance(edges.schema[weight].dataType, FractionalType):
        raise ValueError(
            "sssp_bounded keeps distances in exact BIGINT — fractional "
            "edge weights would be truncated PER HOP (round-10 review); "
            "scale weights to integers (e.g. cents, millis) first"
        )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).alias("w"),
    )
    if not directed:
        e = e.unionAll(
            edges.select(
                F.col(dst).alias("src"), F.col(src).alias("dst"),
                F.col(weight).alias("w"),
            )
        )
    e = e.localCheckpoint(eager=True)
    dist = (
        sources.select(F.col(node_id).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relax = dist.join(e, dist["node"] == e["src"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).cast("long").alias("dist"),
        )
        dist = (
            dist.unionAll(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.select(F.col("node").alias(node_id), "dist")


def pointer_doubling_roots(
    parents: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> DataFrame:
    """Flatten a parent-pointer forest to (node, root, depth) by POINTER
    DOUBLING (path shortening): each round every node's pointer jumps to
    its pointer's pointer, so path lengths HALVE per round and a
    depth-D hierarchy resolves in ⌈log₂ D⌉ self-joins — the classic
    PRAM/Pregel technique for org charts, bill-of-materials rollups,
    category trees, and reply threads, where the naive one-level-per-
    round walk needs D rounds. (Distinct from connected_components'
    min-label propagation: this follows DIRECTED parent edges and keeps
    exact depths.)

    Roots are nodes whose parent is themselves (the conventional
    encoding; NULL parents are normalized to it). Per round: ONE
    self-join of the pointer table keyed on the current pointer, with
    jump distances added — both shuffle-keyed, table checkpointed per
    round so lineage never stacks. Convergence = every pointer is a
    root, probed with one 1-row aggregate per round (the
    connected_components discipline: a scalar to the driver, never the
    table). A cycle (bad input — a hierarchy must be acyclic) either
    never satisfies the probe (the round cap raises) or collapses onto
    itself with a nonzero depth (detected and raised at return), and ⌈log₂⌉ of any realistic depth sits
    far under the default cap of 40 (depth ≤ 2^40)."""
    p = parents.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("ptr"),
    ).withColumn(
        "dist", F.when(F.col("ptr") == F.col("node"), 0).otherwise(1)
        .cast("long")
    ).localCheckpoint(eager=True)
    # a dangling parent (pointer to a nonexistent node) would silently
    # drop its whole subtree from the hop join — fail loudly instead
    n_dangling = (
        p.filter(F.col("ptr") != F.col("node"))
        .join(p.select(F.col("node").alias("ptr")), "ptr", "left_anti")
        .count()
    )
    if n_dangling:
        raise ValueError(
            f"{n_dangling} parent pointers reference nodes that do not "
            "exist — the hierarchy is not closed over its node set"
        )
    for _ in range(max_rounds):
        n_unresolved = (
            p.alias("a")
            .join(
                p.select(F.col("node").alias("_n"),
                         (F.col("ptr") != F.col("node")).alias("_live"))
                .alias("b"),
                F.col("a.ptr") == F.col("b._n"),
            )
            .filter(F.col("b._live"))
            .count()
        )
        if n_unresolved == 0:
            # a cycle whose length divides a jump distance collapses onto
            # itself (ptr == node with dist > 0) and would masquerade as a
            # root — e.g. a 2-cycle self-resolves after one doubling
            n_cycle = p.filter(
                (F.col("ptr") == F.col("node")) & (F.col("dist") > 0)
            ).count()
            if n_cycle:
                raise RuntimeError(
                    f"{n_cycle} nodes resolved onto themselves at depth "
                    "> 0 — the parent graph contains cycles"
                )
            return p.select(
                F.col("node").alias(node_col),
                F.col("ptr").alias("root"),
                F.col("dist").alias("depth"),
            )
        hop = p.select(
            F.col("node").alias("_n"),
            F.col("ptr").alias("_p"),
            F.col("dist").alias("_d"),
        )
        p = (
            p.join(hop, p["ptr"] == hop["_n"])
            .select(
                "node",
                F.col("_p").alias("ptr"),
                (F.col("dist") + F.col("_d")).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"pointer_doubling_roots did not converge in {max_rounds} rounds — "
        "the parent graph almost certainly contains a cycle"
    )


def common_neighbor_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
) -> DataFrame:
    """Link prediction by neighborhood overlap (Liben-Nowell & Kleinberg
    2003): for node pairs NOT directly connected, score how likely an
    edge is from their shared neighbors — common-neighbor count,
    Jaccard overlap, and Adamic-Adar (shared neighbors weighted
    1/ln(degree), so rare mutual contacts count more than hubs). The
    candidate-generation step of graph-based recommendation and
    knowledge-graph completion.

    Scale shape: the inverted-index discipline again — pairs form by
    self-joining the (symmetrized) edge list ON THE SHARED NEIGHBOR
    (fan-out quadratic only in per-node degree, never all-pairs),
    degree/weight tables join node-keyed, and existing edges are
    removed with an anti-join. ``min_common`` floors the candidate set
    (a single shared neighbor is noise at corpus scale). Returns
    (id_a, id_b, common, jaccard, adamic_adar) with id_a < id_b,
    floats rounded to 6."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))  # a self-loop node must not
        # count itself as its own neighbor (label_propagation's guard)
        .distinct()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    a = sym.select(F.col("v").alias("w"), F.col("u").alias("id_a"))
    b = sym.select(F.col("v").alias("w"), F.col("u").alias("id_b"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(
            deg.select(F.col("u").alias("w"), F.col("d").alias("dw")), "w"
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(1.0 / F.log("dw")).alias("_aa"),
        )
        .filter(F.col("common") >= min_common)
    )
    # drop already-connected pairs: link prediction scores ABSENT edges
    existing = sym.select(
        F.least("u", "v").alias("id_a"), F.greatest("u", "v").alias("id_b")
    ).distinct()
    da = deg.select(F.col("u").alias("id_a"), F.col("d").alias("_da"))
    db = deg.select(F.col("u").alias("id_b"), F.col("d").alias("_db"))
    return (
        pairs.join(existing, ["id_a", "id_b"], "left_anti")
        .join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a", "id_b",
            F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")),
                6,
            ).alias("jaccard"),
            F.round(F.col("_aa"), 6).alias("adamic_adar"),
        )
    )


def _l2_normalized(
    df: DataFrame, col: str, materialize: bool = False
) -> DataFrame:
    """Scale ``df[col]`` by the frame's L2 norm (the norm rides a 1-row
    broadcast). The plan consumes ``df`` twice — once under the norm
    aggregate, once in the body — so with ``materialize=True`` the raw
    frame is eagerly localCheckpointed first and both consumers read the
    materialization instead of re-executing the upstream plan (guide
    §2.4); hits_bipartite turns that on when the edge set is wide."""
    if materialize:
        df = df.localCheckpoint(eager=True)
    n = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
    return df.crossJoin(F.broadcast(n)).select(
        df.columns[0], (F.col(col) / F.col("_n")).alias(col)
    )


def hits_bipartite(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs & authorities (Kleinberg, JACM 1999) on a DIRECTED
    (typically bipartite) edge set: auth(v) = Σ_{u→v} hub(u),
    hub(u) = Σ_{u→v} auth(v), each side L2-normalized per round — the
    asymmetric complement to PageRank (an order that touches many
    important parts is a good HUB; a part touched by many good hubs is
    a good AUTHORITY; PageRank's single symmetric score can't separate
    the two roles).

    Fixed ``iterations`` rounds keep it declarative and oracle-able
    (the pagerank-fixed-rounds discipline): each half-step is one
    edge-keyed join + one aggregate, the L2 norm is a 1-row aggregate
    broadcast back, hub/auth tables are node-cardinality and
    checkpointed per round. Returns (hubs, authorities) as
    (node, score) with score rounded to 6."""
    if iterations < 1:
        raise ValueError(f"hits_bipartite needs iterations >= 1, got {iterations}")
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    hubs = e.select("u").distinct().withColumn("h", F.lit(1.0))

    # _l2_normalized consumes its input twice (the 1-row L2 aggregate
    # under the broadcast + the main body), so the edge join+aggregate
    # would execute twice per half-step. On a WIDE edge set (checkpointed
    # scan partitions ≥ 2x the session parallelism — a real graph, never
    # the single-file fixtures) the RAW aggregate is checkpointed first so
    # the join runs once per half-step (guide §2.4). Below the threshold
    # the extra materialization's job overhead exceeds the avoided
    # recompute (round-12 A/B: 3.7 s recompute vs 4.2 s checkpointed at
    # sf0.1), so small graphs keep the recompute form.
    # (.rdd is safe here, unlike dedup._wide_input's caller: ``e`` is an
    # eagerly checkpointed frame, so this compiles a one-node LogicalRDD
    # plan and reads the EXACT materialized partition count — no deep
    # physical planning, and a checkpoint scan has no Catalyst size
    # estimate to use instead.)
    wide = (
        e.rdd.getNumPartitions()
        >= 2 * e.sparkSession.sparkContext.defaultParallelism
    )

    auths = None
    for _ in range(iterations):
        auths = _l2_normalized(
            e.join(hubs, "u").groupBy("v").agg(F.sum("h").alias("a")),
            "a",
            materialize=wide,
        ).localCheckpoint(eager=True)
        hubs = _l2_normalized(
            e.join(auths, "v").groupBy("u").agg(F.sum("a").alias("h")),
            "h",
            materialize=wide,
        ).localCheckpoint(eager=True)
    return (
        hubs.select(F.col("u").alias("node"), F.round("h", 6).alias("hub")),
        auths.select(
            F.col("v").alias("node"), F.round("a", 6).alias("authority")
        ),
    )


def local_clustering(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_id: str = "doc_id",
) -> DataFrame:
    """Local clustering coefficient per node on the undirected graph
    given as DISTINCT ``(id_a < id_b)`` pairs:

        lcc(v) = 2 · tri(v) / (deg(v) · (deg(v) − 1))

    — the Watts-Strogatz per-vertex statistic that turns raw triangle
    counts into a density ratio: 1.0 means v's neighbourhood is a clique
    (template/boilerplate family in a near-dup pair graph — safe to
    collapse wholesale), near 0 means v chains otherwise-unrelated docs
    together (the false-bridge shape that makes connected-component
    dedup delete too much). Emits every node of degree ≥ 2 (the
    coefficient is undefined below that), with ``n_triangles = 0`` rows
    preserved — the zero is the signal.

    Scale shape: one degree aggregation plus :func:`triangle_counts`'
    degree-oriented wedge join (its O(√m) out-degree bound is what
    survives power-law graphs), then a node-keyed left join of the two —
    no new shuffle class beyond triangle counting itself.

    Returns ``(node_id, degree, n_triangles, lcc)`` with ``lcc`` rounded
    to 6 places.
    """
    und = edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    sym = und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    tri = triangle_counts(edges, id_a, id_b, node_id="u")
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "u", "left")
        .select(
            F.col("u").alias(node_id),
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("lcc"),
        )
    )
