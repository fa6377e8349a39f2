"""Iterative graph operators: connected components over near-dup pair
graphs — the step that turns pairwise "A≈B" results into dedup CLUSTERS
(transitive closure), so a corpus pipeline can keep one survivor per
component rather than per pair.

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round, a node adopts the minimum label among itself and its
neighbors; converged when no label changes. Rounds needed = graph diameter
(near-dup components are short chains/stars, so typically 2-5). This is
the DataFrame re-expression of GraphX/GraphFrames' components — each round
is one distributed join + min-aggregate; only the CONVERGENCE CHECK is a
driver-side action (one count per round, the standard pattern for
iterative algorithms on Spark).

Scale notes: per round, the join shuffles |E| rows and the aggregate
|E|+|V| rows, AQE-splittable on hot nodes. `localCheckpoint` truncates the
lineage each round — without it, iteration k replays rounds 1..k-1 and the
plan grows quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node id, component id) for every node that appears in ``edges``;
    the component id is the minimum node id in the component (deterministic
    representative). Raises if ``max_iter`` rounds don't converge — on a
    near-dup graph that means the threshold is far too loose, and silent
    wrong components would poison the dedup downstream."""
    sym = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .union(edges.select(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint()

    for _ in range(max_iter):
        # neighbor labels flow along edges; keep the min of (own, neighbors)
        prop = sym.join(labels, sym["u"] == labels["id"]).select(
            F.col("v").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(prop).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame, src: str = "a_id", dst: str = "b_id"
) -> DataFrame:
    """Near-dup pairs → per-document cluster assignment with cluster size:
    (doc_id, component, n_members). Survivor policy downstream: keep
    doc_id == component (the min id)."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        "n_members",
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster retention policy: one survivor per dedup cluster — the
    HIGHEST-``quality_col`` member (ties to the smallest id), not the
    arbitrary min-id representative. One row per component:
    (component, keep_id, keep_quality, n_members).

    Shape: join cluster assignments to doc metadata, then a single
    `max_by` aggregate on the component key — map-side-combinable argmax,
    no ranking window, one shuffle of |clustered docs| (duplicates only,
    a tiny fraction of the corpus)."""
    joined = clusters.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    # argmax via struct max: (quality, -id) orders quality DESC, id ASC
    best = F.max(
        F.struct(
            F.col(quality_col).alias("q"),
            (-F.col(id_col)).alias("neg_id"),
        )
    )
    return joined.groupBy("component").agg(
        (-best["neg_id"]).alias("keep_id"),
        best["q"].alias("keep_quality"),
        F.max("n_members").alias("n_members"),
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    src: str = "a_id",
    dst: str = "b_id",
    id_col: str = "id",
) -> DataFrame:
    """Integer-exact PageRank over an undirected pair graph — centrality
    for near-dup graphs, where high-rank nodes are the boilerplate HUBS
    (one template shared by many docs) as opposed to pairwise chains.

    Determinism contract: ranks are scaled integers (start 10⁶ per node);
    one round is

        r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div deg(u))) div 100

    — every operation an integer floor-division/sum, so the result is
    bit-identical across engines, partitionings and runs, and a DuckDB
    recursive CTE can replay it exactly (no float accumulation order to
    diverge). d = 0.85 and the 0.15·10⁶ teleport term are folded into the
    integer coefficients. Isolated nodes (no edges) keep rank
    150000 + nothing = the pure teleport mass.

    Scale shape: per iteration one |E| shuffle (contrib join on src) and
    one |V|-keyed aggregate, identical envelope to `connected_components`;
    `localCheckpoint` truncates lineage per round. Fixed iteration count —
    no driver-side convergence loop needed."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select(F.col(id_col).alias("u")).withColumn(
        "r", F.lit(1_000_000).cast("bigint")
    )
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, "u")
            .join(deg, "u")
            .select(F.col("v").alias("u"), F.expr("r div deg").alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            ranks.select("u")
            .join(contrib, "u", "left")
            .select(
                "u",
                (
                    F.lit(150_000)
                    + F.expr("(85 * coalesce(in_mass, 0L)) div 100")
                ).cast("bigint").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("u").alias(id_col), F.col("r").alias("rank_int"))


def triangle_counts(pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id") -> DataFrame:
    """Per-node triangle participation over an undirected edge list given
    as canonical (a < b) pairs — the clique-density signal: near-dup
    TRIANGLES mark template families (three documents pairwise similar),
    which pairwise counts alone can't distinguish from chains. Classic
    ordered 3-way join: edges (a,b),(b,c),(a,c) with a<b<c count each
    triangle exactly once; each node in it gets credit. Scale: two
    self-equi-joins on node keys — cost is Σ deg², the standard
    triangle-enumeration bound; degree caps (`drop_hot_shingles`
    upstream) bound the hot-node blow-up."""
    e = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    nodes = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return nodes


def bfs_hops(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_hops: int = 6,
) -> DataFrame:
    """(id, hops) — shortest hop distance from the highest-degree node
    (deterministic seed, ties broken by min id) to every node within
    ``max_hops``. Frontier-expansion BFS: each round joins only the NEW
    frontier against the edge list, anti-joins the settled set, and
    localCheckpoints to truncate lineage — per-round shuffle is
    O(|frontier| + degree mass), never the whole graph re-walked. The
    DataFrame re-expression of Pregel/GraphX shortest-hop with a bounded
    radius (the blast-radius query of a contamination/near-dup audit)."""
    sym = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .union(edges.select(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # deterministic seed: the highest-degree node (ties -> min id) — the
    # hub whose blast radius is the audit's worst case
    dist = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), F.asc("u"))
        .limit(1)
        .select(F.col("u").alias("id"), F.lit(0).cast("int").alias("hops"))
        .localCheckpoint()
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.select(F.col("id").alias("u")), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .select("id", F.lit(h).cast("int").alias("hops"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist


def label_propagation_int(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    src: str = "a_id",
    dst: str = "b_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Synchronous label propagation over an undirected pair graph —
    community detection for near-dup graphs, the finer-grained sibling of
    `connected_components` (components merge everything reachable; LP
    communities stop where neighborhood majorities stop, so one stray
    bridge edge does not fuse two templates).

    Determinism contract (classic LP is notoriously order-dependent —
    this variant is not): SYNCHRONOUS rounds (every update reads the
    previous round's labels), label init = own id, and the update is the
    neighbor-label MODE with a total tie-break (count DESC, label ASC),
    so the fixed round count yields one bit-exact answer any engine can
    replay with unrolled joins. Isolated nodes keep their own label.

    Scale: per round one |E| shuffle (labels onto edges) + one
    (node, label)-keyed count + one |V| argmax window — exactly the
    `connected_components` envelope; labels never leave int64."""
    from pyspark.sql import Window as W

    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    labels = nodes.select(
        F.col(id_col).alias("u"), F.col(id_col).cast("bigint").alias("lbl")
    )
    w = W.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(iterations):
        neigh = sym.join(labels, "u").groupBy("v", "lbl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        best = (
            neigh.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("v").alias("u"), F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(best, "u", "left")
            .select("u", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint()
        )
    return labels
