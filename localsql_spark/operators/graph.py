"""Weighted PageRank over an edge table (Page et al. 1999 — public
algorithm): the ranking primitive a corpus pipeline uses for domain/
source authority weighting (e.g. harmonic/PageRank-weighted sampling of
web domains in public corpus recipes).

The reference has no graph surface; this extends the iterative-algorithm
family next to the connected-components loops (operators.dedup).

Design for 100 TB: the edge table is the big object and stays
distributed end-to-end — each iteration is one shuffle join
(edges ⋈ ranks on src, co-partitioned; pre-partition both on src to make
it exchange-free) plus one groupBy(dst) aggregation.  Rank state is
node-sized (domains, not documents).  The dangling-mass term is a single
scalar aggregate per iteration (bounded driver traffic, same discipline
as the CC convergence fingerprints, dedup.py:342).  Lineage is cut per
iteration with a lazy localCheckpoint, without which the plan doubles
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from localsql_spark.operators import track_persist


def _pagerank_step(nodes: DataFrame, norm: DataFrame, ranks: DataFrame,
                   n: int, damping: float, dangling: float,
                   n_salts: int) -> DataFrame:
    """One PageRank iteration WITHOUT the lineage cut: the exact plan the
    loop executes per round (contribution join + aggregate + left join
    back onto the node set).  Exposed separately so tools/plan_audit.py
    can pin the per-iteration physical plan — the localCheckpoint in
    :func:`pagerank` erases lineage and would otherwise leave the audit
    block empty."""
    scored = (norm.join(ranks.withColumnRenamed("node", "e_src"),
                        "e_src")
              .select("e_src", F.col("e_dst").alias("node"),
                      (F.col("rank") * F.col("p")).alias("rp")))
    if n_salts > 0:
        # hot-hub graphs (one dst receives edges from a large fraction
        # of nodes — a popular domain) pile the whole contribution sum
        # onto one reducer; two-phase salting spreads it over n_salts
        # partials first (operators.skew.salted_agg discipline), with
        # a deterministic salt keyed on the SOURCE node.  Sum order
        # changes, so results can differ in the last float ulp — keep
        # the default unsalted for bit-stable oracle checks.
        salted = scored.withColumn(
            "__salt", F.pmod(F.hash("e_src"), F.lit(n_salts)))
        contrib = (salted.groupBy("node", "__salt")
                   .agg(F.sum("rp").alias("ps"))
                   .groupBy("node").agg(F.sum("ps").alias("s")))
    else:
        contrib = scored.groupBy("node").agg(F.sum("rp").alias("s"))
    return (nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit((1.0 - damping) / n) + F.lit(damping)
                     * (F.coalesce(F.col("s"), F.lit(0.0))
                        + F.lit(dangling / n))).alias("rank")))


def pagerank_iteration_plan(edges: DataFrame, src: str = "src",
                            dst: str = "dst", weight: str = "w",
                            damping: float = 0.85,
                            n_salts: int = 0) -> DataFrame:
    """The un-checkpointed single-iteration DataFrame (initial uniform
    ranks), for ``.explain`` auditing only — see :func:`_pagerank_step`.
    ``nodes``/``norm`` are persisted exactly as in :func:`pagerank`, so
    the audited plan reads InMemoryTableScans for the loop-invariant
    inputs — the per-round cost is only what remains above them."""
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    nodes = track_persist(nodes)
    n = nodes.count()
    outw = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(weight).alias("tw"))
    norm = (edges.join(outw, F.col(src) == outw.node)
            .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                    (F.col(weight) / F.col("tw")).alias("p")))
    norm = track_persist(norm)
    norm.count()  # materialize so the audited plan shows the cached scan
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    return _pagerank_step(nodes, norm, ranks, n, damping, 0.0, n_salts)


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str = "w", damping: float = 0.85,
             n_iter: int = 6, n_salts: int = 0) -> DataFrame:
    """Fixed-iteration weighted PageRank; returns ``(node, rank)``.

    rank_{t+1}(v) = (1-d)/n + d * (Σ_{u→v} rank_t(u)·w(u,v)/outw(u)
                                   + dangling_t/n)
    with dangling_t the total rank on nodes without out-edges
    (redistributed uniformly).  Fixed ``n_iter`` keeps the result
    deterministic and engine-checkable; convergence-threshold looping is
    a trivial wrapper (iterate until max |Δrank| < ε).
    """
    # Small-input regime (optimization r14, the er.py estimate gate):
    # the aggregated edge table is graph-sized, and when its file-backed
    # ancestor is below half-the-cores' worth of scan splits the whole
    # graph collects and the rounds run driver-side — at that size each
    # round costs ~0.2s of plan analysis for a sub-millisecond join, 34
    # tiny jobs per call (r14 profile).  The recurrence is replicated
    # exactly (_pagerank_local, pinned by
    # test_pagerank_local_matches_distributed); at real scale the gate
    # keeps the distributed loop — edges are corpus-derived and must
    # never collect.  Salted runs stay distributed: n_salts exists to
    # exercise the two-phase aggregation plan itself.
    if n_salts == 0:
        from localsql_spark.operators import small_input_regime

        if small_input_regime(edges):
            sess = edges.sparkSession
            node_t = edges.schema[src].dataType.simpleString()
            rows = [(r[0], r[1], float(r[2])) for r in
                    edges.select(src, dst, weight).collect()]
            ranks = _pagerank_local(rows, damping, n_iter)
            return sess.createDataFrame(
                ranks, f"node {node_t}, rank double")
    # The edge frame often derives from a corpus-sized computation (e.g.
    # a window over every event) while the aggregated edges themselves
    # are graph-sized.  nodes, norm and the dangling probe each
    # materialize independently, so WITHOUT this persist the corpus
    # derivation re-runs three times before the first iteration
    # (optimization r14 measurement: 3 full event-window passes in
    # pagerank_event_transitions' profile).
    edges = track_persist(edges)
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    nodes = track_persist(nodes)
    n = nodes.count()
    outw = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(weight).alias("tw"))
    norm = (edges.join(outw, F.col(src) == outw.node)
            .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                    (F.col(weight) / F.col("tw")).alias("p")))
    norm = track_persist(norm)
    has_out = outw.select("node")

    # one up-front structural probe: a graph with no dangling nodes (every
    # node has out-edges — the common case for co-occurrence/transition
    # graphs) never accumulates dangling mass, so the per-iteration scalar
    # job is skipped entirely
    dangling_nodes = track_persist(
        nodes.join(has_out, "node", "left_anti"))
    any_dangling = not dangling_nodes.isEmpty()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        dangling = 0.0
        if any_dangling:
            dangling = (ranks.join(dangling_nodes, "node", "left_semi")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                        .collect()[0][0])
        ranks = (_pagerank_step(nodes, norm, ranks, n, damping, dangling,
                                n_salts)
                 .localCheckpoint(eager=False))
    return ranks


def _pagerank_local(edge_rows: list[tuple],
                    damping: float, n_iter: int) -> list[tuple]:
    """Driver-side image of the distributed loop over the COLLECTED
    edge table, replicating every arithmetic point: out-weight sums are
    exact (edge weights are integer-valued doubles), p = w/tw is one
    IEEE division, each round computes
    ``(1-d)/n + d * (sum(rank*p) + dangling/n)`` with the same Python-
    evaluated literals the in-plan expression folds in, and the
    dangling mass is the rank sum over no-out-edge nodes.  Float sums
    run in edge-list order; the unsalted distributed aggregation is
    single-partition at gated sizes, so both orders are deterministic
    and agree far below the consumers' 6-decimal output rounding
    (pinned by test_pagerank_local_matches_distributed).  Returns
    [(node, rank)] — order irrelevant, callers aggregate or sort."""
    tw: dict = {}
    for s, _d, w in edge_rows:
        tw[s] = tw.get(s, 0.0) + w
    nodes = sorted({s for s, _d, _w in edge_rows}
                   | {d for _s, d, _w in edge_rows})
    n = len(nodes)
    norm = [(s, d, w / tw[s]) for s, d, w in edge_rows]
    dangling_nodes = [v for v in nodes if v not in tw]
    inv = 1.0 / n  # ZeroDivisionError on an empty graph, like the loop
    rank = {v: inv for v in nodes}
    for _ in range(n_iter):
        dang = 0.0
        for v in dangling_nodes:
            dang += rank[v]
        acc: dict = {}
        for u, v, p in norm:
            acc[v] = acc.get(v, 0.0) + rank[u] * p
        base = (1.0 - damping) / n
        dang_n = dang / n
        rank = {v: base + damping * (acc.get(v, 0.0) + dang_n)
                for v in nodes}
    return list(rank.items())


def triangle_counts(edges: DataFrame, a_col: str = "doc_a",
                    b_col: str = "doc_b") -> DataFrame:
    """Per-node triangle counts over an undirected pair list — the
    transitivity audit for the near-dup graph: triangle-rich components
    are cliquish (single-linkage clustering is safe there), triangle-poor
    chains are the risky transitive merges.

    Algorithm: degree-ordered edge orientation (the compact-forward /
    "curse of the last reducer" scheme — Latapy TCS 2008, Suri &
    Vassilvitskii WWW 2011, both public): each edge orients from its
    lower-(degree, id) endpoint to the higher one, wedges generate only
    at each edge pair's common LOWER endpoint, and a triangle closes by
    one equi-join of the wedge against the oriented edge list.  The
    orientation caps out-degree at O(sqrt(m)), so wedge count is bounded
    by m^1.5 REGARDLESS of hub degree — a naive shared-neighbor join on
    a hot node (degree h) generates h^2 wedges; this is the difference
    between a web-scale graph finishing and not.

    Every triangle is produced exactly once (its rank-minimal vertex is
    the unique wedge center), so counts need no dedup; the result left-
    joins back to all edge endpoints, so isolated-from-triangles nodes
    report 0.  Returns (node, deg, n_tri) — degree rides along for free
    (the orientation needed it anyway) so the clustering coefficient
    derives row-locally downstream.
    """
    e = (edges.select(F.least(F.col(a_col), F.col(b_col)).alias("u"),
                      F.greatest(F.col(a_col), F.col(b_col)).alias("v"))
         .filter(F.col("u") != F.col("v")).distinct())
    e = track_persist(e)  # degree agg + orientation + closing join reuse it
    # endpoint streams via ONE explode, not a 2-way union: the union form
    # references (and statically re-expands) the whole edge subtree per arm
    deg = (e.select(F.explode(F.array("u", "v")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    ed = (e.join(deg.select(F.col("node").alias("u"),
                            F.col("deg").alias("du")), "u")
          .join(deg.select(F.col("node").alias("v"),
                           F.col("deg").alias("dv")), "v"))
    u_first = (F.struct(F.col("du"), F.col("u"))
               < F.struct(F.col("dv"), F.col("v")))
    oriented = track_persist(ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst")))
    w1 = oriented.select("src", F.col("dst").alias("b"),
                         F.col("ddst").alias("db"))
    w2 = oriented.select("src", F.col("dst").alias("c"),
                         F.col("ddst").alias("dc"))
    wedges = (w1.join(w2, "src")
              .filter(F.struct(F.col("db"), F.col("b"))
                      < F.struct(F.col("dc"), F.col("c")))
              .select("src", "b", "c"))
    tris = wedges.join(oriented.select(F.col("src").alias("b"),
                                       F.col("dst").alias("c")),
                       ["b", "c"])
    per_node = (tris.select(F.explode(F.array("src", "b", "c"))
                            .alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))
    return (deg.join(per_node, "node", "left")
            .select("node", "deg",
                    F.coalesce("n_tri", F.lit(0)).alias("n_tri")))


def clustering_coefficients(edges: DataFrame, a_col: str = "doc_a",
                            b_col: str = "doc_b") -> DataFrame:
    """Local clustering coefficient per node, c(v) = 2·tri(v) /
    (deg(v)·(deg(v)−1)) — the per-node transitivity score (Watts &
    Strogatz 1998, public): c≈1 marks cliquish near-dup neighborhoods
    (single-linkage merge is safe), c≈0 marks chain/star joints where
    transitive merging is the risky guess.  Degree-1 nodes define c = 0.
    One row-local expression over :func:`triangle_counts`' output —
    no additional shuffle.  Returns (node, deg, n_tri, coeff)."""
    t = triangle_counts(edges, a_col=a_col, b_col=b_col)
    coeff = F.when(
        F.col("deg") >= 2,
        F.round(2.0 * F.col("n_tri")
                / (F.col("deg") * (F.col("deg") - 1)), 9)
    ).otherwise(F.lit(0.0))
    return t.select("node", "deg", "n_tri", coeff.alias("coeff"))
