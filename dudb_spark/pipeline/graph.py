"""Iterative graph analytics over similarity graphs: PageRank with a
fixed iteration count.

Use case: rank documents inside a near-duplicate / citation / overlap
graph (edges from ``dedup.fingerprint_overlap_pairs`` or the MinHash
candidate pairs) so curation can keep the most central copy, or weight
sources by graph authority.  Complements ``cluster.connected_components``
(membership) with a per-node score.

Scale shape: one shuffle per iteration — ``edges ⋈ ranks`` on the source
key then a destination-keyed aggregation — exactly the join-agg loop
Pregel-style systems run; the frame is ``localCheckpoint``-ed per round
so the lazy plan doesn't stack five join trees (same pattern as
``cluster._propagate``).  Edge and rank frames shuffle on the same id
key, so AQE coalesces the exchanges; degrees are computed once.

A FIXED iteration count (default 5) instead of convergence detection
keeps the operator deterministic and oracle-restatable (the SQL twin
unrolls the same five joins); power iteration converges geometrically at
rate ~damping, so 5 rounds already separate hub docs from leaves, and a
production caller can raise ``iters`` without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    seeds: list | None = None,
) -> DataFrame:
    """PageRank over the UNDIRECTED graph given as a pair list.

    ``pairs`` has one row per undirected edge; both directions are
    materialized internally.  Returns ``(id, score)`` for every node that
    appears in an edge, with uniform initialization 1/N.  Undirected
    graphs have no dangling nodes (every node has out-degree ≥ 1), so no
    dangling-mass redistribution is needed.

    ``seeds`` switches to PERSONALIZED PageRank (topic-sensitive,
    Haveliwala WWW 2002): the teleport mass (1−d) restarts only onto
    the seed set (uniformly) instead of all nodes, and ranks
    initialize 1/|seeds| on seeds, 0 elsewhere — the score becomes
    proximity-to-the-seeds authority (recommendation / related-entity
    expansion) rather than global centrality.  The seed set enters as
    a constant-folded ``isin`` literal — same plan shape, no extra
    join."""
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        pairs.select(
            F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Pin the DEGREE-ANNOTATED edge list, not the bare edges: every
    # iteration joins exactly this frame, and each per-iteration
    # localCheckpoint job is a separate action — with only the bare
    # edges pinned, the degree fold and the edges⋈deg join re-ran once
    # PER ITERATION (iters+1 edge-list aggregations per query; r12 plan
    # audit).  One materialization, read `iters` times (guide §2.4).
    # Size note (spill-aware pin policy): one row per directed edge,
    # three fixed-width columns — the same order of magnitude as the
    # edge list itself, which any iterative PageRank must hold; callers
    # at cluster scale should swap localCheckpoint for a spill-capable
    # persist if |E| outgrows executor storage.
    contrib_src = edges.join(deg, "src").localCheckpoint()
    nodes = contrib_src.select(F.col("src").alias("id")).distinct()
    # |V| as one driver scalar over the pinned frame (bounded: a count),
    # replacing the broadcast single-row N frame that was re-aggregated
    # by the init job AND by every iteration job.  The arithmetic is
    # unchanged: the same IEEE-double divisions, now constant-folded.
    n_nodes = nodes.count()

    if seeds is None:
        init = F.lit(1.0 / n_nodes)

        def tele():
            return F.lit((1.0 - damping) / n_nodes)
    else:
        seed_vals = sorted(set(seeds))
        is_seed = F.col("id").isin(seed_vals)
        init = F.when(is_seed, F.lit(1.0 / len(seed_vals))).otherwise(
            F.lit(0.0)
        )

        def tele():
            return F.when(
                F.col("id").isin(seed_vals),
                F.lit((1.0 - damping) / len(seed_vals)),
            ).otherwise(F.lit(0.0))

    ranks = nodes.select("id", init.alias("r"))
    for _ in range(iters):
        ranks = (
            contrib_src.join(
                ranks.withColumnRenamed("id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("_in"))
            .select(
                "id",
                (tele() + damping * F.col("_in")).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.col("r").alias("score"))


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + clustering coefficient over an
    undirected graph given as distinct ``src < dst`` pairs — the
    degree-ordered wedge join (Suri & Vassilvitskii, "Counting
    triangles and the curse of the last reducer", WWW 2011).

    Why orientation is the whole 100 TB story: a naive wedge join
    fans out Σ deg(v)² — one celebrity hub generates billions of
    wedges.  Orienting every edge from its (degree, id)-SMALLER
    endpoint to the larger bounds every oriented out-degree at
    O(√m) on ANY graph, so the wedge join's fan-out is O(m^{3/2})
    worst-case and each triangle is generated exactly once (at its
    degree-minimal corner).  Three equi-joins, no windows, no state.

    Every step is integer (degrees, counts); the one division — the
    clustering coefficient 2·tri/(deg·(deg−1)) — is a single IEEE op
    rounded to 6 decimals, so the whole operator replays in SQL.

    Returns ``(id, degree, n_tri, clustering)`` for every node of the
    edge set, n_tri = 0 rows included (a node with no triangles is a
    finding, not an absence).  Self-loops, reversed duplicates, and
    NULL-endpoint rows are dropped by the canonicalization
    (least/greatest skip NULLs, collapsing such a row to a
    self-loop)."""
    s, d = F.col(src_col), F.col(dst_col)
    # canonicalize: self-loops dropped, reversed duplicates collapse.
    # Pinned (localCheckpoint): the canonical edge set feeds THREE plan
    # branches (both degree stubs + the orientation join) — unpinned,
    # each branch re-executes the upstream edge construction (r11 plan
    # audit: q172's plan was 760 exchange lines deep, the co-activity
    # join replicated per branch)
    und = edges.select(
        F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
    ).where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("_degb"))
    ed = und.join(da, "a").join(db, "b")
    a_first = (F.col("_dega") < F.col("_degb")) | (
        (F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))
    )
    # pinned: the oriented edge frame is read three times (wedge sides
    # e1/e2 + the closing join) — one O(m) materialization vs three
    # executions of the degree-attach join
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_degb")).otherwise(F.col("_dega"))
        .alias("_degv"),
    ).localCheckpoint()
    # wedges at u: ordered out-neighbor pairs ((deg,id) order), closed
    # by the oriented edge (v, w) — which exists iff {v,w} is an edge,
    # since orientation follows the same total order
    e1 = o.select("u", F.col("v"), F.col("_degv"))
    e2 = o.select(
        F.col("u").alias("u2"), F.col("v").alias("w"),
        F.col("_degv").alias("_degw"),
    )
    wedges = e1.join(e2, F.col("u") == F.col("u2")).where(
        (F.col("_degv") < F.col("_degw"))
        | ((F.col("_degv") == F.col("_degw")) & (F.col("v") < F.col("w")))
    )
    closer = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(closer, ["v", "w"]).select("u", "v", "w")
    corners = (
        tris.select(F.col("u").alias("id"))
        .unionByName(tris.select(F.col("v").alias("id")))
        .unionByName(tris.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    nt = F.coalesce("n_tri", F.lit(0))
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            (nt * 2).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(corners, "id", "left")
        .select("id", "degree", nt.alias("n_tri"),
                coeff.alias("clustering"))
    )


def _canonical_undirected(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Distinct ``a < b`` pairs: self-loops dropped, reversed
    duplicates collapsed, NULL endpoints dropped (least/greatest skip
    NULLs, collapsing such a row to a self-loop)."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara, Phys. Rev. E 2007) with DETERMINISTIC update
    order: every node starts labeled with its own id; each round every
    node simultaneously adopts the label most frequent among its
    neighbors, ties broken by the SMALLEST label.  A fixed round count
    (instead of convergence detection) keeps the operator
    deterministic and oracle-restatable — the SQL twin unrolls the
    same rounds; raising ``rounds`` changes no plan shape.

    Scale shape: per round, ONE equi-join (adjacency ⋈ labels on the
    neighbor key) and TWO map-side-combining aggregations — the
    (id, label) count and the per-id argmax, the argmax as
    ``min(struct(-count, label))`` so no window and no skew-prone
    global sort; labels are ``localCheckpoint``-ed per round so the
    lazy plan doesn't stack join trees (the pagerank discipline).
    Asynchronous/randomized LPA converges faster but is
    non-reproducible — the wrong trade for a data-curation engine.

    Returns ``(id, community, community_size)`` for every node of the
    edge set."""
    und = _canonical_undirected(edges, src_col, dst_col)
    adj = (
        und.select(F.col("a").alias("id"), F.col("b").alias("nb"))
        .unionByName(
            und.select(F.col("b").alias("id"), F.col("a").alias("nb"))
        )
        .localCheckpoint()
    )
    labels = adj.select("id").distinct().withColumn("label", F.col("id"))
    for _ in range(rounds):
        nbl = adj.join(
            labels.select(
                F.col("id").alias("nb"), F.col("label")
            ),
            "nb",
        ).select("id", "label")
        cnt = nbl.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("m")
            )
            .select("id", F.col("m.l").alias("label"))
            .localCheckpoint()
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "id",
        F.col("label").alias("community"),
        "community_size",
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The ``k``-core peeling pass (Seidman, Social Networks 1983;
    distributed peeling as in Montresor et al.): repeatedly delete
    every node whose CURRENT degree is below ``k`` — what survives is
    the maximal subgraph with minimum degree ≥ k, the standard "dense
    cohesive region" primitive for spam-ring and bot-cluster triage
    over interaction graphs.

    A FIXED number of peeling rounds (default 6) makes the semantics
    deterministic and SQL-unrollable at any scale: each round is one
    degree aggregation plus two semi-joins (keep-list against each
    endpoint), ``localCheckpoint``-ed so the plan doesn't stack.  Each
    round strictly shrinks the edge set or is a fixpoint; callers
    needing the true core at adversarial diameters raise ``rounds``
    without changing the plan shape (peeling converges in O(peel
    depth) rounds, typically < 10 on social-shaped graphs).

    Returns ``(id, core_degree)`` for surviving nodes — their degree
    inside the surviving subgraph (≥ k at fixpoint)."""
    cur = _canonical_undirected(edges, src_col, dst_col).localCheckpoint()
    for _ in range(rounds):
        deg = (
            cur.select(F.col("a").alias("id"))
            .unionByName(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("id")
        cur = (
            cur.join(keep.select(F.col("id").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("id").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return (
        cur.select(F.col("a").alias("id"))
        .unionByName(cur.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a partition (Newman & Girvan, Phys. Rev. E
    2004), per community: Q = Σ_c [ L_c/m − (d_c/2m)² ] where m is the
    undirected edge count, L_c the intra-community edges and d_c the
    degree mass of community c.  The quality gate for q175's label
    propagation — a curation pipeline that clusters near-dups or user
    cohorts needs a number saying whether the partition is real
    (Q ≈ 0.3–0.7) or noise (Q ≈ 0).

    Everything except the final division is integer-exact: per
    community the row carries (n_nodes, intra_edges, degree_sum) as
    exact longs plus the contribution (4·m·L_c − d_c²)/(4·m²) rounded
    to 9 places — numerator and denominator are formed in double IN
    THE SAME ORDER on both engines, so the rounded quotient is
    engine-exact.  Scale shape: two aggregations keyed by community
    plus one broadcast of the single-row edge count — never a window,
    never all-pairs; nodes missing from ``assign`` contribute degree
    mass to no community (their edges still count in m).

    Returns ``(community, n_nodes, intra_edges, degree_sum,
    q_contrib)`` sorted by community."""
    # pinned: und feeds three branches (m, intra join, degree fold) —
    # one materialization vs three executions of the canonicalization
    # and everything upstream of it
    und = _canonical_undirected(edges, src_col, dst_col).localCheckpoint()
    m = und.agg(F.count(F.lit(1)).alias("_m"))
    lab = assign.select(
        F.col(id_col).alias("_nid"), F.col(community_col).alias("_c")
    )
    intra = (
        und.join(lab.withColumnRenamed("_nid", "a"), "a")
        .withColumnRenamed("_c", "_ca")
        .join(lab.withColumnRenamed("_nid", "b"), "b")
        .where(F.col("_ca") == F.col("_c"))
        .groupBy(F.col("_c").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = (
        und.select(F.col("a").alias("_nid"))
        .unionByName(und.select(F.col("b").alias("_nid")))
        .groupBy("_nid")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    per_c = (
        deg.join(lab, "_nid")
        .groupBy(F.col("_c").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("_deg").alias("degree_sum"),
        )
    )
    return (
        per_c.join(intra, "community", "left")
        .na.fill({"intra_edges": 0})
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "intra_edges",
            "degree_sum",
            F.round(
                (
                    4.0 * F.col("_m") * F.col("intra_edges")
                    - F.col("degree_sum") * F.col("degree_sum")
                )
                / (4.0 * F.col("_m") * F.col("_m")),
                9,
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


def assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman, Phys. Rev. Lett.
    2002): the Pearson correlation of endpoint degrees over all
    directed edge stubs — positive on social-shaped graphs (hubs link
    hubs), negative on star/broadcast shapes.  The one-number summary
    of whether a co-activity graph is community-shaped or hub-and-
    spoke, complementing q172's local clustering and q177's partition
    quality.

    Exactness: with both orientations materialized the x and y
    marginals coincide, so r = (M·Σxy − (Σx)²)/(M·Σx² − (Σx)²) where
    every Σ is an integer sum over stubs — ONE aggregation row, every
    term an exact int64 well under 2^53, the final ratio formed in
    double in the same operation order on both engines and rounded to
    9 places.  Scale shape: degree agg, two broadcast-sized joins
    keyed by node id, one global single-row fold.  Degree-regular
    graphs (denominator 0) return NULL.

    Returns one row: (n_edges, sum_deg, sum_deg_sq, sum_deg_prod,
    assortativity)."""
    # pinned: und feeds four branches (two degree stubs + two stub
    # orientations) — one materialization vs four executions
    und = _canonical_undirected(edges, src_col, dst_col).localCheckpoint()
    deg = (
        und.select(F.col("a").alias("_nid"))
        .unionByName(und.select(F.col("b").alias("_nid")))
        .groupBy("_nid")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    stubs = und.select(
        F.col("a").alias("_x"), F.col("b").alias("_y")
    ).unionByName(
        und.select(F.col("b").alias("_x"), F.col("a").alias("_y"))
    )
    xy = (
        stubs.join(deg.withColumnRenamed("_nid", "_x"), "_x")
        .withColumnRenamed("_deg", "_dx")
        .join(deg.withColumnRenamed("_nid", "_y"), "_y")
        .withColumnRenamed("_deg", "_dy")
    )
    agg = xy.agg(
        F.count(F.lit(1)).alias("_stubs"),
        F.sum("_dx").alias("sum_deg"),
        F.sum(F.col("_dx") * F.col("_dx")).alias("sum_deg_sq"),
        F.sum(F.col("_dx") * F.col("_dy")).alias("sum_deg_prod"),
    )
    num = (
        F.col("_stubs").cast("double") * F.col("sum_deg_prod")
        - F.col("sum_deg").cast("double") * F.col("sum_deg")
    )
    den = (
        F.col("_stubs").cast("double") * F.col("sum_deg_sq")
        - F.col("sum_deg").cast("double") * F.col("sum_deg")
    )
    return agg.select(
        (F.col("_stubs") / F.lit(2)).cast("long").alias("n_edges"),
        "sum_deg",
        "sum_deg_sq",
        "sum_deg_prod",
        F.when(den != 0, F.round(num / den, 9)).alias("assortativity"),
    )
