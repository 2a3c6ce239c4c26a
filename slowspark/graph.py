"""Link-graph operators over crawled pages: degree statistics and
dangling-aware PageRank as iterative DataFrame joins.

A web corpus is a graph before it is a corpus: hyperlinks carry the
quality signal every crawl-curation stack uses upstream of text filters
(seed-list expansion, spam-farm demotion, crawl prioritization — the
original use case of Page et al. 1999). The reference pipeline has no
graph analog (its entries are independent log lines); these operators
follow the published formulation directly.

Design notes for 10^12-edge scale:

- Edges are the big table; vertices and degrees derive from it with one
  map-side-combined groupBy each. The out-degree table is joined to the
  edge list ONCE before iterating and persisted — the join inside the
  loop is then always `static edges+outdeg  x  current ranks` on the
  src key.
- Each PageRank iteration is exactly one shuffle pair: contributions
  groupBy(dst), then a left join of vertices to contributions. Ranks
  are persisted per iteration and the previous iteration unpersisted;
  every few iterations the rank table is localCheckpoint'ed so the
  lineage (and the risk of a cache-evicted recompute cascading through
  all prior iterations) stays bounded.
- Dangling mass (rank sitting on nodes with no out-links — deleted
  pages, PDFs, crawl frontier edges) is redistributed uniformly each
  iteration, per the standard formulation. It is ONE scalar: a 1-row
  collect per iteration (the repo's bounded-collect idiom), never a
  per-node broadcast join.
- Skew: a celebrity page with 10^8 in-links is a groupBy(dst) hot key —
  partial aggregation combines map-side, and AQE's skew-join handling
  covers the contribution join. No windows, no UDFs, no driver-side
  graph state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

# Size gate for the driver fast path shared by the iterative operators
# (pagerank / hits / label_propagation / seed_distance / spam_mass): a
# graph whose FULL edge list comes back from a limit(cap+1) probe runs
# its rounds as plain-Python IEEE-double loops on the driver instead of
# paying ~2 scheduled jobs per round on a table that fits in one task.
# The probe never counts the big table (CollectLimit short-circuits
# after cap+1 rows, ~one split scan), so the 10^12-edge path is
# unchanged; 200k edges of URL-sized strings collect to ~40 MB, well
# inside default driver limits. Same scale-adaptive idiom as
# textops.connected_min_labels' size-gated union-find finish; both
# paths are pinned equal by differential tests.
_DRIVER_FASTPATH_EDGES = 200_000


def _probe_small(df: DataFrame, cap: int):
    """limit(cap+1).collect() probe: the full row list when df has at
    most cap rows, else None (at which point ~cap+1 rows were scanned,
    not the whole table)."""
    if cap <= 0:
        return None
    rows = df.limit(cap + 1).collect()
    return rows if len(rows) <= cap else None


def _union_node_type(e0: DataFrame, a: str, b: str):
    """The node dtype the distributed path's vertex union would carry
    (schema-only — no job)."""
    return (
        e0.select(F.col(a).alias("node"))
        .union(e0.select(F.col(b).alias("node")))
        .schema["node"]
        .dataType
    )


def _pagerank_driver(
    e0: DataFrame,
    rows,
    n_iter: int,
    damping: float,
    src_col: str,
    dst_col: str,
    weight_col,
    seed_rows,
    init_rows,
) -> DataFrame:
    """The pagerank rounds as a plain-Python IEEE-double loop over an
    already-collected edge list — update expressions mirror the
    distributed path's exactly (contrib = rank*w/out_w, uniform or
    seeded teleport, dangling mass as one scalar per round); summation
    order differs, which the 6dp query contract absorbs (differential-
    pinned against the distributed path)."""
    spark = e0.sparkSession
    weighted = weight_col is not None
    nodes: dict = {}
    edges = []
    for r in rows:
        s, t = r[src_col], r[dst_col]
        nodes.setdefault(s)
        nodes.setdefault(t)
        edges.append((s, t, float(r["__w"]) if weighted else 1))
    n = len(nodes)
    schema = StructType([
        StructField("node", _union_node_type(e0, src_col, dst_col), True),
        StructField("rank", DoubleType(), True),
    ])
    if n == 0:
        return spark.createDataFrame([], schema)
    out_w: dict = {}
    for s, t, w in edges:
        if s is not None:
            out_w[s] = out_w.get(s, 0.0 if weighted else 0) + w
    dangling = [v for v in nodes if v not in out_w]
    tele = None
    if seed_rows is not None:
        inter = {r["node"] for r in seed_rows if r["node"] is not None}
        inter &= set(k for k in nodes if k is not None)
        ns = len(inter)
        if ns == 0:
            raise ValueError(
                "pagerank: no seed appears in the graph — personalized "
                "teleport has nowhere to land"
            )
        tele = {v: (1.0 / ns if v in inter else 0.0) for v in nodes}
    if init_rows is not None:
        ir: dict = {}
        for r in init_rows:
            v = r["__r0"]
            if v is not None:
                ir[r["node"]] = ir.get(r["node"], 0.0) + v
        fill = 1.0 / float(n)
        r0 = {v: ir.get(v, fill) for v in nodes}
        tot = sum(r0.values())
        if not tot > 0:
            raise ValueError(
                "pagerank: init_ranks total mass must be positive"
            )
        ranks = {v: r0[v] / float(tot) for v in nodes}
    else:
        ranks = {v: 1.0 / float(n) for v in nodes}

    def dmass(rk) -> float:
        return sum(rk[v] for v in dangling) if dangling else 0.0

    base = (1.0 - damping) / float(n)
    dm = dmass(ranks)
    for _ in range(n_iter):
        contrib: dict = {}
        for s, t, w in edges:
            if s is None:
                continue
            c = ranks[s] * w / out_w[s] if weighted else ranks[s] / out_w[s]
            contrib[t] = contrib.get(t, 0.0) + c
        if tele is not None:
            ranks = {
                v: (1.0 - damping) * tele[v]
                + damping
                * (
                    (contrib.get(v, 0.0) if v is not None else 0.0)
                    + dm * tele[v]
                )
                for v in nodes
            }
        else:
            ranks = {
                v: base
                + damping
                * (
                    (contrib.get(v, 0.0) if v is not None else 0.0)
                    + dm / float(n)
                )
                for v in nodes
            }
        dm = dmass(ranks)
    return spark.createDataFrame(
        [(v, ranks[v]) for v in nodes], schema
    )


def _hits_driver(base_e: DataFrame, rows, n_iter: int, weighted: bool) -> DataFrame:
    """The HITS rounds on the driver — same unnormalized-accumulate /
    one-norm-pair-per-round math as the distributed loop."""
    import math

    spark = base_e.sparkSession
    nodes: dict = {}
    edges = []
    for r in rows:
        s, t = r["__s"], r["__d"]
        nodes.setdefault(s)
        nodes.setdefault(t)
        edges.append((s, t, float(r["__w"]) if weighted else 1.0))
    schema = StructType([
        StructField("node", _union_node_type(base_e, "__s", "__d"), True),
        StructField("hub", DoubleType(), True),
        StructField("authority", DoubleType(), True),
    ])
    if not nodes:
        return spark.createDataFrame([], schema)
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(n_iter):
        a_u: dict = {}
        for s, t, w in edges:
            if s is None:
                continue
            a_u[t] = a_u.get(t, 0.0) + (w * hub[s] if weighted else hub[s])
        auth_u = {
            v: (a_u.get(v, 0.0) if v is not None else 0.0) for v in nodes
        }
        h_u: dict = {}
        for s, t, w in edges:
            if t is None:
                continue
            h_u[s] = h_u.get(s, 0.0) + (
                w * auth_u[t] if weighted else auth_u[t]
            )
        hub_u = {
            v: (h_u.get(v, 0.0) if v is not None else 0.0) for v in nodes
        }
        an = math.sqrt(sum(x * x for x in auth_u.values()))
        hn = math.sqrt(sum(x * x for x in hub_u.values()))
        an = an if an else 1.0
        hn = hn if hn else 1.0
        auth = {v: auth_u[v] / an for v in nodes}
        hub = {v: hub_u[v] / hn for v in nodes}
    return spark.createDataFrame(
        [(v, hub[v], auth[v]) for v in nodes], schema
    )


def _lpa_driver(e0: DataFrame, rows, n_iter: int) -> DataFrame:
    """The synchronous label-propagation rounds on the driver — integer
    counts and the (max count, min label) tie order are exact, so both
    paths are bit-identical."""
    spark = e0.sparkSession
    nodes: dict = {}
    und = set()
    for r in rows:
        a, b = r["node"], r["nbr"]
        nodes.setdefault(a)
        nodes.setdefault(b)
        if a is not None and b is not None and a != b:
            und.add((a, b))
            und.add((b, a))
    node_t = _union_node_type(e0, "node", "nbr")
    schema = StructType([
        StructField("node", node_t, True),
        StructField("label", node_t, True),
    ])
    if not nodes:
        return spark.createDataFrame([], schema)
    labels = {v: v for v in nodes}
    for _ in range(n_iter):
        cnt: dict = {}
        for v, nb in und:
            k = (v, labels[nb])
            cnt[k] = cnt.get(k, 0) + 1
        best: dict = {}
        for (v, lab), c in cnt.items():
            cand = (-c, lab)
            cur = best.get(v)
            if cur is None or cand < cur:
                best[v] = cand
        labels = {
            v: (best[v][1] if v in best else labels[v]) for v in nodes
        }
    return spark.createDataFrame(
        [(v, labels[v]) for v in nodes], schema
    )


def _bfs_driver(e: DataFrame, erows, seed_rows, max_hops: int) -> DataFrame:
    """Frontier BFS on the driver — hop distances are integer-exact."""
    spark = e.sparkSession
    vertices = set()
    adj: dict = {}
    for r in erows:
        s, t = r["__s"], r["__d"]
        vertices.add(s)
        vertices.add(t)
        if s is not None and t is not None:
            adj.setdefault(s, set()).add(t)
    schema = StructType([
        StructField("node", _union_node_type(e, "__s", "__d"), True),
        StructField("hops", IntegerType(), True),
    ])
    visited: dict = {}
    frontier = []
    for r in seed_rows:
        v = r["node"]
        if v is not None and v in vertices and v not in visited:
            visited[v] = 0
            frontier.append(v)
    for h in range(1, max_hops + 1):
        nxt = []
        seen_this_hop = set()
        for s in frontier:
            for t in adj.get(s, ()):
                if t not in visited and t not in seen_this_hop:
                    seen_this_hop.add(t)
                    nxt.append(t)
        if not nxt:
            break
        for t in nxt:
            visited[t] = h
        frontier = nxt
    return spark.createDataFrame(
        [(v, h) for v, h in visited.items()], schema
    )


def _spam_mass_driver(
    e0: DataFrame,
    rows,
    seed_rows,
    n_iter: int,
    damping: float,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """The fused (pr, ppr) rounds on the driver — per-vector arithmetic
    identical to _pagerank_driver's uniform and seeded updates."""
    spark = e0.sparkSession
    nodes: dict = {}
    edges = []
    for r in rows:
        s, t = r[src_col], r[dst_col]
        nodes.setdefault(s)
        nodes.setdefault(t)
        edges.append((s, t))
    n = len(nodes)
    schema = StructType([
        StructField("node", _union_node_type(e0, src_col, dst_col), True),
        StructField("pr", DoubleType(), True),
        StructField("ppr", DoubleType(), True),
        StructField("mass", DoubleType(), True),
    ])
    inter = {r["node"] for r in seed_rows if r["node"] is not None}
    inter &= set(k for k in nodes if k is not None)
    ns = len(inter)
    if ns == 0:
        raise ValueError(
            "spam_mass: no seed appears in the graph — personalized "
            "teleport has nowhere to land"
        )
    out_w: dict = {}
    for s, t in edges:
        if s is not None:
            out_w[s] = out_w.get(s, 0) + 1
    dangling = [v for v in nodes if v not in out_w]
    tele = {v: (1.0 / ns if v in inter else 0.0) for v in nodes}
    pr = {v: 1.0 / float(n) for v in nodes}
    ppr = {v: 1.0 / float(n) for v in nodes}

    def dmass():
        return (
            sum(pr[v] for v in dangling) if dangling else 0.0,
            sum(ppr[v] for v in dangling) if dangling else 0.0,
        )

    base = (1.0 - damping) / float(n)
    dm_pr, dm_ppr = dmass()
    for _ in range(n_iter):
        c_pr: dict = {}
        c_ppr: dict = {}
        for s, t in edges:
            if s is None:
                continue
            c_pr[t] = c_pr.get(t, 0.0) + pr[s] / out_w[s]
            c_ppr[t] = c_ppr.get(t, 0.0) + ppr[s] / out_w[s]
        pr = {
            v: base
            + damping
            * (
                (c_pr.get(v, 0.0) if v is not None else 0.0)
                + dm_pr / float(n)
            )
            for v in nodes
        }
        ppr = {
            v: (1.0 - damping) * tele[v]
            + damping
            * (
                (c_ppr.get(v, 0.0) if v is not None else 0.0)
                + dm_ppr * tele[v]
            )
            for v in nodes
        }
        dm_pr, dm_ppr = dmass()
    return spark.createDataFrame(
        [
            (v, pr[v], ppr[v], (pr[v] - ppr[v]) / pr[v])
            for v in nodes
        ],
        schema,
    )


def degrees(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node out/in degree over an edge list: (node, out_deg,
    in_deg), zero-filled — a node appears if it occurs on either side
    of any edge. The first question asked of any crawl graph (hub/spam
    detection thresholds, dangling share, frontier size).

    Scale shape: two map-side-combined groupBys (one per endpoint) and
    one full outer join on the node key — each output row is O(1) state
    regardless of how hot the node is."""
    out_d = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return out_d.join(in_d, "node", "full_outer").fillna(
        0, ["out_deg", "in_deg"]
    )


def host_graph(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    drop_self: bool = True,
) -> DataFrame:
    """Collapse a page-level URL edge list to the HOST graph: one row
    per (src host, dst host) with `weight` = the number of page links
    between them — the standard two-level trick that makes crawl-scale
    ranking affordable (10^12 page edges become ~10^8 weighted host
    edges; rank hosts first, spend page-level effort only inside hosts
    that matter). Self-host edges (intra-site navigation, usually >90%
    of all links) are dropped by default — they carry no cross-site
    endorsement.

    Scale shape: one map-side-combined groupBy over codegen'd host
    extraction; output cardinality is the distinct host-pair count."""
    from slowspark.weburl import host_expr

    pairs = edges.select(
        host_expr(src_col).alias("src"), host_expr(dst_col).alias("dst")
    )
    if drop_self:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
    return pairs.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    driver_fastpath_edges: int = _DRIVER_FASTPATH_EDGES,
) -> DataFrame:
    """HITS (Kleinberg 1999) hubs-and-authorities over an edge list, as
    n_iter rounds of DataFrame joins: per iteration

        auth(v) = sum_{u->v} hub(u)      then L2-normalized
        hub(u)  = sum_{u->v} auth(v)     then L2-normalized

    With `weight_col` (e.g. host_graph's page counts) the sums are
    weighted — auth(v) = sum w(u,v)*hub(u), hub(u) = sum
    w(u,v)*auth(v) — the standard weighted-HITS variant; non-positive
    weights raise in-projection (the pagerank guard), all-ones weights
    equal the unweighted run (pinned differential).

    (the standard update order: authorities from CURRENT hubs, hubs
    from the JUST-UPDATED authorities). Returns (node, hub, authority)
    for every node in the edge list; nodes with no out-edges get hub 0
    after the first round, no in-edges get authority 0 — link farms
    split from genuinely-cited pages, which is the curation use
    (PageRank's one score conflates "links to good pages" with "is
    cited"; HITS separates them).

    Scale shape: the edge list is cached TWICE, hash-partitioned on
    each join key (src for the authority step, dst for the hub step) —
    two shuffles paid once so that no iteration ever re-exchanges the
    10^12-edge table; per iteration only the (vertex-sized) score table
    shuffles into each join, plus the two per-direction groupBys. Both
    half-steps run inside ONE norm action per round: normalization is
    by a scalar, so it commutes with the weighted sums — hubs are
    accumulated from UN-normalized authorities and both L2 norms are
    collected in a single 1-row agg (hub/‖hub_u‖ equals the
    normalize-each-half-step value in exact arithmetic; the 6dp query
    contract absorbs the ulp-level reassociation). The unnormalized
    mid table is persisted so the hub aggregate and the join-back read
    one computation of the authority step; scores are checkpointed per
    round (the lineage cut is load-bearing — see OPTIMIZATION_r09.md's
    measured rejection) and the previous round's caches dropped."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    src = F.col(src_col)
    dst = F.col(dst_col)
    if weight_col is not None:
        w = F.when(
            F.col(weight_col) <= 0,
            F.raise_error(F.lit(
                f"hits: non-positive {weight_col} — a weighted edge "
                f"must carry positive endorsement"
            )),
        ).otherwise(F.col(weight_col))
        base_e = edges.select(
            src.alias("__s"), dst.alias("__d"), w.alias("__w")
        )
    else:
        base_e = edges.select(src.alias("__s"), dst.alias("__d"))
    # the upstream edge subtree (often an expensive extraction/collapse,
    # e.g. host_graph over a page-edge self-join) is computed ONCE into
    # this cache; the two per-direction repartitioned copies and the
    # vertex table all derive from it instead of each re-running the
    # upstream (r9: that recompute was 2-3x the whole query cost for
    # host_hits). Dropped after round 0, when every derived cache holds
    # blocks.
    base_e0 = base_e.persist()
    # scale-adaptive fast path (see _DRIVER_FASTPATH_EDGES): the weight
    # guard rides the projection, so the probe collect raises on a
    # non-positive weight exactly like the distributed actions would
    rows = _probe_small(base_e0, driver_fastpath_edges)
    if rows is not None:
        try:
            return _hits_driver(
                base_e0, rows, n_iter, weight_col is not None
            )
        finally:
            base_e0.unpersist()
    # one partitioned cached copy per join direction: the per-iteration
    # joins then reuse the cache's hash partitioning instead of
    # re-shuffling the edge table every round (plan-pinned)
    e = base_e0.repartition("__s").persist()
    e_by_d = base_e0.repartition("__d").persist()
    vertices = (
        base_e0.select(F.col("__s").alias("node"))
        .union(base_e0.select(F.col("__d").alias("node")))
        .distinct()
        .persist()
    )
    vertices.count()
    # round-0 scores are a constant projection over the cached vertex
    # table — nothing to persist (rounds >= 1 return checkpointed data)
    scores = vertices.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    )

    for it in range(n_iter):
        prev = scores
        # authorities from current hubs (UN-normalized: the scalar L2
        # division is deferred — it distributes over the hub sums, so
        # hub_u / ||hub_u|| equals the normalize-then-sum value)
        a_expr = (
            F.col("__w") * F.col("hub")
            if weight_col is not None
            else F.col("hub")
        )
        a = (
            e.join(prev.select(F.col("node").alias("__s"), "hub"), "__s")
            .groupBy("__d")
            .agg(F.sum(a_expr).alias("__a"))
        )
        # prev's node set IS the vertex set (round 0 is a projection of
        # vertices; later rounds are join-backs over it), so the score
        # carrier joins a/h directly — no vertices join-back needed
        p = prev.select("node")
        mid_u = (
            p.join(a, p["node"] == a["__d"], "left")
            .select(
                "node",
                F.coalesce(F.col("__a"), F.lit(0.0)).alias("authority"),
            )
        )
        # persisted WITHOUT an action: the hub aggregate below and the
        # final join-back are its two consumers inside the round's one
        # job — the cache bounds any scheduler-concurrency recompute of
        # the authority step to the first-touch race window
        mid_u.persist()
        # hubs from the just-updated (unnormalized) authorities
        # (dst-partitioned edge copy)
        h_expr = (
            F.col("__w") * F.col("authority")
            if weight_col is not None
            else F.col("authority")
        )
        h = (
            e_by_d.join(
                mid_u.select(F.col("node").alias("__d"), "authority"),
                "__d",
            )
            .groupBy("__s")
            .agg(F.sum(h_expr).alias("__h"))
        )
        nxt_u = (
            mid_u.join(h, mid_u["node"] == h["__s"], "left")
            .select(
                mid_u["node"],
                F.coalesce(F.col("__h"), F.lit(0.0)).alias("hub"),
                "authority",
            )
        )
        nxt_u.persist()
        # both L2 norms in a single 1-row collect (doubles as the
        # cache-materializing action): with the eager checkpoint below
        # the round costs 2 driver jobs where the normalize-each-half-
        # step shape (auth-norm collect, hub-norm collect, checkpoint)
        # paid 3
        row = nxt_u.agg(
            F.sqrt(F.sum(F.col("authority") * F.col("authority"))).alias(
                "an"
            ),
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("hn"),
        ).collect()[0]
        an = float(row["an"]) if row["an"] else 1.0
        # ||hub_u|| where hub_u = sum w*auth_u: dividing by it yields
        # exactly hub_u/||hub_u||, the same value the per-half-step
        # normalization produces (hn there = ||hub_u||/an and the hub
        # entering it was hub_u/an)
        hn = float(row["hn"]) if row["hn"] else 1.0
        scores = nxt_u.select(
            "node",
            (F.col("hub") / F.lit(hn)).alias("hub"),
            (F.col("authority") / F.lit(an)).alias("authority"),
        ).localCheckpoint(eager=True)
        # checkpoint cut the lineage: the round's caches can go
        if it > 0:
            prev.unpersist()
        mid_u.unpersist()
        nxt_u.unpersist()
        if it == 0:
            # every derived cache (e and e_by_d during the round's
            # action, vertices at setup) now holds blocks — the
            # upstream cache has served its purpose
            base_e0.unpersist()

    e.unpersist()
    e_by_d.unpersist()
    vertices.unpersist()
    return scores


def connected_components(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Connected components over an (undirected-interpreted) edge list:
    (node, component) where component = the component's minimum node id.
    The graph face of the engine's dedup-cluster primitive
    (textops.connected_min_labels): one distributed contraction pass
    collapses each near-clique to a star, the size-gated residual is
    finished exactly on the driver (or the Shiloach-Vishkin
    hook+pointer-jump loop runs to fixpoint when the contracted graph
    is still too big to collect) — see that docstring for the measured
    scale/memory envelope."""
    from slowspark.textops import connected_min_labels

    pairs = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    )
    return connected_min_labels(pairs).select(
        F.col("id").alias("node"), F.col("label").alias("component")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
    driver_fastpath_edges: int = _DRIVER_FASTPATH_EDGES,
) -> DataFrame:
    """PageRank (Page et al. 1999) with uniform dangling-mass
    redistribution, as n_iter rounds of DataFrame joins:

        rank'(v) = (1-d)/N  +  d * ( sum_{u->v} rank(u)/outdeg(u)
                                      +  dangling_mass / N )

    where dangling_mass is the total rank on nodes with no out-edges.
    Total rank is conserved at 1.0 every iteration (pinned in tests).
    Returns (node, rank) for every node that appears in the edge list.

    n_iter is a fixed iteration count, not a convergence test — the
    batch-pipeline formulation (a convergence check would be one extra
    agg per iteration; at crawl scale fixed 10-20 rounds is standard
    practice and keeps the run deterministic).

    With `seeds` (a one-column `node` DataFrame) this is PERSONALIZED
    PageRank: the teleport mass (1-d) and the dangling mass land
    uniformly on the seed set instead of on all nodes —

        rank'(v) = (1-d)*tele(v) + d*(contrib(v) + dm*tele(v)),
        tele(v) = 1/|S ∩ V| for seed nodes, else 0

    — the trusted-seed quality-propagation recipe (score every crawled
    page by its link proximity to a vetted seed list; pages only
    reachable from spam farms receive ~nothing). Seeds outside the
    graph are ignored; an empty intersection raises. Total rank mass
    stays 1.0 per iteration, seeded or not. The seed table is joined
    ONCE into the persisted vertex table (a broadcast-sized list or a
    full table both work) — per-iteration cost is identical to the
    uniform case.

    With `weight_col` the edges are WEIGHTED (e.g. host_graph's page
    counts): contributions become rank * w / sum-of-out-weights. A
    non-positive weight raises inside the projection (raise_error CASE,
    the repo's fused-validation idiom — no extra scan); weighted and
    unweighted agree when every weight is 1 (pinned differential).

    With `init_ranks` (a (node, rank) DataFrame — typically the PREVIOUS
    snapshot's pagerank output) iteration starts from those ranks instead
    of uniform 1/N: the incremental-recrawl warm start. Compose with
    weburl.crawl_delta — re-extract edges for new+changed pages only,
    then re-rank the merged edge set from the old ranks; a perturbed
    graph re-converges in a fraction of the cold-start iterations
    (pinned by a convergence-delta test). Nodes absent from init_ranks
    (new URLs) start at 1/N; init nodes no longer in the graph are
    dropped; the vector is then renormalized to total mass 1.0, so the
    per-iteration conservation invariant holds from round 0. Duplicate
    init nodes are summed (one bounded groupBy over the init table);
    a negative rank raises inside the projection (fused raise_error,
    no extra scan); non-positive total mass raises.

    Scale shape: see module docstring — one shuffle pair per iteration
    over a persisted edges+outdeg table, a 1-row dangling-mass collect,
    rank lineage truncated by localCheckpoint every checkpoint_every
    iterations. The warm start adds ONE outer join + ONE scalar agg
    before round 0; every iteration after that is identical.

    ``driver_fastpath_edges``: graphs whose full edge list (and seed /
    init tables, when given) come back from a limit probe run the
    rounds on the driver with identical update expressions — see
    _DRIVER_FASTPATH_EDGES. 0 disables (always distributed).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")

    src = F.col(src_col)
    dst = F.col(dst_col)
    # ONE pass over the (possibly expensive) upstream edge subtree:
    # vertices, out-degrees, the annotated edge table and the dangling
    # set all derive from this cache (r9: each previously recomputed
    # the upstream — 4-5x the edge-build cost for the host_* queries).
    # Dropped after round 0, when every derived cache holds blocks.
    if weight_col is not None:
        w = F.when(
            F.col(weight_col) <= 0,
            F.raise_error(F.lit(
                f"pagerank: non-positive {weight_col} — a weighted edge "
                f"must carry positive endorsement"
            )),
        ).otherwise(F.col(weight_col))
        e0 = edges.select(src_col, dst_col, w.alias("__w")).persist()
    else:
        e0 = edges.select(src_col, dst_col).persist()
    # scale-adaptive fast path: if the whole graph (and the seed / init
    # side tables) fits under the probe cap, iterate on the driver —
    # same update expressions, no per-round jobs. The weight guard
    # rides the e0 projection, so the probe collect raises on a
    # non-positive weight exactly like the distributed actions would.
    rows = _probe_small(e0, driver_fastpath_edges)
    if rows is not None:
        seed_rows = init_rows = None
        small = True
        if seeds is not None:
            seed_rows = _probe_small(
                seeds.select("node").distinct(), driver_fastpath_edges
            )
            small = seed_rows is not None
        if small and init_ranks is not None:
            checked0 = F.when(
                F.col("rank") < 0,
                F.raise_error(F.lit(
                    "pagerank: negative rank in init_ranks — a warm "
                    "start must begin from a valid rank vector"
                )),
            ).otherwise(F.col("rank").cast("double"))
            init_rows = _probe_small(
                init_ranks.select("node", checked0.alias("__r0")),
                driver_fastpath_edges,
            )
            small = init_rows is not None
        if small:
            try:
                return _pagerank_driver(
                    e0, rows, n_iter, damping, src_col, dst_col,
                    weight_col, seed_rows, init_rows,
                )
            finally:
                e0.unpersist()
    vertices = (
        e0.select(src.alias("node"))
        .union(e0.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    n = vertices.count()  # bounded: one scalar (also fills e0's cache)

    if weight_col is not None:
        out_deg = e0.groupBy(src_col).agg(F.sum("__w").alias("__od"))
    else:
        out_deg = e0.groupBy(src_col).agg(F.count("*").alias("__od"))
    # static across iterations: every edge annotated with its
    # source's out-degree (or out-weight); the per-iteration join
    # touches only this + ranks
    edges_w = e0.join(out_deg, src_col).persist()
    # dangling node set is static too (no out-edges at all)
    dangling = vertices.join(
        e0.select(src.alias("node")).distinct(), "node", "left_anti"
    ).persist()

    d = F.lit(damping)
    if seeds is not None:
        seed_set = seeds.select(F.col("node")).distinct()
        tele_v = vertices.join(
            seed_set, "node", "left_semi"
        ).persist()
        ns = tele_v.count()
        if ns == 0:
            raise ValueError(
                "pagerank: no seed appears in the graph — personalized "
                "teleport has nowhere to land"
            )
        # one static join: the teleport column rides the vertex table
        vertices_t = vertices.join(
            tele_v.withColumn("__is_seed", F.lit(True)), "node", "left"
        ).select(
            "node",
            F.when(F.col("__is_seed"), F.lit(1.0 / ns))
            .otherwise(F.lit(0.0)).alias("__tele"),
        ).persist()
        vertices_t.count()
        tele_v.unpersist()
    else:
        vertices_t = None
    base = (F.lit(1.0) - d) / F.lit(float(n))
    if init_ranks is not None:
        checked = F.when(
            F.col("rank") < 0,
            F.raise_error(F.lit(
                "pagerank: negative rank in init_ranks — a warm start "
                "must begin from a valid rank vector"
            )),
        ).otherwise(F.col("rank").cast("double"))
        ir = (
            init_ranks.select("node", checked.alias("__r0"))
            .groupBy("node")
            .agg(F.sum("__r0").alias("__r0"))
        )
        r0 = (
            vertices.join(ir, "node", "left")
            .select(
                "node",
                F.coalesce(
                    F.col("__r0"), F.lit(1.0) / F.lit(float(n))
                ).alias("rank"),
            )
            .persist()
        )
        tot = r0.agg(F.sum("rank").alias("t")).collect()[0]["t"]
        if tot is None or not tot > 0:
            r0.unpersist()
            raise ValueError(
                "pagerank: init_ranks total mass must be positive"
            )
        ranks = r0.select(
            "node", (F.col("rank") / F.lit(float(tot))).alias("rank")
        )
        ranks.persist()
    else:
        ranks = vertices.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
        ranks.persist()

    def _dangling_mass(r: DataFrame) -> float:
        # the one scalar per round; doubles as the cache-materializing
        # action for a freshly persisted rank table (r9: a separate
        # persist().count() + this collect was two jobs per round)
        return (
            r.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            .collect()[0]["dm"]
        )

    dm = _dangling_mass(ranks)
    if init_ranks is not None:
        r0.unpersist()
    for i in range(n_iter):
        contrib_expr = (
            F.col("rank") * F.col("__w") / F.col("__od")
            if weight_col is not None
            else F.col("rank") / F.col("__od")
        )
        contrib = (
            edges_w.join(ranks, edges_w[src_col] == ranks["node"])
            .groupBy(dst_col)
            .agg(F.sum(contrib_expr).alias("__c"))
        )
        if vertices_t is not None:
            new_ranks = (
                vertices_t.join(
                    contrib, vertices_t["node"] == contrib[dst_col], "left"
                )
                .select(
                    "node",
                    (
                        (F.lit(1.0) - d) * F.col("__tele")
                        + d
                        * (
                            F.coalesce(F.col("__c"), F.lit(0.0))
                            + F.lit(float(dm)) * F.col("__tele")
                        )
                    ).alias("rank"),
                )
            )
        else:
            new_ranks = (
                vertices.join(
                    contrib, vertices["node"] == contrib[dst_col], "left"
                )
                .select(
                    "node",
                    (
                        base
                        + d
                        * (
                            F.coalesce(F.col("__c"), F.lit(0.0))
                            + F.lit(float(dm)) / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
            )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if i + 1 < n_iter:
                dm = _dangling_mass(new_ranks)
        else:
            # persist + next round's dangling-mass collect in ONE job
            # (the agg materializes the fresh cache); the final round
            # still needs the action so the returned table is backed by
            # blocks before its parents are unpersisted
            new_ranks.persist()
            dm = _dangling_mass(new_ranks)
        ranks.unpersist()
        ranks = new_ranks
        if i == 0:
            # edges_w (during contrib), dangling (during the dm agg)
            # and vertices (at setup) all hold blocks now — drop the
            # upstream edge cache
            e0.unpersist()

    vertices.unpersist()
    if vertices_t is not None:
        vertices_t.unpersist()
    edges_w.unpersist()
    dangling.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
    driver_fastpath_edges: int = _DRIVER_FASTPATH_EDGES,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made deterministic: labels start as the node id; each
    round every node adopts the most frequent label among its
    (undirected) neighbors, ties broken by the SMALLEST label; an
    isolated node keeps its own label. Returns (node, label) after
    exactly n_iter rounds.

    Communities are the mid-resolution grouping between connected
    components (too coarse: the web is one giant component) and host
    clustering (too literal): link farms, mirror clusters, and topic
    neighborhoods surface as labels after a handful of rounds — the
    standard cheap community pass over a crawl graph.

    Determinism: the textbook algorithm is order-dependent
    (asynchronous updates, random tie-breaks). This one is synchronous
    (round k+1 reads only round k) with a total tie order
    (max count, then min label), so output is independent of
    partitioning and reproducible in a second engine — same contract as
    the rest of this module.

    Scale shape: the undirected neighbor list (both edge directions,
    deduped) is built once and persisted; each round is one shuffle
    pair — join labels on neighbor + groupBy(node, label) count — then
    a max-struct keeper (no window: the per-node argmax folds inside
    the same aggregation). Lineage is cut every checkpoint_every rounds
    like pagerank's."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    src = F.col(src_col)
    dst = F.col(dst_col)
    # one pass over the upstream edge subtree (see pagerank): the
    # undirected neighbor list and the vertex table both derive from
    # this cache instead of each recomputing the upstream
    e0 = edges.select(src.alias("node"), dst.alias("nbr")).persist()
    # scale-adaptive fast path (see _DRIVER_FASTPATH_EDGES): integer
    # counts + the deterministic tie order make both paths bit-identical
    rows = _probe_small(e0, driver_fastpath_edges)
    if rows is not None:
        try:
            return _lpa_driver(e0, rows, n_iter)
        finally:
            e0.unpersist()
    und = (
        e0.union(e0.select(F.col("nbr").alias("node"),
                           F.col("node").alias("nbr")))
        .filter(F.col("node") != F.col("nbr"))
        .distinct()
        .persist()
    )
    # vertices only seeds the label table (which is itself persisted) —
    # no cache of its own needed
    vertices = (
        e0.select("node")
        .union(e0.select(F.col("nbr").alias("node")))
        .distinct()
    )
    labels = vertices.withColumn("label", F.col("node"))
    labels.persist().count()
    for i in range(n_iter):
        nbr_labels = und.join(
            labels.select(
                F.col("node").alias("nbr"), F.col("label").alias("__nl")
            ),
            "nbr",
        )
        counted = nbr_labels.groupBy("node", "__nl").agg(
            F.count("*").alias("__c")
        )
        # argmax(count, tie -> min label) as ONE min-struct fold:
        # (-count, label) orders ties toward the smaller label without
        # a per-node window. The count is negated, NOT the label
        # (ADVICE r8): negating the label only works for numeric node
        # ids — string/host graphs (which pagerank/hits accept) fail
        # with CAST_INVALID_INPUT under ANSI mode.
        picked = counted.groupBy("node").agg(
            F.min(F.struct((-F.col("__c")).alias("__m"), F.col("__nl")))
            ["__nl"].alias("__new")
        )
        new_labels = (
            labels.join(picked, "node", "left")
            .select(
                "node",
                F.coalesce("__new", "label").alias("label"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels.persist().count()
        labels.unpersist()
        labels = new_labels
        if i == 0:
            # und materialized during this round's join — the upstream
            # edge cache has served its purpose
            e0.unpersist()
    und.unpersist()
    return labels


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_fastpath_edges: int = _DRIVER_FASTPATH_EDGES,
) -> DataFrame:
    """Directed BFS hop distance from a trusted seed set: (node, hops)
    for every node reachable from any seed in <= max_hops link hops
    (seeds themselves at 0). Unreachable nodes are ABSENT — the caller
    decides the unreachable policy (TrustRank-style demotion keeps them
    at +inf / drops them).

    Link distance from a vetted seed list is the oldest whitebox spam
    feature (Gyongyi et al. 2004 motivate TrustRank with it): spam
    farms are many hops from any trusted page, while organically cited
    content sits 1-3 hops out. Integer-exact (no float contract needed)
    and cheaper than a full personalized PageRank when only the
    frontier matters (crawl-frontier prioritization).

    Scale shape: classic frontier BFS as DataFrame ops — per hop, join
    the CURRENT frontier (not the whole visited set) to the edge list,
    anti-join out already-visited nodes. Each hop is one shuffle pair
    over frontier-sized inputs and ONE driver action (the emptiness
    count, which doubles as the frontier's cache materialization — r9:
    isEmpty + a per-hop checkpoint of the whole visited set was three).
    The visited set is a lazy union over the per-hop frontier caches,
    checkpointed once at the end (and every 8 hops, bounding lineage
    growth for deep traversals). max_hops bounds the rounds (web BFS
    saturates in ~6; crawl features use 2-4)."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    raw = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    # scale-adaptive fast path (see _DRIVER_FASTPATH_EDGES): probe the
    # RAW projection — no distinct exchange paid before the gate; the
    # driver adjacency sets dedup inherently, and hop distances are
    # integer-exact, so both paths are bit-identical. (A raw list over
    # the cap whose distinct would fit just falls through — the
    # conservative direction.)
    erows = _probe_small(raw, driver_fastpath_edges)
    if erows is not None:
        seed_rows = _probe_small(
            seeds.select("node").distinct(), driver_fastpath_edges
        )
        if seed_rows is not None:
            return _bfs_driver(raw, erows, seed_rows, max_hops)
    e = raw.distinct().persist()
    vertices = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    # seeds outside the graph are ignored (same contract as pagerank's
    # personalized teleport, minus the empty-set raise: an empty
    # intersection just returns an empty frame)
    frontier = (
        seeds.select(F.col("node")).distinct()
        .join(vertices, "node", "left_semi")
        .withColumn("hops", F.lit(0))
    )
    # bootstrap materialization: ONE cheap checkpoint fills the edge
    # cache and cuts the hop-0 frontier's lineage before the hop loop
    # references them several times apiece (without it, hop 1 becomes
    # one deep job that recomputes the un-materialized edge subtree per
    # reference)
    frontier = frontier.localCheckpoint(eager=True)
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(h))
        )
        # checkpoint the NEW FRONTIER ONLY (one action computing this
        # hop's shuffle pair): its lineage — which references both the
        # previous frontier and the whole visited union, i.e. doubles
        # per hop if left uncut — is truncated here, so `visited` stays
        # a lazy union of FLAT checkpointed frontiers and the per-hop
        # plan size stays linear in h. (r8 checkpointed the whole
        # visited union every hop instead: correct, but it recopied all
        # previously-visited rows per hop and still needed a separate
        # emptiness action on the un-materialized frontier.)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():  # flat scan of the checkpoint: ~free
            break
        visited = visited.union(nxt)
        frontier = nxt
    e.unpersist()
    return visited.select("node", "hops")


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_fastpath_edges: int = _DRIVER_FASTPATH_EDGES,
) -> DataFrame:
    """Spam mass (Gyongyi et al. 2006): the fraction of a page's
    PageRank that does NOT come from trusted pages —

        spam_mass(v) = (pr(v) - ppr(v)) / pr(v)

    where pr is uniform PageRank and ppr is PageRank personalized to
    the trusted seed set. Near 0: rank earned through the trusted web.
    Near 1: rank manufactured by link structures unreachable from any
    trusted page — the canonical link-farm detector. Returns
    (node, pr, ppr, mass); mass can be slightly negative for pages
    super-endorsed by seeds (standard; callers threshold on the high
    end).

    FUSED iteration: both rank vectors ride ONE (node, pr, ppr) table —
    per round there is ONE edges⋈ranks join with a two-column
    contribution aggregate, one dangling-mass collect carrying both
    sums, one vertex join-back. Cost = 1x pagerank's shuffles/scans per
    iteration for BOTH chains (the naive composition pays 2x), with
    per-vector arithmetic identical to pagerank's (same IEEE update
    expressions — the two chains never mix, pinned by a differential
    against two separate pagerank runs). Every scale property of
    pagerank's docstring applies unchanged."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    src = F.col(src_col)
    dst = F.col(dst_col)
    # ONE pass over the upstream edge subtree (see pagerank): vertices,
    # out-degrees, the annotated edge table and the dangling set all
    # derive from this cache; dropped after round 0
    e0 = edges.select(src_col, dst_col).persist()
    # scale-adaptive fast path (see _DRIVER_FASTPATH_EDGES)
    rows = _probe_small(e0, driver_fastpath_edges)
    if rows is not None:
        seed_rows = _probe_small(
            seeds.select("node").distinct(), driver_fastpath_edges
        )
        if seed_rows is not None:
            try:
                return _spam_mass_driver(
                    e0, rows, seed_rows, n_iter, damping, src_col, dst_col
                )
            finally:
                e0.unpersist()
    vertices = (
        e0.select(src.alias("node"))
        .union(e0.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    n = vertices.count()
    seed_set = seeds.select(F.col("node")).distinct()
    tele_v = vertices.join(seed_set, "node", "left_semi").persist()
    ns = tele_v.count()
    if ns == 0:
        raise ValueError(
            "spam_mass: no seed appears in the graph — personalized "
            "teleport has nowhere to land"
        )
    vertices_t = vertices.join(
        tele_v.withColumn("__is_seed", F.lit(True)), "node", "left"
    ).select(
        "node",
        F.when(F.col("__is_seed"), F.lit(1.0 / ns))
        .otherwise(F.lit(0.0)).alias("__tele"),
    ).persist()
    vertices_t.count()
    tele_v.unpersist()
    out_deg = e0.groupBy(src_col).agg(F.count("*").alias("__od"))
    edges_w = e0.join(out_deg, src_col).persist()
    dangling = vertices.join(
        e0.select(src.alias("node")).distinct(), "node", "left_anti"
    ).persist()
    d = F.lit(damping)
    base = (F.lit(1.0) - d) / F.lit(float(n))
    ranks = vertices_t.select(
        "node",
        "__tele",
        (F.lit(1.0) / F.lit(float(n))).alias("pr"),
        (F.lit(1.0) / F.lit(float(n))).alias("ppr"),
    )
    ranks.persist()

    def _dangling_mass(r: DataFrame):
        # the two scalars per round in one collect; doubles as the
        # cache-materializing action for a freshly persisted rank table
        return (
            r.join(dangling, "node", "left_semi")
            .agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm_pr"),
                F.coalesce(F.sum("ppr"), F.lit(0.0)).alias("dm_ppr"),
            )
            .collect()[0]
        )

    dm = _dangling_mass(ranks)
    for i in range(n_iter):
        contrib = (
            edges_w.join(ranks, edges_w[src_col] == ranks["node"])
            .groupBy(dst_col)
            .agg(
                F.sum(F.col("pr") / F.col("__od")).alias("__c_pr"),
                F.sum(F.col("ppr") / F.col("__od")).alias("__c_ppr"),
            )
        )
        # join the STATIC vertex table, never `ranks` itself: contrib
        # already contains ranks' lineage, and ranks⋈contrib would put
        # it in the plan twice per round — exponential growth by the
        # first checkpoint (observed as an analysis-time heap OOM)
        new_ranks = (
            vertices_t.join(
                contrib, vertices_t["node"] == contrib[dst_col], "left"
            )
            .select(
                "node",
                "__tele",
                (
                    base
                    + d
                    * (
                        F.coalesce(F.col("__c_pr"), F.lit(0.0))
                        + F.lit(float(dm["dm_pr"])) / F.lit(float(n))
                    )
                ).alias("pr"),
                (
                    (F.lit(1.0) - d) * F.col("__tele")
                    + d
                    * (
                        F.coalesce(F.col("__c_ppr"), F.lit(0.0))
                        + F.lit(float(dm["dm_ppr"])) * F.col("__tele")
                    )
                ).alias("ppr"),
            )
        )
        if (i + 1) % 8 == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if i + 1 < n_iter:
                dm = _dangling_mass(new_ranks)
        else:
            # persist + next round's dangling-mass collect in ONE job
            new_ranks.persist()
            dm = _dangling_mass(new_ranks)
        ranks.unpersist()
        ranks = new_ranks
        if i == 0:
            e0.unpersist()
    vertices.unpersist()
    vertices_t.unpersist()
    edges_w.unpersist()
    dangling.unpersist()
    return ranks.select(
        "node",
        "pr",
        "ppr",
        ((F.col("pr") - F.col("ppr")) / F.col("pr")).alias("mass"),
    )
