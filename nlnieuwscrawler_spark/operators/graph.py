"""Host-graph analytics for crawl prioritization — PageRank.

A frontier scheduler ranks URLs within a host by recency/depth
(operators/politeness), but deciding WHICH HOSTS deserve crawl budget is
a graph problem: hosts that many other hosts link to are the hubs a news
crawler should revisit first. The reference crawler hardcodes its host
list (Dutch news seed list); at 10^10-URL scale the host graph replaces
the hand-curated list, and PageRank over it is the classic priority
signal (Page et al. 1999, "The PageRank Citation Ranking" — public).

Engine-portable exactness (the repo's decimal recipe): per-edge
contributions are IEEE-double divisions rounded to 12 dp and cast to
DECIMAL(28,12), summed EXACTLY (associative, partition-order-free), and
each iteration's new rank is one double expression rounded to 12 dp — so
a DuckDB oracle that unrolls the same K iterations reproduces every bit.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.operators.checkpoint import cut_lineage


def host_pagerank(
    edges: DataFrame,
    n_nodes: int,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    reliable: bool = False,
    broadcast_ranks: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a host link graph → (host, rank).

    Nodes are the dense ids ``0..n_nodes-1`` (a host dictionary is built
    upstream once — dense ids keep the rank table narrow and the dangling
    set well-defined even for hosts that only ever appear as link
    targets). ``edges`` is the DISTINCT (src, dst) host-level link graph.

    Iteration t: every host sends rank_t/outdeg along each out-edge;
    dangling hosts (no out-edges) spread their whole rank uniformly; then

        rank_{t+1}(h) = round((1-d)/N + d*(in_sum(h) + dangling/N), 12)

    FIXED ``iters`` rounds (no convergence test) so the result is a pure
    function of (edges, N, d, iters) — the property the cross-engine
    oracle needs, and what production crawlers do anyway (a handful of
    power iterations is plenty for a priority signal).

    100 TB shape: the rank table is |hosts| rows (~10^7 at web scale) —
    broadcast to the edge join by default (``broadcast_ranks=False``
    falls back to a shuffle hash join keyed by src for host cardinalities
    past broadcast range); out-degrees are computed ONCE and persisted
    with the edges; the only per-iteration shuffle is the groupBy(dst)
    partial-aggregated sum, moving (dst, decimal) pairs — never the edge
    payload. The dangling mass is a scalar per round (metadata-sized
    collect, same pattern as dedup_components' convergence sum);
    per-round lineage cuts stop iterative-plan blowup, ``reliable=True``
    routes them through the durable checkpoint dir.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one persisted pass builds both reused tables
    e = cut_lineage(e, reliable)
    outd = cut_lineage(outd, reliable)

    spark = edges.sparkSession
    nodes = spark.range(n_nodes).select(F.col("id").alias("host"))
    init = round(1.0 / n_nodes, 12)
    ranks = cut_lineage(
        nodes.select("host", F.lit(init).cast("double").alias("rank")), reliable
    )

    round_secs: list[float] = []
    for _ in range(iters):
        t0 = _time.perf_counter()
        new = _pagerank_step(
            e, outd, nodes, ranks, n_nodes, damping, broadcast_ranks
        )
        ranks = cut_lineage(new, reliable)
        round_secs.append(round(_time.perf_counter() - t0, 3))
    if stats is not None:
        stats["rounds"] = len(round_secs)
        stats["round_secs"] = round_secs
    return ranks


def _pagerank_step(
    e: DataFrame,
    outd: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    n_nodes: int,
    damping: float = 0.85,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """One power iteration as a single (un-cut) plan — split out so plan
    tests can pin its shape: rank/outdeg joins broadcast, the ONLY
    exchange the (dst, decimal) partial-aggregated sum."""
    base = (1.0 - damping) / n_nodes  # same IEEE fold the oracle performs
    # dangling mass: ranks of hosts with no out-edges, summed exactly
    dm_row = (
        ranks.join(outd, ranks["host"] == outd["src"], "left_anti")
        .agg(F.sum(F.col("rank").cast("decimal(28,12)")).alias("s"))
        .collect()[0]["s"]
    )
    dm = float(dm_row) if dm_row is not None else 0.0
    r = F.broadcast(ranks) if broadcast_ranks else ranks
    o = F.broadcast(outd) if broadcast_ranks else outd
    contrib = (
        e.join(r, e["src"] == r["host"])
        .join(o, "src")
        .select(
            "dst",
            F.round(F.col("rank") / F.col("outdeg"), 12)
            .cast("decimal(28,12)")
            .alias("__c"),
        )
        .groupBy("dst")
        .agg(F.sum("__c").alias("__s"))
    )
    return nodes.join(contrib, nodes["host"] == contrib["dst"], "left").select(
        "host",
        F.round(
            F.lit(base)
            + F.lit(damping)
            * (
                F.coalesce(F.col("__s"), F.lit(0).cast("decimal(38,12)")).cast(
                    "double"
                )
                + F.lit(dm) / F.lit(float(n_nodes))
            ),
            12,
        ).alias("rank"),
    )


def crawl_depth(
    edges: DataFrame,
    n_nodes: int,
    seeds: list[int],
    max_depth: int = 30,
    reliable: bool = False,
    broadcast_frontier: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Min-hop BFS distance from the seed hosts → (host, depth); NULL
    depth = unreachable. The other half of crawl prioritization: a
    frontier scheduler enforces a DEPTH budget from the seed list (the
    reference crawls only its Dutch-news seeds one hop deep; at web scale
    "how many hops from a trusted seed" is the standard crawl-frontier
    quality prior alongside PageRank).

    Frontier BFS, not dense relaxation: round r joins ONLY the hosts
    first reached at round r-1 against the edge list, so each round
    shuffles the frontier's out-edges — work proportional to the BFS
    wavefront, never |V|x rounds. The frontier broadcasts to the edge
    join by default; at web scale the depth-2/3 wavefront can be most of
    the host graph, so ``broadcast_frontier=False`` switches to a
    src-keyed shuffle hash join. Terminates when the frontier empties
    (one metadata-sized count per round, same pattern as
    dedup_components' convergence sum) or at ``max_depth``. Distances
    are integers — exact on any engine by construction.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).distinct()
    e = cut_lineage(e, reliable)
    nodes = spark.range(n_nodes).select(F.col("id").alias("host"))
    dist = cut_lineage(
        nodes.select(
            "host",
            F.when(
                F.col("host").isin([int(s) for s in seeds]), F.lit(0)
            ).cast("long").alias("depth"),
        ),
        reliable,
    )
    frontier = dist.filter(F.col("depth") == 0).select("host")
    round_secs: list[float] = []
    for r in range(1, max_depth + 1):
        t0 = _time.perf_counter()
        fr = F.broadcast(frontier) if broadcast_frontier else frontier
        reached = (
            e.join(fr, e["src"] == fr["host"])
            .select(F.col("dst").alias("host"))
            .distinct()
        )
        nxt = dist.join(reached.withColumn("__r", F.lit(r)), "host", "left").select(
            "host",
            F.coalesce(
                "depth", F.when(F.col("__r").isNotNull(), F.lit(r)).cast("long")
            ).alias("depth"),
        )
        dist = cut_lineage(nxt, reliable)
        frontier = dist.filter(F.col("depth") == r).select("host")
        n_front = frontier.count()
        round_secs.append(round(_time.perf_counter() - t0, 3))
        if n_front == 0:
            break
    if stats is not None:
        stats["rounds"] = len(round_secs)
        stats["round_secs"] = round_secs
    return dist


def anchor_rollup(
    links: DataFrame,
    target_col: str = "dst",
    anchor_col: str = "anchor",
    src_col: str = "src",
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-corpus
    enrichment: a target page is described by the anchor texts of the
    links POINTING AT it (Brin & Page 1998 §2.2; anchor fields in every
    open web corpus since). The crawler's link extractor (O13) emits
    ``(src, dst, anchor)``; this rolls those up into the per-target
    signal table a ranker or training-data builder joins against.

    Output per target: in-link count, distinct-source count, distinct-
    anchor count, and the most common anchor (ties broken by the
    lexicographically SMALLEST anchor — a total order, so the pick is
    engine-portable).

    100 TB shape: two narrow hash aggregations and one equi-join on the
    target key, all map-side combined — (target, anchor) pair counts
    first (this also bounds the top-anchor window's partition to the
    DISTINCT anchors of one target, not its raw in-links, so a
    1M-in-link hub with 10k distinct anchors ranks over 10k rows), then
    the per-target rollup; anchors are short strings, the fat source
    pages never enter. The window re-exchanges by target alone (hash
    partitioning on (target, anchor) does not co-locate a target's
    groups), which is the correct, narrow move.
    """
    t, a, s = F.col(target_col), F.col(anchor_col), F.col(src_col)
    pair = links.groupBy(t.alias("host"), a.alias("anchor")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("host").orderBy(
            F.col("__cnt").desc(), F.col("anchor").asc()
        )
    )
    top = (
        pair.withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select("host", F.col("anchor").alias("top_anchor"),
                F.col("__cnt").alias("top_cnt"))
    )
    roll = links.groupBy(t.alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct(s).cast("long").alias("n_sources"),
        F.countDistinct(a).cast("long").alias("n_anchors"),
    )
    return roll.join(top, "host")
