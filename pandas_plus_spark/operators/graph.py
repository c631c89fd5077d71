"""Link-graph analytics for crawl-corpus pipelines.

The outlink extractor (``functions.urls.extract_links``) produces the
edge list of the web graph a crawl saw; these operators turn it into
crawl-prioritization and corpus-quality signals (reference parity:
none — beyond-reference pipeline capability, same family as the
dedup/crawl front door):

- :func:`degree_stats` — in/out degree per node, one aggregation each.
- :func:`pagerank` — damped power iteration with dangling-mass
  redistribution, the standard crawl-frontier priority score.

Scale shape: the edge list is re-shuffled ONCE onto its source key and
persisted; every iteration then joins the (node-sized) rank frame
against the co-partitioned edges, aggregates contributions on the
destination key, and eagerly ``localCheckpoint``s the new ranks (the
rank frame feeds both the contribution join and the dangling
anti-join, so un-truncated lineage would double per round). Iteration count
is fixed (power iteration converges geometrically at rate ``damping``),
so lineage stays linear and no driver-side convergence ``collect()`` is
needed; per-iteration cost is one node-frame shuffle + one edge-sized
aggregation — at 100 TB the edge re-shuffle is paid once, like the
bucketed-join prepartitioning elsewhere in the engine.

``exact_mass=True`` switches to INTEGER mass arithmetic (total mass
``10**12``, floor division for the per-edge share, damping 85/100 as an
exact rational): every intermediate is an int64, so the result is
bit-identical in ANY engine — the oracle-gate twin, same convention as
the dedup poly-hash families (production keeps float arithmetic, whose
group-sum ordering is engine-dependent in the last ULP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import attach_cached, ensure_parallelism

#: Integer-mass scale: total rank mass when ``exact_mass=True``. 10^12
#: keeps per-node mass well inside int64 while leaving ~6 decimal
#: digits of resolution below the uniform mass of a trillion-node graph.
PAGERANK_MASS = 10 ** 12


def degree_stats(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) over an edge list — nodes appearing
    only as sources (or only as destinations) get 0 for the missing
    side. Two keyed aggregations and one outer join; both aggregates
    are map-side combined."""
    out_d = (edges.groupBy(F.col(src_col).alias("node"))
             .agg(F.count(F.lit(1)).alias("out_degree")))
    in_d = (edges.groupBy(F.col(dst_col).alias("node"))
            .agg(F.count(F.lit(1)).alias("in_degree")))
    return (out_d.join(in_d, "node", "full")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree")))


def pagerank(
    edges: DataFrame,
    *,
    n_iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    exact_mass: bool = False,
) -> DataFrame:
    """PageRank over an edge list: ``(node, rank)`` after ``n_iters``
    damped power iterations from the uniform start, dangling mass
    (nodes with no out-edges) redistributed uniformly each step —
    the crawl-frontier priority standard (Page et al. 1999).

    Duplicate edges count once (the frame is ``distinct``-ed); every
    node that appears as a source OR destination is ranked. With the
    default float arithmetic, ranks sum to ~1 and match any textbook
    implementation to ~1e-12 per iteration. ``exact_mass=True`` runs
    the same recurrence in integer mass units (see module docstring):
    ``rank = mass / PAGERANK_MASS``; each node's mass divides over its
    out-edges by FLOOR division and damping applies as ``* 85 // 100``
    (for damping=0.85), so results are bit-reproducible across engines
    at the cost of dropping sub-unit remainders (≤ out_degree units per
    node per step, i.e. ≤ 1e-12 relative of total mass per edge) —
    remainders are NOT redistributed, so total mass decays by a few
    units per iteration; the gate's oracle reproduces this exactly.
    """
    if exact_mass and damping != 0.85:
        raise ValueError("exact_mass supports the damping=0.85 rational "
                         "(85/100) only")
    e = (ensure_parallelism(edges)
         .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outd"))
    # edges carry their source's out-degree; ONE shuffle onto src, then
    # persisted — every iteration's join reuses this layout
    ej = e.join(out_d, "src").persist()
    base = nodes.persist()
    n = base.count()                             # node count (scalar)
    if n == 0:
        typ = "long" if exact_mass else "double"
        empty = base.select(
            "node", F.lit(None).cast(typ).alias("rank" if not exact_mass
                                                else "mass"))
        return attach_cached(empty, ej, base)

    if exact_mass:
        init = F.lit(PAGERANK_MASS // n).cast("long")
        ranks = base.select("node", init.alias("__m"))
        for _ in range(n_iters):
            contrib = (
                ej.join(ranks.withColumnRenamed("node", "src"), "src")
                # `div`: true int64 floor division — bit-identical to the
                # oracle's `//`, unlike double-divide-then-cast
                .select("dst", F.expr("__m div __outd").alias("__c"))
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__c").alias("__in")))
            dang = (ranks.join(out_d.withColumnRenamed("src", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("__m"),
                                    F.lit(0).cast("long")).alias("__d")))
            new = (base.join(contrib, "node", "left").crossJoin(
                F.broadcast(dang))
                .select("node", (
                    F.lit((PAGERANK_MASS - PAGERANK_MASS * 85 // 100) // n)
                    + F.expr(
                        "(coalesce(__in, 0L) + __d div %d) * 85 div 100"
                        % n)).alias("__m")))
            # localCheckpoint: the rank frame is referenced TWICE per
            # iteration (contribution join + dangling anti-join), so the
            # logical plan would double each round — eager checkpoint
            # truncates lineage to the node-sized materialized frame
            # (same pattern as dedup.dup_clusters' label propagation)
            ranks = new.localCheckpoint(eager=True)
        out = ranks.select("node", F.col("__m").alias("mass"))
        return attach_cached(out, ej, base, ranks)

    ranks = base.select("node", F.lit(1.0 / n).alias("__r"))
    for _ in range(n_iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("__r") / F.col("__outd")).alias("__c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in")))
        dang = (ranks.join(out_d.withColumnRenamed("src", "node"),
                           "node", "left_anti")
                .agg(F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__d")))
        new = (base.join(contrib, "node", "left").crossJoin(
            F.broadcast(dang))
            .select("node", (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (F.coalesce("__in", F.lit(0.0))
                                    + F.col("__d") / F.lit(float(n))))
                .alias("__r")))
        ranks = new.localCheckpoint(eager=True)  # see exact_mass note
    out = ranks.select("node", F.col("__r").alias("rank"))
    return attach_cached(out, ej, base, ranks)
