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
persisted, and the (iteration-invariant) dangling node set is
materialized ONCE up front; every iteration then joins the
(node-sized) rank frame against the co-partitioned edges, aggregates
contributions on the destination key, semi-joins ranks against the
persisted dangling set for the redistribution mass, and eagerly
``localCheckpoint``s the new ranks (the rank frame feeds both the
contribution join and the dangling semi-join, so un-truncated lineage
would double per round). Iteration count
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

from ..util import attach_cached, ensure_parallelism, lineage_cut

#: Integer-mass scale: total rank mass when ``exact_mass=True``. 10^12
#: keeps per-node mass well inside int64 while leaving ~6 decimal
#: digits of resolution below the uniform mass of a trillion-node graph.
PAGERANK_MASS = 10 ** 12


def _prep_edges(edges, src_col, dst_col, weight_col, exact_mass):
    """Shared edge preparation for the pagerank family: the cleaned edge
    frame, the per-source divisor frame (out-DEGREE unweighted /
    total out-WEIGHT weighted), and the per-edge share expressions.

    Unweighted (``weight_col=None``): EXACTLY the r12 oracle-pinned
    arithmetic — duplicate edges collapse via distinct, the divisor is
    the count, shares are ``m div outd`` / ``r / outd``.

    Weighted: duplicate (src, dst) edges SUM their weights (multi-edge
    semantics); the divisor is the source's total out-weight, shares
    ``m·w div W`` / ``r·w / W``. Weights must be positive: NULL, NaN
    and non-positive weights are DROPPED at cleaning time, exactly
    like NULL endpoints (a source left with no usable out-edge is
    dangling if other edges still reference it, unranked otherwise —
    this also rules out a zero/negative total out-weight divisor).
    ``exact_mass`` additionally RAISES on
    fractional weights or per-source totals > 10**6 (keeps
    ``m·w ≤ 10**18`` inside int64 under ANSI) — validated on the
    POST-CLEAN weights BEFORE the long cast, so a surviving 1.5 weight
    raises instead of silently truncating to 1, while NULL/NaN/
    non-positive rows are dropped in exact mode exactly as in float
    mode; one eager scalar aggregate, weighted exact mode only."""
    base = (ensure_parallelism(edges)
            .select(F.col(src_col).alias("src"),
                    F.col(dst_col).alias("dst"),
                    *([F.col(weight_col).alias("__w")]
                      if weight_col is not None else []))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    if weight_col is None:
        e = base.distinct()
        out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outd"))
        return (e, out_d, lambda m: f"{m} div __outd",
                lambda r: r / F.col("__outd"))
    if exact_mass:
        # ONE eager pass over the POST-CLEAN edges (NULL/NaN/non-positive
        # weights dropped first, exactly as the documented contract
        # cleans them in both modes) validates the exact-mode extras
        # inside a single map-side-combinable aggregate: integrality of
        # every surviving weight, and the per-source total cap (summing
        # cleaned rows per source equals summing the collapsed
        # (src, dst) frame — sums are associative, so no second pass
        # over the collapsed edges).
        chk = (base.where(F.col("__w").isNotNull()
                          & ~F.isnan(F.col("__w").cast("double"))
                          & (F.col("__w") > 0))
               .groupBy("src")
               .agg(F.sum(F.col("__w").cast("double")).alias("__t"),
                    F.min("__w").alias("__mn"),
                    F.min((F.col("__w") == F.floor("__w")).cast("int"))
                    .alias("__int"))
               .agg(F.max("__t").alias("mx"), F.min("__mn").alias("mn"),
                    F.min("__int").alias("ok"))
               .first())
        if chk["mn"] is not None and (
                chk["ok"] == 0 or chk["mx"] > 10 ** 6):
            raise ValueError(
                "exact_mass weighted pagerank needs POSITIVE integer "
                "edge weights with per-source totals <= 10**6 (keeps "
                "mass * weight inside int64)")
    typ = "long" if exact_mass else "double"
    e = (base.where(F.col("__w").isNotNull()
                    & ~F.isnan(F.col("__w").cast("double"))
                    & (F.col("__w") > 0))
         .groupBy("src", "dst")
         .agg(F.sum(F.col("__w").cast(typ)).alias("__w")))
    out_d = e.groupBy("src").agg(F.sum("__w").alias("__outd"))
    return (e, out_d, lambda m: f"{m} * __w div __outd",
            lambda r: r * F.col("__w") / F.col("__outd"))


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
    tol: float | None = None,
    personalize: DataFrame | None = None,
    weight_col: str | None = None,
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

    ``tol`` (optional) adds a convergence early exit: after each
    iteration one scalar aggregation computes ``max |Δrank|`` between
    the old and new (checkpointed, node-sized) rank frames, and the
    loop stops once it drops below ``tol`` — so crawl-scale users can
    set ``n_iters`` as a CAP instead of guessing the iteration count
    (power iteration converges geometrically at rate ``damping``, but
    the constant depends on graph structure). In ``exact_mass`` units
    the threshold is ``tol * PAGERANK_MASS``; the exit decision is
    integer-exact there, so early exit stays bit-reproducible. The
    fixed-count form (``tol=None``, the default) remains the oracle
    twin — no per-iteration action is issued in that mode.

    ``personalize`` (optional) switches to PERSONALIZED PageRank — the
    TrustRank-family crawl-curation scorer (Gyöngyi et al. 2004): a
    ``(node, weight)`` DataFrame of seed nodes; teleport AND dangling
    mass go to the seeds in proportion to their weights instead of
    uniformly, so rank flows outward from trusted (or spam) seeds::

        rank = (1 − d)·tele(v) + d·(Σ contribs + dangling_mass·tele(v))

    with ``tele`` the weight vector normalized over the seeds present
    in the graph; non-seed nodes get teleport 0 and unknown seed nodes
    are ignored. Initial ranks = ``tele``. In ``exact_mass`` mode the
    weights must be non-negative integers with total ≤ 10**6 (keeps
    every intermediate product inside int64 — see
    :func:`_personalized_pagerank` for the split-division identity) and
    the recurrence is bit-reproducible like the uniform twin.

    ``weight_col`` (optional) makes edges WEIGHTED: a source's rank
    divides over its out-edges in proportion to edge weight
    (``rank·w / W_out``) instead of uniformly — link multiplicity or
    link quality as crawl signal. Duplicate (src, dst) edges SUM their
    weights; composes with ``personalize`` and ``tol``. Weights must be
    positive: NULL/NaN/non-positive weights are dropped like NULL
    endpoints (a source with no remaining out-edge is dangling when
    other edges still reference it, unranked otherwise).
    ``exact_mass`` additionally requires INTEGER weights with
    per-source totals ≤ 10**6 (``mass·w`` stays inside int64) and
    raises otherwise — checked on the pre-cast values that SURVIVE
    cleaning, so fractional weights can never silently truncate and
    drop-vs-raise matches float mode; the unweighted arithmetic is
    byte-identical to before, so the existing oracles are unaffected.
    """
    if exact_mass and damping != 0.85:
        raise ValueError("exact_mass supports the damping=0.85 rational "
                         "(85/100) only")
    if personalize is not None:
        return _personalized_pagerank(
            edges, personalize, n_iters=n_iters, damping=damping,
            src_col=src_col, dst_col=dst_col, exact_mass=exact_mass,
            tol=tol, weight_col=weight_col)
    e, out_d, share_int, share_f = _prep_edges(
        edges, src_col, dst_col, weight_col, exact_mass)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    # edges carry their source's out-degree (or total out-WEIGHT); ONE
    # shuffle onto src, then persisted — every iteration's join reuses
    # this layout
    ej = lineage_cut(e.join(out_d, "src"))
    base = lineage_cut(nodes)
    # the dangling node SET is iteration-invariant — materialize it once
    # (r12 advisor: the per-iteration anti-join against unpersisted out_d
    # re-executed the whole edge-dedup pipeline at every eager
    # localCheckpoint; a persisted node-sized set makes the per-iteration
    # cost genuinely one node-frame shuffle + one edge-sized aggregation)
    dangling = lineage_cut(base.join(
        out_d.withColumnRenamed("src", "node"), "node", "left_anti"))
    n = base.count()                             # node count (scalar)
    if n == 0:
        typ = "long" if exact_mass else "double"
        empty = base.select(
            "node", F.lit(None).cast(typ).alias("rank" if not exact_mass
                                                else "mass"))
        return attach_cached(empty, ej, base, dangling)

    if exact_mass:
        init = F.lit(PAGERANK_MASS // n).cast("long")
        ranks = base.select("node", init.alias("__m"))
        for _ in range(n_iters):
            contrib = (
                ej.join(ranks.withColumnRenamed("node", "src"), "src")
                # `div`: true int64 floor division — bit-identical to the
                # oracle's `//`, unlike double-divide-then-cast
                .select("dst", F.expr(share_int("__m")).alias("__c"))
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__c").alias("__in")))
            dang = (ranks.join(dangling, "node", "left_semi")
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
            # iteration (contribution join + dangling semi-join), so the
            # logical plan would double each round — eager checkpoint
            # truncates lineage to the node-sized materialized frame
            # (same pattern as dedup.dup_clusters' label propagation)
            prev, ranks = ranks, new.localCheckpoint(eager=True)
            if tol is not None and _max_abs_delta(
                    prev, ranks, "__m") < tol * PAGERANK_MASS:
                break
        out = ranks.select("node", F.col("__m").alias("mass"))
        return attach_cached(out, ej, base, dangling, ranks)

    ranks = base.select("node", F.lit(1.0 / n).alias("__r"))
    for _ in range(n_iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", share_f(F.col("__r")).alias("__c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in")))
        dang = (ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__d")))
        new = (base.join(contrib, "node", "left").crossJoin(
            F.broadcast(dang))
            .select("node", (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (F.coalesce("__in", F.lit(0.0))
                                    + F.col("__d") / F.lit(float(n))))
                .alias("__r")))
        prev, ranks = ranks, new.localCheckpoint(eager=True)  # see above
        if tol is not None and _max_abs_delta(prev, ranks, "__r") < tol:
            break
    out = ranks.select("node", F.col("__r").alias("rank"))
    return attach_cached(out, ej, base, dangling, ranks)


def _max_abs_delta(prev: DataFrame, cur: DataFrame, col: str) -> float:
    """``max |cur - prev|`` over the shared node key — ONE scalar
    aggregation per iteration for the ``tol=`` early exit. Both inputs
    are the eagerly-checkpointed node-sized rank frames, so the join
    reads two materialized RDDs, never the edge pipeline."""
    row = (cur.select("node", F.col(col).alias("__cur"))
           .join(prev.select("node", F.col(col).alias("__prev")), "node")
           .agg(F.max(F.abs(F.col("__cur") - F.col("__prev")))).first())
    return float(row[0]) if row[0] is not None else 0.0


def _personalized_pagerank(
    edges: DataFrame,
    personalize: DataFrame,
    *,
    n_iters: int,
    damping: float,
    src_col: str,
    dst_col: str,
    exact_mass: bool,
    tol: float | None,
    weight_col: str | None = None,
) -> DataFrame:
    """Personalized-teleport recurrence behind ``pagerank(personalize=)``
    (see its docstring for semantics). Scale shape matches the uniform
    path — the teleport column rides ON the persisted node frame, so per
    iteration there is still exactly one node-frame shuffle + one
    edge-sized aggregation; the uniform path's code is left untouched so
    its oracle-pinned arithmetic cannot drift.

    exact_mass arithmetic: ``tele_m(v) = MASS·w(v) // Σw`` (weights are
    validated to non-negative longs with Σw ≤ 10**6, so ``MASS·w`` ≤
    10**18 stays in int64), and the per-iteration dangling share
    ``tele_m·dang // MASS`` — whose direct product reaches 10**24 —
    uses the exact split identity with ``H = 10**6`` (``MASS = H²``)::

        a = tele_m div H;  b = tele_m mod H     # tele_m = a·H + b
        A = a·dang;        B = b·dang           # each ≤ 10**18
        tele_m·dang // H²  =  A div H + ((A mod H)·H + B) div H²

    every term int64, mirrored verbatim in the gate's SQL oracle."""
    if exact_mass and damping != 0.85:
        raise ValueError("exact_mass supports the damping=0.85 rational "
                         "(85/100) only")
    e, out_d, share_int, share_f = _prep_edges(
        edges, src_col, dst_col, weight_col, exact_mass)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    ej = lineage_cut(e.join(out_d, "src"))
    dangling = lineage_cut(nodes.join(
        out_d.withColumnRenamed("src", "node"), "node", "left_anti"))

    if exact_mass:
        pzw = personalize.select(
            "node", F.col("weight").cast("long").alias("__w"))
        wrow = (nodes.join(pzw, "node", "inner")
                .agg(F.sum("__w").alias("__wt"),
                     F.min("__w").alias("__wmin")).first())
        wtot = wrow["__wt"]
        if not wtot or wtot <= 0:
            raise ValueError("personalize has no positive-weight seed "
                             "present in the graph")
        if wrow["__wmin"] < 0 or wtot > 10 ** 6:
            raise ValueError("exact_mass personalization needs "
                             "non-negative integer weights with total "
                             "<= 10**6")
        H = 10 ** 6
        tele = (nodes.join(pzw, "node", "left")
                .select("node", F.expr(
                    f"{PAGERANK_MASS}L * coalesce(__w, 0L) div {wtot}L")
                    .alias("__t")))
        tele = lineage_cut(tele)
        ranks = tele.select("node", F.col("__t").alias("__m"))
        # split identity for tele_m * dang // MASS (docstring above)
        share = (f"((__t div {H}L) * __dg) div {H}L"
                 f" + ((((__t div {H}L) * __dg) % {H}L) * {H}L"
                 f" + (__t % {H}L) * __dg) div {PAGERANK_MASS}L")
        for _ in range(n_iters):
            contrib = (
                ej.join(ranks.withColumnRenamed("node", "src"), "src")
                .select("dst", F.expr(share_int("__m")).alias("__c"))
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__c").alias("__in")))
            dang = (ranks.join(dangling, "node", "left_semi")
                    .agg(F.coalesce(F.sum("__m"),
                                    F.lit(0).cast("long")).alias("__dg")))
            new = (tele.join(contrib, "node", "left").crossJoin(
                F.broadcast(dang))
                .select("node", F.expr(
                    f"__t * 15 div 100"
                    f" + (coalesce(__in, 0L) + {share}) * 85 div 100")
                    .alias("__m")))
            prev, ranks = ranks, new.localCheckpoint(eager=True)
            if tol is not None and _max_abs_delta(
                    prev, ranks, "__m") < tol * PAGERANK_MASS:
                break
        out = ranks.select("node", F.col("__m").alias("mass"))
        return attach_cached(out, ej, dangling, tele, ranks)

    pzw = personalize.select(
        "node", F.col("weight").cast("double").alias("__w"))
    wtot = nodes.join(pzw, "node", "inner").agg(F.sum("__w")).first()[0]
    if not wtot or wtot <= 0:
        raise ValueError("personalize has no positive-weight seed "
                         "present in the graph")
    tele = (nodes.join(pzw, "node", "left")
            .select("node", (F.coalesce("__w", F.lit(0.0))
                             / F.lit(float(wtot))).alias("__t")))
    tele = lineage_cut(tele)
    ranks = tele.select("node", F.col("__t").alias("__r"))
    for _ in range(n_iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", share_f(F.col("__r")).alias("__c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in")))
        dang = (ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("__r"), F.lit(0.0)).alias("__dg")))
        new = (tele.join(contrib, "node", "left").crossJoin(
            F.broadcast(dang))
            .select("node", (
                F.lit(1.0 - damping) * F.col("__t")
                + F.lit(damping) * (F.coalesce("__in", F.lit(0.0))
                                    + F.col("__dg") * F.col("__t")))
                .alias("__r")))
        prev, ranks = ranks, new.localCheckpoint(eager=True)
        if tol is not None and _max_abs_delta(prev, ranks, "__r") < tol:
            break
    out = ranks.select("node", F.col("__r").alias("rank"))
    return attach_cached(out, ej, dangling, tele, ranks)
