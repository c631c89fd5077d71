"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring how ANN is actually deployed on Spark:

- brute_force_knn: exact cosine top-k. The query side is broadcast (it is
  small by construction); the corpus side streams — so the "cross join" is
  a broadcast nested loop over corpus partitions, never a shuffle. This is
  the correctness baseline and perfectly adequate when |queries| is small.
- hyperplane_lsh_buckets: random-hyperplane signatures (sign of dot with a
  deterministic pseudo-random plane) → bucket id. Candidates co-bucket; the
  join is a shuffled equi-join on the signature. The planes are derived from
  xxhash64(plane, dim) so the operator is fully deterministic and needs no
  side channel for the plane matrix.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM higher-order
functions, no Python. For very wide vectors a pandas_udf BLAS path would
win; at 64-dim the expression path benches faster than Arrow round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import attach_cached, ensure_parallelism, lineage_cut


def _topk_per_query(sims: DataFrame, k: int,
                    query_col: str = "query_id",
                    order_col: str = "cos_sim",
                    tiebreak_col: str = "neighbor_id") -> DataFrame:
    """Two-stage top-k: local top-k within (query, input-partition), then the
    global rank over the pruned set.

    A single window partitioned by query alone funnels EVERY corpus row's
    similarity for a query through ONE task — |corpus| rows per task at
    scale. Stage 1 partitions by (query, spark_partition_id): parallelism is
    queries × partitions and each task holds one partition's rows; it keeps
    at most k rows per (query, partition). Stage 2's per-query window then
    sees ≤ k·P rows, not |corpus|. Same result: a global top-k is contained
    in the union of per-partition top-ks."""
    ordering = (F.col(order_col).desc(), F.col(tiebreak_col))
    local = Window.partitionBy(query_col, "__pid").orderBy(*ordering)
    pruned = (
        sims.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(local))
        .where(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w = Window.partitionBy(query_col).orderBy(*ordering)
    return pruned.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank). Self-matches excluded.
    The query side is broadcast; ranking is the two-stage top-k
    (per-partition local top-k, then merge) so no task ever holds a whole
    corpus's similarities for one query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
            .alias("cos_sim"),
        )
    )
    return _topk_per_query(sims, k)


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a < id_b, cos_sim ≥ threshold).

    With ``candidates`` (from LSH buckets) verifies only those; without,
    brute-force ALL pairs — O(n²) similarity work, the validation-scale
    contract only. The all-pairs form warns (``RuntimeWarning``, same
    convention as ``GroupBy.__iter__``) so a silent cross-join can never
    masquerade as a scale path: at 100 TB always pass ``candidates``
    (e.g. the bucket join inside :func:`lsh_neardup_pairs`)."""
    if candidates is None:
        import warnings
        warnings.warn(
            "cosine_neardup_pairs without candidates cross-joins ALL pairs "
            "(O(n²)) — validation scale only; pass LSH candidates for the "
            "scale path", RuntimeWarning, stacklevel=2)
    vecs = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"))
    if candidates is not None:
        pairs = (
            candidates
            .join(vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                              F.col("nrm").alias("nrm_a")), "id_a")
            .join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                              F.col("nrm").alias("nrm_b")), "id_b")
        )
    else:
        a = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                        F.col("nrm").alias("nrm_a"))
        b = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                        F.col("nrm").alias("nrm_b"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return pairs.select("id_a", "id_b", sim.alias("cos_sim")).where(F.col("cos_sim") >= threshold)


_POLY_M = 2147483647  # Lehmer LCG modulus (2^31 - 1): products stay < 2^47


def _poly_plane_seed(table: int, p: int) -> int:
    """Per-(table, plane) seed of the ANSI-reproducible coefficient family
    — plain bounded integer arithmetic so DuckDB computes the IDENTICAL
    value (the hyperplane analog of dedup.py's ``hash_fn="poly"``)."""
    return (table * 131071 + p * 8191 + 7) % 1000003


def sql_hyperplane_poly_coeff(table_expr: str, p: int, dim_idx_expr: str) -> str:
    """DuckDB SQL for the poly plane coefficient — the oracle twin of the
    ``hash_fn="poly"`` branch below. ``dim_idx_expr`` is the 0-based
    dimension index; every intermediate stays < 2^47 (BIGINT-safe in both
    engines; Spark ANSI mode would throw on overflow)."""
    s = f"(({table_expr}) * 131071 + {p * 8191 + 7}) % 1000003"
    v1 = f"(({s}) * 31 + ({dim_idx_expr}) + 1) % {_POLY_M}"
    v3 = f"((({v1}) * 48271 % {_POLY_M}) * 48271 % {_POLY_M})"
    return f"(({v3}) / {_POLY_M}.0 * 2.0 - 1.0)"


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, bucket) — sign-of-projection LSH. Plane p's d-th coefficient is a
    deterministic pseudo-uniform value in [-1, 1) derived from
    xxhash64(table, p, d); similar vectors land in the same bucket with
    probability 1 − θ/π per plane. Bucket = the n-bit sign pattern packed
    into a long. ``table`` selects an independent plane family — the unit
    of the multi-table OR-construction in :func:`lsh_neardup_pairs`.

    ``hash_fn="poly"`` swaps the coefficient family for a two-round Lehmer
    LCG over bounded integers (same convention as ``dedup`` minhash's poly
    twin): identical arithmetic is expressible in ANSI SQL
    (:func:`sql_hyperplane_poly_coeff`), so a DuckDB oracle reproduces the
    EXACT buckets — which makes the whole LSH-candidates dedup path
    value-checkable end-to-end, not just rows-only. Production keeps
    xxhash64 (JVM codegen, 64-bit mixing)."""
    if hash_fn not in ("xxhash64", "poly"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'poly', got {hash_fn!r}")
    df = ensure_parallelism(df)
    bucket = _hyperplane_bucket_expr(vec_col, n_planes, table, hash_fn)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def _hyperplane_bucket_expr(vec_col: str, n_planes: int, table: int,
                            hash_fn: str) -> Column:
    """The n-bit sign-pattern bucket as a pure Column expression — shared
    by :func:`hyperplane_lsh_buckets` (one table) and
    :func:`lsh_candidate_pairs` (which fuses every table's bucket into ONE
    pass over the vector corpus, r15). Each plane's projection is a single
    left-fold ``acc + vec[d] * coeff(d)`` over the dimension index — the
    same multiply-then-add per element, in the same order, as the previous
    transform/zip_with/aggregate chain (bit-identical doubles, shared
    oracle), but one interpreted HOF sweep per plane instead of three and
    no per-row coefficient/product arrays."""
    vec = F.col(vec_col)
    dim = F.size(vec)
    idx = F.sequence(F.lit(0), dim - 1)

    def proj(p: int) -> Column:
        if hash_fn == "poly":
            s31 = _poly_plane_seed(table, p) * 31

            def coeff(d: Column) -> Column:
                v1 = F.pmod(F.lit(s31).cast("long") + d.cast("long") + 1,
                            F.lit(_POLY_M))
                v3 = F.pmod(F.pmod(v1 * 48271, F.lit(_POLY_M)) * 48271,
                            F.lit(_POLY_M))
                return v3.cast("double") / F.lit(float(_POLY_M)) * 2.0 - 1.0
        else:
            def coeff(d: Column) -> Column:
                return (F.pmod(F.xxhash64(F.lit(table), F.lit(p), d),
                               F.lit(2_000_001)).cast("double")
                        / F.lit(1_000_000.0)) - F.lit(1.0)

        return F.aggregate(
            idx, F.lit(0.0),
            lambda acc, d: acc + F.get(vec, d) * coeff(d))

    bucket = None
    for p in range(n_planes):
        bit = F.when(proj(p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** p).cast("long")
        bucket = term if bucket is None else bucket + term
    return bucket


def recommended_planes(n_rows: int, target_bucket_size: int = 1024) -> int:
    """Plane count that keeps the EXPECTED bucket population near
    ``target_bucket_size``: each plane halves the expected bucket size
    (2^planes buckets per table), so ``planes = ceil(log2(n /
    target))``, floored at 1. This is the bucket-size CONTRACT of
    :func:`lsh_candidate_pairs`: bucket population is corpus-
    proportional at FIXED planes (n / 2^planes per table), so a corpus
    that grows 10× needs ~3.3 more planes to hold the candidate join's
    per-bucket cost constant. The ``max_bucket_size`` cap is the hard
    backstop for skewed/clustered corpora where the expectation doesn't
    hold; this helper keeps the cap a no-op on healthy ones."""
    import math
    if n_rows <= target_bucket_size:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket_size)))


def lsh_candidate_pairs(
    df: DataFrame,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """UNVERIFIED candidate pairs ``(id_a < id_b)`` from the multi-table
    hyperplane-LSH bucket join — the candidate-generation stage of
    :func:`lsh_neardup_pairs`, exposed so other consumers (e.g.
    :func:`semantic_dedup_keep_list`'s scale path) can feed the same
    bucket-bounded pair set into their own verification. Deduped across
    tables; the returned frame carries a persisted bucket intermediate via
    ``_pps_cached`` (release with ``util.release_cached``).

    Bucket-size contract: expected bucket population is ``n / 2^planes``
    per table — corpus-proportional at fixed ``n_planes``. Size planes
    with :func:`recommended_planes` (planes ≈ log2(n/target)) so the
    self-join stays bounded as the corpus grows; ``max_bucket_size``
    (default 1024) is the hard backstop — oversized buckets are lazily
    hash-down-sampled to ~cap entries before the self-join, the same
    guard as the minhash path (``dedup._cap_bucket_entries``), a no-op
    broadcast when no bucket exceeds the cap. ``None`` disables; monitor
    with ``dedup.lsh_bucket_stats(entries, cap, ["table", "bucket"])``.
    Recall under the cap survives via the multi-table OR — a true pair
    sampled out of one table's hot bucket usually co-buckets in another."""
    from .dedup import capped_pair_candidates

    if hash_fn not in ("xxhash64", "poly"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'poly', got {hash_fn!r}")
    # ONE pass over the vector corpus computes EVERY table's bucket and
    # explodes to (id, bucket, table) — r15: the previous per-table
    # hyperplane_lsh_buckets + unionByName chain scanned the corpus (and
    # re-projected the vectors) n_tables times and produced a union whose
    # partition count AQE cannot re-size. Same rows, same values (the
    # bucket expression is shared), n_tables x fewer corpus passes.
    df = ensure_parallelism(df)
    tb = F.explode(F.array(*[
        F.struct(_hyperplane_bucket_expr(vec_col, n_planes, t, hash_fn)
                 .alias("bucket"),
                 F.lit(t).alias("table"))
        for t in range(n_tables)]))
    entries = (df.select(F.col(id_col).alias("id"), tb.alias("tb"))
               .select("id", "tb.bucket", "tb.table"))
    # lineage cut, not persist (r16): the capped self-join machinery
    # references this frame up to 8x, and each reference re-embedded the
    # whole bucket-computation subtree in the consumer's logical plan —
    # the cut makes downstream plans (and Catalyst planning time)
    # segment-sized. Entries are (id, bucket, table) rows: tiny.
    buckets = lineage_cut(entries)
    if max_bucket_size is not None:
        # cap + hub edges: quadratic cliques bounded, cluster
        # connectivity preserved (dedup.capped_pair_candidates)
        cand_raw = capped_pair_candidates(buckets, ["table", "bucket"],
                                          max_bucket_size)
        cands = attach_cached(cand_raw.distinct(),
                              *getattr(cand_raw, "_pps_cached", ()))
    else:
        id_type = buckets.schema["id"].dataType.simpleString()
        a, b = buckets.alias("a"), buckets.alias("b")
        cands = (
            a.join(b, on=["table", "bucket"])
            .where(F.col("a.id") < F.col("b.id"))
            # cross-table dedup shuffles the (potentially quadratic) pair
            # set — pack the pair into ONE long before the distinct so the
            # exchange moves 8 bytes/row instead of 16 and hashes one
            # column (r9: the uncapped Zipfian fixture's cost is exactly
            # this exchange; salting was measured useless there, byte
            # volume is the remaining lever). Packing requires
            # 0 <= id < 2^32 (LSH vec ids are row numbers in every
            # caller); out-of-range ids would silently cross-link
            # unrelated pairs, so the domain is ENFORCED row-wise with a
            # raise_error branch (r10 ADVICE fix) — a map-side comparison,
            # no extra pass. Output ids are cast back to the input id
            # type.
            .select(F.when(
                (F.col("a.id") >= 0) & (F.col("a.id") < F.lit(1 << 32))
                & (F.col("b.id") >= 0) & (F.col("b.id") < F.lit(1 << 32)),
                F.shiftleft(F.col("a.id").cast("long"), 32)
                 .bitwiseOR(F.col("b.id").cast("long")))
             .otherwise(F.raise_error(F.lit(
                 "lsh_candidate_pairs: pair packing requires "
                 "0 <= id < 2^32; repartition ids or use the capped path")))
             .alias("__pk"))
            .distinct()
            .select(F.shiftrightunsigned("__pk", 32).cast(id_type)
                    .alias("id_a"),
                    F.col("__pk").bitwiseAND(F.lit((1 << 32) - 1))
                    .cast(id_type).alias("id_b"))
        )
    return attach_cached(cands, buckets)


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH bucket join to
    generate candidates, exact cosine to verify.

    Multi-table OR-construction (r4 — a single table has recall
    ``(1 − θ/π)^planes``, measured 0.06 at θ≈72° with 6 planes: unusable):
    each of ``n_tables`` independent plane families hashes every vector
    once; candidates co-bucket in ANY table, giving recall
    ``1 − (1 − p^planes)^tables``. Tune planes down / tables up for
    recall, the reverse for cost; candidates are deduped before the exact
    verify so a pair found by several tables verifies once. All entries
    live in ONE frame keyed by (table, bucket) — one self-join regardless
    of table count."""
    cands = lsh_candidate_pairs(df, n_planes, id_col, vec_col, n_tables,
                                hash_fn=hash_fn,
                                max_bucket_size=max_bucket_size)
    out = cosine_neardup_pairs(df, threshold, id_col, vec_col, candidates=cands)
    return attach_cached(out, *getattr(cands, "_pps_cached", ()))


# --------------------------------------------------------------------- #
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------- #

def ivf_build(
    df: DataFrame,
    n_lists: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: k-means coarse quantizer + per-vector list
    assignment. Returns (assignments(id, list_id), centroids(list_id, centroid)).

    Deterministic: initial centroids are the ``n_lists`` lowest-id vectors;
    each Lloyd iteration is one broadcast-join assignment pass + one
    aggregation (zip_with elementwise mean) — no driver-side vectors except
    the (tiny, k-row) centroid frame that is broadcast anyway.
    """
    vecs = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    # n_lists lowest-id vectors via orderBy+limit — planned as
    # TakeOrderedAndProject (per-partition top-n, merged on the driver),
    # never a global single-task sort. The row_number window that assigns
    # list ids runs on the already-LIMITed n_lists-row frame, so its lack of
    # a partition key is harmless at any corpus size.
    seed = vecs.orderBy("id").limit(n_lists)
    w = Window.orderBy("id")
    centroids = (seed.withColumn("__rn", F.row_number().over(w))
                 .select((F.col("__rn") - 1).alias("list_id"),
                         F.col("vec").alias("centroid")))

    def assign(cents: DataFrame) -> DataFrame:
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            "id", "vec", "list_id",
            _dot(F.col("vec"), F.col("centroid")).alias("__dot"),
            _norm(F.col("centroid")).alias("__cn"),
            _norm(F.col("vec")).alias("__vn"),
        )
        rw = Window.partitionBy("id").orderBy(
            (F.col("__dot") / (F.col("__vn") * F.col("__cn"))).desc(), F.col("list_id"))
        return (scored.withColumn("__r", F.row_number().over(rw))
                .where(F.col("__r") == 1).select("id", "vec", "list_id"))

    for _ in range(n_iters):
        centroids = _centroid_update(assign(centroids))
    assignments = attach_cached(assign(centroids).select("id", "list_id"), vecs)
    return assignments, centroids


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize a vector column (NULL-safe: zero vectors stay NULL).

    The norm is let-bound (functions/text.let) — referencing it free inside
    the per-element lambda would re-evaluate the O(d) norm per element
    (interpreted HOF re-evaluation, the minhash lesson)."""
    from ..functions.text import let
    return let(_norm(vec),
               lambda n: F.when(n > 0, F.transform(vec, lambda x: x / n)))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization — the int8 storage path for
    embedding corpora (4x smaller than float32, the standard ANN-index
    compression at corpus scale).

    Per vector: ``scale = max|v| / qmax`` (qmax = 2^(bits-1) - 1), codes
    ``q_i = floor(v_i/scale + 0.5)`` in [-qmax, qmax]. Output carries the
    reconstruction diagnostics instead of the codes themselves:
    ``(id, dim, maxabs, scale, q_sum, mse)`` where q_sum is the integer
    code checksum and mse the per-vector reconstruction error.

    Pure projection (zero shuffles). Math is done in double with explicit
    left-fold accumulation order so results are bit-identical on any
    partitioning — and to the SQL oracle. ``floor(x + 0.5)`` is used over
    round() because the two engines disagree on tie behavior, floor never.
    """
    from ..functions.text import let

    qmax = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double"))))

    def build(m):
        scale = m / F.lit(qmax)
        q = F.transform(v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)))
        q_sum = F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x)
        sq_err = F.aggregate(
            F.zip_with(q, v,
                       lambda qi, xi: F.pow(qi * scale - xi.cast("double"), F.lit(2.0))),
            F.lit(0.0), lambda a, x: a + x)
        return F.struct(
            m.alias("maxabs"), scale.alias("scale"), q_sum.alias("q_sum"),
            (sq_err / F.size(v)).alias("mse"))

    packed = let(maxabs, lambda m: F.when(m > 0, build(m)))
    return df.select(
        F.col(id_col), F.size(v).alias("dim"),
        packed.getField("maxabs").alias("maxabs"),
        packed.getField("scale").alias("scale"),
        packed.getField("q_sum").alias("q_sum"),
        packed.getField("mse").alias("mse"),
    )


def group_centroids(df: DataFrame, key_col: str,
                    vec_col: str = "embedding") -> DataFrame:
    """Per-group mean vector: ``(key_col, n_vecs, centroid)``.

    posexplode → (key, dim) average → array rebuild: shuffle rows are
    (key, dim, value) scalars, never whole vectors through collect_list of
    a group's full membership — the same distributed shape as the IVF
    centroid update (similarity.py:_centroid_update)."""
    base = ensure_parallelism(df)
    exploded = base.select(F.col(key_col), F.posexplode(vec_col).alias("dim", "val"))
    means = exploded.groupBy(key_col, "dim").agg(
        F.avg("val").alias("m"), F.count(F.lit(1)).alias("n"))
    return (means.groupBy(key_col)
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"),
                 F.max("n").alias("n_vecs"))
            .select(key_col, "n_vecs",
                    F.transform("dm", lambda s: s["m"]).alias("centroid")))


def centroid_similarity(df: DataFrame, key_col: str,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Cosine of every vector to its OWN group centroid —
    ``(id_col, key_col, cos_centroid)``. The group-cardinality centroid
    frame is broadcast; per-row math is pure HOF expressions. The standard
    embedding-hygiene signal: low cohesion = outlier / mislabeled."""
    cents = group_centroids(df, key_col, vec_col).select(key_col, "centroid")
    return (
        ensure_parallelism(df)
        .join(F.broadcast(cents), key_col)
        .select(F.col(id_col), F.col(key_col),
                cosine(F.col(vec_col), F.col("centroid")).alias("cos_centroid"))
    )


def _centroid_update(assigned: DataFrame) -> DataFrame:
    """Elementwise mean of vectors per cluster via posexplode + re-collect —
    shuffle rows are (list_id, dim_idx, value): fully distributed, no
    whole-vector collect_list memory spike."""
    exploded = assigned.select("list_id", F.posexplode("vec").alias("dim", "val"))
    means = exploded.groupBy("list_id", "dim").agg(F.avg("val").alias("m"))
    return (means.groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("list_id",
                    F.transform("dm", lambda s: s["m"]).alias("centroid")))


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_lists: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: "IvfIndex | None" = None,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probes`` nearest inverted lists per
    query instead of the whole corpus — the candidate set shrinks by
    ~n_probes/n_lists. Same output schema as brute_force_knn.

    Pass ``index`` (:func:`ivf_build_index` output, typically read back
    from parquet) to skip the k-means build — the production steady state;
    ``n_lists`` is then ignored in favor of the stored centroids."""
    if index is not None:
        assignments, centroids = index.assignments, index.centroids
    else:
        assignments, centroids = ivf_build(corpus, n_lists, 2, id_col, vec_col)
    corpus_lists = corpus.join(
        assignments.withColumnRenamed("id", id_col), id_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                       _norm(F.col(vec_col)).alias("qnorm"))
    # probe selection: rank centroids per query (tiny cross join)
    probed = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qvec", "qnorm", "list_id",
        (_dot(F.col("qvec"), F.col("centroid"))
         / (F.col("qnorm") * _norm(F.col("centroid")))).alias("__sim"))
    pw = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("list_id"))
    probes = (probed.withColumn("__r", F.row_number().over(pw))
              .where(F.col("__r") <= n_probes).select("query_id", "qvec", "qnorm", "list_id"))

    cands = probes.join(corpus_lists, on="list_id").where(
        F.col(id_col) != F.col("query_id"))
    sims = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (_dot(F.col("qvec"), F.col(vec_col))
         / (F.col("qnorm") * _norm(F.col(vec_col)))).alias("cos_sim"),
    )
    # probed candidate set is ~|corpus|·n_probes/n_lists per query — still
    # corpus-proportional, so the same two-stage top-k applies.
    return attach_cached(_topk_per_query(sims, k),
                         *getattr(assignments, "_pps_cached", ()))


def ann_recall_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_lists: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query recall@k of the IVF index vs exact brute force:
    ``(query_id, n_exact, n_hit, recall)``.

    The standard ANN quality gate, computed entirely in-engine: both sides
    are deterministic (seeded IVF, id-tiebroken top-k), so the recall of a
    fixed (corpus, queries, k, n_lists, n_probes) tuple is a REPRODUCIBLE
    number — a test can pin it and a data pipeline can alert on it. The
    join is on (query_id, neighbor_id) over two k·|queries|-row frames —
    trivially small next to the kNN computations themselves.

    ``recall`` divides by the number of exact neighbors actually returned
    (min(k, corpus_size−1)), so tiny corpora don't deflate the metric.
    """
    exact = brute_force_knn(corpus, queries, k, id_col, vec_col) \
        .select("query_id", "neighbor_id")
    approx = ivf_knn(corpus, queries, k, n_lists, n_probes, id_col, vec_col)
    hits = approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    per_q = (
        exact.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"),
             F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"))
        .select("query_id", "n_exact", "n_hit",
                (F.col("n_hit") / F.col("n_exact")).alias("recall"))
    )
    return attach_cached(per_q, *getattr(approx, "_pps_cached", ()))


def lsh_pair_recall(
    df: DataFrame,
    threshold: float,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Pair recall of the hyperplane-LSH near-dup path against the exact
    all-pairs cosine graph: one row ``(n_exact, n_hit, recall)``.

    The LSH quality gate, mirroring :func:`ann_recall_at_k` for the
    pair-generation path: both sides are deterministic (seeded planes,
    exact verification), so recall of a fixed (corpus, threshold,
    n_planes) tuple is a reproducible number a test can pin. Exact
    all-pairs is the oracle side — run at validation scale; production
    monitors recall on a sampled slice.
    """
    import warnings
    with warnings.catch_warnings():
        # the exact all-pairs side IS this function's oracle — the
        # all-pairs RuntimeWarning is redundant here by construction
        warnings.simplefilter("ignore", RuntimeWarning)
        exact_raw = cosine_neardup_pairs(df, threshold, id_col, vec_col)
    exact = exact_raw.select("id_a", "id_b")
    # Keep the raw handle: .select()/.withColumn() return NEW DataFrame
    # objects that do not carry Python instance attributes, so _pps_cached
    # must be read from the frame lsh_neardup_pairs actually returned.
    approx_raw = lsh_neardup_pairs(df, threshold, n_planes, id_col, vec_col,
                                   n_tables=n_tables, hash_fn=hash_fn,
                                   max_bucket_size=max_bucket_size)
    approx = approx_raw.select("id_a", "id_b").withColumn("__hit", F.lit(1))
    out = (
        exact.join(approx, ["id_a", "id_b"], "left")
        .agg(F.count(F.lit(1)).alias("n_exact"),
             F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"))
        .select("n_exact", "n_hit",
                F.when(F.col("n_exact") > 0,
                       F.col("n_hit") / F.col("n_exact"))
                .otherwise(F.lit(1.0)).alias("recall"))
    )
    return attach_cached(out,
                         *getattr(approx_raw, "_pps_cached", ()),
                         *getattr(exact_raw, "_pps_cached", ()))


def semantic_dedup_keep_list(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    cluster_iters: int = 16,
) -> DataFrame:
    """(id, keep) for every embedded document: SEMANTIC dedup — the
    embedding-space analog of ``dedup.dedup_keep_list``.

    Pipeline: cosine near-dup pairs (≥ threshold) → connected components
    over the similarity graph (``dedup.dup_clusters`` min-label
    propagation) → keep = the minimum id of each cluster; documents with
    no near-neighbor keep themselves.

    Scale path: pass ``candidates`` from :func:`lsh_candidate_pairs` so
    the pair verification is bucket-bounded instead of all-pairs; without
    candidates the exact all-pairs graph is test/validation scale only
    (documented contract, same as :func:`cosine_neardup_pairs`, and it
    warns the same way). Downstream frames are graph-sized
    (pairs/clusters), never corpus² — the 100 TB cost is the candidate
    verification, which LSH bounds. The LSH-candidates form is
    value-checked end-to-end by the ``semantic_keep_list_lsh`` gate
    (poly plane family — DuckDB reproduces the exact buckets).
    """
    from .dedup import dup_clusters

    pairs = cosine_neardup_pairs(df, threshold, id_col, vec_col,
                                 candidates=candidates)
    clusters = dup_clusters(pairs, n_iters=cluster_iters)
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(clusters, "id", "left")
        .select("id",
                (F.col("cluster_id").isNull()
                 | (F.col("cluster_id") == F.col("id"))).alias("keep"))
    )


# --------------------------------------------------------------------- #
# low-rank projection (PCA) for embedding columns
# --------------------------------------------------------------------- #

class PCAModel:
    """Fitted PCA: ``mean`` (d,), ``components`` (k, d) row-orthonormal,
    ``explained_variance`` (k,) eigenvalues, ``total_variance`` scalar.
    Plain numpy arrays — serialize however the deployment stores models."""

    def __init__(self, mean, components, explained_variance, total_variance):
        self.mean = mean
        self.components = components
        self.explained_variance = explained_variance
        self.total_variance = total_variance

    @property
    def explained_fraction(self) -> float:
        return float(self.explained_variance.sum() / self.total_variance)


def pca_fit(df: DataFrame, vec_col: str, k: int = 8) -> PCAModel:
    """Fit a k-component PCA over an embedding column.

    Distributed pass: one ``mapInPandas`` sweep accumulates, per Arrow
    batch, the d×d raw second-moment (Gram) matrix via BLAS (``X.T @ X``),
    the coordinate sum, and the row count — emitting ONE flattened row per
    batch. That is the sanctioned Arrow seam (same contract as the
    multimodal decode): vectorized numpy per batch, never per-row Python.
    The batch partials (|batches| × (d²+d+1) doubles — KB, not data-sized)
    aggregate driver-side in deterministic batch order; eigendecomposition
    of the d×d covariance runs on the driver (d ≤ a few thousand — the
    covariance is dimension-, not corpus-, sized).

    At 100 TB the sweep is the only corpus pass and it is embarrassingly
    parallel; the shuffle carries |batches| tiny partial rows. Components
    with eigenvalue ties pick a deterministic sign (largest-|coordinate|
    positive) so refits are reproducible.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    head = df.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("pca_fit needs at least 2 vectors")
    d = len(head[0])
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ])

    def partials(batches):
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]], dtype=np.float64)
            if len(X) == 0:
                continue
            yield pd.DataFrame({
                "n": [len(X)],
                "s": [X.sum(axis=0).tolist()],
                "g": [(X.T @ X).ravel().tolist()],
            })

    rows = (ensure_parallelism(df).select(vec_col)
            .mapInPandas(partials, schema).collect())
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 vectors")
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    gram = np.sum([np.array(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # (k, d)
    # deterministic sign: the largest-|coordinate| entry is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean, comps, np.maximum(evals[order], 0.0),
                    float(np.maximum(evals, 0.0).sum()))


def pca_project(df: DataFrame, vec_col: str, id_col: str,
                model: PCAModel) -> DataFrame:
    """(id_col, proj array<double>) — centered projection onto the model's
    components. The model ships as expression literals (k·d doubles —
    bytes); the projection is k zip_with/aggregate folds per row, pure JVM
    expression work, zero shuffles (the classic broadcast-the-model,
    stream-the-corpus shape)."""
    mean_lit = F.lit([float(x) for x in model.mean])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mean_lit,
                          lambda v, m: v - m)

    def proj_of(c: Column) -> Column:
        outs = []
        for row in model.components:
            w = F.lit([float(x) for x in row])
            outs.append(F.aggregate(
                F.zip_with(c, w, lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x))
        return F.array(*outs)

    from ..functions.text import let
    return df.select(F.col(id_col), let(centered, proj_of).alias("proj"))


def pca_gate(df: DataFrame, vec_col: str, id_col: str, k: int = 8,
             min_explained: float = 0.5) -> DataFrame:
    """One-row PCA invariants gate (the ann_recall pattern: Spark computes
    the checks, the oracle pins the expected row):

    - ``orthonormal_ok``: ``W Wᵀ = I`` to 1e-8 (driver check on the model);
    - ``var_capture_ok``: top-k explained fraction ≥ ``min_explained``;
    - ``proj_energy_ok``: the DISTRIBUTED mean ‖proj‖² equals the model's
      explained variance sum to 1e-6 relative — ties the broadcast
      projection plan to the fit (a wrong sign/order/centering breaks it).
    """
    import numpy as np

    model = pca_fit(df, vec_col, k=k)
    wwt = model.components @ model.components.T
    ortho = bool(np.abs(wwt - np.eye(k)).max() < 1e-8)
    proj = pca_project(df, vec_col, id_col, model)
    energy = (proj.select(
        F.aggregate("proj", F.lit(0.0), lambda a, x: a + x * x).alias("e"))
        .agg(F.avg("e").alias("me")).first()["me"])
    expl = float(model.explained_variance.sum())
    energy_ok = bool(abs(energy - expl) <= 1e-6 * max(expl, 1e-12))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(k), int(model.components.shape[1]), ortho,
          bool(model.explained_fraction >= min_explained), energy_ok)],
        "k int, dim int, orthonormal_ok boolean, var_capture_ok boolean, "
        "proj_energy_ok boolean")


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination: for every corpus vector,
    the max cosine similarity against the (small) benchmark set and a
    ``contaminated`` flag at ``threshold`` — the semantic complement of
    ``cleaning.ngram_contamination`` (paraphrased/near-verbatim eval
    leakage that n-gram overlap misses).

    Returns ``(id_col, nearest_bench_id, max_sim, contaminated)`` for every
    corpus row (ties on similarity break to the smaller benchmark id).

    Scale shape: the benchmark side is benchmark-sized (eval suites are
    thousands of rows) and BROADCAST; the corpus streams through a
    map-side expansion against it and collapses back to one row per corpus
    vector in the same stage's partial max — the corpus is scanned once
    and never shuffled (the per-id final agg reuses the scan partitioning
    ... or costs the one id-keyed exchange Spark needs for the global max,
    which carries one slim row per corpus vector, not the expansion)."""
    c = corpus.select(F.col(id_col).alias("__cid"),
                      F.col(vec_col).cast("array<double>").alias("__cv"))
    b = benchmark.select(F.col(id_col).alias("__bid"),
                         F.col(vec_col).cast("array<double>").alias("__bv"))

    def norm(v):
        return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))

    c = c.withColumn("__cn", norm(F.col("__cv")))
    b = b.withColumn("__bn", norm(F.col("__bv")))
    dot = F.aggregate(F.zip_with("__cv", "__bv", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    sim = dot / (F.col("__cn") * F.col("__bn"))
    pairs = c.join(F.broadcast(b), F.lit(True)).select(
        "__cid", F.struct(sim.alias("s"), (-F.col("__bid")).alias("nb")).alias("__p"))
    best = pairs.groupBy("__cid").agg(F.max("__p").alias("__m"))
    return best.select(
        F.col("__cid").alias(id_col),
        (-F.col("__m.nb")).alias("nearest_bench_id"),
        F.col("__m.s").alias("max_sim"),
        (F.col("__m.s") >= threshold).alias("contaminated"))


class IvfIndex:
    """Stored IVF-ANN index: ``assignments`` (id, list_id) and
    ``centroids`` (list_id, centroid) — the similarity-side analog of
    ``dedup.RefIndex``. Build once with :func:`ivf_build_index`, write
    both frames to parquet, read them back for every query batch: the
    corpus is never re-clustered, and the recurring cost is probe
    selection (queries × k centroids, broadcast) plus the probed-list
    candidate scoring. Refresh by rebuilding when the corpus drifts
    (centroid staleness degrades recall, never correctness — the verify
    is always the true cosine)."""

    def __init__(self, assignments: DataFrame, centroids: DataFrame):
        self.assignments = assignments
        self.centroids = centroids


def ivf_build_index(
    df: DataFrame,
    n_lists: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """One-time IVF indexing pass (same parameters as the queries that will
    probe it). Both frames are corpus-linear and slim (two longs / one
    list_id + d floats per row)."""
    assignments, centroids = ivf_build(df, n_lists, n_iters, id_col, vec_col)
    return IvfIndex(assignments, centroids)
