"""Deterministic sampling and dataset splitting for training-data pipelines.

Beyond the reference (pandas-plus has no sampling surface, SURVEY §2.11):
a 100 TB corpus pipeline needs reproducible subsetting — stratified
downsampling by source/language, train/validation/test splits, and exact-n
per-group samples — where "reproducible" means the SAME rows are selected
on any cluster size, any partition layout, any run. Random-number samplers
(``df.sample``) are seed-stable only per partition *layout*; these operators
instead derive selection from a deterministic affine hash of a row key, so
membership is a pure function of the data. That also makes every operator
here oracle-checkable in ANSI SQL (see the ``sql_*`` twins).

All hot paths are pure Column expressions: a stratified sample is a
pushed-down filter (no shuffle at all); a split assignment is a projection;
exact-n per-group is one window over the group key (the same shape as
GroupBy.head, reuse ``salt=`` there for pathological key skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import poly_hash, sql_poly_hash

# Affine family over the Mersenne prime 2^31-1: u = ((k mod P)·a + b) mod P,
# with (a, b) both derived from the seed so distinct seeds give genuinely
# different permutations (a seed only in the offset would shift u by seed/P
# ≈ 1e-9 — nearly the same selection). a stays < P, so (P-1)·a < 2^62 is
# inside ANSI long range (Spark 4 throws on overflow); the identical
# arithmetic runs in DuckDB BIGINTs for the oracle.
UNIFORM_MOD = 2_147_483_647
UNIFORM_MUL = 1_103_515_245
_GOLDEN = 0x9E3779B9


def _seed_family(seed: int) -> tuple[int, int]:
    a = (UNIFORM_MUL * (2 * seed + 1)) % UNIFORM_MOD
    b = (_GOLDEN * (seed + 1)) % UNIFORM_MOD
    return a, b


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def affine_uniform(key, seed: int = 0, *, string_key: bool = False) -> Column:
    """Deterministic uniform-ish double in [0, 1) from a row key.

    ``key`` is a long column (or any string column with ``string_key=True``,
    hashed by the ANSI-reproducible poly_hash first). Distinct seeds give
    (pairwise) independent selections — the same construction as the MinHash
    affine families in operators/dedup.py.
    """
    a, b = _seed_family(seed)
    k = poly_hash(key) if string_key else _c(key).cast("long")
    u = (F.pmod(k, F.lit(UNIFORM_MOD)) * F.lit(a) + F.lit(b)) % UNIFORM_MOD
    return u.cast("double") / F.lit(float(UNIFORM_MOD))


def sql_affine_uniform(expr: str, seed: int = 0, *, string_key: bool = False) -> str:
    """DuckDB twin of :func:`affine_uniform` for oracle checks."""
    a, b = _seed_family(seed)
    k = sql_poly_hash(expr) if string_key else f"CAST({expr} AS BIGINT)"
    return (
        f"CAST(((({k} % {UNIFORM_MOD} + {UNIFORM_MOD}) % {UNIFORM_MOD})"
        f" * {a} + {b}) % {UNIFORM_MOD} AS DOUBLE)"
        f" / {float(UNIFORM_MOD)}"
    )


def stratified_sample(
    df: DataFrame,
    strata_col,
    fractions: dict | float,
    key,
    seed: int = 0,
    *,
    string_key: bool = False,
) -> DataFrame:
    """Keep a deterministic fraction of rows, per stratum.

    ``fractions`` is either one float for every stratum or a dict
    ``{stratum_value: fraction}`` (strata absent from the dict are dropped,
    mirroring ``DataFrame.sampleBy``). Selection is ``affine_uniform(key)
    < fraction`` — a plain filter Catalyst pushes into the scan: sampling
    100 TB costs one pass with NO shuffle, and re-running on different
    cluster sizes selects the identical rows (unlike ``sampleBy``, which is
    only seed-stable per partition layout).
    """
    u = affine_uniform(key, seed, string_key=string_key)
    if isinstance(fractions, dict):
        s = _c(strata_col)
        thr = F.lit(0.0)
        for value, frac in fractions.items():
            thr = F.when(s == F.lit(value), F.lit(float(frac))).otherwise(thr)
    else:
        thr = F.lit(float(fractions))
    return df.filter(u < thr)


def split_assign(
    key,
    weights: dict[str, float],
    seed: int = 0,
    *,
    string_key: bool = False,
) -> Column:
    """Label column assigning each row to a named split (train/valid/test…).

    ``weights`` need not sum to 1 — they are normalized. Assignment is by
    cumulative-threshold lookup on the affine hash, so splits are disjoint,
    exhaustive, and stable under any repartitioning; a projection, never a
    shuffle. Deterministic twin of ``DataFrame.randomSplit``.
    """
    total = float(sum(weights.values()))
    u = affine_uniform(key, seed, string_key=string_key)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = (F.when(u < acc, F.lit(name)) if expr is None
                else expr.when(u < acc, F.lit(name)))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def sql_split_assign(expr: str, weights: dict[str, float], seed: int = 0, *,
                     string_key: bool = False) -> str:
    """DuckDB twin of :func:`split_assign`."""
    total = float(sum(weights.values()))
    u = sql_affine_uniform(expr, seed, string_key=string_key)
    names = list(weights)
    acc, parts = 0.0, []
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def sample_per_group(
    df: DataFrame,
    keys,
    n: int,
    key,
    seed: int = 0,
    *,
    string_key: bool = False,
) -> DataFrame:
    """Exactly ``min(n, group size)`` deterministic rows per group.

    Uniform-without-replacement per group: rank rows inside each group by
    their affine hash (ties broken by the key itself for full determinism)
    and keep the first ``n``. One hash-partitioned window — the same
    physical shape as ``GroupBy.head``; for a pathologically hot group use
    ``GroupBy.head(salt=...)``'s two-stage pattern instead.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    u = affine_uniform(key, seed, string_key=string_key)
    w = Window.partitionBy(*[_c(k) for k in keys]).orderBy(u.asc(), _c(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col,
    weight_col,
    n: int,
    key,
    seed: int = 0,
    *,
    string_key: bool = False,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, ``n`` rows per
    group — the quality-weighted data-selection step of a curation pipeline
    (sample documents proportionally to a quality/importance score).

    Efraimidis–Spirakis A-ES: each row gets the exponential key
    ``-ln(u) / w`` with ``u = affine_uniform(key, seed)``; the ``n``
    SMALLEST keys per group are a weight-proportional sample without
    replacement. Because ``u`` is a pure function of the row key, the
    selection is identical on any cluster size or partition layout — and
    ANSI-reproducible for the oracle. Rows with weight <= 0 or NULL are
    never selected (excluded before the ranking).

    One window shuffle on the group key; groups larger than executor memory
    are fine (row_number streams), but a pathologically hot group can use
    the same two-stage ``salt=`` pattern as ``GroupBy.head``.
    """
    # +1/P shift: u can be exactly 0 (~2^-31 per row), where the two
    # engines diverge (Spark ln(0) -> NULL, DuckDB -> -inf); the shift is
    # identical on both sides and biases selection immeasurably.
    u = affine_uniform(key, seed, string_key=string_key) + F.lit(1.0 / UNIFORM_MOD)
    w = _c(weight_col).cast("double")
    es_key = -F.log(u) / w
    cand = df.filter(w > 0).withColumn("__es", es_key)
    win = Window.partitionBy(_c(group_col)).orderBy(
        F.col("__es").asc(), _c(key).asc())
    return (cand.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= n)
            .drop("__es", "__rn"))


def sql_weighted_sample_per_group(
    group_expr: str, weight_expr: str, n: int, key_expr: str,
    seed: int = 0, *, string_key: bool = False,
) -> str:
    """DuckDB twin of :func:`weighted_sample_per_group`: the qualifying
    ``row_number() OVER`` predicate; embed in
    ``SELECT ... FROM t QUALIFY {this} <= n`` or a rn subquery."""
    u = sql_affine_uniform(key_expr, seed, string_key=string_key)
    return (f"row_number() OVER (PARTITION BY {group_expr} "
            f"ORDER BY -ln(({u}) + {1.0 / UNIFORM_MOD!r}) "
            f"/ CAST({weight_expr} AS DOUBLE) ASC, "
            f"{key_expr} ASC)")


def temperature_mixture(
    df: DataFrame,
    source_col,
    key,
    alpha: float = 0.5,
    budget_frac: float = 1.0,
    seed: int = 0,
    *,
    string_key: bool = False,
    weight_col=None,
) -> DataFrame:
    """Temperature-based source re-mixing (the multilingual/multi-domain
    pretraining mix): source ``s`` with ``n_s`` rows gets mixture weight
    ``w_s = n_s**alpha / Σ_t n_t**alpha`` — ``alpha < 1`` upweights small
    sources, ``alpha = 1`` keeps natural proportions. The row budget is
    ``budget_frac · N`` total rows; each source keeps
    ``p_s = min(1, budget · w_s / n_s)`` of its rows (downsample-only — no
    row duplication), selected by ``affine_uniform(key, seed) < p_s`` so
    the draw is deterministic and reproducible. ``weight_col`` switches
    the mass from ROW counts to a per-row weight (token counts, bytes):
    ``n_s`` becomes the source's weight sum, so the mix hits its shares
    in TOKEN mass — how production recipes are actually budgeted —
    while the keep decision stays the same per-row uniform
    (expected-mass budgeting; rows within a source keep uniformly).
    For upsampling (epoch factors > 1) see :func:`epoch_mixture`.

    Plan shape: one tiny per-source count aggregate, a one-row total
    cross-joined in (broadcast), then a broadcast join of the
    sources-sized probability frame and a MAP-SIDE filter — the corpus
    itself is scanned once and never shuffled.
    """
    mass = (F.count(F.lit(1)) if weight_col is None
            else F.sum(_c(weight_col).cast("double")))
    counts = df.groupBy(source_col).agg(mass.alias("__n"))
    # the totals frame derives FROM counts — alias both sides so the
    # cross join's column references resolve unambiguously
    tot = counts.agg(F.sum("__n").alias("__N"),
                     F.sum(F.pow("__n", F.lit(float(alpha)))).alias("__Z"))
    probs = (
        counts.alias("c").crossJoin(F.broadcast(tot.alias("t")))
        .select(F.col("c." + source_col).alias(source_col),
                F.least(F.lit(1.0),
                        F.lit(float(budget_frac)) * F.col("t.__N")
                        * F.pow(F.col("c.__n"), F.lit(float(alpha)))
                        / F.col("t.__Z") / F.col("c.__n")).alias("__p"))
    )
    u = affine_uniform(key, seed, string_key=string_key)
    return (df.join(F.broadcast(probs), on=source_col)
            .where(u < F.col("__p")).drop("__p"))


def sql_temperature_mixture_probs(source_col: str, table: str,
                                  alpha: float, budget_frac: float,
                                  weight_expr: str | None = None) -> str:
    """DuckDB CTE body computing the per-source keep probability ``p`` —
    twin of the probability math in :func:`temperature_mixture`.
    ``weight_expr`` mirrors ``weight_col`` (token-mass budgeting)."""
    n_expr = ("count(*)" if weight_expr is None
              else f"sum(CAST({weight_expr} AS DOUBLE))")
    return f"""
        c AS (SELECT {source_col}, {n_expr} AS n FROM {table} GROUP BY {source_col}),
        t AS (SELECT sum(n) AS tot_n,
                     sum(pow(CAST(n AS DOUBLE), {float(alpha)})) AS tot_z
              FROM c),
        p AS (SELECT {source_col},
                     least(1.0, {float(budget_frac)} * t.tot_n
                           * pow(CAST(n AS DOUBLE), {float(alpha)})
                           / t.tot_z / n) AS p
              FROM c, t)
    """


def epochs_for_target(
    df: DataFrame,
    source_col,
    token_col,
    target: dict,
    budget_tokens: int,
) -> DataFrame:
    """The per-source data-recipe plan: ``(source, n_tokens,
    natural_frac, target_frac, epochs)`` where ``epochs = target_frac ·
    budget / n_tokens`` — how many times each source must be replayed
    (fractionally) so the materialized mix hits ``target`` shares in a
    ``budget_tokens`` training run. The LLaMA-style recipe table
    (Wikipedia 2.45 epochs, CommonCrawl 0.64, ...) as one tiny
    map-side-combinable aggregate; sources absent from ``target`` get
    0. Feed the ``epochs`` column (collected — it is sources-sized)
    to :func:`epoch_mixture` to materialize the plan."""
    spark = df.sparkSession
    counts = df.groupBy(_c(source_col).alias("source")).agg(
        F.sum(_c(token_col).cast("long")).alias("n_tokens"))
    tmap = spark.createDataFrame(
        [(k, float(v)) for k, v in target.items()],
        "source string, target_frac double")
    tot = counts.agg(F.sum("n_tokens").alias("__T"))
    return (counts.join(F.broadcast(tmap), "source", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "source", "n_tokens",
                (F.col("n_tokens").cast("double") / F.col("__T"))
                .alias("natural_frac"),
                F.coalesce("target_frac", F.lit(0.0)).alias("target_frac"),
                (F.coalesce("target_frac", F.lit(0.0))
                 * F.lit(float(budget_tokens))
                 / F.col("n_tokens")).alias("epochs")))


def epoch_mixture(
    df: DataFrame,
    source_col,
    key,
    epochs: dict,
    *,
    default_epochs: float = 1.0,
    seed: int = 0,
    string_key: bool = False,
) -> DataFrame:
    """Deterministic fractional-EPOCH materialization — the upsampling
    complement to :func:`temperature_mixture` (which only downsamples):
    source ``s`` with epoch factor ``e`` emits ``floor(e)`` full copies
    of every row plus a hash-selected ``e − floor(e)`` fraction as the
    final partial copy, so the expected emitted share of each source is
    exactly ``e`` epochs (the LLaMA/data-recipe layout: repeat
    high-quality small sources, fractionally sample the big ones).
    Output = the input columns plus ``epoch`` (0-based copy index);
    ``e ≤ 0`` drops the source. Selection is
    ``affine_uniform(key, seed)`` — a pure function of the data, so the
    SAME rows replicate on any cluster/partition layout, and downstream
    shuffles treat copies as ordinary rows.

    Scale shape: the epochs table broadcasts (sources-sized), the copy
    fan-out is a map-side ``explode`` over a ≤ ``ceil(e)``-element
    sequence, and nothing shuffles — cost is proportional to the
    EMITTED corpus, the unavoidable floor for a materialized mix.
    (Pipelines that can consume weights instead of materialized copies
    should prefer :func:`epochs_for_target`'s plan directly.)"""
    spark = df.sparkSession
    emap = spark.createDataFrame(
        [(str(k), float(v)) for k, v in epochs.items()],
        "__src string, __e double")
    sc = _c(source_col)
    if isinstance(source_col, str):
        # a non-string source column (int domain ids, ...) must not be
        # matched through Spark's implicit string cast — cast the
        # recipe keys to the column's own type so 7 matches "7"
        emap = emap.select(
            F.col("__src").cast(df.schema[source_col].dataType)
            .alias("__src"), "__e")
    d2 = (df.join(F.broadcast(emap), sc == F.col("__src"), "left")
          .withColumn("__e", F.coalesce("__e",
                                        F.lit(float(default_epochs)))))
    arr = F.when(
        F.col("__e") > 0,
        F.sequence(F.lit(0).cast("long"),
                   F.ceil("__e").cast("long") - F.lit(1)))
    u = affine_uniform(key, seed, string_key=string_key)
    out = (d2.select(*df.columns, "__e",
                     F.explode(arr).alias("epoch"))
           .where((F.col("epoch") < F.floor("__e"))
                  | (u < F.col("__e") - F.floor("__e")))
           .drop("__e"))
    return out


def global_sample_n(df: DataFrame, n: int, key, seed: int = 0, *,
                    string_key: bool = False) -> DataFrame:
    """Deterministic global sample of EXACTLY ``min(n, count)`` rows: the n
    rows with the smallest ``affine_uniform(key, seed)`` (ties broken by the
    key itself, so the draw is total-ordered and reproducible).

    Plan shape: ``ORDER BY u LIMIT n`` compiles to TakeOrderedAndProject —
    each task keeps a local top-n heap and the driver merges the per-task
    heads; there is NO global sort and NO single-partition exchange, so the
    operator scales with bytes scanned for any ``n`` that fits on the
    driver (millions of rows). For sample sizes beyond driver memory use
    :func:`stratified_sample` (fraction-based, fully distributed) instead.
    """
    u = affine_uniform(key, seed, string_key=string_key).alias("__u")
    return (df.withColumn("__u", u)
            .orderBy(F.col("__u"), _c(key))
            .limit(n)
            .drop("__u"))


def token_budget_sample(
    df: DataFrame,
    group_col,
    token_col,
    budget: int,
    key,
    seed: int = 0,
    *,
    string_key: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group TOKEN-budget selection: take documents in deterministic
    priority order until each group's token budget is spent.

    The training-mix idiom is "N billion tokens per source", not "N docs
    per source" (cap_per_key): every row gets a deterministic priority
    ``affine_uniform(key, seed)``, and a row is selected iff the token
    total of strictly-higher-priority rows in its group is still under
    ``budget`` — greedy take-while, so each group overshoots by at most
    one document and selection is a pure function of the data (stable
    under any partitioning / cluster size, like every sampler here).

    Scale shape: groups in a training mix are FEW and HUGE (10-100
    sources over the corpus), so a plain per-group window would funnel
    terabytes through one task per source. The running total instead
    routes through :func:`~pandas_plus_spark.functions.ordered.
    grouped_cumsum`: range partition on (group, priority), per-partition
    window, broadcast prefix offsets — no single-group bottleneck. Token
    counts stay integral (long) so the running totals are exact.
    """
    from ..functions.ordered import grouped_cumsum

    gnames = [group_col] if isinstance(group_col, str) else list(group_col)
    u = affine_uniform(key, seed, string_key=string_key)
    base = df.withColumn("__u", u)
    cum = grouped_cumsum(
        base, gnames, ["__u", _c(key)], token_col, out="__cum",
        num_partitions=num_partitions)
    tok = _c(token_col)
    out = cum.where((F.col("__cum") - tok) < F.lit(budget)).drop("__u", "__cum")
    from ..util import attach_cached
    return attach_cached(out, *getattr(cum, "_pps_cached", ()))


def sql_token_budget_sample(group_expr: str, token_expr: str, budget: int,
                            key_expr: str, seed: int = 0, *,
                            string_key: bool = False,
                            from_clause: str = "documents") -> str:
    """DuckDB twin of :func:`token_budget_sample` — returns a subquery
    selecting every column of ``from_clause`` rows that the engine keeps."""
    u = sql_affine_uniform(key_expr, seed, string_key=string_key)
    return f"""(
        SELECT * FROM (
            SELECT *, sum({token_expr}) OVER (
                    PARTITION BY {group_expr}
                    ORDER BY {u}, {key_expr}
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum
            FROM {from_clause})
        WHERE __cum - {token_expr} < {budget}
    )"""


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    cluster_iters: int = 16,
    out: str = "split",
) -> DataFrame:
    """Near-duplicate-aware split assignment: every member of a connected
    near-dup cluster gets the SAME split label, so a near-copy of a test
    document can never leak into train.

    ``pairs`` is any near-dup pair frame (minhash/simhash/semantic/exact
    Jaccard — the usual :mod:`~pandas_plus_spark.operators.dedup`
    outputs). Clusters come from the same O(log diameter) min-label
    propagation as the dedup keep-list (``dup_clusters``); each document's
    split hashes the CLUSTER REPRESENTATIVE (minimum member id — or its
    own id for documents outside the pair graph), through the ordinary
    :func:`split_assign` thresholds. Determinism and disjointness are
    inherited; the leakage guarantee is definitional (one rep per
    cluster → one label per cluster).

    Plan shape: the clustering is pair-graph-sized; the only corpus-scale
    step is one equi-join of the corpus against the (id, cluster_id)
    vertex frame — AQE broadcasts it when the dup graph is small.
    """
    from .dedup import dup_clusters

    clusters = dup_clusters(pairs, n_iters=cluster_iters,
                            id_a=id_a, id_b=id_b)
    cl = clusters.select(F.col("id").alias("__lid"),
                         F.col("cluster_id").alias("__rep"))
    joined = df.join(cl, F.col(id_col) == F.col("__lid"), "left")
    rep = F.coalesce(F.col("__rep"), F.col(id_col))
    lbl = split_assign(rep, weights, seed)
    # propagate any persist handles riding on the PAIR frame (minhash /
    # candidate-verify pipelines pin intermediates) so release_cached on
    # the split result frees them — the dedup_keep_list contract
    from ..util import attach_cached
    return attach_cached(
        joined.withColumn(out, lbl).drop("__lid", "__rep"),
        *getattr(pairs, "_pps_cached", ()))


def cap_per_key(df: DataFrame, group_col, n: int, key, seed: int = 0, *,
                string_key: bool = False) -> DataFrame:
    """Per-group row cap: keep at most ``n`` rows per value of
    ``group_col``, chosen deterministically by ``affine_uniform(key, seed)``
    (ties → key order). The classic curation guard against a single domain /
    source / site flooding the training mix (e.g. "≤ 100k docs per
    domain").

    Plan shape: one hash shuffle on ``group_col`` + a rank window inside
    each partition — the same shape as ``GroupBy.head``; for pathologically
    skewed group sizes route through ``GroupBy.head(salt=...)`` which
    two-stages the cap (salted pre-cap, then exact cap), bounding any
    single task at ~group_size/salt rows.
    """
    from pyspark.sql import Window

    u = affine_uniform(key, seed, string_key=string_key)
    w = Window.partitionBy(_c(group_col)).orderBy(u.asc(), _c(key).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .drop("__rn"))
