"""Sequence packing: concat-and-chunk token budgeting for LLM pretraining.

Beyond the reference (SURVEY §2.11): the standard way training pipelines
turn a deduplicated corpus into fixed-length examples is to concatenate
documents in a deterministic order and slice the stream into
``budget``-token chunks (documents may straddle a boundary). The
sequential recurrence looks anti-distributed, but becomes embarrassingly
parallel once the corpus is sharded: chunk ids are a pure function of the
running token total inside a shard, i.e. one window cumsum per shard —
no Python, no iteration, and shards scale out linearly. Boundary waste is
zero by construction (chunking, not bin packing). The complementary
NO-STRADDLE shape — whole documents packed into budget-sized bins without
splitting (the SFT/instruction-tuning layout) — is :func:`pack_first_fit`:
serial first-fit-decreasing inside deterministic hash shards, Arrow seam,
shards scale out linearly.

Fully ANSI-expressible (window sum + integer division), so oracle-checked
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import affine_uniform


def concat_chunk_pack(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    *,
    shards: int = 1,
    seed: int = 0,
    string_key: bool = True,
) -> DataFrame:
    """Assign every document a position in the packed token stream.

    Documents are sharded by a deterministic hash of ``id_col`` (so layout
    is reproducible on any cluster), ordered within the shard by the same
    hash, and the running token total maps each document to:

    - ``shard``            — which independent packed stream it lands in
    - ``chunk_first/last`` — the budget-sized chunks it occupies
      (``chunk_first < chunk_last`` means it straddles boundaries)
    - ``offset_in_chunk``  — token offset where it starts inside chunk_first

    One shuffle (the per-shard window). Chunk ids never coordinate across
    shards, so 1000 executors pack 1000 shards independently; pick
    ``shards`` ≈ cluster parallelism × a few.
    """
    u = affine_uniform(id_col, seed, string_key=string_key)
    # floor, not cast: double→long CAST truncates in Spark but ROUNDS in
    # DuckDB — floor is the one spelling both engines agree on (u ≥ 0).
    shard = F.pmod(F.floor(u * F.lit(float(1 << 30))), F.lit(shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__u").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tokens_col).cast("long")
    out = (
        df.withColumn("__u", u)
        .withColumn("shard", shard)
        .withColumn("__cum", F.sum(n).over(w))
    )
    start = F.col("__cum") - n
    return (
        out.withColumn("chunk_first", F.floor(start / budget))
        .withColumn(
            "chunk_last",
            F.when(n > 0, F.floor((F.col("__cum") - 1) / budget))
            .otherwise(F.floor(start / budget)),
        )
        .withColumn("offset_in_chunk", start % budget)
        .drop("__u", "__cum")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into overlapping fixed-size character chunks —
    the sliding-window chunking step of a RAG/pretraining pipeline
    (each chunk shares its first ``overlap`` chars with the previous
    chunk's tail).

    A doc of length L yields ``1 + max(0, ceil((L - chunk_size) / stride))``
    chunks at starts ``0, stride, 2*stride, ...`` where
    ``stride = chunk_size - overlap``; the final chunk may be shorter.
    Empty documents yield one empty chunk (no row loss, so the output is a
    partition-preserving map of the input).

    Pure projection — ``sequence`` + ``substring`` + ``posexplode``, all
    whole-stage-codegen, zero shuffles; scales linearly with corpus bytes
    on any executor count. Output rows are chunk-sized, so downstream
    operators never carry full documents.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    # NULL text would make `sequence` NULL and posexplode emit no rows,
    # silently dropping the document; coalesce to '' so a NULL doc yields
    # one empty chunk like an empty doc (the no-row-loss contract).
    text = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(text)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((ln - F.lit(chunk_size)) / F.lit(float(stride))))
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int") * F.lit(stride),
                        F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        text.alias("__text"),
    )
    chunk = F.substring(F.col("__text"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("__start").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Whole-document bin packing: assign each document to a pack such that
    no pack exceeds ``budget`` tokens and documents are NEVER split — the
    layout for SFT/instruction tuning, where an example must not straddle a
    context boundary (contrast :func:`concat_chunk_pack`, which slices the
    concatenated stream and accepts straddling).

    Returns ``(id_col, len_col, shard, pack_id, oversize)`` — ``pack_id``
    is globally unique (shard-prefixed); a document longer than ``budget``
    gets its own pack with ``oversize=true`` (flag-and-keep, the caller
    decides truncation).

    Scale shape: bin packing is inherently serial, so the corpus is first
    split into ``n_shards`` deterministic hash shards
    (``xxhash64(id, seed) mod n_shards`` — one exchange) and first-fit-
    decreasing runs SERIALLY PER SHARD inside an Arrow-batched
    ``applyInPandas`` (numpy-backed loop over the shard's (len, id) pairs,
    the sanctioned seam). Shards pack independently: utilization only
    degrades by the per-shard tail (≤ one partial pack per shard —
    bounded waste ``n_shards·budget`` total, negligible when each shard
    holds ≫ 1 pack's worth of tokens), and the shard count is the
    parallelism knob. FFD's guarantee (≤ 11/9·OPT + 6/9 packs) holds per
    shard. Deterministic end-to-end: shard assignment is a pure hash and
    the in-shard order is (len desc, id asc)."""
    import pandas as pd

    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType([
        T.StructField(id_col, id_field.dataType),
        T.StructField(len_col, T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ])
    budget = int(budget)
    if budget <= 0:
        raise ValueError("budget must be positive")

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        rows = sorted(zip(pdf[len_col].astype("int64"), pdf[id_col]),
                      key=lambda t: (-t[0], t[1]))
        # first-fit-decreasing over per-pack remaining budgets
        remaining: list[int] = []
        assign: list[int] = []
        oversize: list[bool] = []
        for ln, _ in rows:
            if ln > budget:
                assign.append(len(remaining))
                remaining.append(0)          # full — nothing else joins it
                oversize.append(True)
                continue
            for pi, rem in enumerate(remaining):
                if rem >= ln:
                    assign.append(pi)
                    remaining[pi] = rem - ln
                    break
            else:
                assign.append(len(remaining))
                remaining.append(budget - ln)
            oversize.append(False)
        return pd.DataFrame({
            id_col: [r[1] for r in rows],
            len_col: [int(r[0]) for r in rows],
            "shard": shard,
            "pack_id": [shard * 1_000_000_000 + a for a in assign],
            "oversize": oversize,
        })

    sharded = df.select(
        F.col(id_col), F.col(len_col).cast("long").alias(len_col),
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
         .cast("int").alias("__shard"))
    return sharded.groupBy("__shard").applyInPandas(pack_shard, out_schema)
