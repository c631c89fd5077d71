"""Byte-level BPE tokenizer: train on a bounded corpus sample, encode
at scale.

The real version of the ``bpe_ish_token_count`` stand-in (reference
parity: none — LLM-pipeline surface): a GPT-2-style byte-pair encoder
whose base vocabulary is the 256 bytes, with merges learned greedily
from pair frequencies. Two trainers share one merge loop:
:func:`train_bpe` follows the sample shape real pipelines use (a
deterministic hash-filtered, hard-capped document collect);
:func:`train_bpe_distributed` (r14) counts word-type frequencies over
the ENTIRE corpus distributedly — one Arrow map pass + one type-keyed
map-side-combined shuffle — and collects only the Zipf-bounded TYPE
table for the driver-side greedy loop, so training sees every byte of
a 100 TB corpus while moving only vocabulary-sized data. Either way
the merge table (a few thousand tiny entries) broadcasts to executors
and encoding runs as an Arrow-batched ``pandas_udf`` over the full
corpus, map-side only.

Losslessness: the pre-tokenizer splits text into letter runs, digit
runs, whitespace runs and single other-characters — a partition of the
string, nothing dropped — and tokens are byte sequences within a
segment, so concatenating every token's bytes restores the exact UTF-8
stream: ``decode(encode(text)) == text`` for ANY input. That property
is the driver gate (``bpe_roundtrip``): the oracle is simply the
original text column.

Determinism: pair counts tie-break lexicographically and the sampling
knob is a hash condition, so the same SAMPLE always yields the same
merge table; the ``max_sample_docs`` safety cap is a ``limit()``
(partition-order dependent) — size ``sample_mod`` so the hash filter
lands UNDER the cap when reproducible training matters. Either way the
roundtrip contract holds for any merge table.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Partition of any string: letter runs, digit runs, whitespace runs,
#: single other characters (DOTALL '.' sweeps the remainder).
_PRETOK = re.compile(r"[^\W\d_]+|\d+|\s+|.", re.DOTALL)


def pretokenize(text: str) -> list[str]:
    """Lossless segmentation — ``''.join(pretokenize(t)) == t``."""
    return _PRETOK.findall(text)


def train_bpe(docs: DataFrame, text_col: str = "text", *,
              vocab_size: int = 512, max_sample_docs: int = 100_000,
              sample_mod: int = 1) -> list[tuple[bytes, bytes]]:
    """Learn a BPE merge table from the corpus. ``sample_mod`` > 1
    hash-samples ~1/mod of the docs DETERMINISTICALLY before the
    bounded collect (``max_sample_docs`` hard cap — the documented
    driver-side materialization: tokenizer training is sample-based in
    real pipelines; everything downstream stays distributed). Returns
    ``vocab_size - 256`` merges at most (fewer when pair counts dry
    up); ties break on the lexicographically smallest pair so the
    table is reproducible."""
    if vocab_size < 257:
        raise ValueError("vocab_size must exceed the 256 byte base")
    src = docs.select(F.col(text_col).alias("__t")).where(
        F.col("__t").isNotNull())
    if sample_mod > 1:
        src = src.where(F.pmod(F.xxhash64("__t"),
                               F.lit(sample_mod)) == 0)
    rows = src.limit(max_sample_docs).collect()
    word_freq: Counter = Counter()
    for r in rows:
        for seg in pretokenize(r[0]):
            word_freq[seg] += 1
    return _greedy_merges(word_freq, vocab_size)


def _greedy_merges(word_freq, vocab_size: int) -> list[tuple[bytes, bytes]]:
    """The greedy merge loop over a word-TYPE frequency map — shared by
    the sample-collect trainer and the distributed-counting trainer, so
    the two produce BIT-EQUAL merge tables from equal frequency maps
    (same tie-break, same stop conditions).

    Incremental (r15): pair counts are maintained across merges instead
    of rescanned — applying a merge touches only the word types that
    CONTAIN the merged pair (a pair→words index built once), and the
    argmax is a lazy-invalidation heap, so one merge costs
    O(affected-word bytes + log #pairs) rather than O(all types). At
    the gate's vocab 512 both shapes are instant; at a production
    vocab (50k merges × 2M types) the rescan loop is ~10¹¹ driver ops
    while this is ~10⁸. Selection order is IDENTICAL to the rescan
    loop: the heap key (-count, pair) is the same total order as
    ``min(..., key=(-count, pair))`` — pairs are unique keys — and
    stale heap entries are skipped by checking the live count, so the
    merge table is bit-equal (pinned by the rescan-vs-incremental
    test)."""
    import heapq

    # word type -> current symbol sequence (tuple of bytes objects)
    seqs = {w: tuple(bytes([b]) for b in w.encode("utf-8"))
            for w in word_freq}
    pair_counts: Counter = Counter()
    pair_words: dict = {}          # pair -> set of word types containing it
    for w, seq in seqs.items():
        f = word_freq[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(w)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(vocab_size - 256):
        # pop to the first LIVE entry (count matches, still positive)
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc and -negc > 0:
                best = (p, -negc)
                break
        if best is None:
            break
        if best[1] < 2:
            break                                # nothing worth merging
        pa, pb = best[0]
        merged = pa + pb
        merges.append((pa, pb))
        for w in list(pair_words.get((pa, pb), ())):
            seq = seqs[w]
            f = word_freq[w]
            delta = {}
            n = len(seq)
            for i in range(1, n):
                p = (seq[i - 1], seq[i])
                delta[p] = delta.get(p, 0) - 1
            out = []
            i = 0
            while i < n:
                if (i + 1 < n and seq[i] == pa
                        and seq[i + 1] == pb):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
            m = len(out)
            for i in range(1, m):
                p = (out[i - 1], out[i])
                delta[p] = delta.get(p, 0) + 1
            for p, d in delta.items():
                if d == 0:
                    continue
                c = pair_counts.get(p, 0) + d * f
                if c <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = c
                    heapq.heappush(heap, (-c, p))
            # membership transitions: a pair whose per-word count hit 0
            # leaves the index; one that appeared joins. d < 0 can only
            # reach 0 via the new-seq scan not re-adding it, so a full
            # membership recheck is two set probes on the delta keys.
            if delta:
                new_pairs = set()
                for i in range(1, m):
                    new_pairs.add((out[i - 1], out[i]))
                for p in delta:
                    if p in new_pairs:
                        pair_words.setdefault(p, set()).add(w)
                    else:
                        ws = pair_words.get(p)
                        if ws is not None:
                            ws.discard(w)
                            if not ws:
                                pair_words.pop(p, None)
        pair_counts.pop((pa, pb), None)
        pair_words.pop((pa, pb), None)
    return merges


def word_type_frequencies(docs: DataFrame, text_col: str = "text", *,
                          sample_mod: int = 1) -> DataFrame:
    """(word, freq) over the corpus — the distributed counting pass of
    :func:`train_bpe_distributed`. Pretokenization runs as an
    Arrow-batched ``pandas_udf`` (the same ``_PRETOK`` partition the
    driver trainer uses) and the explode feeds a hash aggregation, so
    the shuffle carries map-side-combined partial TYPE counts — corpus
    bytes never move. The type frame is Zipf-bounded: it grows with
    vocabulary, not corpus size, which is what makes corpus-scale
    training cheap."""

    @F.pandas_udf("array<string>")
    def _pretok(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _PRETOK.findall(t))

    src = docs.select(F.col(text_col).alias("__t")).where(
        F.col("__t").isNotNull())
    if sample_mod > 1:
        src = src.where(F.pmod(F.xxhash64("__t"),
                               F.lit(sample_mod)) == 0)
    return (src.select(F.explode(_pretok("__t")).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def train_bpe_distributed(
        docs: DataFrame, text_col: str = "text", *,
        vocab_size: int = 512, sample_mod: int = 1,
        max_word_types: int = 2_000_000) -> list[tuple[bytes, bytes]]:
    """Corpus-scale BPE training: the counting pass is DISTRIBUTED
    (:func:`word_type_frequencies` — one corpus map pass + one
    type-keyed shuffle), and only the word-TYPE frequency table comes
    back to the driver for the greedy merge loop. On equal inputs the
    merge table is BIT-EQUAL to :func:`train_bpe`'s (shared
    :func:`_greedy_merges`, same lexicographic tie-break) — the
    difference is what bounds the sample: ``train_bpe`` collects at
    most ``max_sample_docs`` documents, this trainer counts EVERY
    document and collects at most ``max_word_types`` word types
    (deterministic top-by-(freq DESC, word) via TakeOrdered when the
    cap binds — a capped run trains on the head of the Zipf curve,
    which is what real tokenizer trainers prune to anyway)."""
    if vocab_size < 257:
        raise ValueError("vocab_size must exceed the 256 byte base")
    wf = word_type_frequencies(docs, text_col, sample_mod=sample_mod)
    rows = (wf.orderBy(F.col("freq").desc(), "word")
            .limit(max_word_types).collect())
    return _greedy_merges({r["word"]: r["freq"] for r in rows},
                          vocab_size)


def bpe_vocab(merges: list[tuple[bytes, bytes]]) -> list[bytes]:
    """id -> token bytes: 256 single bytes then one entry per merge."""
    return [bytes([i]) for i in range(256)] + [a + b for a, b in merges]


def _encode_segment(seg_bytes: bytes, ranks: dict) -> list[bytes]:
    """Greedy lowest-rank merging of one pre-token's byte sequence."""
    seq = [bytes([b]) for b in seg_bytes]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(col, merges: list[tuple[bytes, bytes]]) -> Column:
    """Token ids (array<int>) for a text column under the trained merge
    table — Arrow-batched pandas_udf, merge ranks captured in the UDF
    closure (a few-thousand-entry dict; Spark ships it once per task
    like a broadcast). NULL text -> NULL ids."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    ids = {tok: i for i, tok in enumerate(bpe_vocab(merges))}

    @F.pandas_udf("array<int>")
    def _enc(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            out = []
            for seg in pretokenize(x):
                for tok in _encode_segment(seg.encode("utf-8"), ranks):
                    out.append(ids[tok])
            return out
        return s.map(one)

    return _enc(_c(col))


def bpe_decode(col, merges: list[tuple[bytes, bytes]]) -> Column:
    """Text from token ids — exact inverse of :func:`bpe_encode`:
    concatenate every token's bytes and UTF-8-decode (strict: segments
    never split characters across pre-token boundaries, and within a
    segment the byte stream is contiguous)."""
    vocab = bpe_vocab(merges)

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def one(ids):
            if ids is None:
                return None
            return b"".join(vocab[i] for i in ids).decode("utf-8")
        return s.map(one)

    return _dec(_c(col))


def bpe_token_count(col, merges: list[tuple[bytes, bytes]]) -> Column:
    """Exact token count under the trained tokenizer — the real version
    of ``text.bpe_ish_token_count`` for token-budget sampling and
    packing decisions."""
    return F.size(bpe_encode(col, merges))


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col
