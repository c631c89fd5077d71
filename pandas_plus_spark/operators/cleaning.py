"""Corpus-cleaning operators for training-data pipelines: PII detection /
redaction, C4-style heuristic filters, and benchmark-contamination flagging.

Beyond the reference (pandas-plus has no corpus tooling, SURVEY §2.11) but
first-class for the 100 TB training-data use case. Design rules:

- PII and C4 rules are pure Column expressions (regexp_count / regexp_replace
  / array HOFs) — map-side, whole-stage codegen, zero shuffles, so they run
  at scan speed on any cluster size.
- Regexes are written in the common Java-regex ∩ RE2 dialect (no lookaround,
  no backreferences) so the DuckDB oracle evaluates the IDENTICAL pattern.
- Contamination is the one operator that needs a join; the benchmark side is
  collapsed to a distinct-hash set (tiny — benchmarks are MBs, corpora TBs)
  and broadcast, so the corpus NEVER shuffles: explode n-grams map-side,
  broadcast-hash-join, re-aggregate by doc id (partial agg collapses hits
  before the only shuffle, which carries doc ids + counts, not text).

C4 rules follow the public description in Raffel et al. 2020 (JMLR 21(140),
"Colossal Clean Crawled Corpus", §2.2); Gopher-style repetition rules live in
``functions/text.py`` + ``operators/corpus.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from ..util import ensure_parallelism


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------- #
# PII
# --------------------------------------------------------------------- #

# Java-regex ∩ RE2 patterns (tested verbatim under DuckDB's RE2):
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the standard permissive scan pattern
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad; \b is an ASCII word boundary in both dialects
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # US-SSN shape
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    # international-ish phone: leading +/digit, 7-16 digits-or-separators,
    # digit end — wide enough for "+1 (555) 123-4567" in one match
    "phone": r"\+?[0-9][0-9()\- ]{7,16}[0-9]\b",
}

PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
}

# Redaction must apply in a fixed order with the narrow-shape patterns first:
# ssn before phone (an SSN parses as a phone otherwise), email before ipv4
# (domains can look dotted-quad-ish once mangled).
PII_ORDER = ("email", "ssn", "ipv4", "phone")


def pii_counts(col, categories=PII_ORDER) -> dict[str, Column]:
    """Per-category PII match counts — one ``regexp_count`` per category,
    all map-side."""
    return {cat: F.regexp_count(_c(col), F.lit(PII_PATTERNS[cat]))
            for cat in categories}


def redact_pii(col, categories=PII_ORDER) -> Column:
    """Replace every PII match with its ``<CATEGORY>`` token, applied in
    ``PII_ORDER``-stable order so overlapping shapes resolve
    deterministically."""
    out = _c(col)
    for cat in PII_ORDER:
        if cat in categories:
            out = F.regexp_replace(out, PII_PATTERNS[cat],
                                   PII_REPLACEMENTS[cat])
    return out


def sql_pii_count(expr: str, cat: str) -> str:
    """DuckDB twin of one ``pii_counts`` entry."""
    pat = PII_PATTERNS[cat].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def sql_redact_pii(expr: str, categories=PII_ORDER) -> str:
    """DuckDB twin of :func:`redact_pii` (same order, 'g' flag)."""
    out = expr
    for cat in PII_ORDER:
        if cat in categories:
            pat = PII_PATTERNS[cat].replace("'", "''")
            out = (f"regexp_replace({out}, '{pat}', "
                   f"'{PII_REPLACEMENTS[cat]}', 'g')")
    return out


# --------------------------------------------------------------------- #
# C4-style heuristic filters (Raffel et al. 2020 §2.2)
# --------------------------------------------------------------------- #

_TERMINAL = (".", "!", "?", '"', "'")


# --------------------------------------------------------------------- #
# HTML boilerplate removal (Boilerpipe/JusText-lite)
# --------------------------------------------------------------------- #

# Java-regex ∩ RE2 patterns (the PII discipline: every pattern below runs
# verbatim under DuckDB's RE2 in the oracle twins).
# block-level tags delimit candidate content blocks; <br> too
BLOCK_SPLIT_RE = (r"(?i)(?:</?(?:p|div|h[1-6]|li|td|tr|ul|ol|table|thead|"
                  r"tbody|section|article|aside|nav|header|footer|"
                  r"blockquote|main|form)(?:\s[^>]*)?>|<br\s*/?>)")
ANCHOR_TEXT_RE = r"(?i)<a(?:\s[^>]*)?>([^<]*)</a>"
ANY_TAG_RE = r"<[^>]*>"
# minimal entity decode, &amp; LAST so decoded ampersands never re-decode
HTML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def _block_text(seg: Column) -> Column:
    """Tag-strip + whitespace-normalize + entity-decode one block segment."""
    t = F.trim(F.regexp_replace(
        F.regexp_replace(seg, ANY_TAG_RE, " "), r"\s+", " "))
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return t


def boilerplate_blocks(col) -> Column:
    """HTML split into candidate content blocks with the two classic
    boilerplate signals per block — the Boilerpipe/JusText family's core
    features, dependency-free: segments between BLOCK-level tags, each
    carrying its tag-stripped text and its LINK-TEXT length (characters
    inside ``<a>`` elements — navigation/footer chrome is link-dense,
    body prose is not). Returns ``array<struct<txt string, alen int>>``
    with empty segments dropped. Pure Column machinery: one regex split,
    higher-order transform/filter — no UDF, no parser library (nested
    anchors and scripted markup are out of scope; the contract is
    crawl-scale triage, not DOM fidelity)."""
    segs = F.split(_c(col), BLOCK_SPLIT_RE)
    blocks = F.transform(
        segs,
        lambda s: tx.let(
            _block_text(s),
            lambda t: F.struct(
                t.alias("txt"),
                F.coalesce(
                    F.aggregate(
                        F.regexp_extract_all(s, F.lit(ANCHOR_TEXT_RE),
                                             F.lit(1)),
                        F.lit(0),
                        lambda acc, x: acc + F.length(x)),
                    F.lit(0)).alias("alen"))))
    return F.filter(blocks, lambda b: F.length(b["txt"]) > 0)


def remove_boilerplate(col, min_chars: int = 25,
                       max_link_density: float = 0.3) -> dict[str, Column]:
    """Main-content extraction: keep blocks with at least ``min_chars``
    of stripped text whose link-text share is at most
    ``max_link_density`` — the two-signal block classifier that removes
    nav bars, footers, tag clouds and related-links chrome while keeping
    body prose (the Boilerpipe NumWords/LinkDensity rule pair). Returns
    ``{"text", "n_blocks", "n_kept"}`` Columns; ``text`` joins the kept
    blocks with single spaces. All JVM-side column expressions — the
    per-doc cost is one regex split + one pass over its blocks."""
    blocks = boilerplate_blocks(col)
    kept = F.filter(
        blocks,
        lambda b: (F.length(b["txt"]) >= F.lit(int(min_chars)))
        & (b["alen"].cast("double")
           <= F.lit(float(max_link_density))
           * F.length(b["txt"]).cast("double")))
    return {
        "text": F.array_join(F.transform(kept, lambda b: b["txt"]), " "),
        "n_blocks": F.size(blocks),
        "n_kept": F.size(kept),
    }


def sql_remove_boilerplate(expr: str, min_chars: int = 25,
                           max_link_density: float = 0.3) -> dict[str, str]:
    """DuckDB twins of :func:`remove_boilerplate` (same patterns, RE2;
    DuckDB's regexp_replace needs the explicit 'g' flag where Spark
    replaces globally). Returns SQL snippets keyed like the Columns."""
    strip = (f"regexp_replace(regexp_replace(s, '{ANY_TAG_RE}', ' ', 'g'),"
             f" '\\s+', ' ', 'g')")
    t = f"trim({strip})"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{lit}')"
    blocks = (
        "list_filter(list_transform("
        f"string_split_regex({expr}, '{BLOCK_SPLIT_RE}'), "
        f"s -> struct_pack(txt := {t}, alen := coalesce(list_sum("
        f"list_transform(regexp_extract_all(s, '{ANCHOR_TEXT_RE}', 1), "
        "x -> length(x))), 0))), b -> length(b.txt) > 0)")
    kept = (f"list_filter({blocks}, b -> length(b.txt) >= {int(min_chars)} "
            f"AND CAST(b.alen AS DOUBLE) <= {float(max_link_density)} "
            "* CAST(length(b.txt) AS DOUBLE))")
    return {
        "text": (f"array_to_string(list_transform({kept}, b -> b.txt), ' ')"),
        "n_blocks": f"len({blocks})",
        "n_kept": f"len({kept})",
    }


def c4_line_stats(col, min_words: int = 5) -> dict[str, Column]:
    """Line-level C4 statistics as pure Columns.

    A line is *kept* when it ends in terminal punctuation AND has at least
    ``min_words`` whitespace words (C4 §2.2 rules 1-2). Exposed:

    - ``n_lines``, ``n_kept_lines``
    - ``kept_line_frac`` (NULL on empty docs)
    - ``n_sentences`` — terminal-punctuation runs, the "at least 3
      sentences" page rule's counter
    """
    lines = tx.let(
        F.filter(F.split(_c(col), "\n"), lambda l: F.trim(l) != ""),
        lambda lines: F.struct(
            F.size(lines).alias("n_lines"),
            F.size(F.filter(lines, _line_kept(min_words))).alias("n_kept"),
        ),
    )
    n_lines = lines["n_lines"]
    n_kept = lines["n_kept"]
    return {
        "n_lines": n_lines,
        "n_kept_lines": n_kept,
        "kept_line_frac": F.when(
            n_lines > 0, n_kept.cast("double") / n_lines),
        # translate() set-scan, not the regex engine: count of [.!?] chars
        # == length minus length-after-deleting-them (the quality_score
        # de-regex pattern, functions/text.py _ALNUM_WS note)
        "n_sentences": F.length(_c(col))
        - F.length(F.translate(_c(col), ".!?", "")),
    }


def _line_kept(min_words: int):
    def kept(line: Column) -> Column:
        t = F.trim(line)
        ends = F.substring(t, -1, 1).isin(*_TERMINAL)
        enough = F.size(F.filter(F.split(t, " +"), lambda w: w != "")) >= min_words
        return ends & enough
    return kept


def c4_flags(col) -> dict[str, Column]:
    """Doc-level C4 drop flags: lorem-ipsum, curly brace (code), and the
    "dirty word" stand-in (C4 uses a public blocklist; the engine takes the
    policy list as data — see ``blocklist=`` on :func:`c4_keep`)."""
    low = F.lower(_c(col))
    return {
        "has_lorem_ipsum": low.contains("lorem ipsum"),
        "has_curly_brace": _c(col).contains("{"),
        "has_javascript": low.contains("javascript"),
    }


def c4_keep(col, min_words: int = 5, min_sentences: int = 3,
            min_kept_line_frac: float = 0.0, blocklist=()) -> Column:
    """The composite C4 page-keep predicate (all rules ANDed); feed to
    ``df.filter``. ``blocklist`` is an iterable of lowercase phrases whose
    presence drops the page."""
    stats = c4_line_stats(col, min_words=min_words)
    flags = c4_flags(col)
    keep = (
        (stats["n_sentences"] >= min_sentences)
        & ~flags["has_lorem_ipsum"]
        & ~flags["has_curly_brace"]
        & (F.coalesce(stats["kept_line_frac"], F.lit(0.0))
           >= F.lit(min_kept_line_frac))
    )
    low = F.lower(_c(col))
    for phrase in blocklist:
        keep = keep & ~low.contains(phrase.lower())
    return keep


# --------------------------------------------------------------------- #
# Benchmark contamination
# --------------------------------------------------------------------- #

def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    hash_fn: str | None = None,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with a benchmark
    set (the standard train/test-decontamination check, e.g. GPT-3 App. C /
    PaLM-style 8-gram overlap — both public methods).

    Returns one row per document:
    ``(id_col, n_grams, n_contaminated, contamination_frac, contaminated)``
    where ``n_grams`` counts the doc's DISTINCT n-grams and
    ``n_contaminated`` how many of those appear anywhere in the benchmark.

    100 TB shape: the benchmark's distinct grams (small by definition) are
    broadcast; the corpus explodes its grams map-side and broadcast-joins —
    the only shuffle is the final re-aggregation keyed by doc id. By default
    gram identity is the RAW GRAM STRING: exact (no collisions), directly
    SQL-oracle-checkable, and the broadcast side stays benchmark-sized.
    ``hash_fn="xxhash64"`` swaps in 64-bit hashed grams — constant-width
    join keys and a smaller broadcast for very gram-dense benchmarks, at
    ~2⁻⁶⁴-per-pair collision odds (rows-only checkable). A 1e9-space hash
    (e.g. the poly hash) would be WRONG here: ~millions of corpus grams
    birthday-collide into benchmark grams and inflate the counts.
    """
    bench_text = bench_text_col or text_col

    def grams_of(df, text_c):
        toks = tx.simple_tokens(text_c)
        grams = tx.word_ngrams(toks, n)
        if hash_fn == "xxhash64":
            grams = F.transform(grams, lambda g: F.xxhash64(g))
        elif hash_fn is not None:
            raise ValueError(f"hash_fn must be None or 'xxhash64', got {hash_fn!r}")
        return F.array_distinct(grams)

    bench_grams = (
        ensure_parallelism(benchmark)
        .select(F.explode(grams_of(benchmark, bench_text)).alias("__g"))
        .distinct()
    )
    doc_grams = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode_outer(grams_of(docs, text_col)).alias("__g"))
    )
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "__g", "left")
    out = hits.groupBy(id_col).agg(
        F.count("__g").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
    )
    return out.select(
        id_col,
        "n_grams",
        "n_contaminated",
        F.when(F.col("n_grams") > 0,
               F.col("n_contaminated").cast("double") / F.col("n_grams"))
        .otherwise(F.lit(0.0)).alias("contamination_frac"),
        (F.col("n_contaminated") > 0).alias("contaminated"),
    )


# --------------------------------------------------------------------- #
# quality-threshold calibration
# --------------------------------------------------------------------- #

def quantile_threshold_filter(
    df: DataFrame,
    group_col,
    score_col,
    q: float,
    *,
    exact: bool = True,
    accuracy: int = 10_000,
    round_to: int = 9,
    threshold_out: str | None = None,
    calibration_df: DataFrame | None = None,
) -> DataFrame:
    """Per-group score-quantile calibration: keep rows whose ``score_col``
    is at or above the group's ``q``-quantile — the pipeline idiom behind
    "keep the top 30% of each source by quality".

    The threshold comes from ONE aggregate pass (per-group exact
    ``percentile`` for ``exact=True``, else ``approx_percentile`` — the
    100 TB path: a mergeable sketch, no per-group sort), after which the
    filter itself is a broadcast-joined predicate: the group/threshold
    frame has one row per group, so at corpus scale the selection costs a
    map-side join — the corpus never shuffles. Calibrating on a
    stratified sample and filtering the full corpus composes naturally
    (pass the sample here, join the thresholds yourself).

    Thresholds are snapped to ``round_to`` decimals so membership is
    reproducible across engines and runs (interpolation emits doubles;
    an unrounded threshold makes >= comparisons knife-edge).

    ``threshold_out`` keeps the per-row threshold as a column for
    downstream inspection; default drops it.

    ``calibration_df`` computes the thresholds from a DIFFERENT frame —
    typically a deterministic sample (``stratified_sample``) of the
    corpus. Without it, both the aggregate branch and the filter branch
    re-evaluate ``score_col``'s expression over the full input (two
    plan branches from one scan — at corpus scale, two passes of a
    regex-heavy score); calibrating on a 1-10% sample makes the
    threshold pass ~free and the filter a single scoring pass.

    CONTRACT: a group with NO row in the calibration frame has no
    threshold, and ALL of its rows are dropped (``s >= NULL`` is never
    true) — "uncalibrated ⇒ unfiltered-out", the conservative choice
    for a quality gate. When sampling for calibration, size the sample
    so every group you intend to keep is represented (stratified
    sampling by the same group column does this by construction for
    non-tiny groups).
    """
    g = _c(group_col)
    s = _c(score_col)
    if exact:
        agg = F.percentile(s, F.lit(float(q)))
    else:
        agg = F.percentile_approx(s, F.lit(float(q)), F.lit(int(accuracy)))
    thr = (calibration_df if calibration_df is not None else df).groupBy(
        g.alias("__g")).agg(F.round(agg, round_to).alias("__thr"))
    joined = df.join(F.broadcast(thr), g.eqNullSafe(F.col("__g")), "left")
    kept = joined.where(s >= F.col("__thr")).drop("__g")
    if threshold_out:
        return kept.withColumnRenamed("__thr", threshold_out)
    return kept.drop("__thr")
