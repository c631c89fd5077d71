"""Scale linting over Spark physical plans.

Reads the PRE-EXECUTION physical plan (``queryExecution().executedPlan()``
— the AdaptiveSparkPlan's initial plan; AQE may still improve it at
runtime, never worsen the lint verdicts below) and reports the features
that decide whether the plan survives a 100× scale-up:

- every ``Exchange`` is a shuffle of its input subtree;
- ``Exchange SinglePartition`` funnels the whole input through ONE task —
  the classic silent scale-killer (global windows, ``coalesce(1)``);
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` are O(n·m) row
  explosions — a join that lost its equi-condition;
- ``BatchEvalPython`` is a row-at-a-time Python UDF (pickled row loop,
  10-100× slower than the Arrow-batched ``ArrowEvalPython`` /
  ``MapInPandas`` seams the engine uses for genuinely-Python work);
- a final ``HashAggregate`` without a ``partial_*`` phase shuffles raw
  rows instead of map-side-combined partials;
- ``FileScan`` lines carry the pushdown evidence (``PushedFilters``,
  ``ReadSchema``) that PLANS.md quotes by hand.

No JVM round-trips beyond fetching the plan string, no execution, no
dependency beyond the DataFrame itself — safe to call in tests and CI on
every query the engine ships.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from pyspark.sql import DataFrame

# severity levels, ordered
ERROR = "error"
WARN = "warn"
INFO = "info"


@dataclass(frozen=True)
class Finding:
    """One lint finding: a stable ``code`` for filtering/suppression, a
    severity (``error`` > ``warn`` > ``info``), and a human message."""
    code: str
    severity: str
    message: str

    def __str__(self) -> str:  # readable in assertion output
        return f"[{self.severity}] {self.code}: {self.message}"


def plan_text(df: DataFrame) -> str:
    """The physical plan as one string (pre-execution; AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


_SCAN_RE = re.compile(r"FileScan (\w+) \[([^\]]*)\]")
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")

# a SinglePartition exchange is FINE when its input is already
# result-bounded: a SCALAR (keys=[]) aggregate — partial or final, the map
# side reduces to one row per task before the funnel — or a limit. A KEYED
# partial aggregate does NOT excuse the funnel: its output is
# key-cardinality-sized, i.e. corpus-scale for high-cardinality keys.
_BOUNDED_CHILD = re.compile(
    r"CollectLimit|LocalLimit|GlobalLimit|TakeOrderedAndProject|"
    r"(?:Hash|Sort|ObjectHash)Aggregate\(keys=\[\]")


def _tree_depth(line: str) -> int:
    """Depth of a plan-tree line = length of its tree-drawing prefix
    (spaces, ``:``, ``+``, ``-``, ``|``)."""
    return re.match(r"^[\s:+|-]*", line).end()


def _child_line(lines: list[str], i: int) -> str:
    """The first real descendant of the operator at ``lines[i]``: the next
    line strictly deeper in the tree, skipping blank and section-marker
    lines (``== Initial Plan ==`` etc.). Empty string when the node prints
    no child (leaf, or reused-subtree reference)."""
    depth = _tree_depth(lines[i])
    for j in range(i + 1, len(lines)):
        cand = lines[j]
        if not cand.strip() or "==" in cand:
            continue
        if _tree_depth(cand) <= depth:
            return ""
        return cand
    return ""


def _parent_line(lines: list[str], i: int) -> str:
    """The nearest preceding line strictly shallower in the tree — the
    operator consuming ``lines[i]``'s output."""
    depth = _tree_depth(lines[i])
    for j in range(i - 1, -1, -1):
        cand = lines[j]
        if not cand.strip() or "==" in cand:
            continue
        if _tree_depth(cand) < depth:
            return cand
    return ""


def _unbounded_single_partition(plan: str) -> int:
    """Count ``Exchange SinglePartition`` nodes whose child subtree is NOT
    result-bounded — the ones that funnel raw data through one task."""
    lines = plan.splitlines()
    return sum(
        1 for i, line in enumerate(lines)
        if "Exchange SinglePartition" in line
        and not _BOUNDED_CHILD.search(_child_line(lines, i)))


# a shuffle feeding an aggregate is map-side combined when what it ships is
# partial-aggregate state — either an explicit partial_* phase or a
# keyed/scalar aggregate with functions=[] (the two-phase DISTINCT rewrite:
# the map side dedups by the grouping keys before the exchange).
_MAP_SIDE_COMBINED = re.compile(
    r"partial_|Aggregate\(keys=\[[^\]]*\], functions=\[\]")


# nodes that pass their input through without changing its row bound —
# walking through these from a cross-join's build side finds the node
# that actually determines the broadcast side's cardinality
# prefix class includes digits/parens for codegen-starred lines ("*(3)
# Project ..." — the whole-stage-codegen stage id printed without AQE)
_PASS_THROUGH = re.compile(
    r"^[\s:+|*\-()0-9]*(Project|Filter|Sort|Exchange|BroadcastExchange|"
    r"AQEShuffleRead|ShuffleQueryStage|BroadcastQueryStage|TableCacheQueryStage|"
    r"WholeStageCodegen|InputAdapter|ColumnarToRow|InMemoryTableScan|"
    r"InMemoryRelation|AdaptiveSparkPlan)\b")


def _subtree_bounded(lines: list[str], i: int) -> bool:
    """True when the subtree rooted at ``lines[i]`` is RESULT-BOUNDED:
    descending through pass-through nodes (projection/filter/exchange/
    codegen markers — none can grow the row bound) reaches a scalar
    aggregate or a limit. A join/union/scan before one of those means the
    side is data-sized — not bounded."""
    j = i
    for _ in range(len(lines)):
        line = lines[j]
        if _BOUNDED_CHILD.search(line):
            return True
        if not _PASS_THROUGH.search(line):
            return False
        # descend to the first real child (next strictly-deeper line,
        # markers skipped); pass-through nodes have at most one
        depth = _tree_depth(line)
        for k in range(j + 1, len(lines)):
            if not lines[k].strip() or "==" in lines[k]:
                continue
            if _tree_depth(lines[k]) <= depth:
                return False
            j = k
            break
        else:
            return False
    return False


def _direct_children(lines: list[str], i: int) -> list[int]:
    """Indices of the operator's DIRECT children (depth == first child's
    depth, within the subtree)."""
    depth = _tree_depth(lines[i])
    kids: list[int] = []
    child_depth = None
    for j in range(i + 1, len(lines)):
        if not lines[j].strip() or "==" in lines[j]:
            continue
        d = _tree_depth(lines[j])
        if d <= depth:
            break
        if child_depth is None:
            child_depth = d
        if d == child_depth:
            kids.append(j)
    return kids


def _cross_join_counts(plan: str) -> tuple[int, int]:
    """(unbounded, bounded) cross-join nodes. A CartesianProduct /
    BroadcastNestedLoopJoin is BOUNDED when a side's subtree reduces to a
    scalar aggregate or a limit before any data-sized node — the
    broadcast-scalar idiom (crossJoin(agg(...)) to attach a corpus total)
    multiplies row counts by ~1 and is fine at any scale. For a BNLJ the
    BUILD side must be the bounded one (the streamed side may be the
    corpus); for a plain CartesianProduct either side bounds the output."""
    lines = plan.splitlines()
    unbounded = bounded = 0
    for i, line in enumerate(lines):
        is_bnlj = "BroadcastNestedLoopJoin" in line
        if not is_bnlj and "CartesianProduct" not in line:
            continue
        kids = _direct_children(lines, i)
        if is_bnlj and len(kids) >= 2:
            build = kids[0] if "BuildLeft" in line else kids[1]
            ok = _subtree_bounded(lines, build)
        else:
            ok = any(_subtree_bounded(lines, k) for k in kids)
        if ok:
            bounded += 1
        else:
            unbounded += 1
    return unbounded, bounded


def _agg_raw_shuffles(plan: str) -> int:
    """Count hash-partitioned exchanges that feed an aggregate but ship RAW
    rows: parent is a HashAggregate, child is neither a partial_* phase nor
    a map-side-dedup (functions=[]) aggregate. Evaluated PER Exchange
    region, so one healthy partial+final pair elsewhere in a multi-
    aggregate plan can't mask a raw-row shuffle in another."""
    lines = plan.splitlines()
    return sum(
        1 for i, line in enumerate(lines)
        if "Exchange hashpartitioning" in line
        and "Aggregate" in _parent_line(lines, i)
        and not _MAP_SIDE_COMBINED.search(_child_line(lines, i)))


def plan_stats(df: DataFrame) -> dict:
    """Summarize the plan's scale-relevant features as plain counts.

    Keys: ``exchanges`` (total), ``single_partition_exchanges``,
    ``broadcast_joins``, ``sort_merge_joins``, ``shuffled_hash_joins``,
    ``cartesian_products`` (UNBOUNDED CartesianProduct/broadcast nested
    loop — both sides data-sized), ``bounded_cross_joins`` (a side
    reduces to a scalar aggregate or limit: the broadcast-scalar idiom,
    output ~1x),
    ``hash_aggregates``, ``has_partial_agg``, ``agg_raw_shuffles``
    (aggregate-feeding exchanges shipping raw rows, per region),
    ``row_udfs``
    (BatchEvalPython), ``arrow_udfs`` (ArrowEvalPython + the
    mapInPandas/applyInPandas seams), ``take_ordered``,
    ``codegen_spans`` (WholeStageCodegen regions), and ``scans`` — a list
    of ``{format, columns, pushed_filters}`` per FileScan.
    """
    plan = plan_text(df)
    xj_unbounded, xj_bounded = _cross_join_counts(plan)
    scans = []
    for m in _SCAN_RE.finditer(plan):
        # a FileScan's attributes print on ITS OWN line — bound the
        # PushedFilters search there so a neighboring scan's fields can
        # never be misattributed to this one
        eol = plan.find("\n", m.end())
        rest = plan[m.end():eol if eol != -1 else len(plan)]
        pushed = _PUSHED_RE.search(rest)
        cols = [c.split("#")[0] for c in m.group(2).split(",") if c]
        scans.append({
            "format": m.group(1),
            "columns": cols,
            "pushed_filters": bool(pushed and pushed.group(1).strip()),
        })
    return {
        "exchanges": len(re.findall(r"\bExchange ", plan)),
        "single_partition_exchanges": _unbounded_single_partition(plan),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian_products": xj_unbounded,
        "bounded_cross_joins": xj_bounded,
        "hash_aggregates": plan.count("HashAggregate"),
        "has_partial_agg": "partial_" in plan,
        "agg_raw_shuffles": _agg_raw_shuffles(plan),
        "row_udfs": plan.count("BatchEvalPython"),
        "arrow_udfs": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                                            plan))),
        "scans": scans,
    }


def lint(df: DataFrame) -> List[Finding]:
    """Flag the plan's scale anti-patterns, most severe first.

    Rules (code → severity):

    - ``cartesian-product`` → error: CartesianProduct or
      BroadcastNestedLoopJoin with BOTH sides data-sized; the join
      condition is missing or non-equi, cost is O(n·m) rows.
    - ``bounded-cross-join`` → info: a cross join whose bounding side
      reduces to a scalar aggregate or limit (the
      ``crossJoin(broadcast(agg(...)))`` idiom for attaching a corpus
      total) — output ~1× the streamed side, fine at any scale.
    - ``single-partition-exchange`` → warn: the whole input funnels
      through one task (unpartitioned window, ``repartition(1)``);
      fine on result-bounded frames, fatal on the corpus.
    - ``row-udf`` → warn: BatchEvalPython = row-at-a-time pickled
      Python; rewrite as built-in expressions or an Arrow-batched
      pandas UDF.
    - ``agg-no-map-side-combine`` → warn: an aggregate-feeding exchange
      ships raw rows with no partial/map-side-dedup phase below it —
      checked PER exchange region, so a healthy partial+final pair in
      one part of a multi-aggregate plan can't mask a raw-row shuffle
      in another (``spark.sql.aggregate.partialAggregate``
      misconfiguration, some rewrites).
    - ``global-sort-of-scan`` → info: a global Sort over raw scan
      output with no aggregate/limit bounding it — a full-corpus
      range shuffle; intended for final result ordering only.
    """
    plan = plan_text(df)
    stats = plan_stats(df)
    findings: List[Finding] = []
    if stats["cartesian_products"]:
        findings.append(Finding(
            "cartesian-product", ERROR,
            f"{stats['cartesian_products']} non-equi join(s) "
            "(CartesianProduct/BroadcastNestedLoopJoin): O(n*m) row "
            "explosion; add an equi-join condition"))
    if stats["bounded_cross_joins"]:
        findings.append(Finding(
            "bounded-cross-join", INFO,
            f"{stats['bounded_cross_joins']} cross join(s) against a "
            "scalar-aggregate/limit-bounded side (broadcast-scalar "
            "idiom): output ~1x the streamed side"))
    if stats["single_partition_exchanges"]:
        findings.append(Finding(
            "single-partition-exchange", WARN,
            f"{stats['single_partition_exchanges']} Exchange "
            "SinglePartition: entire input through one task; partition "
            "the window/repartition call"))
    if stats["row_udfs"]:
        findings.append(Finding(
            "row-udf", WARN,
            f"{stats['row_udfs']} BatchEvalPython node(s): row-at-a-time "
            "Python UDF; use built-in expressions or a pandas_udf"))
    if stats["agg_raw_shuffles"]:
        findings.append(Finding(
            "agg-no-map-side-combine", WARN,
            f"{stats['agg_raw_shuffles']} aggregate exchange(s) shuffle "
            "raw rows (no partial_*/map-side-dedup phase below that "
            "exchange)"))
    if (re.search(r"Sort \[[^\]]*\], true", plan)
            and not stats["hash_aggregates"]
            and not stats["take_ordered"]
            and "CollectLimit" not in plan
            and "FileScan" in plan):
        findings.append(Finding(
            "global-sort-of-scan", INFO,
            "global Sort over raw scan output with no aggregate/limit: "
            "full-corpus range shuffle"))
    # Lineage-cut traversal (r16): util.lineage_cut truncates the visible
    # plan at a LogicalRDD leaf, which would otherwise make everything
    # BELOW the cut invisible to this linter. The engine stashes each
    # pre-cut frame on the checkpointed handle (_pps_ckpt_src) and the
    # handles ride the result (_pps_cached), so the sweep lints every
    # segment of a cut pipeline — no blind spots.
    seen = {id(df)}
    stack = list(getattr(df, "_pps_cached", ()))
    while stack:
        f = stack.pop()
        if id(f) in seen:
            continue
        seen.add(id(f))
        stack.extend(getattr(f, "_pps_cached", ()))
        src = getattr(f, "_pps_ckpt_src", None)
        if src is not None and id(src) not in seen:
            seen.add(id(src))
            stack.extend(getattr(src, "_pps_cached", ()))
            findings.extend(lint(src))
    order = {ERROR: 0, WARN: 1, INFO: 2}
    findings.sort(key=lambda f: order[f.severity])
    return findings


def assert_scalable(df: DataFrame, max_severity: str = WARN,
                    allow: tuple = ()) -> None:
    """Raise ``AssertionError`` listing every finding at or above
    ``max_severity`` (default: errors AND warnings fail), minus codes in
    ``allow``. The one-line CI gate:

    >>> assert_scalable(my_query(spark, sf))          # errors+warns fail
    >>> assert_scalable(df, allow=("row-udf",))       # suppress one code
    >>> assert_scalable(df, max_severity="error")     # errors only
    """
    order = {ERROR: 0, WARN: 1, INFO: 2}
    bad = [f for f in lint(df)
           if order[f.severity] <= order[max_severity]
           and f.code not in allow]
    if bad:
        raise AssertionError(
            "plan fails scale lint:\n" + "\n".join(f"  {f}" for f in bad))


def explain_report(df: DataFrame) -> str:
    """Human-readable one-stop summary: stats, per-scan pushdown
    evidence, and lint findings — the PLANS.md audit for one frame."""
    s = plan_stats(df)
    lines = [
        f"exchanges={s['exchanges']} "
        f"(single-partition={s['single_partition_exchanges']}) "
        f"broadcast_joins={s['broadcast_joins']} "
        f"sort_merge_joins={s['sort_merge_joins']} "
        f"cartesian={s['cartesian_products']}",
        f"hash_aggregates={s['hash_aggregates']} "
        f"partial_agg={s['has_partial_agg']} "
        f"take_ordered={s['take_ordered']} "
        f"codegen_spans={s['codegen_spans']}",
        f"row_udfs={s['row_udfs']} arrow_udfs={s['arrow_udfs']}",
    ]
    for sc in s["scans"]:
        lines.append(
            f"scan {sc['format']}: {len(sc['columns'])} col(s) "
            f"[{', '.join(sc['columns'][:8])}"
            f"{', ...' if len(sc['columns']) > 8 else ''}] "
            f"pushed_filters={sc['pushed_filters']}")
    fs = lint(df)
    lines += [str(f) for f in fs] if fs else ["lint: clean"]
    return "\n".join(lines)
