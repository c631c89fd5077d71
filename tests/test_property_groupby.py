"""Property-based aggregation parity vs pandas (hypothesis).

The reference's own test strategy compares kernels against pandas on random
frames (SURVEY §5); hypothesis drives the same comparison here with
adversarial shapes: empty frames, all-null groups, single-row groups,
duplicate values. Null semantics pinned: an all-null group aggregates to
NULL (pandas needs min_count=1 to agree on sum), counts are 0.
"""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandas_plus_spark import GroupBy

KEYS = st.integers(min_value=0, max_value=4)
VALS = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    st.just(0.0),
    st.just(-1.5),
)
ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=25)


def _approx_eq(a, b):
    if a is None and (b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    if a is None or b is None:
        return False
    if isinstance(b, float) and math.isnan(b):
        return a is None
    return a == pytest.approx(b, rel=1e-9, abs=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_agg_surface_matches_pandas(spark, rows):
    sdf = spark.createDataFrame(rows, "k long, v double")
    out = GroupBy(sdf, "k").agg({
        "s": ("sum", "v"), "m": ("mean", "v"),
        "mn": ("min", "v"), "mx": ("max", "v"),
        "c": ("count", "v"), "n": ("nunique", "v"),
        "v1": ("var", "v"),
    })
    got = {r["k"]: r for r in out.collect()}

    pdf = pd.DataFrame(rows, columns=["k", "v"], dtype=object)
    pdf["v"] = pdf["v"].astype(float)
    grouped = pdf.groupby("k")["v"]
    exp = pd.DataFrame({
        "s": grouped.apply(lambda s: s.sum(min_count=1)),
        "m": grouped.mean(),
        "mn": grouped.min(),
        "mx": grouped.max(),
        "c": grouped.count(),
        "n": grouped.nunique(),
        "v1": grouped.var(ddof=1),
    })
    assert set(got) == set(exp.index)
    for k, row in exp.iterrows():
        for col in ("s", "m", "mn", "mx", "v1"):
            assert _approx_eq(got[k][col], row[col]), (k, col, got[k][col], row[col])
        assert got[k]["c"] == int(row["c"]), (k, "count")
        assert got[k]["n"] == int(row["n"]), (k, "nunique")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_margins_grand_total_is_global_agg(spark, rows):
    sdf = spark.createDataFrame(rows, "k long, v double")
    out = GroupBy(sdf, "k").agg({"s": ("sum", "v")}, margins=True)
    got = {r["k"]: r["s"] for r in out.collect()}
    vals = [v for _, v in rows if v is not None]
    if not rows:
        assert got == {}
        return
    assert "All" in got
    if vals:
        assert got["All"] == pytest.approx(sum(vals), rel=1e-9, abs=1e-9)
    else:
        assert got["All"] is None


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, mask_mod=st.integers(min_value=2, max_value=3))
def test_mask_equals_prefilter_property(spark, rows, mask_mod):
    import pyspark.sql.functions as F
    rows = [(i, k, v) for i, (k, v) in enumerate(rows)]
    sdf = spark.createDataFrame(rows, "rid long, k long, v double")
    m = F.col("rid") % mask_mod == 0
    got = {r["k"]: r["v"] for r in GroupBy(sdf, "k").sum("v", mask=m).collect()}
    exp = {r["k"]: r["v"] for r in GroupBy(sdf.filter(m), "k").sum("v").collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert _approx_eq(got[k], exp[k]), k


# --------------------------------------------------------------------- #
# round-5 text operators vs pure-Python references
# --------------------------------------------------------------------- #

_WORDS = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4),
    min_size=0, max_size=12)
_DOCS = st.lists(_WORDS, min_size=1, max_size=8)

_POLY_MOD = 1_000_000_007


def _py_poly(s):
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % _POLY_MOD
    return acc


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_DOCS)
def test_classifier_matches_python(spark, docs):
    from pandas_plus_spark.operators import classify

    dim = 32
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in classify.classifier_score(
        sdf, "text", "doc_id", dim=dim).collect()}
    for i, ws in enumerate(docs):
        hs = [_py_poly(w) for w in ws]
        bk = [h % dim for h in hs] + [
            ((hs[j] * classify.NGRAM_COMBINE + hs[j + 1]) % _POLY_MOD) % dim
            for j in range(len(hs) - 1)]
        if not bk:
            assert got[i]["score"] is None
            continue
        wsum = sum(((b * classify.WEIGHT_KNUTH) % classify.WEIGHT_PRIME)
                   / classify.WEIGHT_PRIME - 0.5 for b in bk)
        want = 1.0 / (1.0 + math.exp(-(wsum / len(bk))))
        assert got[i]["n_feats"] == len(bk)
        assert got[i]["score"] == pytest.approx(want, rel=1e-9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_DOCS)
def test_bigram_lm_matches_python(spark, docs):
    from pandas_plus_spark.operators import ranking
    from pandas_plus_spark.util import release_cached

    lam = 0.8
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = ranking.bigram_lm_score(sdf, "doc_id", "text", lam=lam)
    got = {r["doc_id"]: r for r in out.collect()}
    release_cached(out)

    uni, bi = {}, {}
    for ws in docs:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = float(sum(uni.values()) or 1)
    for i, ws in enumerate(docs):
        pairs = list(zip(ws, ws[1:]))
        assert got[i]["n_bigrams"] == len(pairs)
        if not pairs:
            assert got[i]["xent"] is None
            continue
        lnp = [math.log(lam * (bi[(a, b)] / uni[a])
                        + (1 - lam) * (uni[b] / total)) for a, b in pairs]
        assert got[i]["xent"] == pytest.approx(-sum(lnp) / len(lnp), rel=1e-9)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, n_parts=st.integers(min_value=1, max_value=7))
def test_grouped_cumsum_matches_window(spark, rows, n_parts):
    """grouped_cumsum == the per-group running-sum window on arbitrary
    key/value/null combinations at arbitrary range-partition counts
    (the r7-close grouped two-phase decomposition)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pandas_plus_spark.functions.ordered import grouped_cumsum

    indexed = [(i, k, v) for i, (k, v) in enumerate(rows)]
    sdf = spark.createDataFrame(indexed, "rid long, k long, v double")
    got = {r.rid: r.c for r in grouped_cumsum(
        sdf, ["k"], ["rid"], "v", out="c", num_partitions=n_parts).collect()}
    w = (Window.partitionBy("k").orderBy("rid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r.rid: r.c for r in
            sdf.withColumn("c", F.sum("v").over(w)).collect()}
    assert set(got) == set(want)
    for rid in want:
        assert _approx_eq(got[rid], want[rid]), (rid, got[rid], want[rid])
