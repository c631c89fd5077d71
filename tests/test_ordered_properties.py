"""Property-based hardening for the few-huge-groups scale family:
hypothesis-generated frames (random group labels incl. NULL, random
null patterns, random partition counts) must match the window forms
exactly. Complements the fixture matrices in test_global_ordered.py
with shapes nobody thought to write down."""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.window import Window

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),
        st.one_of(st.none(),
                  st.floats(allow_nan=False, allow_infinity=False,
                            width=32, min_value=-1e6, max_value=1e6))),
    min_size=0, max_size=120)
NPART = st.sampled_from([1, 2, 7, 32])

SET = settings(max_examples=6, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "rid long, g string, v double")


class TestOrderedProperties:
    @given(rows=ROWS, n=NPART)
    @SET
    def test_cumsum_property(self, spark, rows, n):
        from pandas_plus_spark.functions.ordered import grouped_cumsum
        df = _frame(spark, rows)
        got = {r.rid: r.c for r in grouped_cumsum(
            df, ["g"], ["rid"], "v", out="c", num_partitions=n).collect()}
        w = (Window.partitionBy("g").orderBy("rid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = {r.rid: r.c for r in
                df.withColumn("c", F.sum("v").over(w)).collect()}
        assert set(got) == set(want)
        for k in want:
            if want[k] is None:
                assert got[k] is None, k
            else:
                assert got[k] == pytest.approx(want[k], rel=1e-9,
                                               abs=1e-9), k

    @given(rows=ROWS, n=NPART, backward=st.booleans())
    @SET
    def test_fill_property(self, spark, rows, n, backward):
        from pandas_plus_spark.functions.ordered import grouped_ffill
        df = _frame(spark, rows)
        got = {r.rid: r.f for r in grouped_ffill(
            df, ["g"], ["rid"], "v", out="f", num_partitions=n,
            backward=backward).collect()}
        if backward:
            w = (Window.partitionBy("g").orderBy("rid")
                 .rowsBetween(Window.currentRow, Window.unboundedFollowing))
            ref = F.first("v", ignorenulls=True).over(w)
        else:
            w = (Window.partitionBy("g").orderBy("rid")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            ref = F.last("v", ignorenulls=True).over(w)
        want = {r.rid: r.f for r in df.withColumn("f", ref).collect()}
        assert got == want

    @given(rows=ROWS, n=NPART, window=st.sampled_from([1, 2, 5, 40]))
    @SET
    def test_rolling_property(self, spark, rows, n, window):
        from pandas_plus_spark.functions.ordered import grouped_rolling_sum
        df = _frame(spark, rows)
        got = {r.rid: r.r for r in grouped_rolling_sum(
            df, ["g"], ["rid"], "v", window, min_periods=1, out="r",
            num_partitions=n).collect()}
        w = (Window.partitionBy("g").orderBy("rid")
             .rowsBetween(-(window - 1), Window.currentRow))
        want = {r.rid: r.r for r in df.withColumn(
            "r", F.when(F.count("v").over(w) >= 1,
                        F.sum("v").over(w))).collect()}
        assert set(got) == set(want)
        for k in want:
            if want[k] is None:
                assert got[k] is None, k
            else:
                assert got[k] == pytest.approx(want[k], rel=1e-9,
                                               abs=1e-9), k

    @given(rows=ROWS, n=NPART,
           method=st.sampled_from(["average", "min", "max", "dense"]))
    @SET
    def test_rank_property(self, spark, rows, n, method):
        from pandas_plus_spark.functions.ordered import grouped_rank
        from pandas_plus_spark import GroupBy
        df = _frame(spark, rows)
        got = {r.rid: r.r for r in grouped_rank(
            df, ["g"], ["rid"], "v", method=method, out="r",
            num_partitions=n).collect()}
        want = {r.rid: r.v_rank for r in GroupBy(
            df, "g", order_by="rid", dropna=False).rank(
            "v", method=method).collect()}
        assert got == want
