"""Link-graph analytics: pagerank (float + exact integer mass twin),
degree_stats, lineage truncation across iterations."""

import pytest

from pyspark.sql import functions as F

from pandas_plus_spark.operators import graph as G
from pandas_plus_spark.util import release_cached

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]


def py_pagerank(edges, n_iters, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    r = dict.fromkeys(nodes, 1.0 / n)
    for _ in range(n_iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nr = dict.fromkeys(nodes, (1 - d) / n)
        for s, ts in out.items():
            for t in ts:
                nr[t] += d * r[s] / len(ts)
        for v in nodes:
            nr[v] += d * dang / n
        r = nr
    return r


def py_pagerank_int(edges, n_iters, S=G.PAGERANK_MASS):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    m = dict.fromkeys(nodes, S // n)
    base = (S - S * 85 // 100) // n
    for _ in range(n_iters):
        dang = sum(m[v] for v in nodes if v not in out)
        nm = dict.fromkeys(nodes, 0)
        for s, ts in out.items():
            for t in ts:
                nm[t] += m[s] // len(ts)
        m = {v: base + (nm[v] + dang // n) * 85 // 100 for v in nodes}
    return m


class TestPageRank:

    def _edges_df(self, spark, edges=EDGES):
        import pandas as pd
        return spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"]))

    def test_float_matches_reference(self, spark):
        out = G.pagerank(self._edges_df(spark), n_iters=10)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        ref = py_pagerank(EDGES, 10)
        assert got.keys() == ref.keys()
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved

    def test_exact_mass_bit_identical(self, spark):
        out = G.pagerank(self._edges_df(spark), n_iters=4,
                         exact_mass=True)
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        assert got == py_pagerank_int(EDGES, 4)

    def test_duplicate_edges_count_once(self, spark):
        out = G.pagerank(self._edges_df(spark, EDGES + EDGES[:3]),
                         n_iters=4, exact_mass=True)
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        assert got == py_pagerank_int(EDGES, 4)

    def test_dangling_mass_redistributed(self, spark):
        # node 1 is a pure sink: without dangling handling its inflow
        # leaks and total float mass decays below 1
        out = G.pagerank(self._edges_df(spark, [(0, 1), (2, 1), (2, 0)]),
                         n_iters=8)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        ref = py_pagerank([(0, 1), (2, 1), (2, 0)], 8)
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_many_iterations_lineage_bounded(self, spark):
        # the rank frame feeds two consumers per round — without the
        # eager localCheckpoint the plan doubles per iteration and 12
        # rounds OOM the driver on plan-string generation (r12 finding)
        out = G.pagerank(self._edges_df(spark), n_iters=12)
        assert abs(sum(r.rank for r in out.collect()) - 1.0) < 1e-9
        release_cached(out)

    def test_empty_and_validation(self, spark):
        empty = self._edges_df(spark).where(F.lit(False))
        out = G.pagerank(empty, n_iters=2)
        assert out.count() == 0
        release_cached(out)
        with pytest.raises(ValueError):
            G.pagerank(self._edges_df(spark), exact_mass=True,
                       damping=0.9)

    def test_random_graphs_match_reference(self, spark):
        """Property sweep: seeded random digraphs (dangling nodes,
        multi-edges, self-loop-free) — float pagerank must match the
        pure-python reference to 1e-12 and the integer twin bit-exactly."""
        import numpy as np
        import pandas as pd
        rng = np.random.RandomState(17)
        for case in range(4):
            n = 12 + 4 * case
            m = 3 * n
            edges = set()
            while len(edges) < m:
                a, b = int(rng.randint(n)), int(rng.randint(n))
                if a != b:
                    edges.add((a, b))
            # knock out some sources entirely -> dangling nodes
            drop = {int(x) for x in rng.choice(n, 3, replace=False)}
            edges = sorted((a, b) for a, b in edges if a not in drop)
            df = spark.createDataFrame(
                pd.DataFrame(edges, columns=["src", "dst"]))
            out = G.pagerank(df, n_iters=6)
            got = {r.node: r.rank for r in out.collect()}
            release_cached(out)
            ref = py_pagerank(edges, 6)
            assert got.keys() == ref.keys(), case
            assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12, case
            out2 = G.pagerank(df, n_iters=3, exact_mass=True)
            got2 = {r.node: r.mass for r in out2.collect()}
            release_cached(out2)
            assert got2 == py_pagerank_int(edges, 3), case

    def test_tol_early_exit(self, spark, monkeypatch):
        """tol= stops the loop at the first iteration whose max |Δrank|
        drops below tol (verified by counting delta aggregations), and
        the early-exited result matches the python reference run for
        exactly that many iterations."""
        calls = []
        real = G._max_abs_delta

        def spy(prev, cur, col):
            d = real(prev, cur, col)
            calls.append(d)
            return d

        monkeypatch.setattr(G, "_max_abs_delta", spy)
        out = G.pagerank(self._edges_df(spark), n_iters=50, tol=1e-4)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        iters = len(calls)
        assert iters < 50                       # the cap was not hit
        assert calls[-1] < 1e-4                 # exit condition held
        assert all(d >= 1e-4 for d in calls[:-1])
        ref = py_pagerank(EDGES, iters)
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12

    def test_tol_early_exit_exact_mass(self, spark, monkeypatch):
        """In exact_mass units the exit compares integer deltas against
        tol * PAGERANK_MASS, so the stop iteration is bit-deterministic;
        the result equals the integer reference at that iteration."""
        calls = []
        real = G._max_abs_delta
        monkeypatch.setattr(
            G, "_max_abs_delta",
            lambda p, c, col: calls.append(real(p, c, col)) or calls[-1])
        out = G.pagerank(self._edges_df(spark), n_iters=50,
                         exact_mass=True, tol=1e-4)
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        iters = len(calls)
        assert 0 < iters < 50
        assert calls[-1] < 1e-4 * G.PAGERANK_MASS
        assert got == py_pagerank_int(EDGES, iters)

    def test_degree_stats(self, spark):
        got = {r.node: (r.out_degree, r.in_degree)
               for r in G.degree_stats(self._edges_df(spark)).collect()}
        assert got == {0: (2, 1), 1: (1, 1), 2: (1, 3), 3: (2, 0),
                       4: (0, 1)}


def py_ppr(edges, seeds, n_iters, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    wtot = sum(w for v, w in seeds.items() if v in set(nodes))
    tele = {v: seeds.get(v, 0.0) / wtot for v in nodes}
    r = dict(tele)
    for _ in range(n_iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nr = {v: (1 - d) * tele[v] + d * dang * tele[v] for v in nodes}
        for s, ts in out.items():
            for t in ts:
                nr[t] += d * r[s] / len(ts)
        r = nr
    return r


def py_ppr_int(edges, seeds, n_iters, S=G.PAGERANK_MASS):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    wtot = sum(w for v, w in seeds.items() if v in set(nodes))
    tele = {v: S * seeds.get(v, 0) // wtot for v in nodes}
    m = dict(tele)
    for _ in range(n_iters):
        dang = sum(m[v] for v in nodes if v not in out)
        nm = dict.fromkeys(nodes, 0)
        for s, ts in out.items():
            for t in ts:
                nm[t] += m[s] // len(ts)
        m = {v: tele[v] * 15 // 100
             + (nm[v] + tele[v] * dang // S) * 85 // 100 for v in nodes}
    return m


class TestPersonalizedPageRank:

    def _dfs(self, spark, edges, seeds):
        import pandas as pd
        e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
        s = spark.createDataFrame(
            pd.DataFrame(list(seeds.items()), columns=["node", "weight"]))
        return e, s

    def test_float_matches_reference(self, spark):
        seeds = {0: 2.0, 3: 1.0}
        e, s = self._dfs(spark, EDGES, seeds)
        out = G.pagerank(e, n_iters=8, personalize=s)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        ref = py_ppr(EDGES, seeds, 8)
        assert got.keys() == ref.keys()
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9   # mass conserved

    def test_exact_mass_bit_identical(self, spark):
        seeds = {0: 2, 3: 1}
        e, s = self._dfs(spark, EDGES, seeds)
        out = G.pagerank(e, n_iters=4, exact_mass=True, personalize=s)
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        assert got == py_ppr_int(EDGES, seeds, 4)

    def test_unknown_seed_ignored_and_validation(self, spark):
        seeds = {0: 1.0, 999: 5.0}          # 999 not in the graph
        e, s = self._dfs(spark, EDGES, seeds)
        out = G.pagerank(e, n_iters=3, personalize=s)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        ref = py_ppr(EDGES, {0: 1.0}, 3)
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12
        import pytest as _pt
        e2, s2 = self._dfs(spark, EDGES, {999: 1.0})
        with _pt.raises(ValueError, match="seed"):
            G.pagerank(e2, n_iters=2, personalize=s2)
        e3, s3 = self._dfs(spark, EDGES, {0: 2 * 10 ** 6})
        with _pt.raises(ValueError, match="10"):
            G.pagerank(e3, n_iters=2, exact_mass=True, personalize=s3)

    def test_trust_flows_from_seed(self, spark):
        # chain 0 -> 1 -> 2 and isolated pair 3 -> 4: seeding node 0
        # must rank the chain above the unseeded pair
        edges = [(0, 1), (1, 2), (3, 4)]
        e, s = self._dfs(spark, edges, {0: 1.0})
        out = G.pagerank(e, n_iters=12, personalize=s)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        assert got[0] > got[3] and got[1] > got[4] and got[2] > got[4]
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_random_graphs_match_reference(self, spark):
        import numpy as np
        import pandas as pd
        rng = np.random.RandomState(23)
        for case in range(3):
            n = 14 + 4 * case
            edges = set()
            while len(edges) < 3 * n:
                a, b = int(rng.randint(n)), int(rng.randint(n))
                if a != b:
                    edges.add((a, b))
            drop = {int(x) for x in rng.choice(n, 3, replace=False)}
            edges = sorted((a, b) for a, b in edges if a not in drop)
            seeds = {int(v): int(rng.randint(1, 9))
                     for v in rng.choice(n, 4, replace=False)}
            e = spark.createDataFrame(
                pd.DataFrame(edges, columns=["src", "dst"]))
            s = spark.createDataFrame(
                pd.DataFrame(list(seeds.items()),
                             columns=["node", "weight"]))
            out = G.pagerank(e, n_iters=5, personalize=s)
            got = {r.node: r.rank for r in out.collect()}
            release_cached(out)
            ref = py_ppr(edges, {k: float(v) for k, v in seeds.items()}, 5)
            assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12, case
            out2 = G.pagerank(e, n_iters=3, exact_mass=True, personalize=s)
            got2 = {r.node: r.mass for r in out2.collect()}
            release_cached(out2)
            assert got2 == py_ppr_int(edges, seeds, 3), case


class TestWeightedPageRank:

    def _py_w(self, wedges, n_iters, d=0.85):
        agg = {}
        for s, t, w in wedges:
            agg[(s, t)] = agg.get((s, t), 0) + w
        nodes = sorted({x for s, t in agg for x in (s, t)})
        n = len(nodes)
        out = {}
        for (s, t), w in agg.items():
            out.setdefault(s, {})[t] = w
        W = {s: sum(ts.values()) for s, ts in out.items()}
        r = dict.fromkeys(nodes, 1.0 / n)
        for _ in range(n_iters):
            dang = sum(r[v] for v in nodes if v not in out)
            nr = dict.fromkeys(nodes, (1 - d) / n)
            for s, ts in out.items():
                for t, w in ts.items():
                    nr[t] += d * r[s] * w / W[s]
            for v in nodes:
                nr[v] += d * dang / n
            r = nr
        return r

    def _py_w_int(self, wedges, n_iters, S=G.PAGERANK_MASS):
        agg = {}
        for s, t, w in wedges:
            agg[(s, t)] = agg.get((s, t), 0) + w
        nodes = sorted({x for s, t in agg for x in (s, t)})
        n = len(nodes)
        out = {}
        for (s, t), w in agg.items():
            out.setdefault(s, {})[t] = w
        W = {s: sum(ts.values()) for s, ts in out.items()}
        m = dict.fromkeys(nodes, S // n)
        base = (S - S * 85 // 100) // n
        for _ in range(n_iters):
            dang = sum(m[v] for v in nodes if v not in out)
            nm = dict.fromkeys(nodes, 0)
            for s, ts in out.items():
                for t, w in ts.items():
                    nm[t] += m[s] * w // W[s]
            m = {v: base + (nm[v] + dang // n) * 85 // 100 for v in nodes}
        return m

    WEDGES = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 2, 1),
              (3, 4, 4), (0, 1, 2)]   # (0,1) duplicated: weights sum

    def _df(self, spark, wedges=None):
        import pandas as pd
        return spark.createDataFrame(pd.DataFrame(
            wedges or self.WEDGES, columns=["src", "dst", "w"]))

    def test_float_matches_reference(self, spark):
        out = G.pagerank(self._df(spark), n_iters=8, weight_col="w")
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        ref = self._py_w(self.WEDGES, 8)
        assert got.keys() == ref.keys()
        assert max(abs(got[v] - ref[v]) for v in ref) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_exact_mass_bit_identical_and_validation(self, spark):
        out = G.pagerank(self._df(spark), n_iters=4, exact_mass=True,
                         weight_col="w")
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        assert got == self._py_w_int(self.WEDGES, 4)
        import pytest as _pt
        bad = self._df(spark, [(0, 1, 2 * 10 ** 6), (1, 0, 1)])
        with _pt.raises(ValueError, match="10"):
            G.pagerank(bad, n_iters=2, exact_mass=True, weight_col="w")

    def test_exact_mass_fractional_weight_raises(self, spark):
        # r14 advisory: integrality is validated on the RAW column —
        # a 1.5 weight must raise, never silently truncate to 1
        import pandas as pd
        import pytest as _pt
        bad = spark.createDataFrame(pd.DataFrame(
            [(0, 1, 1.5), (1, 0, 2.0)], columns=["src", "dst", "w"]))
        with _pt.raises(ValueError, match="integer"):
            G.pagerank(bad, n_iters=2, exact_mass=True, weight_col="w")

    def test_float_nonpositive_weights_dropped(self, spark):
        # r14 advisory: zero/negative/NaN weights are dropped at
        # cleaning time, exactly like NULL endpoints — no
        # divide-by-zero NaN can propagate, and a node appearing ONLY
        # in dropped edges is not ranked (here node 0 and the dangling
        # sink 3 hang off dropped edges; 3 survives via 3->1)
        import math
        import pandas as pd
        wedges = [(0, 1, 0.0), (0, 2, -3.0), (0, 3, float("nan")),
                  (1, 2, 2.0), (2, 1, 1.0), (3, 1, 4.0)]
        out = G.pagerank(spark.createDataFrame(pd.DataFrame(
            wedges, columns=["src", "dst", "w"])), n_iters=6,
            weight_col="w")
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        assert set(got) == {1, 2, 3}
        assert all(math.isfinite(v) for v in got.values())
        assert abs(sum(got.values()) - 1.0) < 1e-9
        # identical ranks to the graph with the bad edges pre-removed
        ref = G.pagerank(spark.createDataFrame(pd.DataFrame(
            [(1, 2, 2.0), (2, 1, 1.0), (3, 1, 4.0)],
            columns=["src", "dst", "w"])), n_iters=6, weight_col="w")
        gref = {r.node: r.rank for r in ref.collect()}
        release_cached(ref)
        assert got == gref

    def test_exact_mass_nonpositive_dropped_not_raised(self, spark):
        # r15 advisory: exact_mass validates integrality + cap on the
        # POST-CLEAN weights — NULL/NaN/non-positive rows are DROPPED
        # exactly as in float mode, never raised on, and the result
        # matches the pre-cleaned graph bit-for-bit
        import pandas as pd
        wedges = [(0, 1, 0.0), (0, 2, -3.0), (0, 3, float("nan")),
                  (1, 2, 2.0), (2, 1, 1.0), (3, 1, 4.0)]
        out = G.pagerank(spark.createDataFrame(pd.DataFrame(
            wedges, columns=["src", "dst", "w"])), n_iters=6,
            weight_col="w", exact_mass=True)
        got = {r.node: r.mass for r in out.collect()}
        release_cached(out)
        ref = G.pagerank(spark.createDataFrame(pd.DataFrame(
            [(1, 2, 2.0), (2, 1, 1.0), (3, 1, 4.0)],
            columns=["src", "dst", "w"])), n_iters=6, weight_col="w",
            exact_mass=True)
        gref = {r.node: r.mass for r in ref.collect()}
        release_cached(ref)
        assert got == gref
        # a surviving fractional weight still raises
        import pytest as _pt
        bad = spark.createDataFrame(pd.DataFrame(
            [(0, 1, -1.0), (1, 0, 1.5)], columns=["src", "dst", "w"]))
        with _pt.raises(ValueError, match="integer"):
            G.pagerank(bad, n_iters=2, exact_mass=True, weight_col="w")

    def test_composes_with_personalize(self, spark):
        import pandas as pd
        seeds = spark.createDataFrame(
            pd.DataFrame([(0, 2.0), (3, 1.0)], columns=["node", "weight"]))
        out = G.pagerank(self._df(spark), n_iters=6, weight_col="w",
                         personalize=seeds)
        got = {r.node: r.rank for r in out.collect()}
        release_cached(out)
        # reference: weighted contributions + personalized teleport
        agg = {}
        for s, t, w in self.WEDGES:
            agg[(s, t)] = agg.get((s, t), 0) + w
        nodes = sorted({x for s, t in agg for x in (s, t)})
        out_m = {}
        for (s, t), w in agg.items():
            out_m.setdefault(s, {})[t] = w
        W = {s: sum(ts.values()) for s, ts in out_m.items()}
        tele = {v: {0: 2.0, 3: 1.0}.get(v, 0.0) / 3.0 for v in nodes}
        r = dict(tele)
        d = 0.85
        for _ in range(6):
            dang = sum(r[v] for v in nodes if v not in out_m)
            nr = {v: (1 - d) * tele[v] + d * dang * tele[v] for v in nodes}
            for s, ts in out_m.items():
                for t, w in ts.items():
                    nr[t] += d * r[s] * w / W[s]
            r = nr
        assert max(abs(got[v] - r[v]) for v in nodes) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_uniform_weights_equal_unweighted(self, spark):
        import pandas as pd
        wedges = [(s, t, 1) for s, t in EDGES]
        a = G.pagerank(self._df(spark, wedges), n_iters=5, weight_col="w")
        b = G.pagerank(spark.createDataFrame(
            pd.DataFrame(EDGES, columns=["src", "dst"])), n_iters=5)
        ga = {r.node: r.rank for r in a.collect()}
        gb = {r.node: r.rank for r in b.collect()}
        release_cached(a); release_cached(b)
        assert max(abs(ga[v] - gb[v]) for v in gb) < 1e-12
