"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs each ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin
on the same sf dir, normalizes both frames (column order by name, row order
by all columns, dtype kinds) and compares values exactly for ints/strings
and with tolerance for floats — per the protocol in BASELINE.md.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import numpy as np

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
            rtol: float = 1e-9, atol: float = 1e-12) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: {list(a.columns)} vs {list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: {len(a)} vs {len(b)}"]
    # sort rows by the non-float columns first, then float cols rounded —
    # float jitter must not change sort order.
    keys = [c for c in a.columns if not pd.api.types.is_float_dtype(a[c])]
    fkeys = [c for c in a.columns if pd.api.types.is_float_dtype(a[c])]
    for df in (a, b):
        for c in fkeys:
            df["_r_" + c] = df[c].round(6)
    order = keys + ["_r_" + c for c in fkeys]
    a = a.sort_values(order, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(order, kind="mergesort").reset_index(drop=True)
    for c in list(spark_pdf.columns):
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca):
            na, nb = ca.isna(), cb.isna()
            if not na.equals(nb):
                problems.append(f"{c}: null pattern differs ({int(na.sum())} vs {int(nb.sum())})")
                continue
            va, vb = ca[~na].to_numpy(), cb[~nb].to_numpy()
            if not np.allclose(va, vb, rtol=rtol, atol=atol, equal_nan=True):
                bad = np.where(~np.isclose(va, vb, rtol=rtol, atol=atol))[0][:3]
                problems.append(f"{c}: float mismatch at rows {bad.tolist()}, "
                                f"e.g. {va[bad[0]]} vs {vb[bad[0]]}" if len(bad) else
                                f"{c}: allclose False")
        else:
            if not ca.equals(cb):
                bad = (ca != cb) & ~(ca.isna() & cb.isna())
                idx = list(bad[bad].index[:3])
                problems.append(f"{c}: value mismatch at rows {idx}, "
                                f"e.g. {ca[idx[0]]!r} vs {cb[idx[0]]!r}" if idx else
                                f"{c}: equals False (dtype {ca.dtype} vs {cb.dtype})")
    return problems


def run_gate(spark, sf_dir: str, only: list[str] | None = None,
             rtol: float = 1e-9) -> dict[str, str]:
    """Run every queries() entry vs its oracle. Returns {name: 'OK'/'OK(rows-only)'/error}."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    con = duck_connection(sf_dir)
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            # free operator-pinned intermediates (the documented caller
            # contract). Leaked EXECUTED cache entries also poison later
            # plan-shape tests: the CacheManager substitutes them by plan
            # equality, and an executed InMemoryRelation prints nested
            # AQE "== Final Plan ==" dumps that break text-walking
            # plan lint (r8 finding).
            from pandas_plus_spark.util import release_cached
            release_cached(sdf)
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK FAIL: {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in sqls:
            results[name] = f"OK(rows-only, {len(spdf)} rows)" if len(spdf) >= 0 else "EMPTY"
            continue
        try:
            opdf = con.sql(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE FAIL: {type(e).__name__}: {str(e)[:200]}"
            continue
        problems = compare(spdf, opdf, rtol=rtol)
        if problems:
            results[name] = "MISMATCH: " + "; ".join(problems[:3])
            continue
        # exact-width dtype check: values match after normalization, but a
        # strict driver-side schema comparison could still flag e.g.
        # int32-vs-int64 — surface as a warning, not a failure.
        width_diffs = [
            f"{c}: {spdf[c].dtype} vs {opdf[c].dtype}"
            for c in spdf.columns
            if c in opdf.columns and str(spdf[c].dtype) != str(opdf[c].dtype)
        ]
        results[name] = ("OK" if not width_diffs
                         else "OK (dtype-width: " + "; ".join(width_diffs[:3]) + ")")
    return results
