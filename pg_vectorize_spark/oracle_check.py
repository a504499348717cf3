"""Shared oracle-comparison harness: runs queries() vs oracle_sql() (DuckDB)
and compares row count, columns, and values — the same shape as the driver's
correctness gate. Used by scripts/check_oracle.py and the pytest suite."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        df[c] = df[c].map(norm_cell)
    return df.sort_values(
        by=list(df.columns), key=lambda s: s.map(lambda v: (v is None, str(v)))
    ).reset_index(drop=True)


@dataclass
class CheckResult:
    name: str
    rows: int = 0
    seconds: float = 0.0
    problems: list[str] = field(default_factory=list)
    rows_only: bool = False

    @property
    def ok(self) -> bool:
        return not self.problems


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if list(spark_df.columns) != list(oracle_df.columns):
        problems.append(
            f"columns differ: spark={list(spark_df.columns)} "
            f"oracle={list(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(
            f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}"
        )
        return problems
    # dtype strictness: int-width or numeric-kind mismatches mean the Spark
    # and oracle schemas disagree (e.g. row_number INT vs BIGINT) — flag
    # them even though value comparison would coerce
    for c in spark_df.columns:
        a_dt, b_dt = spark_df[c].dtype, oracle_df[c].dtype
        if a_dt != b_dt:
            # allow object-vs-object containers and NaN-induced float64
            # upcasts of integer columns with NULLs
            a_k = getattr(a_dt, "kind", "O")
            b_k = getattr(b_dt, "kind", "O")
            benign = (
                # NaN-induced float64 upcast of a nullable int column
                {a_k, b_k} <= {"f", "i", "O"}
                and (spark_df[c].isna().any() or oracle_df[c].isna().any())
            ) or (
                # datetime resolution artifact: Spark->pandas is always ns,
                # DuckDB->pandas is us; engine types are both TIMESTAMP(us)
                a_k == "M" and b_k == "M"
            )
            if not benign:
                problems.append(
                    f"col {c!r}: dtype mismatch spark={a_dt} oracle={b_dt}"
                )
    a = _sorted_frame(spark_df)
    b = _sorted_frame(oracle_df)
    for c in a.columns:
        mism = 0
        maxdev = 0.0
        example = None
        for i, (x, y) in enumerate(zip(a[c], b[c])):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    mism += 1
                    maxdev = max(maxdev, abs(x - y))
                    if example is None:
                        example = (i, x, y)
            elif isinstance(x, tuple) and isinstance(y, tuple):
                if x != y:
                    if len(x) == len(y):
                        try:
                            dev = max(
                                abs(float(p) - float(q)) for p, q in zip(x, y)
                            )
                        except (TypeError, ValueError):
                            dev = float("inf")
                    else:
                        dev = float("inf")
                    mism += 1
                    maxdev = max(maxdev, dev)
                    if example is None:
                        example = (i, "array", "array")
            elif x != y:
                mism += 1
                if example is None:
                    example = (i, x, y)
        if mism:
            problems.append(
                f"col {c!r}: {mism} mismatched cells, max float dev "
                f"{maxdev:.3e}, example row {example}"
            )
    return problems


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_checks(spark, sf_dir: str, names: list[str] | None = None) -> list[CheckResult]:
    import time

    import __spark_entry__ as entrymod

    con = duckdb_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: list[CheckResult] = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        res = CheckResult(name)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            res.rows = len(sdf)
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            res.problems.append(f"spark error: {type(e).__name__}: {e}")
            results.append(res)
            continue
        if name not in oracles:
            res.rows_only = True
            res.seconds = time.time() - t0
            results.append(res)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            res.problems.append(f"oracle error: {type(e).__name__}: {e}")
            results.append(res)
            continue
        res.problems = compare_frames(sdf, odf)
        res.seconds = time.time() - t0
        results.append(res)
    return results
