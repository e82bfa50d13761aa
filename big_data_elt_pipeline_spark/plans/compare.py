"""Local differential-oracle harness.

Mimics the driver's correctness gate (``__spark_entry__.py`` contract): run
the Spark plan and the DuckDB oracle SQL side-by-side, compare row count,
column names, and values. We hold ourselves to EXACT equality (bit-identical
doubles) — if strict equality passes here, any reasonable value-hash passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_problems(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Engine-level type mismatches (e.g. DuckDB HUGEINT vs Spark BIGINT).

    The driver's value hash is TYPE-SENSITIVE: an int128 sum on the oracle
    side hash-mismatches a bit-identical int64 on the Spark side. Pandas
    normalization used to mask exactly that (round-1 events_props /
    events_daily_share), so compare raw dtype kind+width BEFORE normalizing.
    """
    problems: list[str] = []
    for c in spark_pdf.columns:
        if c not in duck_pdf.columns:
            continue
        sk, dk = spark_pdf[c].dtype, duck_pdf[c].dtype
        s_num = sk.kind in "iuf"
        d_num = dk.kind in "iuf"
        if (s_num or d_num) and (sk.kind, sk.itemsize) != (dk.kind, dk.itemsize):
            problems.append(f"column {c}: dtype differs — spark={sk} duck={dk}")
    return problems


def diff_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    problems.extend(_dtype_problems(spark_pdf, duck_pdf))
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(float).values
            dv = dv.astype(float).values
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = (sv == dv) | both_nan
            if not eq.all():
                bad = np.where(~eq)[0][:3]
                detail = "; ".join(
                    f"row{i}: spark={sv[i]!r} duck={dv[i]!r} (Δ={abs(sv[i]-dv[i]):.3e})" for i in bad
                )
                problems.append(f"column {c}: {int((~eq).sum())}/{len(eq)} values differ — {detail}")
        else:
            eq = (sv.astype(str) == dv.astype(str)) | (sv.isna() & dv.isna())
            if not eq.all():
                bad = np.where(~eq.values)[0][:3]
                detail = "; ".join(f"row{i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}" for i in bad)
                problems.append(f"column {c}: {int((~eq).sum())}/{len(eq)} values differ — {detail}")
    return problems


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the driver's pre-registered table views."""
    import duckdb

    from big_data_elt_pipeline_spark.sources.tpch import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
