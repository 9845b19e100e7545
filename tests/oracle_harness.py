"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Runs each registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value representation. Catch hash mismatches locally before
the driver's t2 gate does.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from watermill_spark.analytics.registry import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Normalize a cell to a hashable, engine-independent representation."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 15 significant digits: a double round-trips 15 digits exactly;
        # digits 16-17 are representation-dependent. Found at sf1: both
        # engines compute the identical DECIMAL aggregate, but CAST(dec AS
        # DOUBLE) lands 1 ULP apart once the value needs >16 significant
        # digits (q01 sum_charge ~4.36e10 with 6 decimals). Equal bits
        # still compare equal; only sub-ULP rendering noise is forgiven.
        return f"{v:.15g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def compare(spark_df, con, sql: str) -> dict:
    """Return a comparison report dict; report['ok'] is the verdict."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    duck = con.execute(sql)
    d_cols = [c[0] for c in duck.description]
    d_rows = duck.fetchall()

    report = {
        "ok": False,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
        "detail": "",
    }
    if sorted(s_cols) != sorted(d_cols):
        report["detail"] = f"column mismatch: {s_cols} vs {d_cols}"
        return report
    if len(s_rows) != len(d_rows):
        report["detail"] = "row count mismatch"
        return report

    # driver compares order-insensitively, columns sorted by name
    order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    s_set = sorted(tuple(repr(_norm(r[i])) for i in order) for r in s_rows)
    d_set = sorted(tuple(repr(_norm(r[i])) for i in d_order) for r in d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        report["detail"] = f"value mismatch, first diffs: {diffs}"
        return report
    report["ok"] = True
    return report
