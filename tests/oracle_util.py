"""Self-check comparator mimicking the driver's DuckDB oracle gate:
row-count + schema + order-insensitive value comparison on sorted column
names. Used in tests so oracle mismatches surface before the driver runs."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we allow tiny fp jitter in self-checks
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str, float_tol: float = 0.0) -> None:
    """Assert spark result == duckdb result (order-insensitive, columns
    sorted by name — like the driver's hash)."""
    cols = sorted(spark_df.columns)
    s_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]

    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    assert sorted(d_cols) == cols, f"columns differ: spark={cols} duck={sorted(d_cols)}"
    idx = [d_cols.index(c) for c in cols]
    d_rows = [tuple(_norm(row[i]) for i in idx) for row in d.fetchall()]

    assert len(s_rows) == len(d_rows), f"rowcount spark={len(s_rows)} duck={len(d_rows)}"
    if float_tol == 0.0:
        assert sorted(s_rows, key=repr) == sorted(d_rows, key=repr)
    else:
        for a, b in zip(sorted(s_rows, key=repr), sorted(d_rows, key=repr)):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    assert abs(x - y) <= float_tol, (a, b)
                else:
                    assert x == y, (a, b)
