"""Local stand-in for the driver's DuckDB oracle compare: run the Spark
query and the oracle SQL on the same sf dir, sort columns by name,
canonicalize values, compare as multisets."""

from __future__ import annotations

import math

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    out = []
    for rec in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v.item() if hasattr(v, "item") else v) for v in rec))
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, name: str = "") -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if sp.shape[0] != du.shape[0]:
        return False, f"{name}: row count {sp.shape[0]} vs {du.shape[0]}"
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"{name}: columns {sorted(sp.columns)} vs {sorted(du.columns)}"
    rs, rd = _rows(sp), _rows(du)
    if rs != rd:
        diffs = [(a, b) for a, b in zip(rs, rd) if a != b][:3]
        return False, f"{name}: value mismatch, first diffs: {diffs}"
    return True, f"{name}: OK ({sp.shape[0]} rows)"
