"""Local stand-in for the driver's DuckDB oracle compare: run the Spark
query and the oracle SQL on the same sf dir, sort columns by name,
canonicalize values, compare as multisets."""

from __future__ import annotations

import decimal
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
    # Type-TAGGED canonicalization: the driver's value hash is typed, so
    # 4 (bigint) and 4.0 (float64 from an un-cast DuckDB HUGEINT) must NOT
    # compare equal here either.  Python's `4 == 4.0` hid exactly that
    # drift for three rounds (line_quality_filter, r10-r12).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", float(v))
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon(x) for x in v))
    return ("s", str(v))


def _rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    out = []
    for rec in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(
            _canon(v.item() if hasattr(v, "item") and not hasattr(v, "__len__") else v)
            for v in rec
        ))
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
