"""Cross-engine result comparison — the pre-flight copy of the driver's
oracle check (SURVEY.md §5.1).

Normalization before hashing/comparison:
  * columns sorted by name (the driver does the same);
  * floats compared EXACTLY (strict mode, the default) — the driver's
    value hash does not round, so any summation-order drift must be
    fixed in the query (decimal arithmetic / ULP-safe rounding), never
    masked here.  Set SPARK_GRAFT_LOOSE_PARITY=1 to fall back to
    9-significant-digit rounding while debugging a drift source;
  * timestamps truncated to microseconds, naive;
  * arrays compared element-wise with the same rules;
  * row multisets compared order-insensitively.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import numpy as np

STRICT_FLOATS = os.environ.get("SPARK_GRAFT_LOOSE_PARITY", "") != "1"


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            return 0.0
        return f if STRICT_FLOATS else float(f"{f:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_value(x) for x in v)
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        d = v.asDict()
        return tuple((k, norm_value(d[k])) for k in sorted(d))
    if isinstance(v, dict):
        return tuple((k, norm_value(v[k])) for k in sorted(v))
    return v


def normalize_result(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


# DuckDB logical type -> Spark simpleString types the driver should
# treat as schema-equal (the driver compares schemas; int-width or
# date/timestamp drift is a real failure mode the value-hash normalizer
# would otherwise mask).
_TYPE_COMPAT = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
    "DOUBLE[]": {"array<double>"},
    "BIGINT[]": {"array<bigint>"},
    "VARCHAR[]": {"array<string>"},
}


def assert_type_parity(df, con, sql: str, key: str = "?"):
    stypes = dict(df.dtypes)
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    for c, dt in zip(rel.columns, [str(t) for t in rel.types]):
        ok = stypes.get(c) in _TYPE_COMPAT.get(dt, set())
        assert ok, f"[{key}] dtype mismatch on {c}: spark={stypes.get(c)} duck={dt}"


def assert_parity(df, con, sql: str, key: str = "?"):
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"[{key}] column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert_type_parity(df, con, sql, key)
    assert len(s_rows) == len(d_rows), (
        f"[{key}] row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = normalize_result(s_cols, s_rows)
    dn = normalize_result(d_cols, d_rows)
    if sn != dn:
        dset, sset = set(dn), set(sn)
        diff_s = [r for r in sn if r not in dset][:5]
        diff_d = [r for r in dn if r not in sset][:5]
        raise AssertionError(
            f"[{key}] value mismatch ({len(sn)} rows)\n"
            f"  spark-only (≤5): {diff_s}\n  duck-only (≤5): {diff_d}"
        )
