"""Driver-contract conformance: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet, compare row count, column
names, and (order-insensitively) values — a local mirror of the grading
harness (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import importlib.util
import os
from decimal import Decimal

import duckdb
import pytest

SF_DIR = os.environ.get("MCS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    # None / NaN / NaT all canonicalize to NULL — the driver's rule
    # (tests/check_driver_parity.py:35): pandas materializes a DuckDB
    # NULL boolean as float NaN but a Spark one as None
    if v is None or v != v:
        return "NULL"
    if isinstance(v, Decimal):
        return f"{float(v):.6f}"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    try:
        import numpy as np

        if isinstance(v, (np.floating,)):
            return f"{float(v):.6f}"
        if isinstance(v, (np.bool_,)):
            return str(bool(v))
        if isinstance(v, (np.integer,)):
            return str(int(v))
    except Exception:
        pass
    return str(v)


def _norm(pdf):
    cols = sorted(pdf.columns, key=str.lower)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    spdf = sdf.toPandas()
    if sql is None:
        assert len(spdf) >= 0  # rows-only check, mirrors the driver
        return
    dpdf = duck.sql(sql).df()
    s_cols, s_rows = _norm(spdf)
    d_cols, d_rows = _norm(dpdf)
    assert [c.lower() for c in s_cols] == [c.lower() for c in d_cols], (
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mism = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
