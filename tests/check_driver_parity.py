"""Strict local mirror of the driver's correctness compare: run the named
queries() entries on Spark and their oracle_sql() on DuckDB, sort columns by
name, and compare VALUES with strict repr equality (stricter than
test_entry_oracle's 6-digit normalization — catches representation drift the
driver's value-hash would flag).

Usage: python tests/check_driver_parity.py [q05 q06 ...]   (default: all)
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("MCS_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(HERE, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def _cell(v):
    import numpy as np

    if v is None or v != v:  # None / NaN / NaT
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))  # shortest round-trip: bit-exact double check
    return str(v)


def norm(pdf):
    cols = sorted(pdf.columns, key=str.lower)
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return [c.lower() for c in cols], rows


def main() -> int:
    from pyspark.sql import SparkSession

    want = sys.argv[1:]
    names = sorted(entry_mod.queries())
    if want:
        names = [n for n in names if any(n.startswith(w) for w in want)]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = entry_mod.oracle_sql()
    failed = []
    for name in names:
        q = entry_mod.queries()[name]
        sql = oracles.get(name)
        try:
            spdf = q(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {exc}")
            failed.append(name)
            continue
        if sql is None:
            print(f"{name}: no_oracle rows={len(spdf)}")
            continue
        try:
            dpdf = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            failed.append(name)
            continue
        # pandas renders Spark/duckdb types differently for NULLs etc; go via
        # python objects
        s_cols, s_rows = norm(spdf)
        d_cols, d_rows = norm(dpdf)
        if s_cols != d_cols:
            print(f"{name}: COLS {s_cols} vs {d_cols}")
            failed.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"{name}: ROWS {len(s_rows)} vs {len(d_rows)}")
            failed.append(name)
            continue
        mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        if mism:
            print(f"{name}: VALUE MISMATCH x{len(mism)}, first: {mism[0]}")
            failed.append(name)
        else:
            print(f"{name}: OK rows={len(s_rows)}")
    print("FAILED:" if failed else "ALL OK", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
