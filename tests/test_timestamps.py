"""Timestamp-coercion + frequency-inference ladders, ported case-for-case
from the reference's test tables (tests/test_utils.py:32-127 and
tests/test_cftime_utils.py:76-259)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.functions.timestamps import (
    coerce_timestamp_expr,
    freq_bucket_expr,
)

# (time_str, alternative, expected) — the reference's parametrized table
# plus its named granularity cases
COERCE_CASES = [
    ("", "0001-01-01T00:00", datetime(1, 1, 1)),
    ("fx", "0001-01-01T00:00", datetime(1, 1, 1)),
    ("fx", "1999-12-31T00:00", datetime(1999, 12, 31)),
    ("2022", "0001-01-01T00:00", datetime(2022, 1, 1)),
    ("1999", "1980-01-01T00:00", datetime(1999, 1, 1)),
    # alternative supplies the missing DAY component (reference:
    # "202201" with alternative 1999-12-31 -> 2022-01-31)
    ("202201", "1999-12-31T00:00", datetime(2022, 1, 31)),
    ("202203", "1970-01-01T00:00", datetime(2022, 3, 1)),
    # %Y%j day-of-year (2022203 = 22nd July 2022)
    ("2022203", "0001-01-01T00:00", datetime(2022, 7, 22)),
    ("20220131", "0001-01-01T00:00", datetime(2022, 1, 31)),
    ("2022010112", "0001-01-01T00:00", datetime(2022, 1, 1, 12)),
    ("202201011234", "0001-01-01T00:00", datetime(2022, 1, 1, 12, 34)),
    # seconds always dropped
    ("20220101123456", "0001-01-01T00:00", datetime(2022, 1, 1, 12, 34)),
    ("20220131123456", "0001-01-01T00:00", datetime(2022, 1, 31, 12, 34)),
    # T-separated ISO forms reduce to the digit ladder
    ("2022-07-22T12:34", "0001-01-01T00:00", datetime(2022, 7, 22, 12, 34)),
    ("2022-01-31T1234", "0001-01-01T00:00", datetime(2022, 1, 31, 12, 34)),
    ("2022-01-01T", "0001-01-01T00:00", datetime(2022, 1, 1)),
    ("2022-03-04T7", "0001-01-01T00:00", datetime(2022, 3, 4, 7)),
    # unparseable month -> alternative
    ("202213", "1999-12-31T00:00", datetime(1999, 12, 31)),
]


def test_coerce_timestamp_ladder(spark):
    rows = [(i, s) for i, (s, _, _) in enumerate(COERCE_CASES)]
    by_alt: dict[str, list[tuple[int, str, datetime]]] = {}
    for i, (s, alt, want) in enumerate(COERCE_CASES):
        by_alt.setdefault(alt, []).append((i, s, want))
    for alt, cases in by_alt.items():
        df = spark.createDataFrame(
            [(i, s) for i, s, _ in cases], "i int, raw string"
        )
        got = {
            r.i: r.ts
            for r in df.select(
                "i",
                F.date_format(
                    coerce_timestamp_expr(F.col("raw"), alt), "yyyy-MM-dd HH:mm"
                ).alias("ts"),
            ).collect()
        }
        for i, s, want in cases:
            exp = (
                f"{want.year:04d}-{want.month:02d}-{want.day:02d} "
                f"{want.hour:02d}:{want.minute:02d}"
            )
            assert got[i] == exp, (s, alt, got[i], want)


HOUR, DAY = 3600.0, 86400.0

FREQ_CASES = [
    (None, "fx"),
    (0.0, "unknown"),
    (-5.0, "unknown"),
    (15 * 60.0, "subhr"),
    (HOUR, "1hr"),
    (HOUR + 30, "1hr"),          # within the 60s absolute tolerance
    (3 * HOUR, "3hr"),
    (3 * HOUR * 1.009, "3hr"),   # within the 1% relative tolerance
    (6 * HOUR, "6hr"),
    (DAY, "day"),
    (6 * DAY, "6d"),
    (7 * DAY, "1w"),
    (14 * DAY, "sem"),
    (30 * DAY, "mon"),
    (20 * DAY, "mon"),
    (40 * DAY, "mon"),
    (90 * DAY, "season"),
    (365 * DAY, "yr"),
    (366 * DAY, "yr"),
    (10 * 365 * DAY, "dec"),
    # generic day fallback between the rungs
    (3 * DAY, "3.0d"),
    (2.5 * DAY, "2.5d"),
]


def test_freq_bucket_ladder(spark):
    rows = [(i, s) for i, (s, _) in enumerate(FREQ_CASES)]
    df = spark.createDataFrame(rows, "i int, gap_s double")
    got = {
        r.i: r.freq
        for r in df.select(
            "i", freq_bucket_expr(F.col("gap_s")).alias("freq")
        ).collect()
    }
    for i, (s, want) in enumerate(FREQ_CASES):
        assert got[i] == want, (s, got[i], want)


def test_freq_tolerance_is_exclusive_beyond_bounds(spark):
    df = spark.createDataFrame(
        [(1, HOUR + 61.0), (2, 3 * HOUR * 1.02)], "i int, gap_s double"
    )
    got = {r.i: r.freq for r in df.select("i", freq_bucket_expr(F.col("gap_s")).alias("freq")).collect()}
    assert got[1] != "1hr"
    assert got[2] != "3hr"
