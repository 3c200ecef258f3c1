"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no native as-of join (SURVEY guide: bucketize or merge_asof).
This is the union-merge formulation — fully distributed, zero Python:

  union(left, right) -> window per key ordered by (ts ASC, right-first on
  ties, right-row struct) -> last(right-row struct, ignorenulls) over
  unbounded-preceding -> keep left.

One shuffle on the key, one sort inside the window — the same cost as a
sort-merge join, no per-group pandas. Ties (right.ts == left.ts) resolve
right-before-left, i.e. a rate stamped at exactly the event time applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """left columns are preserved; each ``value_cols`` comes from the
    latest right row with right.ts <= left.ts within the ``by`` key."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        l = l.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r = right.select(
        *by, ts, *value_cols
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in set(by + [ts]):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*lcols, *value_cols, "_side").unionByName(
        r.select(*lcols, *value_cols, "_side")
    )
    # the carried payload is ONE struct per RIGHT row (NULL on left
    # rows): last(_, ignorenulls) then skips only left rows — a right
    # row whose value column is legitimately NULL still supersedes an
    # older non-NULL value, matching pandas merge_asof (per-column
    # last(v, ignorenulls) resurrected stale values instead). The
    # struct is also the final window sort key, so duplicate right rows
    # at one (key, ts) resolve deterministically.
    u = u.withColumn(
        "_rv",
        F.when(
            F.col("_side") == 0,
            F.struct(*[F.col(v).alias(v) for v in value_cols]),
        ),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts).asc(), F.col("_side").asc(), F.col("_rv").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_rv = F.last("_rv", ignorenulls=True).over(w)
    filled = u.select(
        *lcols,
        "_side",
        *[last_rv.getField(v).alias(v) for v in value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
