"""As-of (temporal point-in-time) join — union + ordered window plan.

Training-data and event pipelines constantly need "for each fact row,
the most recent dimension row at or before its timestamp" (price as of
trade time, last config before an event, latest error preceding a
click). A naive SQL formulation is an inequality join —
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` plus an argmax — which
Spark plans as a per-key cross product: quadratic in the hot key and a
scale-killer.

The scalable plan used here is the canonical union-merge:

1. tag both inputs and union them on (key, ts) — right rows carry
   their payload, left rows carry null payload;
2. one window per key ordered by (ts, right-before-left at equal ts)
   with ``last(payload, ignorenulls=True)`` over the unbounded-
   preceding frame — each left row picks up the latest right payload
   at or before its own timestamp;
3. filter back to left rows.

Cost: ONE shuffle of |L|+|R| rows on the key and one sort within
partitions — linear, skew-handled by AQE like any other hash
partitioning, no cross product ever materializes. ``tolerance``
post-filters matches older than the given bound (nulling the payload,
not dropping the row — left-join semantics).

Equal timestamps match (``r.ts <= l.ts``), the same convention as
DuckDB/pandas ``ASOF JOIN`` — which is exactly what the contract
oracle runs against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance=None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``payload``
    columns of the latest ``right`` row with the same ``on`` key and
    ``right_ts <= left_ts`` (ties included), or nulls if none exists.

    ``tolerance`` (a Column interval or seconds literal, compared as
    ``left_ts - matched_ts <= tolerance``) nulls out matches that are
    too stale while keeping the left row. All left columns pass
    through unchanged; payload columns must not collide with them.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left: {sorted(clash)}")

    # right rows sort BEFORE left rows at equal ts so ties match
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for p in payload:
        l_tag = l_tag.withColumn(p, F.lit(None))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(p) for p in payload],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    u = l_tag.select(left.columns + ["_ts", "_side"] + payload).unionByName(
        r_tag.select(left.columns + ["_ts", "_side"] + payload)
    )

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w))
    for p in payload:
        filled = filled.withColumn(p, F.last(F.when(F.col("_side") == 0, F.col(p)), ignorenulls=True).over(w))

    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = (F.col("_ts").cast("double") - F.col("_m_ts").cast("double")) <= tolerance
        for p in payload:
            out = out.withColumn(p, F.when(fresh, F.col(p)))
        out = out.withColumn("_m_ts", F.when(fresh, F.col("_m_ts")))
    return out.withColumnRenamed("_m_ts", "matched_ts").drop("_ts", "_side")
