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

    ``tolerance`` (numeric seconds, compared as ``left_ts -
    matched_ts <= tolerance`` on epoch seconds) nulls out matches
    that are too stale while keeping the left row. All left columns
    pass through unchanged; payload columns must not collide with
    them. NULL keys never match (SQL equality-join semantics — the
    same convention as DuckDB ASOF ``ON l.k = r.k``). The matched
    payload and ``matched_ts`` always come from ONE right row (the
    latest at-or-before row), even when that row carries NULL payload
    values.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left: {sorted(clash)}")
    reserved = {"_ts", "_side", "_m", "matched_ts"} & (
        set(left.columns) | set(payload)
    )
    if reserved:
        raise ValueError(f"reserved column names in use: {sorted(reserved)}")

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
    # the match is ATOMIC: one struct per right row (non-null even when
    # its payload fields are null), so last(..., ignorenulls) picks the
    # latest right ROW and payload + matched_ts can never come from
    # different rows
    match = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(F.col("_ts").alias("mts"), *[F.col(p) for p in payload]),
        ),
        ignorenulls=True,
    ).over(w)
    out = u.withColumn("_m", match).filter(F.col("_side") == 1)

    valid = F.col(on).isNotNull() & F.col("_m").isNotNull()
    if tolerance is not None:
        valid = valid & (
            (F.col("_ts").cast("double") - F.col("_m.mts").cast("double"))
            <= tolerance
        )
    for p in payload:
        out = out.withColumn(p, F.when(valid, F.col(f"_m.{p}")))
    out = out.withColumn("matched_ts", F.when(valid, F.col("_m.mts")))
    return out.drop("_m", "_ts", "_side")
