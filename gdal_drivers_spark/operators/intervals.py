"""Bin-bucketed interval (range) join — scale-safe point-in-interval.

``points JOIN intervals ON lo <= v AND v < hi`` is an inequality join:
Spark plans it as a broadcast nested loop (per-point scan of ALL
intervals) — quadratic, a scale-killer once either side is large. The
standard fix (the same trick behind Databricks' range-join
optimization and the engine's own 2-D tile cover join,
``operators/assign.py``) is to discretize the domain into fixed-width
bins:

1. each interval explodes to the bins it overlaps (fan-out
   ``len/bin_width``, bounded and loud-capped);
2. each point computes its single bin — pure codegen arithmetic;
3. equi-join on the bin (hash join, AQE/broadcast eligible like any
   other), then re-check the exact predicate.

Each (interval, bin) pair is unique and a point lives in exactly one
bin, so no dedup is needed. Cost: ONE hash shuffle (or broadcast) on
the bin key, linear in |points| + Σ interval-bins. Pick ``bin_width``
near the median interval length: fan-out stays O(1) per interval and
each point's bin holds only nearby intervals.

Semantics: half-open ``[lo, hi)`` over an INTEGER domain (exact, so
the contract oracle can replay it); empty intervals (``hi <= lo``)
match nothing and are dropped up front (also keeps ``F.sequence`` from
generating a descending range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them
    (integer domain, half-open ``[start, end)``). Output: all point
    columns + all interval columns. Column names must not collide.

    ``max_bins_per_interval`` bounds the explode fan-out: one interval
    spanning the whole domain would otherwise emit domain/bin_width
    rows and melt an executor silently — refuse loudly instead (raise
    at plan-check time via a validated agg on the interval side, which
    is the small/dimension side by construction).
    """
    bw = int(bin_width)
    if bw <= 0:
        raise ValueError("bin_width must be positive")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("'_bin' is reserved by interval_join")

    live = intervals.filter(F.col(end_col) > F.col(start_col))
    # the interval side is the dimension side — one tiny agg validates
    # the fan-out bound before any explode is planned
    worst = live.agg(
        F.max((F.col(end_col) - F.col(start_col))).alias("len")
    ).collect()[0]["len"]
    if worst is not None and (int(worst) + bw - 1) // bw + 1 > max_bins_per_interval:
        raise ValueError(
            f"interval of length {worst} explodes to more than "
            f"{max_bins_per_interval} bins at bin_width={bw}; raise "
            "bin_width or split the interval"
        )

    iv = live.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw).cast("long"),
                F.floor((F.col(end_col) - 1) / bw).cast("long"),
            )
        ),
    )
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bw).cast("long"))
    return (
        p.join(iv, on="_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
