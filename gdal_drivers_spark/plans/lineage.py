"""Per-partition lineage records + counters.

Every partition of a tracked stage emits one lineage row (partition id,
row count, key range, content checksum) alongside accumulator counters —
the audit trail that makes a 10^12-row job debuggable and the resume
decision (plans/checkpoint.py) verifiable. The reference's analogue is
its structured error/warning channel (``mvt.cpp:262-287``
checkNonzero/checkZero/checkSingle; consumed-input warning
``mvt.cpp:207-213``) — here it becomes data, not stderr.

Implementation: ``mapInPandas`` pass-through that also yields side rows
is not possible (one schema per stream), so lineage is a *parallel*
aggregation over the same partitioning: ``spark_partition_id()`` +
groupBy — zero extra shuffle when the input is already partitioned, one
cheap key-only shuffle otherwise. Counters use SparkContext
accumulators (exactly-once only on result stages — documented caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LINEAGE_COLS = ["part_id", "n_rows", "key_min", "key_max", "checksum"]


def lineage_records(df: DataFrame, key: str) -> DataFrame:
    """One row per physical partition: count, key envelope, and an
    order-insensitive checksum (bit_xor of xxhash64 — commutative and
    overflow-free under ANSI mode; identical duplicate rows cancel,
    which is consistent between write and validate)."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(key).alias("key_min"),
            F.max(key).alias("key_max"),
            F.expr(f"bit_xor(xxhash64({key}))").alias("checksum"),
        )
        .withColumnRenamed("_pid", "part_id")
    )


class Counters:
    """Named accumulator bundle for pipeline metrics (rows decoded,
    rows rejected, tiles painted, …)."""

    def __init__(self, spark, *names: str):
        self._acc = {n: spark.sparkContext.accumulator(0) for n in names}

    def add(self, name: str, v: int = 1):
        self._acc[name].add(int(v))

    def value(self, name: str) -> int:
        return self._acc[name].value

    def snapshot(self) -> dict[str, int]:
        return {n: a.value for n, a in self._acc.items()}
