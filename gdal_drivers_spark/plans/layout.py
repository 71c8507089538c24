"""Storage layout for co-located joins — bucketing by cell id.

At 100 TB the dominant cost of the tile↔source join is the shuffle of
the big fact side. The engine's layout contract removes it:

- **partition** the lake table by cell *prefix* (coarse quadkey level,
  e.g. z=4 → ≤256 directories): `filter(cell prefix)` becomes file
  pruning (the quadtree constraint pushdown of
  ``/root/reference/gdal-drivers/mask.cpp:229-233``, done by layout
  instead of a custom Catalyst rule);
- **bucket** by the full cell id (`bucketBy(n, 'cell')`): two tables
  bucketed the same way sort-merge-join with NO exchange on either
  side — the join is executed bucket-by-bucket, co-located. This is
  Spark's native form of the reference's "aligned grids never
  resample" invariant (blender.cpp:164-172): align the layout once at
  write time, every later join is narrow.

`tests/test_layout.py` proves the plan shape: bucketed join → zero
Exchange; identical unbucketed join → two Exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str = "cell",
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and in-bucket sorted) parquet table.
    Sorting by the key lets the sort-merge join skip its sort too."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str = "cell") -> DataFrame:
    """Join two same-bucketed tables on the bucket key — co-located,
    shuffle-free (verify with ``df.explain``: no Exchange)."""
    return spark.table(left).join(spark.table(right), key)
