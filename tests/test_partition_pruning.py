"""Layout contract, part 2: partitioning the lake table by cell
PREFIX makes cell-range queries prune files at plan time (the
quadtree constraint pushdown of mask.cpp:229-233 expressed as layout
— SURVEY §4 'predicate pushdown into index'). Proven on the scan
node: PartitionFilters present, and only the selected prefix
directories are read."""

from pyspark.sql import functions as F


def test_cell_prefix_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "assign")
    n_prefixes = 16
    df = spark.range(40_000).select(
        (F.col("id") % n_prefixes).alias("cell_prefix"),
        F.col("id").alias("cell"),
        (F.col("id") * 3).alias("payload"),
    )
    df.write.partitionBy("cell_prefix").mode("overwrite").parquet(path)

    scan = spark.read.parquet(path).filter(F.col("cell_prefix") == 7)
    n = scan.count()
    assert n == 40_000 // n_prefixes

    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_prefix" in plan, plan

    def files_read(df):
        # execute THIS plan instance, then read its scan-leaf numFiles
        jqe = df._jdf.queryExecution()
        jqe.executedPlan().execute().count()
        scan_node = jqe.executedPlan().collectLeaves().head()
        return scan_node.metrics().apply("numFiles").value()

    pruned = files_read(scan)
    full = files_read(spark.read.parquet(path))
    assert 0 < pruned < full, (pruned, full)
    # exactly one prefix directory of sixteen survives pruning
    assert pruned <= full / n_prefixes + 1, (pruned, full)
