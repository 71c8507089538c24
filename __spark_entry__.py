"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (synthesize images from the
sf0.001 orders table → Arrow-batch decode → tile-assign → cell join →
per-region counts). ``queries()`` / ``oracle_sql()`` expose each
implemented operator from SURVEY.md §2 with a DuckDB-checkable ANSI-SQL
twin. All oracle-checked arithmetic is exact-integer or power-of-two
float so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

Z_ASSIGN = 6  # 64×64 grid for assignment queries
_CELL0 = 6 * (1 << 52)  # packed level prefix


def _ship(spark: SparkSession) -> SparkSession:
    from gdal_drivers_spark import _ship as ship

    return ship(spark)


def _orders_footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer footprints (inclusive cell ranges at
    Z_ASSIGN) derived from the orders table — the relational shadow of
    sources.synth.footprint_of, exact in both engines."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    h1 = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4096)
    return o.select(
        F.col("o_orderkey").alias("k"),
        (h1 % 64).alias("cx0"),
        (h1.cast("long") / 64).cast("long").alias("cy0"),
        F.least(h1 % 64 + F.col("o_orderkey") % 3, F.lit(63)).alias("cx1"),
        F.least(
            (h1.cast("long") / 64).cast("long")
            + (F.col("o_orderkey").cast("long") / 3).cast("long") % 3,
            F.lit(63),
        ).alias("cy1"),
    )


_ORDERS_FOOTPRINT_SQL = """
  SELECT o_orderkey AS k,
         ((o_orderkey * 2654435761) % 4096) % 64 AS cx0,
         ((o_orderkey * 2654435761) % 4096) // 64 AS cy0,
         least(((o_orderkey * 2654435761) % 4096) % 64 + o_orderkey % 3, 63) AS cx1,
         least(((o_orderkey * 2654435761) % 4096) // 64 + (o_orderkey // 3) % 3, 63) AS cy1
  FROM orders
"""


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footprints exploded to covering cells (tile assignment, S5/J1):
    narrow sequence+explode, no shuffle, all codegen."""
    from gdal_drivers_spark.operators.assign import pack_cell

    fp = _orders_footprints(spark, sf_dir)
    return (
        fp.withColumn("cx", F.explode(F.sequence("cx0", "cx1")))
        .withColumn("cy", F.explode(F.sequence("cy0", "cy1")))
        .withColumn("cell", pack_cell(Z_ASSIGN, F.col("cx"), F.col("cy")))
    )


_ASSIGNED_SQL = f"""
  SELECT k, cx, cy,
         ({Z_ASSIGN}::BIGINT * {1 << 52}) + (cx * {1 << 26}) + cy AS cell
  FROM ({_ORDERS_FOOTPRINT_SQL}) fp,
       LATERAL (SELECT unnest(generate_series(fp.cx0, fp.cx1)) AS cx) gx,
       LATERAL (SELECT unnest(generate_series(fp.cy0, fp.cy1)) AS cy) gy
"""


# --------------------------------------------------------------- queries

def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/J1: tile assignment — per-cell image count + distinct images."""
    return (
        _assigned(spark, sf_dir)
        .groupBy("cell")
        .agg(F.count("*").alias("n_assign"), F.countDistinct("k").alias("n_images"))
    )


def q_cell_join_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/P3: cell equi-join against the boundary table (region attr =
    r(x+y)%8, FIXTURES.md §2), grouped by region. The boundary side is
    a broadcast (4^z rows)."""
    from gdal_drivers_spark.operators.assign import pack_cell

    n = 1 << Z_ASSIGN
    bounds = (
        spark.range(n * n)
        .select(
            (F.col("id").cast("long") / n).cast("long").alias("bx"),
            (F.col("id") % n).alias("by"),
        )
        .withColumn("cell", pack_cell(Z_ASSIGN, F.col("bx"), F.col("by")))
        .withColumn("region", F.concat(F.lit("r"), ((F.col("bx") + F.col("by")) % 8)))
    )
    a = _assigned(spark, sf_dir)
    return (
        a.join(F.broadcast(bounds.select("cell", "region")), "cell", "inner")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_assign"),
            F.countDistinct("k").alias("n_images"),
            F.countDistinct("cell").alias("n_cells"),
        )
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: exact kNN (k=3) of supplier query points against customer
    points via cell-ring expansion, certified termination."""
    from gdal_drivers_spark.operators.knn import knn_join

    span = 65536
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 48271) % span).alias("px"),
        ((F.col("c_custkey") * 69621) % span).alias("py"),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("qid"),
        ((F.col("s_suppkey") * 16807) % span).alias("qx"),
        ((F.col("s_suppkey") * 39916801) % span).alias("qy"),
    )
    return knn_join(supp, cust, k=3, z=4, coord_span=span)


def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 relational shadow: partial+final weighted aggregation with
    exact integer-cents arithmetic (order-independent, engine-exact)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents"),
            F.count("*").alias("n_rows"),
        )
    )


def q_tristate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A7: quadtree pyramid rollup with tristate classification
    (white/gray/black = all/any/none, mask.cpp:240-256 semantics) —
    leaves at z=4 derived from part, parents at z=3."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    h = (F.col("p_partkey") * F.lit(2654435761)) % F.lit(256)
    leaves = (
        p.select(
            (h % 16).alias("qx"),
            (h.cast("long") / 16).cast("long").alias("qy"),
            (F.col("p_partkey") % 2).alias("bit"),
        )
        .groupBy("qx", "qy")
        .agg(F.max("bit").alias("bit"))  # OR-combine (A3, blender.cpp:657-731)
    )
    return (
        leaves.groupBy(
            (F.col("qx").cast("long") / 2).cast("long").alias("px"),
            (F.col("qy").cast("long") / 2).cast("long").alias("py"),
        )
        .agg(
            F.count("*").alias("n_children"),
            F.sum("bit").alias("n_white"),
        )
        .withColumn(
            "klass",
            F.when(F.col("n_white") == 0, "black")
            .when(F.col("n_white") == F.col("n_children"), "white")
            .otherwise("gray"),
        )
    )


def q_tms_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/J2: keyed z-x-y lookup with the TMS row flip
    (row = 2^z−1−y, mbtiles.cpp:154-155) as an equi-join."""
    z = 5
    n = 1 << z
    store = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            ((F.col("p_partkey") * 7) % n).alias("x"),
            (F.lit(n - 1) - (F.col("p_partkey") * 13) % n).alias("tms_row"),
            F.col("p_partkey").alias("payload_id"),
        )
        .groupBy("x", "tms_row")
        .agg(F.min("payload_id").alias("payload_id"))
    )
    requests = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("req_id"),
        ((F.col("s_suppkey") * 11) % n).alias("x"),
        ((F.col("s_suppkey") * 5) % n).alias("y"),
    )
    flipped = requests.withColumn("tms_row", F.lit(n - 1) - F.col("y"))
    return flipped.join(store, ["x", "tms_row"], "inner").select(
        "req_id", "x", "y", "tms_row", "payload_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": q_tile_assign,
        "cell_join_region": q_cell_join_region,
        "knn": q_knn,
        "pricing_rollup": q_pricing_rollup,
        "tristate_rollup": q_tristate_rollup,
        "tms_lookup": q_tms_lookup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tile_assign": f"""
            SELECT cell, count(*) AS n_assign, count(DISTINCT k) AS n_images
            FROM ({_ASSIGNED_SQL}) a GROUP BY cell
        """,
        "cell_join_region": f"""
            WITH bounds AS (
                SELECT (6::BIGINT * {1 << 52}) + (bx * {1 << 26}) + by_ AS cell,
                       'r' || CAST((bx + by_) % 8 AS VARCHAR) AS region
                FROM (SELECT unnest(generate_series(0, 63)) AS bx) gx,
                     (SELECT unnest(generate_series(0, 63)) AS by_) gy
            )
            SELECT region, count(*) AS n_assign, count(DISTINCT k) AS n_images,
                   count(DISTINCT a.cell) AS n_cells
            FROM ({_ASSIGNED_SQL}) a JOIN bounds USING (cell)
            GROUP BY region
        """,
        "knn": """
            WITH pts AS (
                SELECT c_custkey AS pid, (c_custkey * 48271) % 65536 AS px,
                       (c_custkey * 69621) % 65536 AS py FROM customer
            ), qs AS (
                SELECT s_suppkey AS qid, (s_suppkey * 16807) % 65536 AS qx,
                       (s_suppkey * 39916801) % 65536 AS qy FROM supplier
            ), d AS (
                SELECT qid, pid,
                       (px - qx) * (px - qx) + (py - qy) * (py - qy) AS dist2,
                       row_number() OVER (PARTITION BY qid ORDER BY
                           (px - qx) * (px - qx) + (py - qy) * (py - qy), pid) AS rank
                FROM qs CROSS JOIN pts
            )
            SELECT qid, pid, dist2, CAST(rank AS INT) AS rank FROM d WHERE rank <= 3
        """,
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents,
                   sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS revenue_cents,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "tristate_rollup": """
            WITH leaves AS (
                SELECT ((p_partkey * 2654435761) % 256) % 16 AS qx,
                       ((p_partkey * 2654435761) % 256) // 16 AS qy,
                       max(p_partkey % 2) AS bit
                FROM part GROUP BY 1, 2
            )
            SELECT qx // 2 AS px, qy // 2 AS py,
                   count(*) AS n_children, sum(bit) AS n_white,
                   CASE WHEN sum(bit) = 0 THEN 'black'
                        WHEN sum(bit) = count(*) THEN 'white'
                        ELSE 'gray' END AS klass
            FROM leaves GROUP BY 1, 2
        """,
        "tms_lookup": """
            WITH store AS (
                SELECT (p_partkey * 7) % 32 AS x,
                       31 - (p_partkey * 13) % 32 AS tms_row,
                       min(p_partkey) AS payload_id
                FROM part GROUP BY 1, 2
            ), req AS (
                SELECT s_suppkey AS req_id, (s_suppkey * 11) % 32 AS x,
                       (s_suppkey * 5) % 32 AS y FROM supplier
            )
            SELECT req.req_id, req.x, req.y, 31 - req.y AS tms_row, store.payload_id
            FROM req JOIN store ON store.x = req.x AND store.tms_row = 31 - req.y
        """,
    }


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: orders → synthetic images (real bytes) →
    Arrow-batch decode → tile assignment (z=6) → boundary cell join →
    per-region rollup. Returns one row per region with decode-verified
    pixel stats."""
    _ship(spark)
    import pandas as pd

    from gdal_drivers_spark.operators.assign import assign_tiles, pack_cell
    from gdal_drivers_spark.operators.decode import decode_stats
    from gdal_drivers_spark.sources.synth import IMAGES_SCHEMA, gen_images_pdf

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")

    def gen(batches):
        import numpy as np

        for pdf in batches:
            yield gen_images_pdf(pdf["o_orderkey"].to_numpy(np.int64))

    images = orders.mapInPandas(gen, IMAGES_SCHEMA)
    decoded = decode_stats(images)
    assigned = assign_tiles(decoded, z=Z_ASSIGN)

    n = 1 << Z_ASSIGN
    bounds = (
        spark.range(n * n)
        .select(
            (F.col("id").cast("long") / n).cast("long").alias("bx"),
            (F.col("id") % n).alias("by"),
        )
        .withColumn("cell", pack_cell(Z_ASSIGN, F.col("bx"), F.col("by")))
        .withColumn("region", F.concat(F.lit("r"), ((F.col("bx") + F.col("by")) % 8)))
        .select("cell", "region")
    )
    return (
        assigned.join(F.broadcast(bounds), "cell", "inner")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_assign"),
            F.countDistinct("image_id").alias("n_images"),
            F.sum(F.col("dec_ok").cast("int")).alias("n_decoded"),
            F.round(F.avg("px_mean"), 3).alias("avg_px_mean"),
        )
        .orderBy("region")
    )
