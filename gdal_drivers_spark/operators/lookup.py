"""Keyed tile lookup — the MBTiles fetch path
(``/root/reference/gdal-drivers/detail/mbtiles.cpp:128-225``) as a
distributed keyed join:

- ``z-x-y`` request parse with strict non-negative ints
  (``mbtiles.cpp:63-110``) → ``regexp_extract`` + casts (F10);
- bounds check against ``max = 2^z − 1`` (``mbtiles.cpp:146-152``);
- **TMS row flip** ``row = max − row`` (``mbtiles.cpp:154-155``);
- the SQLite point lookup (``mbtiles.cpp:166-183``) → equi-join on
  (zoom, x, row) — a broadcast-hash join for small request sets;
- gzip sniff (first byte 0x1f) + gunzip (``mbtiles.cpp:214-224``) in
  an Arrow-batched decode (F11);
- missing tile → no row (empty result, not an error —
  ``mbtiles.cpp:188-192``): inner join semantics.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PATH_RE = r"^(\d+)-(\d+)-(\d+)$"


def parse_requests(paths: DataFrame, col: str = "path") -> DataFrame:
    """'z-x-y' strings → typed (zoom,x,y) with bounds validation.
    Malformed or out-of-bounds paths are dropped (the reference raises
    per request; set-at-a-time the analogue is filtering, with a
    'rejected' side channel available via the inverse filter)."""
    p = paths.withColumn("_z", F.regexp_extract(F.col(col), PATH_RE, 1)) \
        .withColumn("_x", F.regexp_extract(F.col(col), PATH_RE, 2)) \
        .withColumn("_y", F.regexp_extract(F.col(col), PATH_RE, 3))
    return (
        p.filter((F.col("_z") != "") & (F.col("_x") != "") & (F.col("_y") != ""))
        .select(
            "*",
            F.col("_z").cast("int").alias("zoom"),
            F.col("_x").cast("long").alias("x"),
            F.col("_y").cast("long").alias("y"),
        )
        .drop("_z", "_x", "_y")
        .filter(
            (F.col("x") <= F.expr("shiftleft(CAST(1 AS BIGINT), zoom) - 1"))
            & (F.col("y") <= F.expr("shiftleft(CAST(1 AS BIGINT), zoom) - 1"))
        )
    )


def fetch_tiles(requests: DataFrame, store: DataFrame) -> DataFrame:
    """requests(zoom,x,y) ⋈ store(zoom,x,y[TMS],tile_data) with the TMS
    flip applied to the request row, then gunzip-sniff decode."""
    flipped = requests.withColumn(
        "tms_y", F.expr("shiftleft(CAST(1 AS BIGINT), zoom) - 1 - y")
    )
    joined = flipped.join(
        F.broadcast(store.withColumnRenamed("y", "tms_y")),
        ["zoom", "x", "tms_y"],
        "inner",
    )

    @F.pandas_udf("binary")
    def _gunzip(blobs: pd.Series) -> pd.Series:
        from ..core.codecs import gunzip_sniff

        # corrupt gzip → empty payload, never a stage failure (one
        # shared poison policy, core/codecs.gunzip_sniff)
        out = [gunzip_sniff(b) or b"" for b in blobs]
        return pd.Series(out)

    return joined.withColumn("tile_data", _gunzip(F.col("tile_data")))
