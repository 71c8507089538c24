"""Real MBTiles (SQLite) ingestion — the archive the reference's fetch
path opens per request (``/root/reference/gdal-drivers/detail/
mbtiles.cpp:158-183``: ``SELECT tile_data FROM tiles WHERE
zoom_level=? AND tile_column=? AND tile_row=?``), rebuilt as a
distributed SCAN: instead of one point lookup per GDAL ``Open``, the
archive's whole ``tiles`` table becomes a DataFrame that the existing
keyed-lookup join (operators/lookup.py) and MVT proto decode consume.

Scale shape: an MBTiles file is one SQLite file, so the parallel unit
is the FILE (tile lakes ship thousands of per-region archives). Stage 1
lists each archive's distinct zoom levels (executor-side, cheap index
scan); stage 2 fans (archive, zoom) work units across the cluster, each
task range-scanning one zoom of one file with stdlib ``sqlite3``. A
single giant archive thus still splits into per-zoom tasks instead of
serializing on one executor. No driver-side SQLite access anywhere.

Row conventions preserved from the reference:
  - the stored row is TMS (bottom-up); the XYZ row ``y = 2^z − 1 −
    tms_row`` is emitted alongside (flip at ``mbtiles.cpp:154-155``);
  - payloads are returned verbatim (gzip sniff happens downstream,
    ``mbtiles.cpp:214-224`` → lookup.fetch_tiles / gunzip_tiles).
"""

from __future__ import annotations

import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILES_SCHEMA = (
    "archive string, zoom int, x long, tms_y long, y long, tile_data binary"
)


def _connect_ro(path: str) -> sqlite3.Connection:
    # read-only open, same flag as sqlite3_open_v2(..., READONLY)
    # at mbtiles.cpp:160-162
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def read_mbtiles(spark: SparkSession, paths: list[str] | DataFrame) -> DataFrame:
    """``.mbtiles`` file paths → tiles DataFrame.

    Two executor-side stages: (archive → zooms) then ((archive, zoom) →
    rows), so one task never holds more than one zoom level of one
    archive in memory and a single large file parallelizes by zoom.
    """
    if isinstance(paths, DataFrame):
        pdf_paths = paths
    else:
        pdf_paths = spark.createDataFrame(
            [(p,) for p in paths], "archive string"
        )

    def _zooms(batches):
        for pdf in batches:
            rows = []
            for p in pdf["archive"]:
                # poison-archive guard: a corrupt/missing/foreign SQLite
                # file yields zero work units for that archive; the scan
                # stage survives (same philosophy as decode_stats's
                # poison rows)
                try:
                    con = _connect_ro(str(p))
                except sqlite3.Error:
                    continue
                try:
                    for (z,) in con.execute(
                        "SELECT DISTINCT zoom_level FROM tiles"
                    ):
                        rows.append((str(p), int(z)))
                except sqlite3.Error:
                    pass
                finally:
                    con.close()
            yield pd.DataFrame(rows, columns=["archive", "zoom"])

    units = pdf_paths.mapInPandas(_zooms, "archive string, zoom int")
    # fan the (archive, zoom) units across the cluster
    units = units.repartition("archive", "zoom")

    def _scan(batches):
        for pdf in batches:
            for r in pdf.itertuples():
                # an archive that turned unreadable between stages
                # poisons only its own rows
                try:
                    con = _connect_ro(str(r.archive))
                except sqlite3.Error:
                    continue
                try:
                    cur = con.execute(
                        "SELECT tile_column, tile_row, tile_data FROM tiles "
                        "WHERE zoom_level = ?",
                        (int(r.zoom),),
                    )
                    maxrow = (1 << int(r.zoom)) - 1
                    while True:
                        try:
                            chunk = cur.fetchmany(4096)
                        except sqlite3.Error:
                            break  # corrupt page mid-scan: keep rows so far
                        if not chunk:
                            break
                        # NULL tile_data / non-integer coords are legal
                        # SQLite (no constraints on the tiles table) but
                        # poison rows here — skip them, keep the rest
                        good = [
                            c for c in chunk
                            if c[2] is not None
                            and isinstance(c[0], int) and isinstance(c[1], int)
                        ]
                        if not good:
                            continue
                        yield pd.DataFrame(
                            {
                                "archive": str(r.archive),
                                "zoom": int(r.zoom),
                                "x": [int(c[0]) for c in good],
                                "tms_y": [int(c[1]) for c in good],
                                "y": [maxrow - int(c[1]) for c in good],
                                "tile_data": [bytes(c[2]) for c in good],
                            }
                        )
                except sqlite3.Error:
                    pass  # missing tiles table etc.: zero rows, no crash
                finally:
                    con.close()

    return units.mapInPandas(_scan, TILES_SCHEMA)


def read_metadata(spark: SparkSession, paths: list[str]) -> DataFrame:
    """The archive ``metadata`` key/value table (format/name/bounds)."""
    pdf_paths = spark.createDataFrame([(p,) for p in paths], "archive string")

    def _meta(batches):
        for pdf in batches:
            rows = []
            for p in pdf["archive"]:
                try:
                    con = _connect_ro(str(p))
                except sqlite3.Error:
                    continue  # missing/unopenable archive: zero rows
                try:
                    for k, v in con.execute("SELECT name, value FROM metadata"):
                        rows.append((str(p), str(k), str(v)))
                except sqlite3.Error:
                    pass  # optional table / not-a-database: zero rows
                finally:
                    con.close()
            yield pd.DataFrame(rows, columns=["archive", "key", "value"])

    return pdf_paths.mapInPandas(_meta, "archive string, key string, value string")


def write_mbtiles(path: str, rows, metadata: dict | None = None) -> None:
    """Create an ``.mbtiles`` archive (tiles stored TMS, exactly the
    layout mbtiles.cpp reads). ``rows`` iterates (zoom, x, tms_y,
    tile_data:bytes). Single-file SQLite write = single-process by
    nature; used for fixtures and per-partition tile sinks."""
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE IF NOT EXISTS tiles ("
            "zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, "
            "tile_data BLOB)"
        )
        con.execute(
            "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)"
        )
        con.executemany(
            "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)",
            [(int(z), int(x), int(ty), sqlite3.Binary(bytes(d)))
             for z, x, ty, d in rows],
        )
        if metadata:
            con.executemany(
                "INSERT INTO metadata VALUES (?, ?)",
                sorted(metadata.items()),
            )
        con.commit()
    finally:
        con.close()


def fetch_one(path_zxy: str) -> bytes | None:
    """Reference-parity point fetch: ``<archive>.mbtiles/z-x-y`` →
    tile bytes or None (loadFromMbTilesArchive, mbtiles.cpp:128-225:
    path split on last slash, strict z-x-y parse, bounds check,
    TMS flip, single SELECT)."""
    slash = path_zxy.rfind("/")
    if slash < 0:
        raise ValueError(f"no slash in {path_zxy!r}")
    archive, tail = path_zxy[:slash], path_zxy[slash + 1:]
    parts = tail.split("-")
    if len(parts) != 3 or not all(p.isdigit() for p in parts):
        raise ValueError(f"bad z-x-y {tail!r}")
    zoom, col, row = (int(p) for p in parts)
    maxv = (1 << zoom) - 1
    if col > maxv or row > maxv:
        raise ValueError(f"z-x-y out of bounds 0-{maxv}: {tail!r}")
    row = maxv - row  # TMS flip (mbtiles.cpp:154-155)
    con = _connect_ro(archive)
    try:
        cur = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
            "tile_column=? AND tile_row=?",
            (zoom, col, row),
        )
        got = cur.fetchone()
        return bytes(got[0]) if got else None
    finally:
        con.close()
