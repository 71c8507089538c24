#!/usr/bin/env python
"""Round-6 OPTIMIZATION measurement harness (guide §1) — NOT the round
artifact. ``bench.py`` is frozen for measurement; this file exists so
the optimization loop can (a) time each bench workload in isolation
with the same action bench.py uses, (b) time the pure computation
through the noop sink (guide §1.4) where the workload shape allows it,
and (c) capture ``explain("formatted")`` plans into ``plans/r06/`` for
the before/after evidence the round deliverables require.

Usage:
  python bench_extra.py                      # all workloads, 3 reps
  python bench_extra.py --only knn_graph,ann_ivfpq --reps 5
  python bench_extra.py --plans before       # also write plans/r06/<q>_before.txt
  python bench_extra.py --plans after

Output: one JSON line per workload on stdout with median/min seconds
(same convention as bench.py), plus a trailing summary JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ENTRY_QUERIES = [
    "knn", "dedup_minhash", "ann_topk", "ann_ivf", "phash_near_dup",
    "windowed_events", "tile_assign", "mvt_proto_typed", "mbtiles_scan",
    "warp_reproject", "asof_join", "interval_join", "zonal_stats",
    "horn_gradients", "warp_utm", "ann_ivfpq", "knn_graph", "warp_cubic",
]


def _explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    import bench  # frozen harness — reused for the flagship builder only

    only = None
    plans_tag = None
    reps = 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from gdal_drivers_spark import get_spark

    spark = get_spark("bench_extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    spark.range(1000).count()  # session warm-up, like bench.py

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}

    def timed(name: str, fn, plan_df_fn=None):
        if only and name not in only:
            return
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        med, best = statistics.median(times), min(times)
        results[name] = {"median": round(med, 3), "min": round(best, 3),
                         "samples": [round(t, 3) for t in times]}
        print(json.dumps({"q": name, **results[name]}), flush=True)
        if plans_tag and plan_df_fn is not None:
            txt = _explain_formatted(plan_df_fn())
            with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(None)

    # --- flagship (builder reused from the frozen bench.py) ---
    timed("flagship_assign_join", lambda: bench._flagship(spark, SF_DIR, 1),
          lambda: bench._flagship(spark, SF_DIR, 1)[3])

    # --- decode_20k (same pre-materialized input dir as bench.py) ---
    from gdal_drivers_spark.operators.decode import decode_stats
    from gdal_drivers_spark.sources import synth

    n_img = 20_000
    img_dir = f"/tmp/bench_images_{n_img}"
    if not os.path.isdir(img_dir):
        synth.images_df(spark, n_img, partitions=CPUS * 2).write.mode(
            "overwrite").parquet(img_dir)

    def _decode():
        prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        prev_oc = spark.conf.get("spark.sql.files.openCostInBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 19))
        try:
            decode_stats(spark.read.parquet(img_dir)).filter("dec_ok").count()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", prev_oc)

    _decode()  # warm pass, like bench.py
    timed("decode_20k", _decode,
          lambda: decode_stats(spark.read.parquet(img_dir)).filter("dec_ok"))

    # --- blend (same pre-materialized dir as bench.py) ---
    from gdal_drivers_spark.operators.blend import blend_tiles

    n_cells, n_src, ts = 512, 4, 256
    blend_dir = f"/tmp/bench_blend_{n_cells}x{n_src}"
    if not os.path.isdir(blend_dir):
        import pandas as _pd

        from gdal_drivers_spark.core import codecs as _codecs
        from gdal_drivers_spark.sources.synth import pattern as _pattern

        def _gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    i = int(i)
                    cellv = (6 << 52) + (i // n_src)
                    img = _pattern(ts, ts, 1, (i * 2654435761) % 256)
                    rows.append(
                        (cellv, 0, i % n_src, _codecs.encode_raw(img),
                         0.0, 0.0, 1.0, 1.0)
                    )
                yield _pd.DataFrame(
                    rows,
                    columns=["cell", "band", "source_id", "tile",
                             "vx0", "vy0", "vx1", "vy1"],
                )

        spark.range(0, n_cells * n_src, 1, CPUS * 2).mapInPandas(
            _gen,
            "cell long, band int, source_id long, tile binary, "
            "vx0 double, vy0 double, vx1 double, vy1 double",
        ).write.mode("overwrite").parquet(blend_dir)
    if os.path.isdir(blend_dir):
        timed("blend_512c4s_256px",
              lambda: blend_tiles(spark.read.parquet(blend_dir),
                                  tile_px=ts, overlap=0.05).count(),
              lambda: blend_tiles(spark.read.parquet(blend_dir),
                                  tile_px=ts, overlap=0.05))

    # --- entry queries (identical call shape to bench.py) ---
    for name in ENTRY_QUERIES:
        q = entry_mod.queries()[name]
        timed(name, lambda q=q: q(spark, SF_DIR).count(),
              lambda q=q: q(spark, SF_DIR))

    # --- pyramid pair (same dirs as bench.py) ---
    from gdal_drivers_spark.operators.pyramid import build_pyramid, update_pyramid

    n_grid, pts = 64, 128
    pyr_leaf_dir = f"/tmp/bench_pyr_leaves_{n_grid}x{pts}"
    pyr_lvl_dir = f"/tmp/bench_pyr_levels_{n_grid}x{pts}"
    if not (os.path.isdir(pyr_leaf_dir) and os.path.isdir(f"{pyr_lvl_dir}/3")):
        import numpy as _np
        import pandas as _pd

        def _leafgen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    i = int(i)
                    cx, cy = i // n_grid, i % n_grid
                    gx = _np.arange(pts) + cx * pts
                    gy = _np.arange(pts) + cy * pts
                    img = ((gx[None, :] * 3 + gy[:, None] * 5 + 11) % 256).astype(
                        _np.uint8
                    )
                    rows.append(((6 << 52) | (cx << 26) | cy, 0, img.tobytes(), pts))
                yield _pd.DataFrame(rows, columns=["cell", "band", "tile", "ts"])

        spark.range(0, n_grid * n_grid, 1, CPUS * 2).mapInPandas(
            _leafgen, "cell long, band int, tile binary, ts int"
        ).write.mode("overwrite").parquet(pyr_leaf_dir)
        lv = build_pyramid(spark.read.parquet(pyr_leaf_dir), 6, 3, agg="mean")
        for z in (5, 4, 3):
            lv[z].write.mode("overwrite").parquet(f"{pyr_lvl_dir}/{z}")
    if os.path.isdir(pyr_leaf_dir) and os.path.isdir(f"{pyr_lvl_dir}/3"):
        timed("pyramid_full_rebuild",
              lambda: build_pyramid(
                  spark.read.parquet(pyr_leaf_dir), 6, 3, agg="mean")[3].count(),
              lambda: build_pyramid(
                  spark.read.parquet(pyr_leaf_dir), 6, 3, agg="mean")[3])

        import numpy as _np
        import pandas as _pd

        _delta_rows = []
        for i in range(16):
            cx, cy = (i * 7) % n_grid, (i * 13) % n_grid
            img = _np.full((pts, pts), (i * 37) % 256, _np.uint8)
            _delta_rows.append(((6 << 52) | (cx << 26) | cy, 0, img.tobytes(), pts))
        delta_df = spark.createDataFrame(
            _pd.DataFrame(_delta_rows, columns=["cell", "band", "tile", "ts"]),
            schema="cell long, band int, tile binary, ts int",
        )

        def _incremental():
            levels = {6: spark.read.parquet(pyr_leaf_dir)}
            for z in (5, 4, 3):
                levels[z] = spark.read.parquet(f"{pyr_lvl_dir}/{z}")
            return update_pyramid(levels, delta_df, agg="mean")[3]

        timed("pyramid_incremental", lambda: _incremental().count(), _incremental)

        # --- cutline over the same stored mosaic ---
        from pyspark.sql import functions as _F

        from gdal_drivers_spark.operators.cutline import cutline_crop

        cut_ring = [(1500, 1000), (6800, 1600), (6000, 7000), (1000, 6200)]

        def _cut_df():
            return cutline_crop(
                spark.read.parquet(pyr_leaf_dir), cut_ring, pts, raster="tile")

        timed("cutline_mosaic",
              lambda: _cut_df().agg(
                  _F.sum("n_kept"), _F.sum(_F.col("boundary").cast("long")),
                  _F.count("*")).collect(),
              _cut_df)

    total = sum(v["median"] for v in results.values())
    print(json.dumps({"metric": "bench_extra per-query isolation",
                      "sum_median_s": round(total, 3),
                      "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                      "cpus": CPUS,
                      "queries": {k: v["median"] for k, v in results.items()},
                      "queries_min": {k: v["min"] for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
