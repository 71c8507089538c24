"""Distributed raster polygonize vs a scalar whole-raster flood fill:
global components (canonical min-gpid key, value, pixel count) must
match exactly on a random small-alphabet raster — blobs cross tile
seams in both axes and components re-enter tiles (multi-piece)."""

from collections import deque

import numpy as np
import pandas as pd

from gdal_drivers_spark.operators.polygonize import polygonize

T, GRID = 16, 3  # 3×3 tiles of 16 px = 48² raster
W = T * GRID


def _cell(tx, ty):
    return (4 << 52) + (tx << 26) + ty


def _flood(full: np.ndarray):
    """(component_min_gpid, value) per pixel + per-component stats."""
    lab = -np.ones(full.shape, int)
    comps = {}
    for r in range(W):
        for c in range(W):
            if lab[r, c] >= 0:
                continue
            q = deque([(r, c)])
            lab[r, c] = 1
            members = [(r, c)]
            while q:
                rr, cc = q.popleft()
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    r2, c2 = rr + dr, cc + dc
                    if (
                        0 <= r2 < W and 0 <= c2 < W
                        and lab[r2, c2] < 0
                        and full[r2, c2] == full[rr, cc]
                    ):
                        lab[r2, c2] = 1
                        q.append((r2, c2))
                        members.append((r2, c2))
            key = min(rr2 * W + cc2 for rr2, cc2 in members)
            comps[key] = (int(full[r, c]), len(members))
    return comps


def _local_piece_count(full: np.ndarray) -> int:
    """Total per-tile connected pieces (what n_tiles counts)."""
    total = 0
    for tx in range(GRID):
        for ty in range(GRID):
            sub = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            seen = -np.ones(sub.shape, int)
            for r in range(T):
                for c in range(T):
                    if seen[r, c] >= 0:
                        continue
                    total += 1
                    q = deque([(r, c)])
                    seen[r, c] = 1
                    while q:
                        rr, cc = q.popleft()
                        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                            r2, c2 = rr + dr, cc + dc
                            if (
                                0 <= r2 < T and 0 <= c2 < T
                                and seen[r2, c2] < 0
                                and sub[r2, c2] == sub[rr, cc]
                            ):
                                seen[r2, c2] = 1
                                q.append((r2, c2))
    return total


def test_polygonize_matches_flood_fill(spark):
    rng = np.random.default_rng(17)
    full = (rng.integers(0, 3, (W, W)) * 80).astype(np.uint8)  # 3 classes, blobby
    rows = [
        (_cell(tx, ty), full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID)
        for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got = {r["component"]: r for r in polygonize(tiles, T, (GRID, GRID)).collect()}

    exp = _flood(full)
    assert set(got) == set(exp), (len(got), len(exp))
    for comp, (value, n_px) in exp.items():
        assert got[comp]["value"] == value
        assert got[comp]["n_px"] == n_px
    # n_pieces counts local pieces; sum over components == total pieces
    assert sum(r["n_pieces"] for r in got.values()) == _local_piece_count(full)


def test_polygonize_poison_tile_counted(spark):
    rows = [
        (_cell(0, 0), np.zeros((T, T), np.uint8).tobytes()),
        (_cell(1, 0), b"\x00bad"),
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got = {r["component"]: r for r in polygonize(tiles, T, (2, 1)).collect()}
    assert got[-1]["n_pieces"] == 1  # the poison row counts bad tiles
    assert got[0]["n_px"] == T * T  # the good tile is one flat component


def test_sieve_matches_scalar_reference(spark):
    """Distributed sieve == a scalar reference implementing the same
    rule: components < threshold merge into their largest-shared-
    boundary neighbor (ties → lowest component id), chains compressed
    transitively, mutual-small cycles merged into the cycle's min id."""
    from gdal_drivers_spark.operators.polygonize import sieve

    rng = np.random.default_rng(29)
    full = (rng.integers(0, 3, (W, W)) * 80).astype(np.uint8)
    rows = [
        (_cell(tx, ty), full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID)
        for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    threshold = 12
    got = {r["component"]: (r["value"], r["n_px"], r["n_absorbed"])
           for r in sieve(tiles, T, (GRID, GRID), threshold).collect()}

    # ---- scalar reference
    lab = -np.ones(full.shape, int)
    comp_of = {}
    for r in range(W):
        for c in range(W):
            if lab[r, c] >= 0:
                continue
            members = [(r, c)]
            q = deque([(r, c)])
            lab[r, c] = 0
            while q:
                rr, cc = q.popleft()
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    r2, c2 = rr + dr, cc + dc
                    if (0 <= r2 < W and 0 <= c2 < W and lab[r2, c2] < 0
                            and full[r2, c2] == full[rr, cc]):
                        lab[r2, c2] = 0
                        q.append((r2, c2))
                        members.append((r2, c2))
            key = min(rr2 * W + cc2 for rr2, cc2 in members)
            for m in members:
                comp_of[m] = key
    sizes, values = {}, {}
    for (r, c), k in comp_of.items():
        sizes[k] = sizes.get(k, 0) + 1
        values[k] = int(full[r, c])
    adj = {}
    for r in range(W):
        for c in range(W):
            for dr, dc in ((0, 1), (1, 0)):
                r2, c2 = r + dr, c + dc
                if r2 < W and c2 < W and comp_of[(r, c)] != comp_of[(r2, c2)]:
                    a, b = sorted((comp_of[(r, c)], comp_of[(r2, c2)]))
                    adj[(a, b)] = adj.get((a, b), 0) + 1
    remap = {}
    for k, n in sizes.items():
        if n >= threshold:
            continue
        nbrs = {}
        for (a, b), cnt in adj.items():
            if a == k:
                nbrs[b] = nbrs.get(b, 0) + cnt
            elif b == k:
                nbrs[a] = nbrs.get(a, 0) + cnt
        if nbrs:
            remap[k] = max(nbrs.items(), key=lambda kv: (kv[1], -kv[0]))[0]

    def final_of(c):
        path, seen = [], set()
        while c in remap and c not in seen:
            seen.add(c)
            path.append(c)
            c = remap[c]
        if c in seen:
            return min(path[path.index(c):])
        return c

    exp = {}
    for k, n in sizes.items():
        f = final_of(k)
        v, px, ab = exp.get(f, (values[f], 0, -1))
        exp[f] = (v, px + n, ab + 1)
    assert got == exp
    # sanity: the fixture actually exercised merges
    assert any(ab > 0 for _, _, ab in exp.values())


def test_sieve_apply_matches_scalar_relabel(spark):
    """The output raster: every pixel of a sub-threshold component
    carries its absorber's value; all other bytes untouched. Compared
    against a scalar relabel of the stitched raster; pass-through
    tiles report n_relabeled=0."""
    from gdal_drivers_spark.operators.polygonize import sieve_apply

    rng = np.random.default_rng(29)
    full = (rng.integers(0, 3, (W, W)) * 80).astype(np.uint8)
    rows = [
        (_cell(tx, ty), full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID)
        for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    threshold = 12
    got = {r["cell"]: r for r in sieve_apply(tiles, T, (GRID, GRID), threshold).collect()}

    # scalar reference: flood fill, remap, relabel
    lab = -np.ones(full.shape, int)
    comp_of = np.zeros(full.shape, int)
    for r in range(W):
        for c in range(W):
            if lab[r, c] >= 0:
                continue
            members = [(r, c)]
            q = deque([(r, c)])
            lab[r, c] = 0
            while q:
                rr, cc = q.popleft()
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    r2, c2 = rr + dr, cc + dc
                    if (0 <= r2 < W and 0 <= c2 < W and lab[r2, c2] < 0
                            and full[r2, c2] == full[rr, cc]):
                        lab[r2, c2] = 0
                        q.append((r2, c2))
                        members.append((r2, c2))
            key = min(rr2 * W + cc2 for rr2, cc2 in members)
            for rr2, cc2 in members:
                comp_of[rr2, cc2] = key
    sizes, values = {}, {}
    for r in range(W):
        for c in range(W):
            k = comp_of[r, c]
            sizes[k] = sizes.get(k, 0) + 1
            values[k] = int(full[r, c])
    adj = {}
    for r in range(W):
        for c in range(W):
            for dr, dc in ((0, 1), (1, 0)):
                r2, c2 = r + dr, c + dc
                if r2 < W and c2 < W and comp_of[r, c] != comp_of[r2, c2]:
                    a, b = sorted((comp_of[r, c], comp_of[r2, c2]))
                    adj[(a, b)] = adj.get((a, b), 0) + 1
    remap = {}
    for k, n in sizes.items():
        if n >= threshold:
            continue
        nbrs = {}
        for (a, b), cnt in adj.items():
            if a == k:
                nbrs[b] = nbrs.get(b, 0) + cnt
            elif b == k:
                nbrs[a] = nbrs.get(a, 0) + cnt
        if nbrs:
            remap[k] = max(nbrs.items(), key=lambda kv: (kv[1], -kv[0]))[0]

    def final_of(cc):
        path, seen = [], set()
        while cc in remap and cc not in seen:
            seen.add(cc)
            path.append(cc)
            cc = remap[cc]
        if cc in seen:
            return min(path[path.index(cc):])
        return cc

    expect = full.copy()
    for r in range(W):
        for c in range(W):
            k = comp_of[r, c]
            f = final_of(k)
            if f != k:
                expect[r, c] = values[f]

    total_rel = 0
    for tx in range(GRID):
        for ty in range(GRID):
            r = got[_cell(tx, ty)]
            tile = np.frombuffer(bytes(r["tile"]), np.uint8).reshape(T, T)
            ref = expect[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            assert (tile == ref).all(), (tx, ty)
            src = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            assert r["n_relabeled"] == int((ref != src).sum())
            total_rel += r["n_relabeled"]
    assert total_rel > 0  # the fixture actually relabeled pixels


def test_contour_polygons_matches_banded_flood_fill(spark):
    from gdal_drivers_spark.operators.polygonize import contour_polygons

    rng = np.random.default_rng(29)
    full = rng.integers(0, 256, (W, W)).astype(np.uint8)
    levels = [64, 128, 192]
    rows = [
        (_cell(tx, ty),
         full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID) for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got = contour_polygons(tiles, levels, T, (GRID, GRID)).collect()
    banded = np.searchsorted(np.array(levels), full, side="right").astype(np.uint8)
    exp = _flood(banded)
    gmap = {r["component"]: r for r in got}
    assert set(gmap) == set(exp)
    bounds = {0: (-1, 64), 1: (64, 128), 2: (128, 192), 3: (192, -1)}
    for comp, (band, n_px) in exp.items():
        r = gmap[comp]
        assert r["band"] == band and r["n_px"] == n_px
        assert (r["lo"], r["hi"]) == bounds[band]


def test_contour_polygons_validation_and_poison(spark):
    from gdal_drivers_spark.operators.polygonize import contour_polygons

    tiles = spark.createDataFrame(
        pd.DataFrame([(_cell(0, 0), b"short")], columns=["cell", "tile"]))
    import pytest
    with pytest.raises(ValueError):
        contour_polygons(tiles, [], T, (1, 1))
    with pytest.raises(ValueError):
        contour_polygons(tiles, [10, 10], T, (1, 1))
    rows = [(_cell(tx, ty), bytes(T * T) if (tx, ty) != (0, 0) else b"bad")
            for tx in range(GRID) for ty in range(GRID)]
    tiles2 = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got = contour_polygons(tiles2, [128], T, (GRID, GRID)).collect()
    poison = [r for r in got if r["component"] == -1]
    assert len(poison) == 1 and poison[0]["n_pieces"] == 1
    assert poison[0]["lo"] == -1 and poison[0]["hi"] == -1


def test_contour_polygons_null_tile_poisons_not_crashes(spark):
    from gdal_drivers_spark.operators.polygonize import contour_polygons

    rows = [(_cell(tx, ty), bytes(T * T) if (tx, ty) != (1, 1) else None)
            for tx in range(GRID) for ty in range(GRID)]
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "tile"]), "cell long, tile binary")
    got = contour_polygons(tiles, [128], T, (GRID, GRID)).collect()
    poison = [r for r in got if r["component"] == -1]
    assert len(poison) == 1 and poison[0]["n_pieces"] == 1


def _flood8(full: np.ndarray):
    """8-connectivity twin of _flood."""
    lab = -np.ones(full.shape, int)
    comps = {}
    nbrs = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)]
    for r in range(W):
        for c in range(W):
            if lab[r, c] >= 0:
                continue
            q = deque([(r, c)])
            lab[r, c] = 1
            members = [(r, c)]
            while q:
                rr, cc = q.popleft()
                for dr, dc in nbrs:
                    r2, c2 = rr + dr, cc + dc
                    if (0 <= r2 < W and 0 <= c2 < W and lab[r2, c2] < 0
                            and full[r2, c2] == full[rr, cc]):
                        lab[r2, c2] = 1
                        q.append((r2, c2))
                        members.append((r2, c2))
            key = min(rr2 * W + cc2 for rr2, cc2 in members)
            comps[key] = (int(full[r, c]), len(members))
    return comps


def test_polygonize_8conn_matches_flood_fill(spark):
    rng = np.random.default_rng(47)
    full = (rng.integers(0, 3, (W, W)) * 80).astype(np.uint8)
    rows = [
        (_cell(tx, ty),
         full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID) for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got = {r["component"]: r for r in
           polygonize(tiles, T, (GRID, GRID), connectivity=8).collect()}
    exp = _flood8(full)
    exp4 = _flood(full)
    assert len(exp) < len(exp4)  # 8-conn genuinely merges across diagonals
    assert set(got) == set(exp)
    for comp, (v, n) in exp.items():
        assert got[comp]["value"] == v and got[comp]["n_px"] == n


def test_polygonize_8conn_checkerboard_two_components(spark):
    gy, gx = np.mgrid[0:W, 0:W]
    full = (((gx + gy) % 2) * 255).astype(np.uint8)
    rows = [
        (_cell(tx, ty),
         full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T].tobytes())
        for tx in range(GRID) for ty in range(GRID)
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows, columns=["cell", "tile"]))
    got8 = polygonize(tiles, T, (GRID, GRID), connectivity=8).collect()
    assert len(got8) == 2  # each color one diagonal-connected component
    by_v = {r["value"]: r for r in got8}
    assert by_v[0]["component"] == 0 and by_v[255]["component"] == 1
    assert by_v[0]["n_px"] == by_v[255]["n_px"] == W * W // 2
    got4 = polygonize(tiles, T, (GRID, GRID), connectivity=4)
    assert got4.count() == W * W  # 4-conn: every pixel its own component
    import pytest
    with pytest.raises(ValueError):
        polygonize(tiles, T, (GRID, GRID), connectivity=6)
