"""Property-based invariants (SURVEY §5.3) via hypothesis — pure-core
properties, no Spark session (fast, wide input coverage):

- zigzag(unzigzag) = id and vice versa (mvt.cpp:241-244);
- command word pack/split round-trip (mvt.cpp:171-179);
- cell pack/unpack round-trip, parent/children closure, neighbor
  bounds clamp (mask.cpp:229-256 / mbtiles.cpp:146-152 semantics);
- TMS flip involution (mbtiles.cpp:154-155);
- Morton interleave round-trip;
- snap-to-grid: result aligned and contains the input
  (blender.cpp:416-429);
- feather weight ∈ [0,1]; zero-overlap degrades to the hard
  point-in-rect indicator (blender.cpp:590-624);
- geometry command-stream encode→decode round-trip (cursor cumsum);
- image codec round-trips: raw/png exact, thumb PSNR ≥ 40 dB.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_drivers_spark.core import codecs, geometry, mvtcodec, qcell

I64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)


@given(st.lists(I64, min_size=1, max_size=64))
def test_zigzag_roundtrip(vs):
    v = np.asarray(vs, np.int64)
    assert (mvtcodec.unzigzag(mvtcodec.zigzag(v)) == v).all()
    nn = np.abs(v)  # zigzag domain: unsigned
    assert (mvtcodec.zigzag(mvtcodec.unzigzag(nn)) == nn).all()


@given(st.integers(0, 7), st.integers(0, 2**28))
def test_cmd_word_roundtrip(op, count):
    w = mvtcodec.cmd_word(op, count)
    got_op, got_count = mvtcodec.cmd_split(np.int64(w))
    assert (int(got_op), int(got_count)) == (op, count)


@given(st.integers(0, 20), st.data())
def test_cell_pack_unpack_parent_children(z, data):
    n = 1 << z
    x = data.draw(st.integers(0, n - 1))
    y = data.draw(st.integers(0, n - 1))
    c = qcell.pack(z, x, y)
    zz, xx, yy = (int(v) for v in qcell.unpack(c))
    assert (zz, xx, yy) == (z, x, y)
    kids = qcell.children(c)
    assert len(kids) == 4
    for k in kids:
        assert int(qcell.parent(k)) == int(c)
    if z > 0:
        p = qcell.parent(c)
        pz, px, py = (int(v) for v in qcell.unpack(p))
        assert (pz, px, py) == (z - 1, x // 2, y // 2)


@given(st.integers(1, 12), st.data(), st.integers(1, 3))
def test_neighbors_clamped_in_bounds(z, data, ring):
    n = 1 << z
    x = data.draw(st.integers(0, n - 1))
    y = data.draw(st.integers(0, n - 1))
    nb = qcell.neighbors(qcell.pack(z, x, y), ring=ring)
    # exact-ring semantics: every in-bounds cell at Chebyshev distance
    # == ring, and nothing else (empty iff the whole ring is clamped out)
    expected = {
        (xx, yy)
        for xx in range(max(0, x - ring), min(n, x + ring + 1))
        for yy in range(max(0, y - ring), min(n, y + ring + 1))
        if max(abs(xx - x), abs(yy - y)) == ring
    }
    got = set()
    for c in np.asarray(nb).ravel():
        zz, xx, yy = (int(v) for v in qcell.unpack(np.int64(c)))
        assert zz == z
        got.add((xx, yy))
    assert got == expected


@given(st.integers(0, 28), st.data())
def test_tms_flip_involution(z, data):
    y = data.draw(st.integers(0, (1 << z) - 1))
    assert qcell.tms_flip(z, qcell.tms_flip(z, y)) == y


@given(st.integers(0, 2**26 - 1), st.integers(0, 2**26 - 1))
def test_morton_roundtrip(x, y):
    xx, yy = qcell.unmorton(qcell.morton(np.int64(x), np.int64(y)))
    assert (int(xx), int(yy)) == (x, y)


@given(
    st.floats(-100, 100), st.floats(-100, 100),
    st.floats(0.001, 50), st.floats(0.001, 50),
    st.integers(1, 64), st.integers(1, 64),
)
def test_snap_contains_and_aligns(x0, y0, w, h, rx_i, ry_i):
    rx, ry = 1.0 / rx_i, 1.0 / ry_i
    x1, y1 = x0 + w, y0 + h
    sx0, sy0, sx1, sy1 = geometry.snap_extents(x0, y0, x1, y1, 0.0, 0.0, rx, ry)
    assert sx0 <= x0 + 1e-9 and sy0 <= y0 + 1e-9
    assert sx1 >= x1 - 1e-9 and sy1 >= y1 - 1e-9
    for v, r in ((sx0, rx), (sx1, rx), (sy0, ry), (sy1, ry)):
        assert abs(v / r - round(v / r)) < 1e-6


@given(st.data())
def test_feather_weight_bounds_and_indicator(data):
    pts = data.draw(
        st.lists(st.tuples(st.floats(0, 1), st.floats(0, 1)), min_size=1, max_size=32)
    )
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    vx0, vy0 = 0.25, 0.25
    vx1, vy1 = 0.75, 0.75
    ow = data.draw(st.floats(0.01, 0.3))
    w = geometry.feather_weight(px, py, vx0, vy0, vx1, vy1, ow, ow)
    assert ((w >= 0) & (w <= 1)).all()
    hard = geometry.feather_weight(px, py, vx0, vy0, vx1, vy1, 0, 0)
    ind = geometry.points_in_rect(px, py, vx0, vy0, vx1, vy1).astype(float)
    assert (hard == ind).all()


@given(
    st.sampled_from([mvtcodec.GEOM_POINT, mvtcodec.GEOM_LINESTRING]),
    st.lists(
        st.lists(st.tuples(st.integers(0, 4095), st.integers(0, 4095)), min_size=2, max_size=12),
        min_size=1, max_size=4,
    ),
)
def test_geometry_stream_roundtrip(gt, parts):
    arrs = [np.asarray(p, np.int64) for p in parts]
    stream = mvtcodec.encode_geometry(gt, arrs)
    dec = mvtcodec.decode_geometry(gt, stream)
    flat_in = np.vstack(arrs)
    flat_out = np.vstack(dec)
    assert (flat_out == flat_in).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=3, max_size=10, unique=True,
    )
)
def test_polygon_stream_roundtrip_closes_rings(ring):
    arr = np.asarray(ring, np.int64)
    stream = mvtcodec.encode_geometry(mvtcodec.GEOM_POLYGON, [arr])
    dec = mvtcodec.decode_geometry(mvtcodec.GEOM_POLYGON, stream)
    assert len(dec) == 1
    out = dec[0]
    assert (out[-1] == out[0]).all()  # closed (mvt.cpp:341-348)
    assert (out[:-1] == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 48), st.integers(1, 48), st.sampled_from([1, 3]),
    st.integers(0, 2**31),
)
def test_codec_roundtrips(w, h, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8).astype(np.uint8)
    assert (codecs.decode(codecs.encode_raw(img)) == img).all()
    assert (codecs.decode(codecs.encode_png(img)) == img).all()
    thumb = codecs.decode(codecs.encode_thumb(img))
    assert codecs.psnr(img, thumb) >= 40.0
    dct = codecs.decode(codecs.encode_dct(img))  # via magic sniff
    assert dct.shape == img.shape
    assert codecs.psnr(img, dct) >= 40.0


@given(
    st.integers(0, 2**63 - 1),
    st.sets(st.integers(0, 62), max_size=3),
)
def test_phash_band_pigeonhole(h, flips):
    """The recall-1 invariant behind dedup.phash_near_dup: any pair
    within Hamming distance 3 agrees exactly on ≥1 of 4 contiguous
    16-bit bands (3 flipped bits cannot touch 4 disjoint bands)."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    bands = lambda v: [(v >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(a == b for a, b in zip(bands(h), bands(h2)))


@given(
    st.integers(0, 6),
    st.data(),
)
def test_trafo_inverse_roundtrip(z, data):
    """world_to_tile(tile_to_world(p)) == p for any tile and any
    integer tile-local coords within the extent (the encode sink's
    exactness precondition)."""
    n = 1 << z
    tx = data.draw(st.integers(0, n - 1))
    ty = data.draw(st.integers(0, n - 1))
    extent = data.draw(st.sampled_from([256, 4096]))
    pts = np.array(
        [
            [data.draw(st.integers(0, extent)), data.draw(st.integers(0, extent))]
            for _ in range(3)
        ],
        np.int64,
    )
    w = mvtcodec.tile_to_world([pts], z, tx, ty, extent)
    back = mvtcodec.world_to_tile(w, z, tx, ty, extent)
    assert (back[0] == pts).all()


# ------------------------------------------------------------- protobuf wire

@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=200))
def test_proto_packed_varint_roundtrip(vals):
    """Vectorized packed-varint decode inverts the encoder, and the
    encoder is byte-identical to per-value LEB128."""
    from gdal_drivers_spark.core import mvtproto

    arr = np.asarray(vals, np.uint64)
    blob = mvtproto.encode_packed_varints(arr)
    assert blob == b"".join(mvtproto.encode_varint(int(v)) for v in vals)
    back = mvtproto.decode_packed_varints(blob)
    assert (back == arr).all()


@given(
    st.sampled_from(["string", "float", "double", "int", "uint", "sint", "bool"]),
    st.data(),
)
def test_proto_value_roundtrip(kind, data):
    from gdal_drivers_spark.core import mvtproto

    if kind == "string":
        v = data.draw(st.text(max_size=40))
    elif kind in ("float", "double"):
        v = data.draw(st.floats(allow_nan=False, allow_infinity=False, width=32))
    elif kind == "int":
        v = data.draw(st.integers(-(2**63), 2**63 - 1))
    elif kind == "uint":
        v = data.draw(st.integers(0, 2**64 - 1))
    elif kind == "sint":
        v = data.draw(st.integers(-(2**63), 2**63 - 1))
    else:
        v = data.draw(st.booleans())
    k2, v2 = mvtproto.decode_value(mvtproto.encode_value(kind, v))
    assert k2 == kind
    if kind == "float":
        assert v2 == np.float32(v)
    else:
        assert v2 == v


@given(
    st.sampled_from([mvtcodec.GEOM_POINT, mvtcodec.GEOM_LINESTRING]),
    st.lists(
        st.lists(st.tuples(st.integers(0, 4095), st.integers(0, 4095)), min_size=2, max_size=12),
        min_size=1, max_size=4,
    ),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), max_size=4),
)
def test_proto_tile_equals_array_encoding(gt, parts, tagpairs):
    """VERDICT r02 criterion: proto-encode→decode == array-encode→decode.
    The same command stream framed through real protobuf must decode to
    the identical feature (id, tags, geom_type, geometry) the engine's
    int-array layer encoding carries."""
    from gdal_drivers_spark.core import mvtproto

    arrs = [np.asarray(p, np.int64) for p in parts]
    stream = mvtcodec.encode_geometry(gt, arrs)  # the array encoding
    tags = np.asarray([t for p in tagpairs for t in p], np.uint64)
    feat = {"id": 7, "tags": tags, "geom_type": gt,
            "geometry": stream.astype(np.uint64)}
    blob = mvtproto.encode_tile(
        [{"name": "l", "extent": 4096, "version": 2,
          "keys": ["a", "b", "c", "d"],
          "values": [("string", "x"), ("int", 1), ("bool", True), ("double", 0.5)],
          "features": [feat]}]
    )
    layers = mvtproto.decode_tile(blob)
    assert len(layers) == 1 and len(layers[0]["features"]) == 1
    f = layers[0]["features"][0]
    assert f["id"] == 7 and f["geom_type"] == gt
    assert (f["geometry"] == stream).all()
    assert (f["tags"] == tags.astype(np.int64)).all()
    # and the geometry decodes to the same vertices either way
    dec = mvtcodec.decode_geometry(gt, np.asarray(f["geometry"], np.int64))
    assert (np.vstack(dec) == np.vstack(arrs)).all()


# ------------------------------------------------------------- SRS

@given(st.floats(-179.9, 179.9), st.floats(-84.9, 84.9))
def test_mercator_roundtrip(lon, lat):
    """4326→3857→4326 is the identity to float64 precision (both
    directions are the published closed-form spherical formulas)."""
    from gdal_drivers_spark.core.srs import get_transform

    f = get_transform("EPSG:4326", "EPSG:3857")
    b = get_transform("EPSG:3857", "EPSG:4326")
    assert abs(float(b.np_x(f.np_x(np.array([lon]))))- lon) < 1e-9
    assert abs(float(b.np_y(f.np_y(np.array([lat]))))- lat) < 1e-9


def test_srs_unknown_pair_raises():
    from gdal_drivers_spark.core.srs import get_transform

    import pytest as _pytest

    # (EPSG:32633 then EPSG:2154 were the canonical unsupported
    # examples; r03 made UTM dynamic and pre-registered Lambert-93, so
    # probe a genuinely unknown code — British National Grid needs the
    # Airy ellipsoid + OSTN shift, out of scope)
    with _pytest.raises(ValueError, match="no transform"):
        get_transform("EPSG:4326", "EPSG:27700")
    with _pytest.raises(ValueError, match="no transform"):
        get_transform("EPSG:32633", "EPSG:27700")  # composition hub can't reach it
    # identity for equal names, any name
    t = get_transform("EPSG:32633", "EPSG:32633")
    assert float(t.np_x(np.array([5.0]))) == 5.0


@given(st.binary(max_size=300))
@settings(max_examples=300)
def test_proto_decode_never_crashes_outside_caught_set(buf):
    """Poison-tile guarantee: arbitrary bytes either decode or raise
    exactly the exception set decode_features_proto catches
    (ValueError/IndexError/UnicodeDecodeError) — nothing else escapes
    to kill a stage."""
    from gdal_drivers_spark.core import mvtproto

    try:
        layers = mvtproto.decode_tile(bytes(buf))
        assert isinstance(layers, list)
    except (ValueError, IndexError, UnicodeDecodeError):
        pass
