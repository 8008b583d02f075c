"""Geo package tests: S2 cell-ID self-consistency, region predicate
geometry, shapeData pivoting, and the Flux ``geo.`` stages end-to-end.

Reference surface: the Flux ``experimental/geo`` package the pinned
influxdb:2.0.9 image ships (region records, lat/lon field convention,
s2_cell_id tokens). S2 parity is structural (public-algorithm
implementation + property checks) — the container has no s2 library to
cross-check golden tokens against; COVERAGE.md documents that bound.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.frontends.flux import (
    FluxError,
    execute_flux,
)
from aws_greengrass_labs_database_influxdb_spark.operators.geo import (
    EARTH_RADIUS_KM,
    region_bbox,
    region_grid_predicate,
    region_strict_predicate,
    s2_cell_contains,
    s2_cell_ids,
    s2_cell_level,
    s2_token_of,
    shape_data,
)

T0 = 1704067200_000_000_000


# --------------------------------------------------------------------- S2

def test_s2_levels_and_containment():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.9, 89.9, 3000)
    lon = rng.uniform(-180, 180, 3000)
    for lvl in (0, 4, 10, 16, 30):
        ids = s2_cell_ids(lat, lon, lvl)
        assert {s2_cell_level(int(c)) for c in ids} == {lvl}
    coarse = s2_cell_ids(lat, lon, 8)
    leaf = s2_cell_ids(lat, lon, 30)
    assert all(s2_cell_contains(int(a), int(b)) for a, b in zip(coarse, leaf))
    # a cell NEVER contains the leaf of a far-away point
    far = s2_cell_ids(-lat, (lon + 180) % 360 - 180, 30)
    same = sum(s2_cell_contains(int(a), int(b)) for a, b in zip(coarse, far))
    assert same == 0


def test_s2_all_faces_reachable_and_tokens():
    # face centers: +x -> 0, +y -> 1, +z -> 2, -x -> 3, -y -> 4, -z -> 5
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = s2_cell_ids(lats, lons, 30).view(np.uint64)
    assert (ids >> np.uint64(61)).tolist() == [0, 1, 2, 3, 4, 5]
    for c in ids.view(np.int64):
        t = s2_token_of(int(c))
        assert 1 <= len(t) <= 16
        assert int(t.ljust(16, "0"), 16) == int(c) & 0xFFFFFFFFFFFFFFFF


def test_s2_locality():
    """Points metres apart share fine cells; cells partition space (two
    points in the same level-k cell are within ~2x the cell diagonal)."""
    a = s2_cell_ids(np.array([47.61]), np.array([-122.33]), 12)[0]
    b = s2_cell_ids(np.array([47.6101]), np.array([-122.3301]), 12)[0]
    c = s2_cell_ids(np.array([47.7]), np.array([-122.2]), 12)[0]
    assert a == b != c


# ------------------------------------------------------------ region algebra

def _hav_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lat2 - lat1) / 2
    dn = math.radians(lon2 - lon1) / 2
    x = math.sin(dl) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dn) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(x))


@pytest.fixture(scope="module")
def latlon_df(spark):
    rng = np.random.default_rng(5)
    rows = [
        (float(la), float(lo))
        for la, lo in zip(rng.uniform(39, 43, 400), rng.uniform(-76, -71, 400))
    ]
    return spark.createDataFrame(rows, "lat double, lon double").cache()


def test_region_box_circle_polygon(latlon_df):
    box = {"minLat": 40.0, "maxLat": 41.0, "minLon": -74.5, "maxLon": -73.0}
    got = latlon_df.filter(
        region_strict_predicate(box, F.col("lat"), F.col("lon"))
    ).collect()
    for r in latlon_df.collect():
        expect = 40.0 <= r.lat <= 41.0 and -74.5 <= r.lon <= -73.0
        assert ((r.lat, r.lon) in {(g.lat, g.lon) for g in got}) == expect

    circle = {"lat": 40.71, "lon": -74.0, "radius": 120.0}
    got = {
        (g.lat, g.lon)
        for g in latlon_df.filter(
            region_strict_predicate(circle, F.col("lat"), F.col("lon"))
        ).collect()
    }
    for r in latlon_df.collect():
        d = _hav_km(r.lat, r.lon, 40.71, -74.0)
        if abs(d - 120.0) > 1e-6:  # avoid float-boundary flakes
            assert ((r.lat, r.lon) in got) == (d < 120.0)

    tri = {"points": [
        {"lat": 40.0, "lon": -75.0},
        {"lat": 42.5, "lon": -73.5},
        {"lat": 40.0, "lon": -72.0},
    ]}
    got = {
        (g.lat, g.lon)
        for g in latlon_df.filter(
            region_strict_predicate(tri, F.col("lat"), F.col("lon"))
        ).collect()
    }

    def in_tri(la, lo):  # planar ray cast, same convention
        pts = [(40.0, -75.0), (42.5, -73.5), (40.0, -72.0)]
        inside = False
        for k in range(3):
            la1, lo1 = pts[k]
            la2, lo2 = pts[(k + 1) % 3]
            if la1 == la2:
                continue
            if (la1 > la) != (la2 > la) and lo < (lo2 - lo1) * (la - la1) / (
                la2 - la1
            ) + lo1:
                inside = not inside
        return inside

    for r in latlon_df.collect():
        assert ((r.lat, r.lon) in got) == in_tri(r.lat, r.lon)


def test_grid_filter_is_superset_of_strict(latlon_df):
    for region in (
        {"lat": 40.71, "lon": -74.0, "radius": 150.0},
        {"points": [
            {"lat": 40.0, "lon": -75.0},
            {"lat": 42.5, "lon": -73.5},
            {"lat": 40.0, "lon": -72.0},
        ]},
    ):
        strict = latlon_df.filter(
            region_strict_predicate(region, F.col("lat"), F.col("lon"))
        )
        grid = latlon_df.filter(
            region_grid_predicate(region, F.col("lat"), F.col("lon"))
        )
        assert strict.exceptAll(grid).count() == 0  # no exact row escapes
        assert grid.count() >= strict.count()


def test_region_bbox_circle_pole_clamp():
    lo_la, hi_la, lo_lo, hi_lo = region_bbox(
        {"lat": 89.5, "lon": 10.0, "radius": 200.0}
    )
    assert hi_la == 90.0 and (lo_lo, hi_lo) == (-180.0, 180.0)


# ------------------------------------------------------------- frame shape

@pytest.fixture(scope="module")
def geo_pts(spark):
    """Canonical points frame with lat/lon fields: two bikes moving
    through Manhattan-ish coordinates, one minute apart."""
    from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import (
        lines_df_to_points,
    )

    lines = []
    for i in range(8):
        t = T0 + i * 60_000_000_000
        lines.append(f"bike,id=b1 lat={40.70 + i * 0.01},lon={-74.00 + i * 0.01} {t}")
        lines.append(f"bike,id=b2 lat={47.60 + i * 0.01},lon={-122.33 + i * 0.01} {t}")
    return lines_df_to_points(
        spark.createDataFrame([(ln,) for ln in lines], "value string")
    ).cache()


def test_shape_data_pivots_and_tokens(geo_pts):
    shaped = shape_data(geo_pts, "lat", "lon", 12).collect()
    assert len(shaped) == 16  # 2 bikes x 8 timestamps, one row each
    for r in shaped:
        assert r.lat is not None and r.lon is not None
        assert 1 <= len(r.s2_cell_id) <= 16
    by_bike = {r.tags["id"] for r in shaped}
    assert by_bike == {"b1", "b2"}
    # tokens are local: the two cities never share one
    t1 = {r.s2_cell_id for r in shaped if r.tags["id"] == "b1"}
    t2 = {r.s2_cell_id for r in shaped if r.tags["id"] == "b2"}
    assert not (t1 & t2)


# ---------------------------------------------------------------- Flux glue

def test_flux_geo_filter_rows(geo_pts):
    out = execute_flux(
        geo_pts,
        'import "experimental/geo"\n'
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        "|> geo.filterRows(region: {minLat: 40.0, maxLat: 41.0, "
        "minLon: -75.0, maxLon: -73.0})",
    ).collect()
    assert len(out) == 8 and all(r.tags["id"] == "b1" for r in out)
    # circle around Seattle catches only b2
    out = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        "|> geo.filterRows(region: {lat: 47.62, lon: -122.3, radius: 25.0})",
    ).collect()
    assert len(out) == 8 and all(r.tags["id"] == "b2" for r in out)
    # polygon (triangle over NYC), strict: false = grid cover only
    tri = ("{points: [{lat: 40.0, lon: -75.0}, {lat: 42.0, lon: -73.9}, "
           "{lat: 40.0, lon: -73.0}]}")
    strict = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        f"|> geo.filterRows(region: {tri})",
    ).count()
    loose = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        f"|> geo.filterRows(region: {tri}, strict: false)",
    ).count()
    assert strict <= loose == 8


def test_flux_geo_shape_data_and_st_fns(geo_pts):
    out = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        "|> geo.shapeData(latField: \"lat\", lonField: \"lon\", level: 14) "
        "|> map(fn: (r) => ({ r with d: geo.ST_Distance("
        "region: {lat: 40.70, lon: -74.00}, "
        "geometry: {lat: r.lat, lon: r.lon}) }))",
    ).collect()
    assert len(out) == 16
    for r in out:
        ref = _hav_km(r.lat, r.lon, 40.70, -74.00)
        assert abs(r.d - ref) < 1e-9
        assert len(r.s2_cell_id) >= 1
    # ST_DWithin as a filter predicate: 50 km of downtown NYC -> b1 only
    out = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        "|> geo.toRows() "
        "|> filter(fn: (r) => geo.ST_DWithin(region: {lat: 40.70, lon: -74.0}, "
        "geometry: {lat: r.lat, lon: r.lon}, distance: 50.0))",
    ).collect()
    assert len(out) == 8 and all(r.tags["id"] == "b1" for r in out)
    # ST_Contains in map: boolean flag matches the box
    out = execute_flux(
        geo_pts,
        'from(bucket:"b") |> range(start: 2024-01-01T00:00:00Z) '
        "|> geo.toRows() "
        "|> map(fn: (r) => ({ r with nyc: geo.ST_Contains("
        "region: {minLat: 40.0, maxLat: 41.0, minLon: -75.0, maxLon: -73.0}, "
        "geometry: {lat: r.lat, lon: r.lon}) }))",
    ).collect()
    assert {(r.tags["id"], r.nyc) for r in out} == {("b1", True), ("b2", False)}


def test_flux_geo_typed_errors(geo_pts):
    with pytest.raises(FluxError, match="region"):
        execute_flux(
            geo_pts,
            'from(bucket:"b") |> geo.filterRows(region: 12)',
        )
    with pytest.raises(FluxError, match="lat"):
        execute_flux(
            geo_pts,
            'from(bucket:"b") |> geo.filterRows(region: {points: [{lat: 1.0}]})',
        )
    with pytest.raises(FluxError, match="geometry"):
        execute_flux(
            geo_pts,
            'from(bucket:"b") |> geo.toRows() |> map(fn: (r) => ({r with '
            "d: geo.ST_Distance(region: {lat: 1.0, lon: 2.0})}))",
        )


def test_s2_face_uv_roundtrips_through_published_face_table():
    """The two public S2 tables must compose to identity: XYZ →
    (face, u, v) via ValidFaceXYZtoUV, then back via FaceUVtoXYZ
    ((1,u,v), (-u,1,v), (-u,-v,1), (-1,-v,-u), (v,-1,-u), (v,u,-1)),
    normalized. The r9 ADVICE sign bug (dividing by the positive
    magnitude on faces 3-5) negates u and v there — internally
    consistent, so only this cross-table identity catches it."""
    import numpy as np

    from aws_greengrass_labs_database_influxdb_spark.operators.geo import _xyz_to_face_uv

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(500, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    x, y, z = pts[:, 0].copy(), pts[:, 1].copy(), pts[:, 2].copy()
    face, u, v = _xyz_to_face_uv(x, y, z)

    one = np.ones_like(u)
    table = {
        0: lambda u, v: (one, u, v),
        1: lambda u, v: (-u, one, v),
        2: lambda u, v: (-u, -v, one),
        3: lambda u, v: (-one, -v, -u),
        4: lambda u, v: (v, -one, -u),
        5: lambda u, v: (v, u, -one),
    }
    rx = np.empty_like(x)
    ry = np.empty_like(y)
    rz = np.empty_like(z)
    for f, fn in table.items():
        m = face == f
        a, b, c = fn(u, v)
        rx[m], ry[m], rz[m] = a[m], b[m], c[m]
    norm = np.sqrt(rx * rx + ry * ry + rz * rz)
    assert np.allclose(rx / norm, x, atol=1e-12)
    assert np.allclose(ry / norm, y, atol=1e-12)
    assert np.allclose(rz / norm, z, atol=1e-12)


def test_s2_face_center_tokens_golden():
    """Level-0 golden tokens: the six face cells have ids
    (face << 61) | 2^60 → tokens 1/3/5/7/9/b — a library-independent
    fact of the public cell-id layout. Faces 3-5 (negative dominant
    axis: the Americas / south pole band) pin the r10 sign fix."""
    import numpy as np

    from aws_greengrass_labs_database_influxdb_spark.operators.geo import (
        s2_cell_ids,
        s2_token_of,
    )

    centers = [  # (lat, lon) of each face center
        (0.0, 0.0), (0.0, 90.0), (90.0, 0.0),
        (0.0, 180.0), (0.0, -90.0), (-90.0, 0.0),
    ]
    lat = np.array([c[0] for c in centers])
    lon = np.array([c[1] for c in centers])
    ids = s2_cell_ids(lat, lon, 0)
    toks = [s2_token_of(int(i)) for i in ids]
    assert toks == ["1", "3", "5", "7", "9", "b"]


def test_s2_negative_face_uv_signs():
    """Spot signs on faces 3-5 per ValidFaceXYZtoUV (signed
    denominator). Face 3 (x<0): u=z/x so a northern point has u<0;
    face 4 (y<0): v=-x/y so x>0 gives v>0; face 5 (z<0): u=-y/z so
    y>0 gives u>0."""
    import numpy as np

    from aws_greengrass_labs_database_influxdb_spark.operators.geo import _xyz_to_face_uv

    # face 3: lon 180, lat +10 → x<0, z>0 ⇒ u = z/x < 0
    lat, lon = np.radians(10.0), np.radians(180.0)
    x = np.array([np.cos(lat) * np.cos(lon)])
    y = np.array([np.cos(lat) * np.sin(lon)])
    z = np.array([np.sin(lat)])
    f, u, v = _xyz_to_face_uv(x, y, z)
    assert f[0] == 3 and u[0] < 0

    # face 4: lon -80 (x>0, y<0 dominant) ⇒ v = -x/y > 0
    lat, lon = np.radians(0.0), np.radians(-80.0)
    x = np.array([np.cos(lat) * np.cos(lon)])
    y = np.array([np.cos(lat) * np.sin(lon)])
    z = np.array([np.sin(lat)])
    f, u, v = _xyz_to_face_uv(x, y, z)
    assert f[0] == 4 and v[0] > 0

    # face 5: lat -80, lon 90 (z<0 dominant, y>0) ⇒ u = -y/z > 0
    lat, lon = np.radians(-80.0), np.radians(90.0)
    x = np.array([np.cos(lat) * np.cos(lon)])
    y = np.array([np.cos(lat) * np.sin(lon)])
    z = np.array([np.sin(lat)])
    f, u, v = _xyz_to_face_uv(x, y, z)
    assert f[0] == 5 and u[0] > 0


def test_s2_deep_level_published_golden_tokens():
    """Cross-library parity at REAL query levels (r10 verdict #4): the
    s2geometry project's own published test vector — lat/lng
    (49.703498679, 11.770681595) is leaf cell 0x47a1cbd595522b39
    (the example quoted across the C++/Go/Python S2 ports' cell-id
    docs and tests). An exact 64-bit match rules out every curve/
    projection/orientation divergence at once (chance agreement is
    2^-60). Levels 10-29 assert direct level-L computation against the
    published leaf truncated by the library's documented parent
    arithmetic (id & -lsb | lsb) — computed HERE with plain ints, not
    via the code under test."""
    import numpy as np

    from aws_greengrass_labs_database_influxdb_spark.operators.geo import (
        s2_cell_ids,
        s2_cell_level,
        s2_token_of,
    )

    LAT, LON = 49.703498679, 11.770681595
    PUBLISHED_LEAF = 0x47A1CBD595522B39

    got_leaf = int(s2_cell_ids(np.array([LAT]), np.array([LON]), 30)[0])
    assert got_leaf & 0xFFFFFFFFFFFFFFFF == PUBLISHED_LEAF
    assert s2_token_of(got_leaf) == "47a1cbd595522b39"

    for level in (10, 12, 15, 20, 25, 29):
        lsb = 1 << (2 * (30 - level))
        want = (PUBLISHED_LEAF & ~(2 * lsb - 1)) | lsb  # C++ parent()
        got = int(s2_cell_ids(np.array([LAT]), np.array([LON]), level)[0])
        got &= 0xFFFFFFFFFFFFFFFF
        assert got == want, (level, hex(got), hex(want))
        assert s2_cell_level(got) == level

    # token spelling at a mid level: level-12 ids carry 27 prefix bits
    # + the marker → 7 hex digits after trailing-zero stripping
    lsb12 = 1 << (2 * (30 - 12))
    tok12 = s2_token_of((PUBLISHED_LEAF & ~(2 * lsb12 - 1)) | lsb12)
    got12 = s2_token_of(int(s2_cell_ids(np.array([LAT]), np.array([LON]), 12)[0]))
    assert got12 == tok12 == "47a1cbd"
