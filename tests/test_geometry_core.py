"""Unit tests for the pure-numpy geometry kernels (no Spark needed).

Expected values are computed analytically from the fixture coordinates
(FIXTURES.md F1/F2); the reference's own goldens (SURVEY.md §5) are the
same arithmetic done by shapely.
"""

import math

import numpy as np
import pytest

from ecmm428_pycart_spark.geometry import core

SQ = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0), (0.0, 0.0)]


def poly(pts):
    return ("Polygon", [np.asarray(pts, dtype="f8")])


def test_wkb_roundtrip_polygon():
    g = poly(SQ)
    assert core.loads(core.dumps(g))[0] == "Polygon"
    np.testing.assert_allclose(core.loads(core.dumps(g))[1][0],
                               np.asarray(SQ))


def test_wkb_roundtrip_point_multipolygon():
    p = ("Point", (1.5, -2.5))
    assert core.loads(core.dumps(p)) == ("Point", (1.5, -2.5))
    mp = ("MultiPolygon", [[np.asarray(SQ)], [np.asarray(SQ) + 10.0]])
    back = core.loads(core.dumps(mp))
    assert back[0] == "MultiPolygon" and len(back[1]) == 2


def test_wkt_roundtrip():
    g = core.wkt_loads("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")
    assert core.area(g) == pytest.approx(2.0)
    s = core.wkt_dumps(g)
    assert core.area(core.wkt_loads(s)) == pytest.approx(2.0)
    mp = core.wkt_loads(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert mp[0] == "MultiPolygon" and len(mp[1]) == 2
    assert core.area(mp) == pytest.approx(2.0)


def test_area_with_hole():
    outer = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8")
    hole = np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], dtype="f8")
    assert core.area(("Polygon", [outer, hole])) == pytest.approx(15.0)


def test_centroid_rect():
    cx, cy = core.centroid(poly(SQ))
    assert (cx, cy) == pytest.approx((1.0, 0.5))


def test_centroid_orientation_independent():
    cw = poly(list(reversed(SQ)))
    assert core.centroid(cw) == pytest.approx((1.0, 0.5))


def test_perimeter():
    assert core.perimeter(poly(SQ)) == pytest.approx(6.0)


def test_scale_about_centroid():
    g = core.scale_about(poly(SQ), 2.0, 2.0, core.centroid(poly(SQ)))
    assert core.area(g) == pytest.approx(8.0)
    assert core.centroid(g) == pytest.approx((1.0, 0.5))


def test_translate():
    g = core.translate_geom(poly(SQ), 10.0, -5.0)
    assert core.centroid(g) == pytest.approx((11.0, -4.5))


def test_buffer_point_area_close_to_circle():
    g = core.buffer_point(3.0, 4.0, 2.0)
    # 32-gon area = 0.5*n*r^2*sin(2pi/n)
    n = 32
    expected = 0.5 * n * 4.0 * math.sin(2 * math.pi / n)
    assert core.area(g) == pytest.approx(expected)
    assert core.centroid(g) == pytest.approx((3.0, 4.0), abs=1e-9)


def test_shared_boundary_full_edge():
    a = poly([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    b = poly([(1, 0), (2, 0), (2, 1), (1, 1), (1, 0)])
    assert core.shared_boundary_length(a[0] and a, b) == pytest.approx(1.0)


def test_shared_boundary_partial_overlap():
    a = poly([(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)])
    b = poly([(1, 1), (3, 1), (3, 2), (1, 2), (1, 1)])  # shares y=1 from x=1..2
    assert core.shared_boundary_length(a, b) == pytest.approx(1.0)


def test_shared_boundary_corner_only_is_zero():
    a = poly([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    b = poly([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)])
    assert core.shared_boundary_length(a, b) == pytest.approx(0.0)


def test_shared_boundary_split_segments():
    # b's shared edge is split into two segments; total must count once
    a = poly([(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)])
    b = ("Polygon", [np.asarray(
        [(0, 1), (1, 1), (2, 1), (2, 2), (0, 2), (0, 1)], dtype="f8")])
    assert core.shared_boundary_length(a, b) == pytest.approx(2.0)


def test_vertices_drop_closing():
    v = core.vertices(poly(SQ))
    assert v.shape == (4, 2)


def test_fixture_noncontiguous_scales():
    """FIXTURES.md F2 golden: scale = sqrt(density / max density)."""
    coords = {
        "TL": [(-3.634135, 50.446137), (-3.569522, 50.446137),
               (-3.569522, 50.486784), (-3.634135, 50.486784),
               (-3.634135, 50.446137)],
        "BL": [(-3.569522, 50.446137), (-3.634135, 50.446137),
               (-3.634135, 50.407205), (-3.569522, 50.407205),
               (-3.569522, 50.446137)],
        "TR": [(-3.504629, 50.446137), (-3.504629, 50.486784),
               (-3.569522, 50.486784), (-3.569522, 50.446137),
               (-3.504629, 50.446137)],
        "BR": [(-3.569522, 50.407205), (-3.504629, 50.407205),
               (-3.504629, 50.446137), (-3.569522, 50.446137),
               (-3.569522, 50.407205)],
    }
    pop = {"TL": 100, "BL": 200, "TR": 400, "BR": 150}
    dens = {k: pop[k] / core.area(poly(coords[k])) for k in pop}
    mx = max(dens.values())
    scales = {k: math.sqrt(d / mx) for k, d in dens.items()}
    assert scales["TR"] == pytest.approx(1.0)
    assert scales["TL"] == pytest.approx(0.50108, abs=2e-4)
    assert scales["BL"] == pytest.approx(0.72408, abs=2e-4)
    assert scales["BR"] == pytest.approx(0.62571, abs=2e-4)


def test_multipolygon_with_hole_full_pipeline():
    """MultiPolygon where one part has a hole: area/centroid/perimeter
    consistency through WKB and WKT roundtrips."""
    outer = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8")
    hole = np.asarray([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)], dtype="f8")
    island = np.asarray([(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)],
                        dtype="f8")
    mp = ("MultiPolygon", [[outer, hole], [island]])
    assert core.area(mp) == pytest.approx(16.0 - 4.0 + 4.0)
    assert core.perimeter(mp) == pytest.approx(16.0 + 8.0 + 8.0)
    # centroid: ring-hole donut is symmetric at (2,2), island at (11,11)
    cx, cy = core.centroid(mp)
    want_x = (12.0 * 2.0 + 4.0 * 11.0) / 16.0
    assert (cx, cy) == pytest.approx((want_x, want_x))
    for rt in (core.loads(core.dumps(mp)), core.wkt_loads(core.wkt_dumps(mp))):
        assert core.area(rt) == pytest.approx(core.area(mp), rel=1e-6)
        assert core.centroid(rt) == pytest.approx((cx, cy), rel=1e-6)


def test_ewkb_srid_flag_skipped():
    # EWKB point with SRID flag (PostGIS style): type | 0x20000000, then SRID
    import struct
    buf = (b"\x01" + struct.pack("<I", 1 | 0x20000000)
           + struct.pack("<I", 4326) + struct.pack("<dd", 3.0, 4.0))
    assert core.loads(buf) == ("Point", (3.0, 4.0))


def test_ewkb_z_rejected_explicitly():
    import struct
    # EWKB Z flag
    buf = (b"\x01" + struct.pack("<I", 1 | 0x80000000)
           + struct.pack("<ddd", 1.0, 2.0, 3.0))
    with pytest.raises(ValueError, match="Z/M"):
        core.loads(buf)
    # ISO Z point (type 1001)
    buf = b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd", 1.0, 2.0, 3.0)
    with pytest.raises(ValueError, match="Z/M"):
        core.loads(buf)


def test_contains_point_even_odd():
    """PIP kernel: interior/exterior, hole flips parity, multi-part
    accumulates, and the half-open boundary convention is stable
    (left/bottom in, right/top out on an axis-aligned unit square)."""
    from ecmm428_pycart_spark.geometry import core

    sq = core.wkt_loads("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert core.contains_point(sq, 0.5, 0.5)
    assert not core.contains_point(sq, 1.5, 0.5)
    hole = core.wkt_loads(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert core.contains_point(hole, 0.5, 2.0)
    assert not core.contains_point(hole, 2.0, 2.0)
    multi = core.wkt_loads(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)),"
        " ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert core.contains_point(multi, 5.5, 5.5)
    assert not core.contains_point(multi, 3.0, 3.0)
    # half-open convention on the boundary
    assert core.contains_point(sq, 0.0, 0.5)       # left edge in
    assert not core.contains_point(sq, 1.0, 0.5)   # right edge out


def test_convex_hull_kernel():
    """Monotone chain: L-shape hull drops the concave corner, collinear
    points are removed, degenerate inputs raise."""
    import numpy as np
    import pytest

    from ecmm428_pycart_spark.geometry import core

    s = 2.0
    ring = [(0, 0), (s, 0), (s, s / 2), (s / 2, s / 2), (s / 2, s),
            (0, s), (0, 0)]
    h = core.convex_hull(("Polygon", [np.asarray(ring, dtype="f8")]))
    pts = core.vertices(h)
    assert pts.shape[0] == 5                       # pentagon, corner cut
    assert abs(core.area(h) - 7 * s * s / 8) < 1e-12
    assert abs(core.perimeter(h) - (3 * s + s / np.sqrt(2))) < 1e-12
    # collinear midpoints must not survive
    sq = [(0, 0), (1, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    h2 = core.convex_hull(("Polygon", [np.asarray(sq, dtype="f8")]))
    assert core.vertices(h2).shape[0] == 4
    # hull of a hull is idempotent
    assert core.vertices(core.convex_hull(h2)).shape[0] == 4
    with pytest.raises(ValueError):
        core.convex_hull(("Polygon", [np.asarray(
            [(0, 0), (1, 1), (0, 0)], dtype="f8")]))


def test_simplify_dp_kernel():
    """DP simplification: bumps below tolerance collapse to the
    4-corner square, a tolerance below bump height keeps all 8
    vertices, the ring stays closed, and non-polygons raise."""
    import numpy as np
    import pytest

    from ecmm428_pycart_spark.geometry import core

    s, h = 2.0, 0.2
    ring = [(0, 0), (s / 2, -h), (s, 0), (s + h, s / 2), (s, s),
            (s / 2, s + h), (0, s), (-h, s / 2), (0, 0)]
    g = ("Polygon", [np.asarray(ring, dtype="f8")])
    coarse = core.simplify_dp(g, s / 5)
    assert core.vertices(coarse).shape[0] == 4
    assert abs(core.area(coarse) - s * s) < 1e-9
    fine = core.simplify_dp(g, h / 2)
    assert core.vertices(fine).shape[0] == 8
    assert abs(core.area(fine) - (s * s + 2 * s * h)) < 1e-9
    r = fine[1][0]
    assert (r[0] == r[-1]).all()            # closed ring
    with pytest.raises(NotImplementedError):
        core.simplify_dp(("Point", (0.0, 0.0)), 0.1)
