"""Property-based tests (hypothesis) for the numpy geometry kernels —
invariants that must hold for arbitrary simple polygons."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ecmm428_pycart_spark.geometry import core


@st.composite
def convex_polygons(draw):
    """Random well-conditioned convex polygon: points on a circle with
    angular gaps bounded away from zero (degenerate slivers have
    ill-conditioned centroids/collinearity and are not meaningful
    inputs for these invariants)."""
    n = draw(st.integers(min_value=3, max_value=12))
    cx = draw(st.floats(-100.0, 100.0, allow_nan=False))
    cy = draw(st.floats(-100.0, 100.0, allow_nan=False))
    r = draw(st.floats(1.0, 100.0, allow_nan=False))
    gaps = draw(st.lists(st.floats(0.2, 1.0, allow_nan=False),
                         min_size=n, max_size=n))
    total = sum(gaps)
    angles = []
    acc = 0.0
    for g in gaps:
        angles.append(acc / total * 2 * math.pi)
        acc += g
    pts = [(cx + r * math.cos(a), cy + r * math.sin(a)) for a in angles]
    pts.append(pts[0])
    return ("Polygon", [np.asarray(pts, dtype="f8")])


@given(convex_polygons())
@settings(max_examples=60, deadline=None)
def test_wkb_roundtrip_preserves_everything(poly):
    back = core.loads(core.dumps(poly))
    np.testing.assert_array_equal(back[1][0], poly[1][0])


@given(convex_polygons())
@settings(max_examples=60, deadline=None)
def test_wkt_roundtrip_area(poly):
    back = core.wkt_loads(core.wkt_dumps(poly))
    a0, a1 = core.area(poly), core.area(back)
    # WKT prints %.9g; area error bounded by coordinate quantization
    # times perimeter scale, not relative to (possibly small) area
    scale = max(abs(v) for v in core.bounds(poly))
    assert abs(a0 - a1) <= 1e-6 * scale * core.perimeter(poly)


@given(convex_polygons(), st.floats(0.1, 5.0))
@settings(max_examples=60, deadline=None)
def test_scale_area_quadratic(poly, f):
    c = core.centroid(poly)
    scaled = core.scale_about(poly, f, f, c)
    assert abs(core.area(scaled) - core.area(poly) * f * f) \
        <= 1e-7 * max(1.0, core.area(poly) * f * f)
    # centroid is a fixed point of scaling about itself
    c2 = core.centroid(scaled)
    assert abs(c2[0] - c[0]) < 1e-6 and abs(c2[1] - c[1]) < 1e-6


@given(convex_polygons(), st.floats(-100, 100), st.floats(-100, 100))
@settings(max_examples=60, deadline=None)
def test_translate_moves_centroid(poly, dx, dy):
    c = core.centroid(poly)
    t = core.translate_geom(poly, dx, dy)
    c2 = core.centroid(t)
    assert abs(c2[0] - (c[0] + dx)) < 1e-6
    assert abs(c2[1] - (c[1] + dy)) < 1e-6
    assert abs(core.perimeter(t) - core.perimeter(poly)) < 1e-6


@given(convex_polygons())
@settings(max_examples=40, deadline=None)
def test_shared_boundary_self_is_perimeter(poly):
    """A polygon's shared boundary with itself is its full perimeter."""
    got = core.shared_boundary_length(poly, poly)
    assert abs(got - core.perimeter(poly)) < 1e-6 * max(1.0, core.perimeter(poly))


def _point_seg_dist(p, a, b):
    seg = (b[0] - a[0], b[1] - a[1])
    L2 = seg[0] * seg[0] + seg[1] * seg[1]
    if L2 == 0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = max(0.0, min(1.0, ((p[0] - a[0]) * seg[0]
                           + (p[1] - a[1]) * seg[1]) / L2))
    return math.hypot(p[0] - (a[0] + t * seg[0]),
                      p[1] - (a[1] + t * seg[1]))


@given(st.lists(st.tuples(st.floats(-50, 50, allow_nan=False),
                          st.floats(-50, 50, allow_nan=False)),
                min_size=3, max_size=40))
@settings(max_examples=60, deadline=None)
def test_convex_hull_properties(pts):
    """Hull invariants on arbitrary point clouds (fed in as a
    degenerate 'polygon' ring): every input point is inside-or-on the
    hull, hull vertices are a subset of the inputs, and hulling is
    idempotent."""
    arr = np.asarray(pts + [pts[0]], dtype="f8")
    uniq = np.unique(arr[:-1], axis=0)
    if uniq.shape[0] < 3:
        return
    # skip fully-collinear clouds (hull undefined as a polygon)
    v0, rest = uniq[0], uniq[1:]
    cr = (rest[:, 0] - v0[0]) * (rest[-1, 1] - v0[1]) \
        - (rest[:, 1] - v0[1]) * (rest[-1, 0] - v0[0])
    if np.all(np.abs(cr) < 1e-9):
        return
    try:
        hull = core.convex_hull(("Polygon", [arr]))
    except ValueError:
        return
    hv = core.vertices(hull)
    in_set = {tuple(p) for p in uniq}
    assert all(tuple(p) in in_set for p in hv)
    ring = np.vstack([hv, hv[:1]])
    # inside-or-on: every input point left-of-or-on each CCW edge
    for p in uniq:
        for i in range(len(ring) - 1):
            a, b = ring[i], ring[i + 1]
            cross = ((b[0] - a[0]) * (p[1] - a[1])
                     - (b[1] - a[1]) * (p[0] - a[0]))
            assert cross >= -1e-6 * max(1.0, abs(cross))
    again = core.convex_hull(hull)
    assert np.array_equal(np.asarray(sorted(map(tuple, core.vertices(again)))),
                          np.asarray(sorted(map(tuple, hv))))


@given(st.lists(st.floats(0.0, 10.0, allow_nan=False),
                min_size=8, max_size=30),
       st.floats(0.05, 3.0, allow_nan=False))
@settings(max_examples=60, deadline=None)
def test_simplify_dp_properties(heights, tol):
    """DP invariants on a fan polygon with random radial bumps: output
    vertices are a subset of the input ring, the ring stays closed,
    and every dropped vertex lies within tol of the simplified
    boundary (the DP guarantee)."""
    n = len(heights)
    pts = []
    for i, h in enumerate(heights):
        ang = 2 * math.pi * i / n
        r = 20.0 + h
        pts.append((r * math.cos(ang), r * math.sin(ang)))
    ring = np.asarray(pts + [pts[0]], dtype="f8")
    simp = core.simplify_dp(("Polygon", [ring]), tol)
    out = core.vertices(simp)
    in_set = {tuple(p) for p in pts}
    assert all(tuple(p) in in_set for p in out)
    closed = simp[1][0]
    assert (closed[0] == closed[-1]).all()
    segs = [(closed[i], closed[i + 1]) for i in range(len(closed) - 1)]
    out_set = {tuple(p) for p in out}
    for p in pts:
        if tuple(p) in out_set:
            continue
        d = min(_point_seg_dist(p, a, b) for a, b in segs)
        assert d <= tol + 1e-9, (p, d, tol)
