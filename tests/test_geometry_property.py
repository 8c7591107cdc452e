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
