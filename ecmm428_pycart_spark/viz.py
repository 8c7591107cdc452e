"""Figure sink (S7 — reference main.py:255-347 matplotlib gallery).

The reference renders cartograms to PNG via matplotlib at the client.
matplotlib is not in this container, so this module ships two
dependency-free sinks with the same role — a *client-side* helper that
collects the (small, final) cartogram table and draws it:

- ``to_svg``: vector output (round 2).
- ``to_png`` (round 4): RASTER output matching the reference's PNG
  file format — even-odd scanline polygon fill into a numpy RGB
  raster, encoded with the repo's own stdlib PNG encoder
  (``png_bytes_rgb``) and verifiable with its own decoder
  (``decode_png_pixels``). No matplotlib anywhere.

Never distributed; the engine's outputs are DataFrames, rendering is
presentation.
"""

from __future__ import annotations

import html

import numpy as np
from pyspark.sql import DataFrame

from ecmm428_pycart_spark.geometry import core

_PALETTE = ["#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
            "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac"]


def _rings(geom):
    gtype, data = geom
    if gtype == "Polygon":
        return data
    if gtype == "MultiPolygon":
        return [r for rings in data for r in rings]
    return []


def to_svg(df: DataFrame, path: str, geometry_col: str = "geometry",
           label_col: str | None = None, width: int = 640,
           height: int = 640, stroke: str = "#333") -> str:
    """Render the geometry column of a (collected) DataFrame to an SVG
    file; returns the SVG text. Flips y (SVG y grows downward)."""
    rows = df.select(*( [geometry_col] + ([label_col] if label_col else []) )) \
             .collect()
    # filter geometry and row together so labels/colors stay aligned when
    # some rows carry null geometry
    pairs = [(core.loads(bytes(r[geometry_col])), r) for r in rows
             if r[geometry_col] is not None]
    geoms = [g for g, _ in pairs]
    rows = [r for _, r in pairs]
    if not geoms:
        raise ValueError("to_svg: no geometries to render")
    bxs = [core.bounds(g) for g in geoms]
    minx = min(b[0] for b in bxs)
    miny = min(b[1] for b in bxs)
    maxx = max(b[2] for b in bxs)
    maxy = max(b[3] for b in bxs)
    spanx = (maxx - minx) or 1.0
    spany = (maxy - miny) or 1.0
    pad = 10.0
    sc = min((width - 2 * pad) / spanx, (height - 2 * pad) / spany)

    def tx(x):
        return pad + (x - minx) * sc

    def ty(y):
        return height - pad - (y - miny) * sc

    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" '
             f'width="{width}" height="{height}" '
             f'viewBox="0 0 {width} {height}">']
    for i, (g, row) in enumerate(zip(geoms, rows)):
        fill = _PALETTE[i % len(_PALETTE)]
        title = (html.escape(str(row[label_col]))
                 if label_col else f"feature {i}")
        d = []
        for ring in _rings(g):
            pts = " L ".join(f"{tx(x):.2f} {ty(y):.2f}" for x, y in ring[:-1])
            d.append(f"M {pts} Z")
        if d:
            parts.append(
                f'<path d="{" ".join(d)}" fill="{fill}" fill-opacity="0.7" '
                f'stroke="{stroke}" stroke-width="0.8" fill-rule="evenodd">'
                f"<title>{title}</title></path>")
    parts.append("</svg>")
    svg = "\n".join(parts)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def _hex_rgb(s: str) -> tuple[int, int, int]:
    return (int(s[1:3], 16), int(s[3:5], 16), int(s[5:7], 16))


def _fill_even_odd(mask: np.ndarray, rings, tx, ty) -> None:
    """Even-odd scanline fill of ``rings`` (device-space transform via
    tx/ty) into a boolean raster. A pixel is inside when its CENTER
    (x+0.5, y+0.5) crosses an odd number of edges to the left — the
    same parity rule as SVG's fill-rule="evenodd" and
    core.contains_point."""
    height, width = mask.shape
    segs = []
    for ring in rings:
        pts = [(tx(x), ty(y)) for x, y in ring]
        segs += [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]
    if not segs:
        return
    ymin = max(0, int(min(min(p1[1], p2[1]) for p1, p2 in segs)))
    ymax = min(height - 1, int(max(max(p1[1], p2[1]) for p1, p2 in segs)) + 1)
    for y in range(ymin, ymax + 1):
        yc = y + 0.5
        xs = []
        for (x1, y1), (x2, y2) in segs:
            if (y1 <= yc < y2) or (y2 <= yc < y1):
                xs.append(x1 + (yc - y1) / (y2 - y1) * (x2 - x1))
        xs.sort()
        for a, b in zip(xs[::2], xs[1::2]):
            i0 = max(0, int(np.ceil(a - 0.5)))
            i1 = min(width - 1, int(np.floor(b - 0.5)))
            if i1 >= i0:
                mask[y, i0:i1 + 1] = True


def to_png(df: DataFrame, path: str, geometry_col: str = "geometry",
           width: int = 320, height: int = 320,
           background: tuple = (255, 255, 255)) -> bytes:
    """Render the geometry column to a PNG file (reference main.py:347
    parity: the figure sink writes the same FILE FORMAT, matplotlib
    replaced by an even-odd rasterizer + the repo's stdlib PNG codec).
    Returns the PNG bytes; same collect-then-draw client-side contract
    and coordinate mapping (y flipped) as ``to_svg``."""
    from ecmm428_pycart_spark.datapipe.multimodal import png_encode_adaptive

    rows = df.select(geometry_col).collect()
    geoms = [core.loads(bytes(r[geometry_col])) for r in rows
             if r[geometry_col] is not None]
    if not geoms:
        raise ValueError("to_png: no geometries to render")
    bxs = [core.bounds(g) for g in geoms]
    minx = min(b[0] for b in bxs)
    miny = min(b[1] for b in bxs)
    spanx = (max(b[2] for b in bxs) - minx) or 1.0
    spany = (max(b[3] for b in bxs) - miny) or 1.0
    pad = 10.0
    sc = min((width - 2 * pad) / spanx, (height - 2 * pad) / spany)

    def tx(x):
        return pad + (x - minx) * sc

    def ty(y):
        return height - pad - (y - miny) * sc

    raster = np.empty((height, width, 3), dtype=np.uint8)
    raster[:] = np.asarray(background, dtype=np.uint8)
    for i, g in enumerate(geoms):
        mask = np.zeros((height, width), dtype=bool)
        _fill_even_odd(mask, _rings(g), tx, ty)
        raster[mask] = _hex_rgb(_PALETTE[i % len(_PALETTE)])
    png = png_encode_adaptive(raster)
    with open(path, "wb") as f:
        f.write(png)
    return png
