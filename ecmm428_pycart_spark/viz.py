"""Figure sink (S7 — reference main.py:255-347 matplotlib gallery).

The reference renders cartograms to PNG via matplotlib at the client.
matplotlib is not in this container, so this module emits SVG directly —
zero dependencies, same role: a *client-side* helper that collects the
(small, final) cartogram table and draws it. Never distributed; the
engine's outputs are DataFrames, rendering is presentation.
"""

from __future__ import annotations

import html

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
