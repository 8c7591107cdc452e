"""Generate an SVG gallery mirroring the reference's out/gallery PNGs
(non-contiguous + dorling over the test fixtures and synthetic grids).

Usage: python tools/run_gallery.py [out_dir]   (default out/gallery)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "out/gallery"
    os.makedirs(out_dir, exist_ok=True)

    from ecmm428_pycart_spark import Cartogram, get_spark
    from ecmm428_pycart_spark.geometry import core
    from ecmm428_pycart_spark.viz import to_png, to_svg

    spark = get_spark("gallery")

    # 4-square reference fixture
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
    pop = {"TL": 100.0, "BL": 200.0, "TR": 400.0, "BR": 150.0}
    rows = [(i, n, pop[n],
             core.dumps(("Polygon", [np.asarray(coords[n], dtype="f8")])))
            for i, n in enumerate(["TL", "BL", "TR", "BR"])]
    squares = spark.createDataFrame(
        rows, "region_idx long, name string, Population double, geometry binary")
    cart = Cartogram(squares, "Population", "name", idx_field="region_idx")
    noncon = cart.non_contiguous()
    dorl = cart.dorling(iterations=100)
    to_svg(noncon, f"{out_dir}/squares_noncon.svg", label_col="name")
    to_svg(dorl, f"{out_dir}/squares_dorling.svg", label_col="name")
    # raster twins in the reference's own output format (main.py:347)
    to_png(noncon, f"{out_dir}/squares_noncon.png")
    to_png(dorl, f"{out_dir}/squares_dorling.png")

    # 10x10 synthetic grid, both dorling modes
    side = 10
    grows = []
    for k in range(side * side):
        gx, gy = k % side, k // side
        ring = np.asarray([(gx, gy), (gx + 1, gy), (gx + 1, gy + 1),
                           (gx, gy + 1), (gx, gy)], dtype="f8")
        grows.append((k, f"r{k}", float((k % 13) + 1),
                      core.dumps(("Polygon", [ring]))))
    grid = spark.createDataFrame(
        grows, "region_idx long, name string, value double, geometry binary")
    gcart = Cartogram(grid, "value", "name", idx_field="region_idx")
    to_svg(gcart.non_contiguous(), f"{out_dir}/grid_noncon.svg")
    to_svg(gcart.dorling(iterations=50, mode="reference"),
           f"{out_dir}/grid_dorling_reference.svg")
    # scalable mode pays ~seconds of fixed distributed-loop cost per
    # iteration at toy sizes; 10 iterations is plenty for the gallery
    scal = gcart.dorling(iterations=10, mode="scalable")
    to_svg(scal, f"{out_dir}/grid_dorling_scalable.svg")
    to_png(scal, f"{out_dir}/grid_dorling_scalable.png")
    print(f"wrote gallery (5 SVGs + 3 PNGs) to {out_dir}")


if __name__ == "__main__":
    main()
