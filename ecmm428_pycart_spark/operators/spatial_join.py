"""Spatial join strategies (SURVEY.md §4.3.1 — R13/R14 building blocks).

Plain Catalyst has no spatial join, so these compose built-ins:

- **grid-bucket distance self-join** — assign each point to a fixed grid
  cell, probe the 3×3 cell neighbourhood via a 9-way explode, equi-join on
  cell id, then exact distance filter. One shuffle on the cell key; cell
  size is chosen ≥ the max search radius so the 3×3 ring is sufficient.
  At 100 TB the equi-join shuffles hash-partitioned cell keys instead of
  the reference's O(n²) scan-per-row (pycart/cartogram.py:357).

- **vertex-bucket contiguity join** — see operators/borders.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def distance_range_self_join(points: DataFrame, x: str, y: str,
                             max_dist: float, key: str) -> DataFrame:
    """All ordered pairs (focal, neighbour) of distinct points with
    0 < dist(focal, neighbour) ≤ max_dist (exclusive handled by caller).

    ``points`` must carry columns ``key, x, y`` (+ any payload). Output has
    every focal column prefixed ``f_`` and neighbour column prefixed
    ``n_``, plus ``dist``.

    Implements R13 (pycart/cartogram.py:357) as a shuffle-bounded equi-join
    instead of a per-row full scan.
    """
    cell = float(max_dist) if max_dist > 0 else 1.0
    with_cell = points.withColumn("_cx", F.floor(F.col(x) / F.lit(cell))) \
                      .withColumn("_cy", F.floor(F.col(y) / F.lit(cell)))

    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _OFFSETS])
    probe = (with_cell.withColumn("_o", F.explode(offs))
             .withColumn("_px", F.col("_cx") + F.col("_o.dx"))
             .withColumn("_py", F.col("_cy") + F.col("_o.dy"))
             .drop("_o"))

    f = probe.select([F.col(c).alias(f"f_{c}") for c in points.columns]
                     + [F.col("_px"), F.col("_py")])
    n = with_cell.select([F.col(c).alias(f"n_{c}") for c in points.columns]
                         + [F.col("_cx"), F.col("_cy")])

    pairs = f.join(
        n,
        (F.col("_px") == F.col("_cx")) & (F.col("_py") == F.col("_cy")),
        "inner",
    ).drop("_px", "_py", "_cx", "_cy")

    pairs = pairs.filter(F.col(f"f_{key}") != F.col(f"n_{key}"))
    dist = F.hypot(F.col(f"n_{x}") - F.col(f"f_{x}"),
                   F.col(f"n_{y}") - F.col(f"f_{y}"))
    return (pairs.withColumn("dist", dist)
                 .filter(F.col("dist") <= F.lit(float(max_dist))))
