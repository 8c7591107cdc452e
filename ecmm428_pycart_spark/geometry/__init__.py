from ecmm428_pycart_spark.geometry import core
from ecmm428_pycart_spark.geometry.core import (
    dumps, loads, wkt_dumps, wkt_loads, from_geojson,
    area, centroid, perimeter, bounds, scale_about, translate_geom,
    buffer_point, shared_boundary_length, vertices,
)

__all__ = [
    "core", "dumps", "loads", "wkt_dumps", "wkt_loads", "from_geojson",
    "area", "centroid", "perimeter", "bounds", "scale_about",
    "translate_geom", "buffer_point", "shared_boundary_length", "vertices",
]
