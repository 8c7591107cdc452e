"""Public scalar-function namespace — the engine's analog of
``pyspark.sql.functions`` for its domain-specific columns.

    from ecmm428_pycart_spark import functions as EF
    df.withColumn("a", EF.st_area("geom"))
"""

from ecmm428_pycart_spark.geometry.udfs import (
    st_area,
    st_bbox,
    st_buffer_point,
    st_centroid,
    st_centroid_xy,
    st_convex_hull,
    st_perimeter,
    st_scale_about_centroid,
    st_shared_border_length,
    st_simplify_dp,
    st_translate,
    st_vertices,
    st_wkb_to_wkt,
    st_wkt_to_wkb,
)
from ecmm428_pycart_spark.operators.relational import to_int_col
from ecmm428_pycart_spark.datapipe.text import (
    fingerprint,
    token_count,
    tokens,
)
from ecmm428_pycart_spark.datapipe.dedup import shingle_set
from ecmm428_pycart_spark.datapipe.similarity import cosine, dot, norm2, sign_bucket

__all__ = [
    "st_area", "st_bbox", "st_buffer_point", "st_centroid", "st_centroid_xy",
    "st_convex_hull", "st_perimeter", "st_scale_about_centroid",
    "st_shared_border_length", "st_simplify_dp",
    "st_translate", "st_vertices", "st_wkb_to_wkt", "st_wkt_to_wkb",
    "to_int_col", "fingerprint", "token_count", "tokens", "shingle_set",
    "cosine", "dot", "norm2", "sign_bucket",
]
