from ecmm428_pycart_spark.operators import relational, spatial_join, borders

__all__ = ["relational", "spatial_join", "borders"]
