from ecmm428_pycart_spark.datapipe import (
    components,
    dedup,
    kmeans,
    multimodal,
    similarity,
    text,
)

__all__ = ["components", "dedup", "kmeans", "multimodal", "similarity", "text"]
