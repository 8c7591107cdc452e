from ecmm428_pycart_spark.plans.cartogram import Cartogram

__all__ = ["Cartogram"]
