from ecmm428_pycart_spark.sources.geojson import read_geojson, write_geojson
from ecmm428_pycart_spark.sources.csv import (
    read_csv, read_pop_csv, read_world_pop_wide, read_wkt_csv,
)
from ecmm428_pycart_spark.sources.jsonl import (
    DOCUMENT_SCHEMA, read_jsonl, write_jsonl,
)

__all__ = ["read_geojson", "write_geojson", "read_csv", "read_pop_csv",
           "read_world_pop_wide", "read_wkt_csv",
           "read_jsonl", "write_jsonl", "DOCUMENT_SCHEMA"]
