"""GeoJSON FeatureCollection source (reference main.py:15-28, S1/S2).

Strategy: ``spark.read.text(wholetext=True)`` gives one row per file, so a
directory of GeoJSON files parallelizes per-file; a ``mapInPandas`` stage
parses features with the stdlib json module and emits one row per feature
with properties as a string map and geometry converted to WKB. This avoids
``spark.read.json`` schema-inference problems with mixed Polygon /
MultiPolygon coordinate nesting depths, while keeping the scan distributed.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecmm428_pycart_spark.geometry import core

_FEATURE_SCHEMA = T.StructType([
    T.StructField("feature_index", T.LongType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    T.StructField("geometry", T.BinaryType()),
    T.StructField("source_file", T.StringType()),
])


def _parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for text, fname in zip(pdf["value"], pdf["_file"]):
            fc = json.loads(text)
            for i, feat in enumerate(fc.get("features", [])):
                props = {
                    k: (None if v is None else str(v))
                    for k, v in (feat.get("properties") or {}).items()
                }
                geo = feat.get("geometry")
                wkb = None
                if geo is not None:
                    wkb = core.dumps(core.from_geojson(geo["type"], geo["coordinates"]))
                rows.append((i, props, wkb, fname))
        yield pd.DataFrame(rows, columns=["feature_index", "properties",
                                          "geometry", "source_file"])


def read_geojson(spark: SparkSession, path: str,
                 property_cols: list[str] | None = None) -> DataFrame:
    """Load GeoJSON file(s) → one row per feature.

    Columns: ``feature_index`` (position within its file — the reference's
    positional-index key, SURVEY.md §1.4), ``properties`` map, ``geometry``
    WKB binary. With ``property_cols``, each named property is promoted to
    a top-level string column (like GeoDataFrame.from_features at
    main.py:54).
    """
    raw = (spark.read.text(path, wholetext=True)
           .withColumn("_file", F.input_file_name()))
    df = raw.mapInPandas(_parse_files, schema=_FEATURE_SCHEMA)
    if property_cols:
        for c in property_cols:
            df = df.withColumn(c, F.col("properties").getItem(c))
    return df


def write_geojson(df: DataFrame, path: str, geo_col: str = "geometry",
                  single_file: bool = False) -> None:
    """GeoJSON FeatureCollection sink (write side of S1/S2).

    Every column except ``geo_col`` becomes a feature property; WKB
    geometry converts back through :func:`core.to_geojson`. Each
    partition emits ONE complete FeatureCollection document as a single
    text row, so the output directory is a set of valid GeoJSON files —
    exactly the layout :func:`read_geojson` parallelizes over, making
    write→read a lossless round trip at any partition count.
    ``single_file=True`` coalesces to one document first (small outputs
    / interop with single-file consumers).
    """
    props = [c for c in df.columns if c != geo_col]
    if single_file:
        df = df.coalesce(1)

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        feats = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                geo = row[geo_col]
                feats.append(json.dumps({
                    "type": "Feature",
                    "properties": {k: (None if pd.isna(row[k]) else row[k])
                                   for k in props},
                    "geometry": (None if geo is None
                                 else core.to_geojson(core.loads(bytes(geo)))),
                }, default=str))
        if feats:
            doc = ('{"type": "FeatureCollection", "features": ['
                   + ", ".join(feats) + "]}")
            yield pd.DataFrame({"value": [doc]})

    (df.mapInPandas(_render, schema="value string")
     .write.mode("overwrite").text(path))


def feature_property_keys(spark: SparkSession, path: str) -> list[str]:
    """Property key names from the first feature (main.py:20 `keys`)."""
    row = (read_geojson(spark, path)
           .filter(F.col("feature_index") == 0)
           .select(F.map_keys("properties").alias("k"))
           .take(1))
    return list(row[0]["k"]) if row else []
