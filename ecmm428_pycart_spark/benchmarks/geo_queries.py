"""Geo macro-operator queries, oracle-checked on a synthetic planar grid.

The driver's testdata has no geometry column, so these queries *construct*
one deterministically from the nation table: nation ``k`` becomes the unit
grid cell at ``(k % 5, k // 5)`` with value ``(k % 7) + 1``. Unit squares
with integer corners make every geometric quantity analytically exact
(area 1, rook border weight 1, corner weight 0, centroid at +0.5), so the
full cartogram pipeline — WKT parse → WKB → area/centroid/borders/radii —
is verifiable against plain SQL in DuckDB.

g04 (the dorling force loop) is deliberately oracle-free: iterative
Gauss–Seidel is not SQL-expressible; the driver records a rows-only check
(SURVEY.md §5 point 4 / driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ecmm428_pycart_spark.geometry.udfs import st_wkt_to_wkb
from ecmm428_pycart_spark.operators.borders import get_borders
from ecmm428_pycart_spark.plans.cartogram import Cartogram
from ecmm428_pycart_spark.session import load_table as _t

QUERIES = {}
ORACLES = {}


def q(name, sql):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = sql
        return fn
    return deco


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → 5×5 unit-cell grid with WKB geometry (engine ingest path:
    WKT text → st_wkt_to_wkb, like sources.read_wkt_csv)."""
    n = _t(spark, sf_dir, "nation")
    gx = (F.col("n_nationkey") % 5).cast("long")
    gy = F.floor(F.col("n_nationkey") / 5).cast("long")
    wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        gx, gy, gx + 1, gy, gx + 1, gy + 1, gx, gy + 1, gx, gy)
    return (n.select(
        F.col("n_nationkey").alias("region_idx"),
        F.col("n_name"),
        ((F.col("n_nationkey") % 7) + 1).cast("double").alias("value"),
        st_wkt_to_wkb(wkt).alias("geometry")))


# A2 — non_contiguous scale factors (pycart/cartogram.py:219-243).
# Unit cells → area exactly 1.0 → scale = sqrt(v / max v).
@q("g01_noncontiguous_scale", """
SELECT n_name, round(sqrt(((n_nationkey % 7) + 1) / mx), 6) AS scale
FROM nation, (SELECT max((n_nationkey % 7) + 1.0) AS mx FROM nation)
""")
def g01_noncontiguous_scale(spark, sf_dir):
    cart = Cartogram(_grid(spark, sf_dir), "value", "n_name",
                     idx_field="region_idx")
    return (cart.non_contiguous()
            .select("n_name", F.round("scale", 6).alias("scale")))


# A4 — Queen-contiguity borders with shared-perimeter weights
# (pycart/border_util.py:5-91). On the unit grid: rook pairs share an edge
# of length exactly 1, diagonal pairs touch at a corner (weight 0).
@q("g02_queen_borders", """
WITH g AS (
  SELECT n_nationkey AS k, n_nationkey % 5 AS gx, n_nationkey // 5 AS gy
  FROM nation
)
SELECT CAST(a.k AS BIGINT) AS focal, CAST(b.k AS BIGINT) AS neighbor,
       CAST(CASE WHEN abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
            THEN 1.0 ELSE 0.0 END AS DOUBLE) AS weight
FROM g a JOIN g b
  ON (a.k <> b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
""")
def g02_queen_borders(spark, sf_dir):
    borders, _ = get_borders(_grid(spark, sf_dir), "n_name", "geometry",
                             idx_field="region_idx")
    return borders.select("focal", "neighbor",
                          F.round("weight", 6).alias("weight"))


# A3 setup — dorling radius calibration k = ΣD/ΣR over the directed edge
# list (pycart/cartogram.py:320-338, quirk Q5). Cell-centre distances are
# exactly 1 (rook) / sqrt(2) (diagonal).
@q("g03_dorling_radii", """
WITH g AS (
  SELECT n_nationkey AS k, n_name,
         n_nationkey % 5 AS gx, n_nationkey // 5 AS gy,
         ((n_nationkey % 7) + 1)::DOUBLE AS v
  FROM nation
),
e AS (
  SELECT a.k AS fk, a.v AS fv, b.v AS nv,
         sqrt((a.gx - b.gx)^2 + (a.gy - b.gy)^2) AS dist
  FROM g a JOIN g b
    ON (a.k <> b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
),
s AS (
  SELECT sum(dist) / sum(sqrt(fv / pi()) + sqrt(nv / pi())) AS kcoef FROM e
)
SELECT n_name, round(kcoef * sqrt(v / pi()), 6) AS radius
FROM g, s
""")
def g03_dorling_radii(spark, sf_dir):
    cart = Cartogram(_grid(spark, sf_dir), "value", "n_name",
                     idx_field="region_idx")
    return (cart.dorling_radii()
            .select(F.col("id").alias("n_name"),
                    F.round("radius", 6).alias("radius")))


# A3 full loop — Gauss–Seidel is iterative/order-dependent, not
# SQL-expressible; registered without an oracle (driver rows-only check).
QUERIES["g04_dorling_positions"] = None  # placeholder replaced below
ORACLES["g04_dorling_positions"] = None


def g04_dorling_positions(spark, sf_dir):
    cart = Cartogram(_grid(spark, sf_dir), "value", "n_name",
                     idx_field="region_idx")
    out = cart.dorling(iterations=5, mode="reference")
    return out.select("n_name", F.round("cx", 4).alias("cx"),
                      F.round("cy", 4).alias("cy"),
                      F.round("radius", 4).alias("radius"))


QUERIES["g04_dorling_positions"] = g04_dorling_positions


def g05_dorling_scalable(spark, sf_dir):
    """Distributed Jacobi dorling on the grid (rows-only check; the
    Spark-vs-local-oracle equivalence is covered by tests/test_dorling_scale)."""
    cart = Cartogram(_grid(spark, sf_dir), "value", "n_name",
                     idx_field="region_idx")
    out = cart.dorling(iterations=3, mode="scalable")
    return out.select("n_name", F.round("cx", 4).alias("cx"),
                      F.round("cy", 4).alias("cy"),
                      F.round("radius", 4).alias("radius"))


QUERIES["g05_dorling_scalable"] = g05_dorling_scalable
ORACLES["g05_dorling_scalable"] = None


# R13 proper (2-D distance-range self-join) on grid centroids via the
# grid-bucket join — oracle is the naive quadratic predicate join.
@q("g06_distance_pairs", """
WITH g AS (
  SELECT n_nationkey AS k, n_nationkey % 5 + 0.5 AS cx,
         n_nationkey // 5 + 0.5 AS cy
  FROM nation
)
SELECT a.k AS focal, CAST(count(*) AS BIGINT) AS n_neighbors,
       round(sum(sqrt((a.cx - b.cx)^2 + (a.cy - b.cy)^2)), 6) AS sum_dist
FROM g a JOIN g b
  ON a.k <> b.k
 AND sqrt((a.cx - b.cx)^2 + (a.cy - b.cy)^2) <= 1.5
GROUP BY a.k
""")
def g06_distance_pairs(spark, sf_dir):
    from ecmm428_pycart_spark.operators.spatial_join import distance_range_self_join
    pts = _grid(spark, sf_dir).select(
        F.col("region_idx").alias("k"),
        (F.col("region_idx") % 5 + 0.5).alias("cx"),
        (F.floor(F.col("region_idx") / 5) + 0.5).alias("cy"))
    pairs = distance_range_self_join(pts, "cx", "cy", max_dist=1.5, key="k")
    return (pairs.groupBy(F.col("f_k").alias("focal"))
            .agg(F.count(F.lit(1)).alias("n_neighbors"),
                 F.round(F.sum("dist"), 6).alias("sum_dist")))


# A4 at scale: queen borders over a customer-derived grid whose size
# grows with the scale factor (1.5k regions at sf0.01, 15k at sf0.1) —
# the vertex-equality join's shuffle is the scaling dimension.
@q("g07_queen_borders_large", """
WITH p AS (
  SELECT CAST(ceiling(sqrt(count(*))) AS BIGINT) AS side FROM customer
),
g AS (
  SELECT c_custkey AS k, c_custkey % side AS gx, c_custkey // side AS gy
  FROM customer, p
)
SELECT CAST(a.k AS BIGINT) AS focal, CAST(b.k AS BIGINT) AS neighbor,
       CAST(CASE WHEN abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
            THEN 1.0 ELSE 0.0 END AS DOUBLE) AS weight
FROM g a JOIN g b
  ON (a.k <> b.k AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1)
""")
def g07_queen_borders_large(spark, sf_dir):
    import math
    from ecmm428_pycart_spark.operators.borders import get_borders
    c = _t(spark, sf_dir, "customer")
    side = int(math.ceil(math.sqrt(c.count())))
    gx = (F.col("c_custkey") % side).cast("long")
    gy = F.floor(F.col("c_custkey") / side).cast("long")
    wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        gx, gy, gx + 1, gy, gx + 1, gy + 1, gx, gy + 1, gx, gy)
    grid = c.select(F.col("c_custkey").alias("region_idx"),
                    st_wkt_to_wkb(wkt).alias("geometry"))
    borders, _ = get_borders(grid, "region_idx", "geometry",
                             idx_field="region_idx")
    return borders.select("focal", "neighbor",
                          F.round("weight", 6).alias("weight"))
