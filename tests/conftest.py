import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
TESTDATA_SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from ecmm428_pycart_spark.session import get_spark
    s = get_spark("pycart-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def squares_df(spark):
    """The reference's 4-square test fixture (data/Test/square_test.geojson +
    squares_pop.csv), loaded as (name, Population, geometry WKB)."""
    from pyspark.sql import functions as F
    from ecmm428_pycart_spark.geometry import core

    coords = {
        "TL": [[-3.634135, 50.446137], [-3.569522, 50.446137],
               [-3.569522, 50.486784], [-3.634135, 50.486784],
               [-3.634135, 50.446137]],
        "BL": [[-3.569522, 50.446137], [-3.634135, 50.446137],
               [-3.634135, 50.407205], [-3.569522, 50.407205],
               [-3.569522, 50.446137]],
        "TR": [[-3.504629, 50.446137], [-3.504629, 50.486784],
               [-3.569522, 50.486784], [-3.569522, 50.446137],
               [-3.504629, 50.446137]],
        "BR": [[-3.569522, 50.407205], [-3.504629, 50.407205],
               [-3.504629, 50.446137], [-3.569522, 50.446137],
               [-3.569522, 50.407205]],
    }
    pop = {"TL": 100, "BL": 200, "TR": 400, "BR": 150}
    # region_idx in file order, like the reference's positional index
    order = ["TL", "BL", "TR", "BR"]
    rows = [
        (i, name, float(pop[name]),
         core.dumps(core.from_geojson("Polygon", [coords[name]])))
        for i, name in enumerate(order)
    ]
    return spark.createDataFrame(
        rows, "region_idx long, name string, Population double, geometry binary")
