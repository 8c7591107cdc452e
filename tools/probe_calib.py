"""Cheap host-regime probe: computes the bench's frozen calib_mt
fingerprint (and the single-thread calib) WITHOUT running the bench
body. Used to time full bench runs to in-band host windows
(clean point calib_mt 0.132, admission band 0.112-0.152 per the r12
protocol) instead of burning 3-4 minutes to discover a bad regime.

Usage: python tools/probe_calib.py
Prints one JSON line: {"calib": ..., "calib_mt": ...}
"""
import json
import os
import statistics
import time


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("probe-calib")
             .config("spark.ui.enabled", "false").getOrCreate())

    # single-thread numpy-free calib (mirrors bench._cpu_calibration's
    # spirit without importing bench, which would start its session)
    def st():
        t0 = time.time()
        s = 0
        for i in range(2_000_000):
            s += i % 7
        return time.time() - t0
    st()
    calib = round(statistics.median([st() for _ in range(3)]), 3)

    # FROZEN multi-core fingerprint — identical computation to
    # bench._mt_calibration (32-partition CPU-bound aggregation).
    def run():
        t0 = time.time()
        (spark.range(0, 200_000_000, 1, 32)
         .selectExpr("sum(id % 7 + id % 13) AS s").collect())
        return time.time() - t0
    run()
    calib_mt = round(statistics.median([run() for _ in range(3)]), 3)
    spark.stop()
    print(json.dumps({"calib": calib, "calib_mt": calib_mt,
                      "in_band": 0.112 <= calib_mt <= 0.152}))


if __name__ == "__main__":
    main()
