"""Round-14 re-adjudication of m12_resize_pixels (VERDICT r13 next-1).

The r13c lever (fuse the 3-crossing Python chain into one mapInPandas
+ spread to defaultParallelism) A/B'd 5.0x locally but the driver
recorded 30.2s@32c vs 4.5s in r12 — the spread's 32 concurrent Arrow
workers amplify the host's pathological 32-thread JVM regime. This
tool re-proves or refutes each ingredient on the exact driver
invocation path (the registry query + .count()), interleaved:

  chain      — SPARK_GRAFT_SPREAD_OFF=1 + the pre-fusion 3-stage chain
               (the r12 shape, rebuilt here verbatim)
  fused      — the shipped fused kernel, spread disabled (1 task)
  fused_sp   — fused + spread to full parallelism (the r13 shipped shape)
  fused_cap8 — fused + spread capped at min(parallelism, 8) tasks
               (the r14 SHIPPED shape: spread_small(..., max_tasks=8))

Outputs asserted identical across arms every round. Run at local[32]
AND SPARK_GRAFT_CPUS=8 (fresh process per core count — the session
master is fixed at first get_spark).

Usage: SPARK_GRAFT_CPUS=N python tools/ab_m12_r14.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir, arm):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.datapipe import multimodal
    from ecmm428_pycart_spark.session import load_table, spread_small

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    if arm == "chain":
        payload = docs.withColumn(
            "payload",
            multimodal.synth_png_gradient_min4_payload(F.col("doc_id")))
        resized = multimodal.resize_image(payload, width=4, height=4)
        px = resized.select(
            "doc_id",
            multimodal.binary_to_ints(F.col("pixels")).alias("vals"))
    else:
        if arm == "fused_sp":
            docs = spread_small(docs)
        elif arm == "fused_cap8":
            docs = docs.repartition(
                min(spark.sparkContext.defaultParallelism, 8))
        px = multimodal.synth_gradient_resize_vals(docs, width=4, height=4)
    ex = px.select("doc_id", F.posexplode("vals").alias("pos", "value"))
    return ex.select(
        "doc_id",
        (F.col("pos") / 4).cast("int").alias("out_y"),
        (F.col("pos") % 4).cast("int").alias("out_x"),
        F.col("value"))


ARMS = ("chain", "fused", "fused_sp", "fused_cap8")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("ab-m12-r14")
    cpus = spark.sparkContext.defaultParallelism

    def run(arm):
        # chain/fused arms need spreading disabled inside the library
        os.environ["SPARK_GRAFT_SPREAD_OFF"] = \
            "1" if arm in ("chain", "fused") else "0"
        t0 = time.time()
        n = build(spark, sf_dir, arm).count()   # the bench's timed action
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        return sec, n

    from pyspark.sql import functions as F
    sums = {}
    for arm in ARMS:                            # warmup each arm once
        run(arm)
        # order-insensitive full-output checksum: row count + per-column
        # sums + a sum over an md5-derived row hash
        df = build(spark, sf_dir, arm)
        # decimal sum: float addition order differs across partition
        # layouts, which would flag identical outputs as different
        rowh = F.conv(F.substring(F.md5(F.concat_ws(
            ",", "doc_id", "out_y", "out_x", "value")), 1, 12), 16, 10
        ).cast("decimal(38,0)")
        sums[arm] = df.agg(
            F.count(F.lit(1)), F.sum("doc_id"), F.sum("out_y"),
            F.sum("out_x"), F.sum("value"), F.sum(rowh)).collect()[0]
        spark.catalog.clearCache()
    assert len({tuple(v) for v in sums.values()}) == 1, \
        f"arm outputs differ! {sums}"

    runs = {a: [] for a in ARMS}
    for _ in range(rounds):
        for arm in ARMS:
            sec, n = run(arm)
            runs[arm].append(sec)
    os.environ.pop("SPARK_GRAFT_SPREAD_OFF", None)
    med = lambda v: round(statistics.median(v), 2)
    out = {"cpus": cpus, "rounds": rounds,
           **{a: {"runs": runs[a], "median": med(runs[a])} for a in ARMS}}
    base = med(runs["chain"])
    for a in ARMS[1:]:
        out[f"speedup_{a}_vs_chain"] = round(base / max(med(runs[a]), 1e-9), 2)
    out["checksums_identical"] = True
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
