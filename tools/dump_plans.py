"""Dump `.explain("formatted")` for named queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX SF_DIR NAME [NAME ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. Used to produce the
plans/r13/ before/after evidence files: run once from a worktree pinned
at the round's starting commit (SUFFIX=before) and once from HEAD
(SUFFIX=after). Note: queries whose construction eagerly materializes a
derived-dataset store or a localCheckpoint execute that work while
planning — acceptable for a doc tool (same caveat as explain_plans.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = get_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        nexch = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {nexch} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
