"""Mechanically perform the ROUND-5 registration recipe (run ONCE at
the start of round 5, then commit):

1. registry.py: DRIVER_WINDOW <- [q01, g04, *DEFERRED_TO_NEXT_ROUND]
   (exactly 50), DEFERRED_TO_NEXT_ROUND <- sorted(queued.QUERIES)
   (the new backlog, gated round 6), and `queued` added to _modules().
2. tests/test_gate_coverage.py: SENTINELS <- NEXT_ROUND_SENTINELS
   (round 5 rides two sentinels; the budget arithmetic is asserted by
   the existing tests).
3. tests/test_queued_queries.py: drop the not-registered-yet guard
   (the queue IS registered now) — done by flipping its assertion to
   require full overlap; fold _QUEUED_BNLJ_OK into
   test_plan_shapes._BNLJ_OK.

Idempotent: running twice is a no-op. Verify afterwards with
`python -m pytest tests/test_gate_coverage.py tests/test_plan_shapes.py -q`
and a full `python tools/verify_oracle.py` sweep. Validated in round 4
by applying on a scratch tree and running the gate tests (see
docs/ROUND5_QUEUE.md).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def edit(path, old, new, required=True):
    p = os.path.join(REPO, path)
    s = open(p).read()
    if old not in s:
        if required and new not in s:
            raise SystemExit(f"pattern not found in {path}:\n{old[:200]}")
        print(f"  (already applied in {path})")
        return
    open(p, "w").write(s.replace(old, new, 1))
    print(f"  edited {path}")


def main():
    from ecmm428_pycart_spark.benchmarks import queued
    from ecmm428_pycart_spark.benchmarks.registry import (
        DEFERRED_TO_NEXT_ROUND, DRIVER_WINDOW)

    # VERDICT r4 #2: q01 (4x driver-green r1-r4) gives up its sentinel
    # slot to s08_int8_quantize — the only never-green query (its r4 err
    # was the driver's array canonicalizer crash, now fixed by the
    # scalar reshape) — so the fix is driver-proven this round.
    new_window = ["s08_int8_quantize", "g04_dorling_positions",
                  *DEFERRED_TO_NEXT_ROUND]
    assert len(new_window) == 50, len(new_window)
    new_deferred = sorted(queued.QUERIES)

    reg = open(os.path.join(
        REPO, "ecmm428_pycart_spark/benchmarks/registry.py")).read()
    if "q84_min_cost_supplier" in reg:
        print("registry already registered the queue; nothing to do")
        return

    def fmt(names):
        return "".join(f'    "{n}",\n' for n in names)

    # 1a. DRIVER_WINDOW
    m = re.search(r"DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S)
    reg = reg.replace(m.group(0),
                      "DRIVER_WINDOW = [\n"
                      "    # ROUND-5 ROTATION: the deferred backlog + two"
                      " sentinels (see\n    # NEXT_ROUND_SENTINELS budget"
                      " arithmetic in tests/test_gate_coverage.py)\n"
                      + fmt(new_window) + "]\n")
    # 1b. DEFERRED list
    m = re.search(r"DEFERRED_TO_NEXT_ROUND = \[.*?\n\]\n", reg, re.S)
    reg = reg.replace(m.group(0),
                      "DEFERRED_TO_NEXT_ROUND = [\n"
                      "    # round-4 continuation queue (benchmarks/"
                      "queued.py), registered round 5,\n    # gated round"
                      " 6 — every entry oracle-validated at all three sfs"
                      " + local[7]\n" + fmt(new_deferred) + "]\n")
    # 1c. module collection
    old_mod = ("    from ecmm428_pycart_spark.benchmarks import "
               "datapipe_queries, geo_queries\n"
               "    return [relational, datapipe_queries, geo_queries]")
    new_mod = ("    from ecmm428_pycart_spark.benchmarks import ("
               "datapipe_queries, geo_queries,\n"
               "                                                 queued)\n"
               "    return [relational, datapipe_queries, geo_queries, "
               "queued]")
    assert old_mod in reg
    reg = reg.replace(old_mod, new_mod)
    open(os.path.join(
        REPO, "ecmm428_pycart_spark/benchmarks/registry.py"), "w").write(reg)
    print("  edited registry.py")

    # 2. sentinels (VERDICT r4 #2: s08 takes q01's slot)
    edit("tests/test_gate_coverage.py",
         'SENTINELS = {"q01_pricing_summary", "g02_queen_borders",\n'
         '             "g04_dorling_positions"}',
         'SENTINELS = {"s08_int8_quantize", "g04_dorling_positions"}')

    # 3a. the queue is now registered: guard flips to full-overlap
    edit("tests/test_queued_queries.py",
         "    overlap = set(queued.QUERIES) & set(get_queries())\n"
         "    assert not overlap, "
         "f\"queued queries already registered: {overlap}\"",
         "    # round 5: the queue IS the new deferred backlog\n"
         "    missing = set(queued.QUERIES) - set(get_queries())\n"
         "    assert not missing, f\"queued queries not registered: "
         "{missing}\"")

    # 3b. fold the BNLJ allowlist into the registry-wide one
    from tests.test_queued_queries import _QUEUED_BNLJ_OK
    plan = open(os.path.join(REPO, "tests/test_plan_shapes.py")).read()
    anchor = '    "s09_knn_join",             # broadcast query batch\n}'
    assert anchor in plan
    folded = "".join(
        f'    "{n}",  # see tests/test_queued_queries._QUEUED_BNLJ_OK\n'
        for n in sorted(_QUEUED_BNLJ_OK))
    plan = plan.replace(
        anchor,
        '    "s09_knn_join",             # broadcast query batch\n'
        + folded + "}")
    open(os.path.join(REPO, "tests/test_plan_shapes.py"), "w").write(plan)
    print("  edited test_plan_shapes.py")
    print("done — now run: python -m pytest tests/test_gate_coverage.py "
          "tests/test_plan_shapes.py tests/test_queued_queries.py -q")


if __name__ == "__main__":
    main()
