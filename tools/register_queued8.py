"""Mechanically register the ROUND-8 queue (benchmarks/queued8.py) —
run in round 8 AFTER tools/apply_round8.py has rotated the window and
emptied DEFERRED_TO_NEXT_ROUND, then commit. Does four edits (the
register_queued{6,7}.py recipe):

1. registry.py `_modules()`: collect queued8 alongside the other
   query modules (hard import — a failure must propagate).
2. registry.py DEFERRED_TO_NEXT_ROUND: append every queued8 name
   (they gate in round 9; tests/test_gate_coverage.py enforces the
   50 - len(sentinels) budget — queued8 must stay <= 48).
3. tests/test_plan_shapes.py `_BNLJ_OK`: fold in the queued8 BNLJ
   allowlist, copied from tests/test_queued8_queries.py's bnlj_ok.
4. tests/test_queued8_queries.py: flip the not-registered-yet guard
   to the fully-registered form.

Written in round 7 so round 8's first move is mechanical. After
registration, add `q133_crawl_pipeline` to bench.py HEADLINE (the
crawl-macro family's representative — it cannot join earlier because
bench resolves names through the registry); the 1950-byte line budget
has ~35 bytes of headroom for exactly one more entry at 1-decimal
precision. Idempotent: running twice is a no-op. Verify with
  python -m pytest tests/test_gate_coverage.py tests/test_plan_shapes.py \
      tests/test_queued8_queries.py -q
then `python tools/verify_oracle.py` (full sweep).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from ecmm428_pycart_spark.benchmarks import queued8
    names = sorted(queued8.QUERIES)
    assert len(names) <= 48, (
        f"queued8 has {len(names)} entries > the 48 deferred budget")

    # 1 + 2: registry.py ------------------------------------------------
    reg_path = os.path.join(REPO, "ecmm428_pycart_spark/benchmarks/registry.py")
    reg = open(reg_path).read()
    if "queued8" in reg:
        print("registry already collects queued8; skipping registry edits")
    else:
        old_mod = ("    from ecmm428_pycart_spark.benchmarks import "
                   "(datapipe_queries, geo_queries,\n"
                   "                                                 queued, "
                   "queued6, queued7)\n"
                   "    return [relational, datapipe_queries, geo_queries, "
                   "queued, queued6, queued7]")
        new_mod = ("    from ecmm428_pycart_spark.benchmarks import "
                   "(datapipe_queries, geo_queries,\n"
                   "                                                 queued, "
                   "queued6, queued7,\n"
                   "                                                 queued8)\n"
                   "    return [relational, datapipe_queries, geo_queries, "
                   "queued, queued6, queued7,\n"
                   "            queued8]")
        if old_mod not in reg:
            raise SystemExit("_modules() shape changed; update this tool")
        reg = reg.replace(old_mod, new_mod, 1)

        m = re.search(r"DEFERRED_TO_NEXT_ROUND = \[\n(.*?)\]\n", reg, re.S)
        if m is None:
            raise SystemExit("DEFERRED_TO_NEXT_ROUND not found")
        body = m.group(1)
        if body.strip() and '"' in body:
            raise SystemExit(
                "DEFERRED_TO_NEXT_ROUND is not empty — run "
                "tools/apply_round8.py first (this tool appends the "
                "queued8 names to the FRESH round-8 list)")
        entries = "".join(f'    "{n}",\n' for n in names)
        reg = reg.replace(
            m.group(0),
            "DEFERRED_TO_NEXT_ROUND = [\n"
            "    # round-8 queue (benchmarks/queued8.py), registered via\n"
            "    # tools/register_queued8.py — every entry oracle-green at\n"
            "    # sf0.001/0.01/0.1 under the gate canonicalization +\n"
            "    # plan/scalar guards before registration; gated round 9\n"
            + entries + "]\n", 1)
        open(reg_path, "w").write(reg)
        print(f"  registry.py: collected queued8, deferred {len(names)}")

    # 3: plan-shapes BNLJ allowlist ------------------------------------
    q8t_path = os.path.join(REPO, "tests/test_queued8_queries.py")
    q8t = open(q8t_path).read()
    m = re.search(r"bnlj_ok = \{(.*?)\}", q8t, re.S)
    bnlj = re.findall(r'"([^"]+)"', m.group(1)) if m else []
    ps_path = os.path.join(REPO, "tests/test_plan_shapes.py")
    ps = open(ps_path).read()
    add = "".join(
        f'    "{n}",  # see tests/test_queued8_queries (1-row broadcasts)\n'
        for n in bnlj if f'"{n}"' not in ps)
    if add:
        anchor = re.search(r"_BNLJ_OK = \{.*?\n\}", ps, re.S).group(0)
        ps = ps.replace(anchor, anchor[:-1] + add + "}", 1)
        open(ps_path, "w").write(ps)
        print(f"  test_plan_shapes.py: +{len(add.splitlines())} BNLJ entries")
    else:
        print("  test_plan_shapes.py already has the queued8 BNLJ entries")

    # 4: flip the not-registered guard ---------------------------------
    old_guard = '''def test_queued8_is_not_registered_yet():
    """queued8 is the OVERFLOW queue: it registers in round 8 (after
    round 7 registers queued7 and the rotation re-empties the
    deferred budget); registering earlier would blow the
    deferred + sentinels <= 50 budget in test_gate_coverage."""
    from ecmm428_pycart_spark.benchmarks import queued8
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    overlap = set(queued8.QUERIES) & set(get_queries())
    assert not overlap, f"queued8 queries already registered: {overlap}"'''
    new_guard = '''def test_queued8_is_fully_registered():
    """Since round 8 the queue IS registered (it forms the round-9
    deferred backlog): every queued8.py entry must appear in the
    registry, or it would silently fall outside the 2-round gate
    rotation. (Round 7 asserted the inverse — the queue stayed OUT
    until apply_round8 freed the budget.)"""
    from ecmm428_pycart_spark.benchmarks import queued8
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    missing = set(queued8.QUERIES) - set(get_queries())
    assert not missing, f"queued8 queries not registered: {missing}"'''
    if old_guard in q8t:
        open(q8t_path, "w").write(q8t.replace(old_guard, new_guard, 1))
        print("  test_queued8_queries.py: guard flipped to fully-registered")
    elif new_guard in q8t:
        print("  test_queued8_queries.py guard already flipped")
    else:
        raise SystemExit("registration guard shape changed; update this tool")

    print("done — run the gate/plan/queued8 tests, then a full "
          "verify_oracle sweep; consider bench.py representatives")


if __name__ == "__main__":
    main()
