"""Mechanically register the ROUND-6 queue (benchmarks/queued6.py) —
run in round 6 AFTER tools/apply_round6.py has rotated the window and
emptied DEFERRED_TO_NEXT_ROUND, then commit. Does four edits:

1. registry.py `_modules()`: collect queued6 alongside the other
   query modules (hard import — a failure must propagate).
2. registry.py DEFERRED_TO_NEXT_ROUND: append every queued6 name
   (they gate in round 7; the budget check lives in
   tests/test_gate_coverage.py and will fail if the queue has
   outgrown 50 - len(sentinels)).
3. tests/test_plan_shapes.py `_BNLJ_OK`: fold in the queued6 BNLJ
   allowlist (the documented 1-row broadcasts), copied from
   tests/test_queued6_queries.py's own bnlj_ok set.
4. tests/test_queued6_queries.py: flip the not-registered-yet guard
   to the fully-registered form (the round-5 queued.py precedent).

Idempotent: running twice is a no-op. Verify with
  python -m pytest tests/test_gate_coverage.py tests/test_plan_shapes.py \
      tests/test_queued6_queries.py -q
then `python tools/verify_oracle.py` (full sweep — queued6 names
resolve through the registry once step 1 lands). Also remember one
bench.py representative per NEW family if the round's budget allows.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from ecmm428_pycart_spark.benchmarks import queued6
    names = sorted(queued6.QUERIES)

    # 1 + 2: registry.py ------------------------------------------------
    reg_path = os.path.join(REPO, "ecmm428_pycart_spark/benchmarks/registry.py")
    reg = open(reg_path).read()
    if "queued6" in reg:
        print("registry already collects queued6; skipping registry edits")
    else:
        old_mod = ("    from ecmm428_pycart_spark.benchmarks import "
                   "(datapipe_queries, geo_queries,\n"
                   "                                                 queued)\n"
                   "    return [relational, datapipe_queries, geo_queries, "
                   "queued]")
        new_mod = ("    from ecmm428_pycart_spark.benchmarks import "
                   "(datapipe_queries, geo_queries,\n"
                   "                                                 queued, "
                   "queued6)\n"
                   "    return [relational, datapipe_queries, geo_queries, "
                   "queued, queued6]")
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
                "tools/apply_round6.py first (this tool appends the "
                "queued6 names to the FRESH round-6 list)")
        entries = "".join(f'    "{n}",\n' for n in names)
        reg = reg.replace(
            m.group(0),
            "DEFERRED_TO_NEXT_ROUND = [\n"
            "    # round-6 queue (benchmarks/queued6.py), registered via\n"
            "    # tools/register_queued6.py — every entry oracle-green at\n"
            "    # sf0.001/0.01/0.1 under the gate canonicalization +\n"
            "    # plan/scalar guards before registration; gated round 7\n"
            + entries + "]\n", 1)
        open(reg_path, "w").write(reg)
        print(f"  registry.py: collected queued6, deferred {len(names)}")

    # 3: plan-shapes BNLJ allowlist ------------------------------------
    q6t_path = os.path.join(REPO, "tests/test_queued6_queries.py")
    q6t = open(q6t_path).read()
    m = re.search(r"bnlj_ok = \{(.*?)\}", q6t, re.S)
    bnlj = re.findall(r'"([^"]+)"', m.group(1)) if m else []
    ps_path = os.path.join(REPO, "tests/test_plan_shapes.py")
    ps = open(ps_path).read()
    add = "".join(
        f'    "{n}",  # see tests/test_queued6_queries (1-row broadcasts)\n'
        for n in bnlj if f'"{n}"' not in ps)
    if add:
        ps = ps.replace(
            '    "s20_hard_negatives",  # see tests/test_queued_queries.'
            '_QUEUED_BNLJ_OK\n}',
            '    "s20_hard_negatives",  # see tests/test_queued_queries.'
            '_QUEUED_BNLJ_OK\n' + add + '}')
        open(ps_path, "w").write(ps)
        print(f"  test_plan_shapes.py: +{len(add.splitlines())} BNLJ entries")
    else:
        print("  test_plan_shapes.py already has the queued6 BNLJ entries")

    # 4: flip the not-registered guard ---------------------------------
    old_guard = '''def test_queued6_is_not_registered_yet():
    """Round-5's deferred budget is exactly full, so these must stay
    OUT of the registry until round 6's rotation empties it;
    registering one early would orphan it from the 2-round gate
    contract (flip to full-overlap when apply_round6 lands them)."""
    from ecmm428_pycart_spark.benchmarks import queued6
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    overlap = set(queued6.QUERIES) & set(get_queries())
    assert not overlap, f"queued6 queries already registered: {overlap}"'''
    new_guard = '''def test_queued6_is_fully_registered():
    """Since round 6 the queue IS registered (it forms the round-7
    deferred backlog): every queued6.py entry must appear in the
    registry, or it would silently fall outside the 2-round gate
    rotation. (Round 5 asserted the inverse — the queue stayed OUT
    until apply_round6 freed the budget.)"""
    from ecmm428_pycart_spark.benchmarks import queued6
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    missing = set(queued6.QUERIES) - set(get_queries())
    assert not missing, f"queued6 queries not registered: {missing}"'''
    if old_guard in q6t:
        open(q6t_path, "w").write(q6t.replace(old_guard, new_guard, 1))
        print("  test_queued6_queries.py: guard flipped to fully-registered")
    elif new_guard in q6t:
        print("  test_queued6_queries.py guard already flipped")
    else:
        raise SystemExit("registration guard shape changed; update this tool")

    print("done — run the gate/plan/queued6 tests, then a full "
          "verify_oracle sweep; consider bench.py representatives")


if __name__ == "__main__":
    main()
