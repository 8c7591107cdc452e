"""Mechanically perform the ROUND-10 rotation (run ONCE at the start
of round 10, after CORRECTNESS_r09.json is committed):

With the registration backlog at ZERO (round 9 drained queued8), the
rotation contract shifts from "gate the never-gated" to EVIDENCE
FRESHNESS (docs/ROUND10_PLAN.md item 1): re-gate the queries whose
last driver-gate row is OLDEST. Rounds 1-3 gated ~84 queries on a
tree six-plus rounds old; the reference-parity core deserves fresh
driver rows on the current tree.

DRIVER_WINDOW <- [q01, g04] + the 48 stalest names, where staleness =
(last round whose committed CORRECTNESS_r*.json contains the name,
then name) ascending. DEFERRED_TO_NEXT_ROUND stays empty (no queued9
unless the round-10 VERDICT asks). Idempotent: a second run detects
the window already matches the computed rotation and no-ops.

Verify afterwards with `python -m pytest tests/test_gate_coverage.py
tests/test_plan_shapes.py -q` and a full verify_oracle sweep.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SENTINELS = ["q01_pricing_summary", "g04_dorling_positions"]


def stalest_names(n: int = 48) -> list[str]:
    import __spark_entry__ as ent

    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            # ADVICE r9: only rows that actually PASSED count as gate
            # evidence — a failed/errored row must not make a query
            # look freshly gated and rotate it out of the window.
            if row.get("err") is not None:
                continue
            if not (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match")):
                continue
            last[name] = max(last.get(name, 0), rnd)
    registered = list(ent.queries())
    # never-gated (shouldn't exist after round 9) sorts most-stale
    ranked = sorted((q for q in registered if q not in SENTINELS),
                    key=lambda q: (last.get(q, 0), q))
    return ranked[:n]


def main():
    if not glob.glob(os.path.join(REPO, "CORRECTNESS_r09.json")):
        print("WARNING: CORRECTNESS_r09.json not committed yet — the "
              "queued8 batch would rank as never-gated and re-fill the "
              "window. Run after the round-9 gate lands.")
        return
    new_window = SENTINELS + stalest_names(48)
    assert len(new_window) == 50, len(new_window)

    reg_path = "ecmm428_pycart_spark/benchmarks/registry.py"
    reg = open(os.path.join(REPO, reg_path)).read()
    m = re.search(r"^DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S | re.M)
    current = re.findall(r'"([a-z0-9_]+)"', m.group(0))
    if current == new_window:
        print("registry already rotated to round 10; nothing to do")
        return

    def fmt(names):
        return "".join(f'    "{n}",\n' for n in names)

    reg = reg.replace(
        m.group(0),
        "DRIVER_WINDOW = [\n"
        "    # ROUND-10 ROTATION (evidence freshness): the 48 queries\n"
        "    # with the OLDEST committed driver-gate rows (rounds 1-3\n"
        "    # vintage), re-gated on the current tree + two sentinels.\n"
        "    # Computed by tools/apply_round10.py from CORRECTNESS_r*.\n"
        + fmt(new_window) + "]\n")
    open(os.path.join(REPO, reg_path), "w").write(reg)
    print("  edited registry.py — window:")
    for q in new_window:
        print(f"    {q}")
    print("done — now run: python -m pytest tests/test_gate_coverage.py "
          "tests/test_plan_shapes.py -q, then a full verify_oracle sweep")


if __name__ == "__main__":
    main()
