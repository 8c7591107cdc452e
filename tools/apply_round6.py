"""Mechanically perform the ROUND-6 rotation (run ONCE at the start of
round 6, then commit):

1. registry.py: DRIVER_WINDOW <- [q01, g04, *DEFERRED_TO_NEXT_ROUND]
   (exactly 50: 2 sentinels + the 48-entry round-5 deferred list), and
   DEFERRED_TO_NEXT_ROUND <- [] (round 6 starts a fresh list with
   whatever it builds; budget = 50 - len(round-7 sentinels)).
2. tests/test_gate_coverage.py: SENTINELS <- NEXT_ROUND_SENTINELS
   ({q01, g04} — q01 returns after giving its round-5 slot to s08).

Unlike round 5 there is no queued-module registration step: the queue
was folded into the registry last round, and round-6 additions
register directly while the deferred budget lasts.

Idempotent: running twice is a no-op. Verify afterwards with
`python -m pytest tests/test_gate_coverage.py tests/test_plan_shapes.py -q`
and a full `python tools/verify_oracle.py` sweep. Validated in round 5
by applying on the live tree, running the gate tests, and reverting
(see docs/ROUND5_NOTES.md).
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
    from ecmm428_pycart_spark.benchmarks.registry import (
        DEFERRED_TO_NEXT_ROUND)

    new_window = ["q01_pricing_summary", "g04_dorling_positions",
                  *DEFERRED_TO_NEXT_ROUND]
    assert len(new_window) == 50, len(new_window)

    reg_path = "ecmm428_pycart_spark/benchmarks/registry.py"
    reg = open(os.path.join(REPO, reg_path)).read()
    if "q100_sessionization" in re.search(
            r"DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S).group(0):
        print("registry already rotated to round 6; nothing to do")
        return

    def fmt(names):
        return "".join(f'    "{n}",\n' for n in names)

    m = re.search(r"^DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S | re.M)
    reg = reg.replace(
        m.group(0),
        "DRIVER_WINDOW = [\n"
        "    # ROUND-6 ROTATION: the round-5 deferred backlog + two\n"
        "    # sentinels (q01 relational core, g04 dorling parity)\n"
        + fmt(new_window) + "]\n")
    # ^-anchored: the recipe comment above the list quotes the literal
    # "DEFERRED_TO_NEXT_ROUND = [" and an unanchored match clobbers
    # from inside that comment through the real list (found when
    # validating register_queued6 on the live tree)
    m = re.search(r"^DEFERRED_TO_NEXT_ROUND = \[.*?\n\]\n", reg, re.S | re.M)
    reg = reg.replace(
        m.group(0),
        "DEFERRED_TO_NEXT_ROUND = [\n"
        "    # round-6 additions go here (gated round 7); budget =\n"
        "    # 50 - len(NEXT_ROUND_SENTINELS) — see test_gate_coverage\n"
        "]\n")
    open(os.path.join(REPO, reg_path), "w").write(reg)
    print("  edited registry.py")

    edit("tests/test_gate_coverage.py",
         'SENTINELS = {"s08_int8_quantize", "g04_dorling_positions"}',
         'SENTINELS = {"q01_pricing_summary", "g04_dorling_positions"}')
    print("done — now run: python -m pytest tests/test_gate_coverage.py "
          "tests/test_plan_shapes.py -q, then a full verify_oracle sweep")


if __name__ == "__main__":
    main()
