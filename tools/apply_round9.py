"""Mechanically perform the ROUND-9 rotation (run ONCE at the start of
round 9, then commit):

1. registry.py: DRIVER_WINDOW <- [q01, g04, *DEFERRED_TO_NEXT_ROUND]
   (exactly 50: 2 sentinels + the 48-entry queued8 batch registered in
   round 8 — this drains the backlog to ZERO; round 9 additions, if
   any, need a new queued9 module and a fresh deferred list).
2. tests/test_gate_coverage.py sentinels: {q01, g04} carry forward —
   no edit needed (both multiply driver-green).

Written in round 8 so round 9's first move is mechanical (the
r6/r7/r8 precedent). Idempotent: running twice is a no-op. Verify
afterwards with `python -m pytest tests/test_gate_coverage.py
tests/test_plan_shapes.py -q` and a full verify_oracle sweep.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from ecmm428_pycart_spark.benchmarks.registry import (
        DEFERRED_TO_NEXT_ROUND)

    reg_path = "ecmm428_pycart_spark/benchmarks/registry.py"
    reg = open(os.path.join(REPO, reg_path)).read()
    # d80 is a queued8-only name: its presence in the window means the
    # round-9 rotation already ran. This check MUST precede the length
    # assert: after rotation DEFERRED_TO_NEXT_ROUND is empty, so the
    # assert would fire on a second run instead of the no-op message.
    if "d80_sorted_neighborhood" in re.search(
            r"^DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S | re.M).group(0):
        print("registry already rotated to round 9; nothing to do")
        return

    new_window = ["q01_pricing_summary", "g04_dorling_positions",
                  *DEFERRED_TO_NEXT_ROUND]
    assert len(new_window) == 50, len(new_window)

    def fmt(names):
        return "".join(f'    "{n}",\n' for n in names)

    # ^-anchored matches: the recipe comments above the lists quote the
    # literal list headers, and an unanchored match would clobber from
    # inside a comment through the real list (round-5 lesson).
    m = re.search(r"^DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S | re.M)
    reg = reg.replace(
        m.group(0),
        "DRIVER_WINDOW = [\n"
        "    # ROUND-9 ROTATION: the queued8 batch (registered round 8,\n"
        "    # deferred to this window) + two sentinels (q01 relational\n"
        "    # core, g04 dorling parity)\n"
        + fmt(new_window) + "]\n")
    m = re.search(r"^DEFERRED_TO_NEXT_ROUND = \[.*?\n\]\n", reg, re.S | re.M)
    reg = reg.replace(
        m.group(0),
        "DEFERRED_TO_NEXT_ROUND = [\n"
        "    # round-9 additions go here (gated round 10); budget =\n"
        "    # 50 - len(NEXT_ROUND_SENTINELS) — see test_gate_coverage.\n"
        "    # The queued8 drain is COMPLETE: new queries need a fresh\n"
        "    # queued9 module following the queued6/7/8 contract.\n"
        "]\n")
    open(os.path.join(REPO, reg_path), "w").write(reg)
    print("  edited registry.py")
    print("done — now run: python -m pytest tests/test_gate_coverage.py "
          "tests/test_plan_shapes.py -q, then a full verify_oracle sweep")


if __name__ == "__main__":
    main()
