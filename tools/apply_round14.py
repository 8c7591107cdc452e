"""Mechanically perform the ROUND-14 rotation (run ONCE at the start
of round 14, after CORRECTNESS_r13.json is committed).

Same contract as rounds 10-13 (standing): with the registration
backlog at zero, each round re-gates EVIDENCE FRESHNESS —
DRIVER_WINDOW <- [q01, g04] + the 48 names whose last PASSING
committed CORRECTNESS_r*.json row is oldest (failed/errored rows
don't count as evidence — ADVICE r9). After round 13's window (the
r4/r5 tiebreak-loser band: q50-q100, d42-d48, s18-s22, m23, early
queued6) the stalest pool is expected to be the remaining r5/r6
vintage rows; this tool computes it from the committed files rather
than assuming.

Idempotent: a second run detects the window already matches and
no-ops. Verify afterwards with `python -m pytest
tests/test_gate_coverage.py tests/test_plan_shapes.py -q` and a full
verify_oracle sweep.
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
            if row.get("err") is not None:
                continue
            if not (row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match")):
                continue
            last[name] = max(last.get(name, 0), rnd)
    registered = list(ent.queries())
    ranked = sorted((q for q in registered if q not in SENTINELS),
                    key=lambda q: (last.get(q, 0), q))
    return ranked[:n]


def main():
    if not glob.glob(os.path.join(REPO, "CORRECTNESS_r13.json")):
        print("WARNING: CORRECTNESS_r13.json not committed yet — the "
              "round-13 window would rank as never-re-gated and re-fill "
              "itself. Run after the round-13 gate lands.")
        return
    new_window = SENTINELS + stalest_names(48)
    assert len(new_window) == 50, len(new_window)

    reg_path = "ecmm428_pycart_spark/benchmarks/registry.py"
    reg = open(os.path.join(REPO, reg_path)).read()
    m = re.search(r"^DRIVER_WINDOW = \[.*?\n\]\n", reg, re.S | re.M)
    if m is None:
        sys.exit(f"ERROR: could not find the DRIVER_WINDOW block in "
                 f"{reg_path} — its format has drifted; edit it by hand "
                 f"or update this tool's pattern.")
    # Extract names only from non-comment lines so a future quoted name
    # inside a comment can't be mistaken for a window entry (ADVICE r10).
    current = [name
               for line in m.group(0).splitlines()
               if not line.lstrip().startswith("#")
               for name in re.findall(r'"([a-z0-9_]+)"', line)]
    if current == new_window:
        print("registry already rotated to round 14; nothing to do")
        return

    def fmt(names):
        return "".join(f'    "{n}",\n' for n in names)

    reg = reg.replace(
        m.group(0),
        "DRIVER_WINDOW = [\n"
        "    # ROUND-14 ROTATION (evidence freshness): the 48 queries\n"
        "    # with the OLDEST committed PASSING driver-gate rows,\n"
        "    # re-gated on the current tree + two sentinels.\n"
        "    # Computed by tools/apply_round14.py from CORRECTNESS_r*.\n"
        + fmt(new_window) + "]\n")
    open(os.path.join(REPO, reg_path), "w").write(reg)
    print("  edited registry.py — window:")
    for q in new_window:
        print(f"    {q}")
    print("done — now run: python -m pytest tests/test_gate_coverage.py "
          "tests/test_plan_shapes.py -q, then a full verify_oracle sweep")


if __name__ == "__main__":
    main()
