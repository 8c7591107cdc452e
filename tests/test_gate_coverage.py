"""Guard for the driver correctness gate's coverage window.

The driver evaluates only the FIRST ~50 entries of ``queries()``
(observed cap in CORRECTNESS_r01/r02/r03). Round 2 learned that
reordering the registry silently moves families in and out of that
window; rounds 1-3 together still left 56 registered queries that had
NEVER seen the driver's DuckDB oracle (VERDICT r3). Round 4 therefore
switches the pinned invariant from "window covers every family" to a
ROTATION contract:

  every registered query must be driver-gate-checked within two
  consecutive rounds — i.e. it is (a) already checked in a committed
  CORRECTNESS_r*.json, (b) in the current DRIVER_WINDOW, or (c) in the
  explicit DEFERRED_TO_NEXT_ROUND list, which is small enough to fit
  (with sentinels) entirely in the next round's window.

No SparkSession needed: this is a pure registry-shape test.
"""

from __future__ import annotations

import glob
import json
import os

GATE_CAP = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# §2 sentinels that ride every window as canaries for the
# previously-proven surface (relational core, queen borders, dorling).
SENTINELS = {"q01_pricing_summary", "g02_queen_borders",
             "g04_dorling_positions"}

# Round 5's window is fully booked by the deferred backlog (round 4
# added ~50 queries against a 47-slot/round gate budget), so round 5
# rides TWO sentinels: q01 (relational core) and g04 (the geo macro
# surface; g02's queen-border machinery is additionally covered by the
# historically-checked g07). 48 deferred + 2 = exactly GATE_CAP.
NEXT_ROUND_SENTINELS = {"q01_pricing_summary", "g04_dorling_positions"}


def _window():
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    return list(get_queries())[:GATE_CAP]


def _historically_checked() -> set[str]:
    """Names that appeared in any committed driver correctness record
    (presence means the driver ran the oracle compare on them)."""
    checked = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            checked |= set(json.load(f))
    return checked


def test_gate_window_matches_declared_order():
    """The curated DRIVER_WINDOW must actually be the emitted prefix —
    a registry refactor that stops honoring it would silently revert
    to module-concatenation order (round-2's failure mode)."""
    from ecmm428_pycart_spark.benchmarks.registry import DRIVER_WINDOW
    assert _window()[:len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == GATE_CAP


def test_window_keeps_sentinels():
    assert SENTINELS <= set(_window())


def test_every_query_gate_checked_within_two_rounds():
    """The rotation invariant: no registered query may sit outside the
    hard signal indefinitely. Each one is historically checked, in the
    current window, or explicitly deferred to next round's window."""
    from ecmm428_pycart_spark.benchmarks.registry import (
        DEFERRED_TO_NEXT_ROUND, get_queries)
    registered = set(get_queries())
    covered = (_historically_checked() | set(_window())
               | set(DEFERRED_TO_NEXT_ROUND))
    orphans = registered - covered
    assert not orphans, (
        f"queries outside the 2-round gate rotation: {sorted(orphans)} — "
        "add them to DRIVER_WINDOW or DEFERRED_TO_NEXT_ROUND")


def test_deferred_list_fits_next_window():
    """The deferral escape hatch must stay small enough that next
    round's window can absorb all of it plus the sentinels."""
    from ecmm428_pycart_spark.benchmarks.registry import (
        DEFERRED_TO_NEXT_ROUND, get_queries)
    deferred = set(DEFERRED_TO_NEXT_ROUND)
    assert len(DEFERRED_TO_NEXT_ROUND) == len(deferred)
    assert len(deferred) + len(NEXT_ROUND_SENTINELS) <= GATE_CAP
    assert deferred <= set(get_queries())
    assert not deferred & set(_window()), \
        "a query cannot be both gated now and deferred"


def test_window_names_all_have_oracles():
    """Every gated query must be hash-checkable: an oracle-less entry
    in the window burns a slot on a rows-only (weak) row."""
    from ecmm428_pycart_spark.benchmarks.registry import get_oracle_sql
    oracles = get_oracle_sql()
    missing = [n for n in _window() if n not in oracles]
    assert not missing, f"gated queries without oracle SQL: {missing}"


def test_full_registry_still_contains_everything():
    """Reordering must never drop registrations: the tail (post-window)
    queries stay registered and verify via tools/verify_oracle.py."""
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    names = list(get_queries())
    assert len(names) == len(set(names))
    for required in ("q38_sketch_accuracy", "m05_frame_sample",
                     "q41_e3_pipeline", "d27_source_mix",
                     "s08_int8_quantize", "q22_revenue_by_nation",
                     "g08_dorling_scalable_large", "st01_stream_hourly"):
        assert required in names
