"""Contended-stability probe for the DuckDB oracles (round-10 lesson,
made standing).

Round 10's sf0.1 sweep failed q115 with value diffs that root-caused
to the ORACLE engine: DuckDB 1.0.0's parallel window execution
returns a nondeterministic WRONG answer for cumulative frames on
~600k-row inputs (docs/ORACLE_FULL_r10.md). The engine result was
correct in every run. This tool is the defense: re-run each oracle N
times in fresh connections and flag ANY run-to-run disagreement —
run it (ideally while something else loads the CPU; parallel-window
morsel splits are contention-sensitive) whenever an oracle is added,
an oracle is edited, or the DuckDB version is bumped.

By default probes every oracle that uses a window function over one
of the big tables (lineitem/orders/events) — the population where the
round-10 bug class lives; pass names to probe a specific set, or
--all for the whole registry.

Usage:
  python tools/oracle_stability.py [--sf SF_DIR] [--trials N] [--all] [name ...]

Exit code 1 if any oracle is unstable.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BIG = ("FROM LINEITEM", "JOIN LINEITEM", "FROM EVENTS", "JOIN EVENTS",
       "FROM ORDERS", "JOIN ORDERS")


def default_names(oracles: dict[str, str]) -> list[str]:
    out = []
    for name, sql in oracles.items():
        s = sql.upper()
        if re.search(r"\bOVER\b", s) and any(t in s for t in BIG):
            out.append(name)
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--all", action="store_true",
                    help="probe every oracle, not just big-table windows")
    args = ap.parse_args()

    import __spark_entry__ as ent
    oracles = ent.oracle_sql()
    names = (args.names or
             (sorted(oracles) if args.all else default_names(oracles)))

    flaky = []
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: no oracle, skipped")
            continue
        ref = None
        bad = 0
        for _ in range(args.trials):
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf}/{t}.parquet')")
            rows = sorted(map(str, con.sql(sql).fetchall()))
            if ref is None:
                ref = rows
            elif rows != ref:
                bad += 1
            con.close()
        print(f"{name}: nondeterministic {bad}/{args.trials - 1}")
        if bad:
            flaky.append(name)
    print(f"unstable oracles: {flaky or 'none'}")
    sys.exit(1 if flaky else 0)


if __name__ == "__main__":
    main()
