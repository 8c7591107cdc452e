"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf dir, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
       python tools/verify_oracle.py --queued [sf_dir] [query_name ...]

--queued sweeps benchmarks/queued.py (the round-5 registration queue)
instead of the registered registry — same compare, same exit code.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # distinguish -0.0 from 0.0: the driver's value-hash may hash
        # string forms where they differ even though == treats them equal
        r = round(v, 9)
        return repr(r)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _norm_spark_type(t: str) -> str:
    t = t.lower()
    if t in ("int", "integer"):
        return "int32"
    if t == "bigint":
        return "int64"
    if t == "float":
        return "float32"
    if t in ("double",):
        return "float64"
    if t.startswith("array"):
        return "list"
    return t


def _norm_duck_type(t: str) -> str:
    t = t.upper()
    if t.endswith("[]"):
        return "list"
    m = {"BIGINT": "int64", "INTEGER": "int32", "SMALLINT": "int32",
         "TINYINT": "int32", "DOUBLE": "float64", "FLOAT": "float32",
         "VARCHAR": "string", "DATE": "date", "TIMESTAMP": "timestamp",
         "TIMESTAMP_NS": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
         "BLOB": "binary", "BOOLEAN": "boolean"}
    return m.get(t, t.lower())


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    args = sys.argv[1:]
    use_queued = "--queued" in args
    use_plain = "--plain" in args
    window_only = "--window" in args
    args = [a for a in args if a not in ("--queued", "--plain", "--window")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as ent
    from ecmm428_pycart_spark.session import get_spark

    if use_plain:
        # driver-parity mode: the session the driver actually builds —
        # NO get_spark configs (no pinned UTC timezone, no AQE/Arrow/
        # shuffle-partition settings). --plain --window together
        # simulate the exact correctness gate.
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .appName("verify-oracle-plain")
                 .config("spark.ui.enabled", "false").getOrCreate())
    else:
        spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    if use_queued:
        from ecmm428_pycart_spark.benchmarks import queued
        qs, oracles = dict(queued.QUERIES), dict(queued.ORACLES)
    else:
        qs = ent.queries()
        oracles = ent.oracle_sql()
    if window_only:  # the driver gates exactly the first 50 entries
        qs = dict(list(qs.items())[:50])
    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        # this tool tuple-izes list cells (norm_cell), but the DRIVER's
        # canonicalizer crashes on them (the r4 s08 red) — surface the
        # divergence loudly instead of silently passing what the gate
        # would fail (tests/test_gate_coverage.py enforces the same for
        # window+deferred; this warns for the whole registry)
        arrayish = [f.name for f in df.schema.fields
                    if f.dataType.simpleString().startswith(
                        ("array", "struct", "map"))]
        if arrayish:
            print(f"  ! {name}: array/struct/map output columns "
                  f"{arrayish} — gate-INCOMPATIBLE (driver "
                  "canonicalizer crashes on these); this tool is more "
                  "lenient than the driver here")
        if sql is None:
            print(f"weak {name}: rows={len(sp_rows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            rel = con.sql(sql)
            du_cols = list(rel.columns)
            du_types = [str(t) for t in rel.types]
            du_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount spark={len(sp_rows)} duck={len(du_rows)}")
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        else:
            # normalized type compare (int widths matter, driver may check)
            spt = {f.name: _norm_spark_type(f.dataType.simpleString())
                   for f in df.schema.fields}
            dut = dict(zip(du_cols, [_norm_duck_type(t) for t in du_types]))
            for c in sp_cols:
                if spt[c] != dut.get(c) and dut.get(c) != "any":
                    problems.append(f"type[{c}] spark={spt[c]} duck={dut.get(c)}")
        if not problems:
            cs = canon(sp_rows, sp_cols)
            cd = canon(du_rows, du_cols)
            if cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sp_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
