#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/selfcheck.py [sfDir] [verifyOut] [query...]

Reads verifyOut/oracle_sql.json, runs each oracle in DuckDB against the
sfDir parquet tables, reads the Spark result parquet, sorts columns by
name, and compares exact cell values. Reports per-query PASS/FAIL.
"""
import datetime, glob, json, math, sys, time
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle-cost budget (round-16 gate, VERDICT r15 "Next round" #2): the
# driver's DuckDB-compare phase has a finite window (~10 min observed —
# CORRECTNESS_r15 came back EMPTY because two oracles alone took 750 s).
# Budget to half that window so host drift and suite growth can't push
# us over: no single oracle > 15 s and suite total <= 300 s at sf0.01.
# Enforced only for sf0.01 dirs (sf0.1 oracles are legitimately ~10x).
PER_ORACLE_BUDGET_S = 15.0
SUITE_BUDGET_S = 300.0

# Pin the oracle engine: the MATERIALIZED CTE rewrite (Queries.normalize)
# and the suite's CTE-evaluation cost model are validated on this exact
# DuckDB line; an engine bump can silently change CTE semantics/costs.
EXPECTED_DUCKDB = "1.0."


class NonScalar(Exception):
    """A cell the driver's pandas lexsort cannot hash (array/map/struct)."""


def norm(v):
    # Bit-strict, driver-faithful normalization: a Python Decimal never
    # equals a float (the driver hash-mismatches them even when
    # numerically identical), and non-scalar cells hard-error (the
    # driver's lexsort raises on numpy arrays). Do NOT add tolerant
    # fallbacks here — round 1 shipped 16 red rows because this gate
    # was looser than the driver's.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", v.hex())
    if isinstance(v, Decimal):
        return ("dec", str(v))
    # DATE columns: pandas reads Spark parquet date32 as datetime.date
    # objects while DuckDB's .df() yields datetime64 Timestamps — the
    # driver's gate hash-matched DATE outputs in round 1 (q_filter_range,
    # q_date_parse), so canonicalize both to one representation.
    if isinstance(v, datetime.datetime):
        return ("dt", v.isoformat())
    if isinstance(v, datetime.date):
        return ("dt", datetime.datetime(v.year, v.month, v.day).isoformat())
    if hasattr(v, "tolist") or isinstance(v, (list, tuple, dict, set)):
        raise NonScalar(repr(type(v)))
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])

    if not duckdb.__version__.startswith(EXPECTED_DUCKDB):
        print(f"FAIL gate: duckdb {duckdb.__version__} != pinned "
              f"{EXPECTED_DUCKDB}x — revalidate oracle costs/semantics "
              f"before trusting this gate")
        sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    oracle_secs = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            exp = con.execute(sql).df()
            oracle_secs[name] = time.time() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            # pandas/pyarrow, NOT DuckDB: the driver reads the Spark
            # parquet this way, so decimal columns surface as Python
            # Decimal objects exactly as they do in the driver's gate
            parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            got = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
            failures += 1
            continue
        bad = 0
        nonscalar = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                try:
                    na, nb = norm(a), norm(b)
                except NonScalar as e:
                    nonscalar = f"{c}[{i}] non-scalar cell {e}"
                    break
                if na != nb:
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: oracle={a!r} spark={b!r}"
                              f" (dtypes oracle={exp[c].dtype} spark={got[c].dtype})")
                    bad += 1
            if nonscalar:
                break
        if nonscalar:
            print(f"FAIL {name}: {nonscalar} (would crash the driver comparator)")
            failures += 1
        elif bad:
            print(f"FAIL {name}: {bad} mismatched cells (rows={exp.shape[0]})")
            failures += 1
        else:
            print(f"PASS {name} ({exp.shape[0]} rows x {exp.shape[1]} cols)")

    # Oracle-cost budget report + gate (full-suite sf0.01 runs only; a
    # partial run or a bigger SF prints the table without enforcing).
    total = sum(oracle_secs.values())
    print(f"\noracle cost: {total:.1f}s total over {len(oracle_secs)} "
          f"oracles (duckdb {duckdb.__version__}); top 10:")
    for n, s in sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {s:7.2f}s {n}")
    if not only and "sf0.01" in sf:
        over = {n: s for n, s in oracle_secs.items()
                if s > PER_ORACLE_BUDGET_S}
        for n, s in sorted(over.items(), key=lambda kv: -kv[1]):
            print(f"FAIL budget: oracle {n} took {s:.1f}s "
                  f"(> {PER_ORACLE_BUDGET_S:.0f}s at sf0.01)")
        if total > SUITE_BUDGET_S:
            print(f"FAIL budget: oracle suite took {total:.1f}s "
                  f"(> {SUITE_BUDGET_S:.0f}s at sf0.01)")
        failures += len(over) + (1 if total > SUITE_BUDGET_S else 0)

    print(f"\n{'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
