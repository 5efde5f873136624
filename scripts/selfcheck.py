#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/selfcheck.py [sfDir] [verifyOut] [query...]

Reads verifyOut/oracle_sql.json, runs each oracle in DuckDB against the
sfDir parquet tables, reads the Spark result parquet, sorts columns by
name, and compares exact cell values. Reports per-query PASS/FAIL.
"""
import json, math, sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", v)
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if hasattr(v, "tolist"):          # numpy array cell
        return ("a", tuple(norm(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(norm(x) for x in v))
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
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
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                na, nb = norm(a), norm(b)
                if na != nb:
                    # float-vs-decimal cross-type: compare numerically
                    try:
                        if na is not None and nb is not None and \
                           float(a) == float(b):
                            continue
                    except (TypeError, ValueError):
                        pass
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: oracle={a!r} spark={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells (rows={exp.shape[0]})")
            failures += 1
        else:
            print(f"PASS {name} ({exp.shape[0]} rows x {exp.shape[1]} cols)")
    print(f"\n{'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
