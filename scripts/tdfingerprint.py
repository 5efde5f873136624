#!/usr/bin/env python3
"""Fingerprint the testdata a gate run is binding against (VERDICT r8 #4).

Round 8's lesson: the driver regenerated /root/testdata between the
builder's last commit and the round's verify run (TIMESTAMP(NANOS) →
TIMESTAMP(MICROS)), so a SELFCHECK.log that said ALL PASS was stale
evidence the moment the files changed. This prints one deterministic
line per table — parquet SCHEMA hash (the thing that actually broke) +
file mtime + size — so (a) the log records exactly which data it
vouches for, and (b) presnapshot.sh can diff gate-start vs gate-end
state and refuse to go green across a regeneration.

Usage: python3 scripts/tdfingerprint.py [sfDir]
"""
import hashlib, os, sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        try:
            st = os.stat(path)
            # remove_metadata(): the pandas blob carries no read semantics;
            # the arrow schema string pins column names + physical types
            # (e.g. "ts: timestamp[us]" vs "ts: int64") — the contract.
            schema = pq.read_schema(path).remove_metadata()
            digest = hashlib.md5(schema.serialize().to_pybytes()).hexdigest()[:16]
            print(f"td {t} schema={digest} mtime={int(st.st_mtime)} "
                  f"size={st.st_size} :: {str(schema).replace(chr(10), '; ')}")
        except Exception as e:  # missing table is itself a loud fingerprint
            print(f"td {t} ERROR {e}")


if __name__ == "__main__":
    main()
