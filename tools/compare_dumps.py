#!/usr/bin/env python3
"""Compare two graft.Verify output directories for bit-identity — the
partition-count-determinism closing gate. Run Verify twice with different
SPARK_GRAFT_CPUS (e.g. 8 and 32), then:

    python3 tools/compare_dumps.py /tmp/verify_out8 /tmp/verify_out32

Canonicalization matches check_oracle.py (columns sorted by name, rows
sorted, floats at full repr), so "0 mismatches" here is the same
strictness as the oracle gate: a query whose result depends on partition
count — a nondeterministic ordering leaking into a value, a float sum
folded in partition order — fails loudly instead of passing at 32 threads
and failing on the driver's 8.
"""
import math
import os
import sys

import duckdb


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(a, b):
    con = duckdb.connect()
    names_a = sorted(d for d in os.listdir(a)
                     if os.path.isdir(os.path.join(a, d)))
    names_b = sorted(d for d in os.listdir(b)
                     if os.path.isdir(os.path.join(b, d)))
    if names_a != names_b:
        print(f"query sets differ: only_a={set(names_a)-set(names_b)} "
              f"only_b={set(names_b)-set(names_a)}")
        sys.exit(1)
    n_bad = 0
    for name in names_a:
        ra = con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'")
        rows_a, cols_a = ra.fetchall(), [c.lower() for c in ra.columns]
        rb = con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'")
        rows_b, cols_b = rb.fetchall(), [c.lower() for c in rb.columns]
        if sorted(cols_a) != sorted(cols_b):
            print(f"MISMATCH {name}: cols {sorted(cols_a)} vs {sorted(cols_b)}")
            n_bad += 1
        elif canon(rows_a, cols_a) != canon(rows_b, cols_b):
            print(f"MISMATCH {name}: values differ ({len(rows_a)} vs {len(rows_b)} rows)")
            n_bad += 1
    print(f"{len(names_a)} compared, {n_bad} mismatches")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
