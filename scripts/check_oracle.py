#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers the
testdata parquet tables as DuckDB views, runs each oracle SQL, and compares
cell-by-cell against the Spark result parquet in <verifyOutDir>/<name>/.
Columns are sorted by name on both sides (the driver hashes in that order).
Exit code 1 if any query mismatches.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleGen's sf1 tables are
        # Spark-written directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.sql(sql)
            want_cols = list(want.columns)
            want_types = [str(t) for t in want.types]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got.columns)
            got_types = [str(t) for t in got.types]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            failures += 1
            continue
        ok = True
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}")
            failures += 1
            continue
        wt = dict(zip(want_cols, want_types))
        gt = dict(zip(got_cols, got_types))
        type_diff = {c: (wt[c], gt[c]) for c in want_cols if wt[c] != gt[c]}
        if type_diff:
            # Type drift is a hard failure: the driver hashes typed value
            # encodings, so e.g. DuckDB HUGEINT vs Spark BIGINT hash-mismatch
            # even when every cell compares equal (the round-5 q_privacy_kanon
            # red row shipped over a printed WARN here).
            print(f"FAIL {name}: type drift {type_diff}")
            failures += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: row count oracle={len(want_rows)} spark={len(got_rows)}")
            failures += 1
            continue
        # column order: sorted by name, mirroring the driver's hash
        w_idx = [want_cols.index(c) for c in sorted(want_cols)]
        g_idx = [got_cols.index(c) for c in sorted(got_cols)]
        max_float_diff = 0.0
        bad = None
        for rn, (wr, gr) in enumerate(zip(want_rows, got_rows)):
            for wi, gi in zip(w_idx, g_idx):
                a, b = wr[wi], gr[gi]
                if not cells_equal(a, b):
                    if isinstance(a, float) and isinstance(b, float):
                        max_float_diff = max(max_float_diff, abs(a - b))
                    if bad is None:
                        bad = (rn, want_cols[wi], a, b)
        if bad is not None:
            rn, cname, a, b = bad
            print(f"FAIL {name}: first diff row {rn} col {cname}: oracle={a!r} spark={b!r} "
                  f"(max float diff {max_float_diff:g})")
            failures += 1
            ok = False
        if ok:
            print(f"OK   {name}: {len(want_rows)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
