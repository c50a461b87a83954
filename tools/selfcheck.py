#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each query's parquet dump (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over views named
after the parquet tables in sfDir, and compares: row count, column-name
set, and cell-exact values after sorting columns by name and rows by all
columns. Exit code 1 if any oracle-backed query mismatches.
"""
import sys, os, json, math, time
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Heavy oracles (unrolled-iteration graph CTEs at blow-up tiers)
    # can out-spill the box: default temp dir is ./.tmp INSIDE THE REPO
    # and the default memory limit is 80% of RAM, so a too-big oracle
    # fills the root filesystem before failing (observed: q43 at 100x,
    # ENOSPC). Pin the spill location and a bounded memory budget so a
    # too-big oracle fails ITS query cleanly instead of taking the
    # repo's filesystem down with it.
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill'")
    con.execute("SET memory_limit='48GB'")
    con.execute("SET max_temp_directory_size='60GB'")

    def src(t):
        # driver fixtures are single parquet FILES; Spark-derived dirs
        # (the 10x blow-up) are DIRECTORIES of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        return f"{p}/*.parquet" if os.path.isdir(p) else p

    for t in TABLES:
        view = f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src(t)}')"
        if t == "events":
            # The driver fixture stores ts as parquet TIMESTAMP(NANOS);
            # Spark-derived copies (the 10x blow-up) re-emit it as plain
            # INT64 nanos. Oracles are written against a timestamp ts,
            # so when the file carries BIGINT, convert in the view the
            # same way the Spark loader does (integer floor-div to
            # micros — never float, nanos exceed 2^53).
            info = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src(t)}')"
            ).fetchall()
            if any(c == "ts" and ty == "BIGINT" for c, ty, *_ in info):
                cols = ", ".join(
                    "make_timestamp(ts // 1000) AS ts" if c == "ts" else c
                    for c, _, *_ in info
                )
                view = (f"CREATE VIEW events AS SELECT {cols} "
                        f"FROM read_parquet('{src(t)}')")
        con.execute(view)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    checked = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        spark_df = pq.read_table(path).to_pandas()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        checked += 1
        t0 = time.time()
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        # dtype-kind strictness: the driver hashes values, and an int64
        # column vs a float64 column (e.g. DuckDB SUM(int) -> HUGEINT ->
        # float64) hash-mismatches even when == holds cell-by-cell.
        # Kind-level (not full-width) comparison is INTENTIONAL: the
        # driver compare tolerates int32-vs-int64 / float32-vs-float64
        # (verified: tx01's size()->int32 vs len()->int64 hash-matches),
        # so width differences are not a local failure.
        kind_bad = [
            (c, s[c].dtype, d[c].dtype)
            for c in s.columns
            if s[c].dtype.kind != d[c].dtype.kind
        ]
        if kind_bad:
            c, sk, dk = kind_bad[0]
            print(f"FAIL {name}: dtype mismatch col={c} spark={sk} duck={dk}")
            failures += 1
            continue
        bad = None
        for ci, c in enumerate(s.columns):
            sv, dv = s[c].tolist(), d[c].tolist()
            for ri in range(len(sv)):
                x, y = sv[ri], dv[ri]
                # normalize NaT/None/pd.NA and numpy scalars
                x = None if x is None or (isinstance(x, float) and math.isnan(x)) or str(x) == "NaT" else x
                y = None if y is None or (isinstance(y, float) and math.isnan(y)) or str(y) == "NaT" else y
                if hasattr(x, "item"):
                    x = x.item()
                if hasattr(y, "item"):
                    y = y.item()
                if isinstance(x, pd.Timestamp):
                    x = x.to_pydatetime()
                if isinstance(y, pd.Timestamp):
                    y = y.to_pydatetime()
                if not cells_equal(x, y):
                    bad = (c, ri, x, y)
                    break
            if bad:
                break
        if bad:
            c, ri, x, y = bad
            print(f"FAIL {name}: first cell mismatch col={c} row={ri} spark={x!r} duck={y!r}")
            failures += 1
        else:
            # per-oracle wall time: the number that decides which tiers
            # a query's gate can afford (exclusions are cost-model calls)
            print(f"  OK {name}: {len(s)} rows ({time.time() - t0:.1f}s)")
    print(f"\n{checked} oracle-backed checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
