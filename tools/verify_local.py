#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
testdata tables, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact; floats also reported with tolerance so we
can tell a hard mismatch from a last-bit one).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps/dates -> ISO strings so tz-naive/aware and date/datetime line up
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            try:
                if df[c].map(lambda v: hasattr(v, "isoformat")).any():
                    df[c] = df[c].map(lambda v: v.isoformat() if hasattr(v, "isoformat") else v)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; a derived corpus
        # (graft.ScaleCorpus) is a Spark-written DIRECTORY of part files
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            status = "ROWS_ONLY" + (" (EMPTY!)" if len(got) == 0 else f" rows={len(got)}")
            print(f"  {name:26s} {status}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name:26s} ORACLE_SQL_ERROR: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"  {name:26s} SCHEMA_MISMATCH spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  {name:26s} ROWCOUNT spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        # The driver hashes rendered values, so dtype drift (e.g. DuckDB
        # HUGEINT -> float64 vs Spark int64) fails its gate even when cell
        # values compare equal. Be exactly as strict here.
        dbad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                if str(g[c].dtype) != str(w[c].dtype)]
        if dbad:
            print(f"  {name:26s} DTYPE_MISMATCH (spark,duckdb): {dbad}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not cells_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"  {name:26s} VALUE_MISMATCH e.g. {bad}")
            n_fail += 1
        else:
            print(f"  {name:26s} OK rows={len(g)}")
            n_pass += 1
    # an oracle with NO output dir means graft.Verify caught that query
    # throwing (its [verify] stderr line is easy to miss in sbt noise) —
    # count it as a FAILURE, not a silent skip: iterating only existing
    # dirs once hid a query that failed at analysis time
    missing = sorted(set(oracles) - set(names))
    for name in missing:
        print(f"  {name:26s} NO_OUTPUT (query threw in graft.Verify — see its stderr)")
        n_fail += 1
    print(f"\n{n_pass} oracle-pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
