#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle SQL from <outdir>/oracle_sql.json (written by
graft.Verify) against the sf parquet tables, and compares with the parquet
the Spark side dumped: schema (column names + types after sorting columns
by name) and a hash of all values with rows sorted.

Usage: python3 tools/check.py <sfdir> <outdir>
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np
import hashlib

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # ndarray/list cells are unhashable for sort_values — tuple-ize them
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (np.ndarray, list))).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, list) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        h.update(c.encode())
        h.update(str(col.dtype).encode())
        for v in col:
            if isinstance(v, float):
                h.update(repr(v).encode())
            elif isinstance(v, np.ndarray):
                h.update(repr(v.tolist()).encode())
            else:
                h.update(repr(v).encode())
    return h.hexdigest()


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        try:
            actual = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            fails += 1
            continue
        e, a = canon(expected), canon(actual)
        if list(e.columns) != list(a.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != oracle {list(e.columns)}")
            fails += 1
            continue
        if [str(d) for d in e.dtypes] != [str(d) for d in a.dtypes]:
            print(f"WARN {name}: dtypes spark={list(map(str,a.dtypes))} oracle={list(map(str,e.dtypes))}")
        if len(e) != len(a):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(e)}")
            fails += 1
            continue
        if df_hash(e) != df_hash(a):
            diff_cols = []
            for c in e.columns:
                try:
                    same = (e[c].values == a[c].values) | (pd.isna(e[c].values) & pd.isna(a[c].values))
                    if not same.all():
                        i = int(np.argmin(same))
                        diff_cols.append(f"{c}[{i}]: oracle={e[c].iloc[i]!r} spark={a[c].iloc[i]!r}")
                except Exception as ex:
                    diff_cols.append(f"{c}: cmp error {ex}")
            print(f"FAIL {name}: value mismatch: {'; '.join(diff_cols[:3])}")
            fails += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
    print(f"\n{len(oracles) - fails}/{len(oracles)} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
