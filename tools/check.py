#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every parquet table of
<sfDir> as a DuckDB view, runs each oracle, and compares against the
Spark result parquet (columns sorted by name, exact value equality).
Not part of the Scala library — validation tooling only.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            odf = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            sdf = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failed.append(name)
            continue
        if list(odf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs oracle {list(odf.columns)}")
            failed.append(name)
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
            failed.append(name)
            continue
        mismatch = None
        for c in odf.columns:
            a, b = sdf[c], odf[c]
            # Strict dtype-kind check: the driver hashes serialized values, so
            # an int64 Spark column vs a float64 oracle column (e.g. DuckDB's
            # HUGEINT sum() landing in arrow as float) is a driver-side FAIL
            # even when 1234 == 1234.0. Mirror that here. 'i'/'u' are one
            # class; datetime unit differences (ns vs us) share kind 'M'.
            ka = "i" if a.dtype.kind == "u" else a.dtype.kind
            kb = "i" if b.dtype.kind == "u" else b.dtype.kind
            if ka != kb:
                mismatch = f"col {c} dtype kind: spark={a.dtype} oracle={b.dtype}"
                break
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int(eq.idxmin())
                mismatch = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(odf)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
