#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views of
the <sfDir> parquet tables, sorts columns by name (like the driver), and
compares values exactly. Reports per-query PASS/FAIL with diff details.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not hasattr(b, "__len__") or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            nfail += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rowcount differs: spark={len(got)} oracle={len(want)}")
        else:
            bad = 0
            for c in got.columns:
                for i, (a, b) in enumerate(zip(got[c], want[c])):
                    if not cell_eq(a, b):
                        if bad < 3:
                            probs.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
                        bad += 1
            if bad:
                probs.append(f"({bad} mismatched cells)")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            nfail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            npass += 1
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n} rows)")
        if n > 0:
            npass += 1
        else:
            nfail += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
