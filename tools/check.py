#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify) **via
pandas/pyarrow** (like the driver — NOT via DuckDB, which silently
normalizes decimals/hugeints and so hides hash-relevant dtype drift),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over
views of the <sfDir> parquet tables, sorts rows by all columns and
columns by name (like the driver), and compares cell repr **strictly**:
int64 vs float64, Decimal vs float, 1 vs 1.0 are all FAILs here because
they are hash mismatches driver-side.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def components_oracle(con, sql: str) -> pd.DataFrame:
    """Scalable oracle for dedup_docs_components. DuckDB still computes
    the pair set (the same CTE prefix the hash-matched ngram_jaccard
    query proves feasible at every sweep scale); the transitive closure
    then runs as an exact union-find in O(E alpha(E)) memory instead of
    the recursive CTE's quadratic `reach` materialization, which spills
    >79 GB and dies on disk past ~1M edges (SWEEP_SF1.md). Same answer
    by construction: component label = min doc_id reachable through the
    pair graph, singletons label themselves.

    The split point is the ORACLE-SPLIT sentinel comment that
    dedupDocsComponentsSql (queries/TextOps.scala) places above its
    closure CTEs — the contract is documented there; the bare
    "edges AS" fallback keeps old committed oracle_sql.json dumps
    checkable. The sentinel line may carry `out=<id>,<label>[,<count>]`
    to rename the output columns (default doc_id,component) and, with a
    third name, append each component's member count (incl. singletons)
    — the er_fuzzy_entities shape, where ids are STRINGS and the label
    is the min reachable id under the same `<` the SQL min() uses."""
    token = "-- ORACLE-SPLIT" if "-- ORACLE-SPLIT" in sql else "edges AS"
    out_cols = ["doc_id", "component"]
    if token == "-- ORACLE-SPLIT":
        import re as _re
        line = sql.split(token, 1)[1].split("\n")[0]
        m = _re.search(r"out=([\w,]+)", line)
        if m:
            out_cols = m.group(1).split(",")
    prefix = sql.split(token)[0].rstrip().rstrip(",")
    pairs = con.execute(prefix + "\nSELECT a, b FROM pairs").fetchall()
    ids = [r[0] for r in
           con.execute(prefix + "\nSELECT doc_id FROM corpus").fetchall()]
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min root: the representative IS the component label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    labels = [find(i) for i in ids]
    df = pd.DataFrame({out_cols[0]: ids, out_cols[1]: labels})
    if len(out_cols) > 2:
        from collections import Counter
        sizes = Counter(labels)
        df[out_cols[2]] = pd.Series([sizes[l] for l in labels],
                                    dtype="int64")
    # integer ids keep the driver's int64 repr; string ids pass through
    for c in out_cols[:2]:
        if len(df) and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].astype("int64")
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver sorts rows itself (its lexsort is what crashes on array
    # cells) — replicate so array-typed outputs fail here too
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # explicit cap instead of DuckDB's default 80%-of-RAM: under a
    # concurrent sweep the Spark JVM already holds most of the box, and
    # an oracle that sizes itself off TOTAL ram OOMs on memory the OS
    # can't give it (observed: dq_constraint_report's 60M-row
    # count(DISTINCT) during the r14 sfx100 sweep; 4.6 s standalone
    # under a 24GB cap). 24GB is the CEILING, not the floor: on a
    # smaller host cap at half of physical RAM instead, else the
    # explicit limit would raise DuckDB's budget above the machine
    # (GRAFT_ORACLE_MEM overrides both).
    mem = os.environ.get("GRAFT_ORACLE_MEM")
    if not mem:
        try:
            total_kb = next(int(l.split()[1]) for l in open("/proc/meminfo")
                            if l.startswith("MemTotal:"))
            mem = f"{min(24, max(1, total_kb // (2 * 1024 * 1024)))}GB"
        except (OSError, StopIteration):
            mem = "24GB"
    con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            # union-find closure for any oracle declaring the split
            # sentinel (components-style transitive closures are
            # disk-infeasible as recursive CTEs past ~1M edges);
            # the name check keeps old committed dumps checkable
            want = canon(components_oracle(con, sql)
                         if ("-- ORACLE-SPLIT" in sql
                             or name == "dedup_docs_components")
                         else con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: compare error: {type(e).__name__}: {e}")
            nfail += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rowcount differs: spark={len(got)} oracle={len(want)}")
        else:
            # pure repr compare: int32 vs int64 both repr as '5' (fine,
            # matches driver round-1 behavior), while int vs float ('5'
            # vs '5.0'), Decimal, and hugeint drift are all caught
            bad = 0
            # unwrap numpy scalars first: under numpy>=2 repr(np.int64(5))
            # is 'np.int64(5)', which would false-fail every numeric cell
            unwrap = lambda x: (x.item() if hasattr(x, "item")
                                and getattr(x, "size", 1) == 1 else x)
            import numpy as np

            def fast_clean(a: pd.Series, b: pd.Series) -> bool:
                """True only when C-level equality GUARANTEES repr
                equality cell-for-cell — the sweep-scale fast path (a
                15M-row python repr loop is ~10 min/query). Same-dtype
                numeric/bool/datetime: equal values of one dtype repr
                identically (floats additionally need signbit: -0.0 ==
                0.0 but reprs differ; equals() treats NaN==NaN as
                equal, and repr('nan') matches). All-string object
                columns: str equality implies repr equality. Decimals /
                mixed objects NEVER fast-path (Decimal('5.0') ==
                Decimal('5.00') but reprs differ) — they fall through
                to the exact repr loop below, as does any column this
                returns False for, so every reported mismatch is still
                repr-level."""
                if a.dtype != b.dtype:
                    return False
                if a.dtype == object:
                    if (pd.api.types.infer_dtype(a) != "string"
                            or pd.api.types.infer_dtype(b) != "string"):
                        return False
                    return bool(np.asarray(a.values == b.values).all())
                if not a.equals(b):
                    return False
                if pd.api.types.is_float_dtype(a.dtype):
                    return bool((np.signbit(a.values) == np.signbit(b.values)).all())
                return True

            for c in got.columns:
                if fast_clean(got[c], want[c]):
                    continue
                for i, (a, b) in enumerate(zip(got[c], want[c])):
                    a, b = unwrap(a), unwrap(b)
                    if repr(a) != repr(b):
                        if bad < 3:
                            probs.append(f"row {i} col {c}: spark={a!r} oracle={b!r}")
                        bad += 1
            if bad:
                probs.append(f"({bad} repr-mismatched cells)")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            nfail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            npass += 1
    # queries with no oracle: rows-only check, but still exercise the
    # driver's pandas read+sort (array cells must not crash it)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle or (only and name not in only):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        try:
            df = canon(pd.concat([pd.read_parquet(f) for f in files])) if files else pd.DataFrame()
            n = len(df)
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            npass, nfail = (npass + 1, nfail) if n > 0 else (npass, nfail + 1)
        except Exception as e:
            print(f"FAIL {name}: rows-only read/sort error: {type(e).__name__}: {e}")
            nfail += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
