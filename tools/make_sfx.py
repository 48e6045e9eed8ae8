#!/usr/bin/env python3
"""Replicate the sf0.1 fixtures R times with referentially-consistent
key offsets -> a synthetic ~sf1 for the deep correctness sweep.

Usage: python3 tools/make_sfx.py [srcDir] [dstDir] [replicas]

Why replication (not a fresh generator): the oracle gate compares Spark
vs DuckDB on the SAME parquet, so any data works as long as both
engines read it; what the 10x sweep adds over sf0.1 is one more decade
of scale for boundary-condition bugs (sum/rounding cliffs, overflow,
ties) which replication exposes just as well. Keys are offset per
replica by a round power of ten larger than the key domain, applied to
every foreign-key column consistently, so joins keep exactly their
per-replica cardinalities. Dims (region/nation) are NOT replicated —
replicated fact rows reference the shared dims, like a real scale-up.
pyarrow preserves the physical schema exactly (incl. the events table's
ns timestamps, which the Spark-side Tables loader special-cases).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key-column -> offset-domain per table; domains shared across tables
KEYS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    # one shared offset base per domain: a power of ten above every max
    dom_max = {}
    tabs = {}
    for t, keys in KEYS.items():
        tabs[t] = pq.read_table(f"{SRC}/{t}.parquet")
        for col, dom in keys.items():
            m = pc.max(tabs[t].column(col)).as_py() or 0
            dom_max[dom] = max(dom_max.get(dom, 0), m)
    base = {}
    for dom, m in dom_max.items():
        b = 1
        while b <= m:
            b *= 10
        base[dom] = b
    for t, keys in KEYS.items():
        tab = tabs[t]
        if not keys:  # dims stay single-copy
            pq.write_table(tab, f"{DST}/{t}.parquet")
            continue
        parts = []
        for r in range(R):
            if r == 0:
                parts.append(tab)
                continue
            cols = []
            for name in tab.column_names:
                c = tab.column(name)
                if name in keys:
                    off = pa.scalar(r * base[keys[name]], type=c.type)
                    c = pc.add(c, off)
                cols.append(c)
            parts.append(pa.table(cols, names=tab.column_names))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {tab.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
