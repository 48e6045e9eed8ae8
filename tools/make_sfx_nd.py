#!/usr/bin/env python3
"""Near-dup-realistic variant of make_sfx.py for the PAIR families.

Pure replication (make_sfx.py) gives every document/vector N IDENTICAL
copies, so pair-generating queries blow up as C(N,2) per duplicate
group — a fixture artifact, not operator scaling (measured: the r14
sfx100 sweep's pairs chunk filled 65 GB of shuffle scratch and died of
ENOSPC on the FIRST family). This builder replicates the same way the
scale-stress harness does instead: replica k shifts doc ids by k*10M
and ROTATES each text by k words (each replica keeps the fixture's
internal near-dup structure, but replicas are not wholesale duplicates
of each other), and shifts vec ids while perturbing each embedding
element by k*0.001 (distinct vectors, same geometry). Both engines
read the SAME parquet, so the oracle contract is unchanged.

Usage: python3 tools/make_sfx_nd.py [srcDir] [dstDir] [replicas]
Only documents.parquet and embeddings.parquet are rewritten; the other
tables are copied through unchanged (pair queries don't read them, but
check.py builds views over all of them).
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx100nd"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 100

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]


def rotate(text: str, k: int) -> str:
    if text is None:
        return None
    w = text.split(" ")
    r = k % max(1, len(w))
    # the rotation alone repeats every len(w) replicas (a 3-word doc is
    # a wholesale duplicate again at k=3,6,...), partially reintroducing
    # the C(N,2) pair blowup this tool exists to avoid — a per-replica
    # salt token keeps every replica's text distinct at ANY doc length
    return " ".join(w[r:] + w[:r] + [f"rs{k}"])


def main():
    os.makedirs(DST, exist_ok=True)
    for t in PASSTHROUGH:
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    cols = docs.column_names
    d = docs.to_pylist()
    out = []
    for k in range(R):
        off = k * 10_000_000
        for r in d:
            rr = dict(r)
            rr["doc_id"] = r["doc_id"] + off
            rr["text"] = rotate(r["text"], k)
            out.append(rr)
    pq.write_table(pa.Table.from_pylist(out, schema=docs.schema),
                   f"{DST}/documents.parquet")
    print(f"documents: {len(d)} -> {len(out)} rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    e = emb.to_pylist()
    out = []
    for k in range(R):
        off = k * 10_000_000
        delta = k * 0.001
        for r in e:
            rr = dict(r)
            rr["vec_id"] = r["vec_id"] + off
            rr["embedding"] = [x + delta for x in r["embedding"]]
            out.append(rr)
    pq.write_table(pa.Table.from_pylist(out, schema=emb.schema),
                   f"{DST}/embeddings.parquet")
    print(f"embeddings: {len(e)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
