"""Deterministic 10x upscale of /root/testdata/sf0.1 -> /root/testdata_sf1_local.

Validation-only data (NOT committed, NOT read by bench.py/oracle): ten
key-shifted copies of every fact table so join structure, degree
distributions and per-key densities match the sf0.1 corpus while total
rows are 10x. Copy 0 is the identity. Text/embedding payloads are
deterministically perturbed per copy (word shuffle / dimension roll) so
near-dup and similarity operators see 10x *independent* corpora instead
of 100x cross-copy duplicate pairs, matching how a real larger SF scales.
nation/region stay fixed (dimension tables).
"""
import os, random, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"  # output: /root/testdata_sf1_local
DST = "/root/testdata_sf1_local"
COPIES = 10
STRIDE = 100_000_000  # far above any sf0.1 key

def read(t):
    return pq.read_table(os.path.join(SRC, f"{t}.parquet"))

def write(t, tbl):
    pq.write_table(tbl, os.path.join(DST, f"{t}.parquet"))

def offset(col, c):
    return pa.compute.add(col, pa.scalar(c * STRIDE, type=col.type))

def upscale(t, keycols, perturb=None):
    tbl = read(t)
    outs = []
    for c in range(COPIES):
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in keycols:
                cols[name] = offset(col, c) if c else col
            else:
                cols[name] = col
        piece = pa.table(cols)
        if perturb and c:
            piece = perturb(piece, c)
        outs.append(piece)
    out = pa.concat_tables(outs)
    write(t, out)
    print(f"{t}: {tbl.num_rows:,} -> {out.num_rows:,}")

def perturb_documents(piece, c):
    texts = piece.column("text").to_pylist()
    new = []
    for i, s in enumerate(texts):
        words = s.split(" ")
        rng = random.Random((c << 32) ^ i)
        rng.shuffle(words)
        new.append(" ".join(words))
    arr = pa.array(new, type=pa.string())
    n_chars = pa.array([len(s) for s in new], type=pa.int64())
    cols = {n: piece.column(n) for n in piece.column_names}
    cols["text"] = arr
    cols["n_chars"] = n_chars
    return pa.table(cols)

def perturb_embeddings(piece, c):
    embs = piece.column("embedding").to_pylist()
    rolled = [np.roll(np.array(v, dtype=np.float32), c).tolist() for v in embs]
    cols = {n: piece.column(n) for n in piece.column_names}
    cols["embedding"] = pa.array(rolled, type=pa.list_(pa.float32()))
    return pa.table(cols)

def main():
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    upscale("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
    upscale("orders", {"o_orderkey", "o_custkey"})
    upscale("part", {"p_partkey"})
    upscale("customer", {"c_custkey"})
    upscale("supplier", {"s_suppkey"})
    upscale("documents", {"doc_id"}, perturb_documents)
    upscale("embeddings", {"vec_id"}, perturb_embeddings)
    upscale("events", {"event_id", "user_id"})
    for t in ("nation", "region"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet"))
        print(f"{t}: copied as-is")
    open(os.path.join(DST, "_DONE"), "w").close()

if __name__ == "__main__":
    main()
