"""Deterministically upsample an sf dir by an integer factor for LOCAL
perf measurement only (the driver generates its own large SFs; this
script only has to match the *shape* of that data: same schemas, FK
structure, file layout, and a similar near-dup population in documents).

Never used by bench.py or any query — measurement fixture tooling only.

Usage: python scripts/make_sf_upsample.py <src_sf_dir> <dst_dir> [factor]

Key remapping per copy i keeps FK joins cardinality-correct:
  custkey/orderkey/partkey/suppkey/vec_id/doc_id/event_id/user_id += i*N.
nation/region stay fixed (TPC-H dims don't scale). Document texts of
copy i>0 are word-mutated with a deterministic per-(doc,copy) RNG at
~15% replacement (5% of docs stay exact duplicates), preserving an
exact-dup + near-dup population without exploding pair outputs.
Embeddings get +-1% deterministic noise. Timestamps are unchanged.
Files are written with pyarrow defaults (1Mi-row row groups) to mimic
the driver's one-file-per-table layout.
"""
from __future__ import annotations

import hashlib
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def rng_for(*parts) -> random.Random:
    h = hashlib.sha256("|".join(map(str, parts)).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def offset_col(tbl: pa.Table, name: str, off: int) -> pa.Table:
    col = tbl[name]
    typ = col.type
    arr = pa.compute.add(col, pa.scalar(off, type=typ))
    return tbl.set_column(tbl.schema.get_field_index(name), tbl.field(name), arr)


def main():
    src = sys.argv[1]
    dst = sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    counts = {}
    for t in ["customer", "orders", "lineitem", "part", "supplier",
              "events", "documents", "embeddings"]:
        counts[t] = pq.ParquetFile(f"{src}/{t}.parquet").metadata.num_rows

    # dims: copy through unchanged
    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    offs = {
        "customer": {"c_custkey": counts["customer"]},
        "orders": {"o_orderkey": counts["orders"], "o_custkey": counts["customer"]},
        "lineitem": {
            "l_orderkey": counts["orders"],
            "l_partkey": counts["part"],
            "l_suppkey": counts["supplier"],
        },
        "part": {"p_partkey": counts["part"]},
        "supplier": {"s_suppkey": counts["supplier"]},
        "events": {"event_id": counts["events"], "user_id": 1500},
        "embeddings": {"vec_id": counts["embeddings"]},
        "documents": {"doc_id": counts["documents"]},
    }

    for t, keymap in offs.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for i in range(factor):
            c = base
            for col, unit in keymap.items():
                if i:
                    c = offset_col(c, col, i * unit)
            if t == "documents" and i:
                c = mutate_documents(c, i)
            if t == "embeddings" and i:
                c = perturb_embeddings(c, i)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(t, out.num_rows)


def mutate_documents(tbl: pa.Table, copy_i: int) -> pa.Table:
    texts = tbl["text"].to_pylist()
    ids = tbl["doc_id"].to_pylist()
    # vocabulary of the whole corpus (deterministic order)
    vocab = sorted({w for t in texts for w in t.split(" ") if w})
    new_texts = []
    for did, text in zip(ids, texts):
        r = rng_for("doc", did, copy_i)
        if r.random() < 0.05:  # keep an exact-duplicate population
            new_texts.append(text)
            continue
        words = text.split(" ")
        for j in range(len(words)):
            if words[j] and r.random() < 0.15:
                words[j] = vocab[r.randrange(len(vocab))]
        new_texts.append(" ".join(words))
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(idx, tbl.field("text"), pa.array(new_texts, type=pa.string()))
    idx = tbl.schema.get_field_index("n_chars")
    tbl = tbl.set_column(
        idx, tbl.field("n_chars"),
        pa.array([len(t) for t in new_texts], type=tbl.field("n_chars").type),
    )
    return tbl


def perturb_embeddings(tbl: pa.Table, copy_i: int) -> pa.Table:
    col = tbl["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    seed = int.from_bytes(hashlib.sha256(f"emb|{copy_i}".encode()).digest()[:4], "big")
    noise = np.random.RandomState(seed).uniform(0.99, 1.01, size=flat.shape)
    new_flat = (flat * noise).astype(np.float32)
    new_col = pa.ListArray.from_arrays(col.offsets, pa.array(new_flat, type=pa.float32()))
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, tbl.field("embedding"), new_col.cast(tbl.field("embedding").type))


if __name__ == "__main__":
    main()
