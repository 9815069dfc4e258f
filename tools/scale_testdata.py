"""Deterministic scale-up of the driver testdata for large-sf benchmarking.

The driver ships sf{0.001,0.01,0.1}; VERDICT r3 #3 asks for one bench run at
~sf1 to amortize codegen warmup / host noise and surface scale cliffs. This
tool replicates an existing sf directory R times with TPC-H-style key-space
offsets, so every foreign key stays consistent and every per-key group keeps
its original size while the number of keys grows R-fold (exactly how TPC-H
itself scales: more suppliers/customers/orders, same rows-per-order).

Copies must not be trivial clones for the text/embedding tables or the dedup
and similarity benchmarks would measure a pathological 90%-duplicate corpus
instead of a 10x corpus:

- ``documents``: copy i > 0 stride-permutes each doc's word sequence with a
  stride coprime to its length (destroys word n-gram shingle sets → copies
  are not near-duplicates for MinHash/Jaccard-family ops) AND tags every
  8th word with a per-copy suffix (perturbs the token MULTISET → copies are
  not near-duplicates for multiset-based signatures either; the v1 scaler
  preserved multisets exactly, which made every copy family a SimHash
  10-clique and inflated the sf1 dedup_simhash measurement ×16). Token
  distribution stays ~7/8 intact for frequency/length/lang-id workloads.
- ``embeddings``: copy i circularly shifts the dimension axis by i. Norms
  are preserved exactly; cosine between a vector and its shifted copy is
  ~0 for random-ish vectors, so near-pair counts scale linearly, not
  quadratically.

Usage:  python tools/scale_testdata.py SRC_DIR DST_DIR [R]
        python tools/scale_testdata.py /root/testdata/sf0.1 /tmp/sf1 10

Output parquet is written as a DIRECTORY of R row-group files per table
(one per copy), so Spark gets >= R input splits per table without relying
on _spread().
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (table, {column: stride_key}) — stride_key names the table whose key-space
# size provides the offset unit, so FKs move in lockstep with their PK.
KEYED = {
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ["nation", "region"]

PK_COL = {
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _strides(src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for tbl, col in PK_COL.items():
        arr = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])[col]
        out[tbl] = int(pa.compute.max(arr).as_py()) + 1
    uid = pq.read_table(os.path.join(src, "events.parquet"), columns=["user_id"])["user_id"]
    out["events_user"] = int(pa.compute.max(uid).as_py()) + 1
    return out


def _coprime_stride(n: int, seed: int) -> int:
    """Smallest stride >= 2+seed%5 coprime to n (1 for degenerate lengths)."""
    if n <= 2:
        return 1
    s = 2 + seed % 5
    from math import gcd

    while gcd(s, n) != 1:
        s += 1
    return s % n if s % n != 0 else 1


def _permute_text(text: str, doc_id: int, copy: int) -> str:
    words = text.split()
    n = len(words)
    if n < 4:
        return text + f" cp{copy}"
    s = _coprime_stride(n, doc_id * 31 + copy * 7)
    out = [words[(j * s) % n] for j in range(n)]
    # multiset-breaking tag on every 8th word (offset varies per copy)
    for j in range((doc_id + copy) % 8, n, 8):
        out[j] = f"{out[j]}c{copy}"
    return " ".join(out)


def _scale_table(src: str, dst: str, tbl: str, r: int, strides: dict[str, int]) -> None:
    t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
    outdir = os.path.join(dst, f"{tbl}.parquet")
    os.makedirs(outdir, exist_ok=True)
    offsets = KEYED.get(tbl, {})
    emb_np = None
    if tbl == "embeddings":
        emb_np = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    for i in range(r):
        cols = []
        for name in t.column_names:
            col = t[name]
            if name in offsets and i > 0:
                off = i * strides[offsets[name]]
                col = pa.chunked_array(
                    [pa.compute.add(c, pa.scalar(off, type=c.type)) for c in col.chunks]
                )
            elif tbl == "documents" and name == "text" and i > 0:
                ids = t["doc_id"].to_pylist()
                col = pa.array(
                    [_permute_text(x, d, i) for x, d in zip(col.to_pylist(), ids)],
                    type=pa.string(),
                )
            elif tbl == "embeddings" and name == "embedding" and i > 0:
                rolled = np.roll(emb_np, i, axis=1)
                col = pa.array(list(rolled), type=t.schema.field("embedding").type)
            cols.append(col)
        out = pa.table(cols, schema=t.schema)
        if tbl == "documents":  # n_chars must track the permuted text
            n_chars = pa.compute.utf8_length(out["text"]).cast(pa.int64())
            out = out.set_column(out.schema.get_field_index("n_chars"), "n_chars", n_chars)
        pq.write_table(out, os.path.join(outdir, f"part-{i:03d}.parquet"))
    print(f"  {tbl}: {t.num_rows} -> {t.num_rows * r} rows ({r} files)")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)
    print(f"scaling {src} -> {dst} x{r}; key strides: {strides}")
    for tbl in COPY_AS_IS:
        outdir = os.path.join(dst, f"{tbl}.parquet")
        os.makedirs(outdir, exist_ok=True)
        pq.write_table(
            pq.read_table(os.path.join(src, f"{tbl}.parquet")),
            os.path.join(outdir, "part-000.parquet"),
        )
        print(f"  {tbl}: copied")
    for tbl in KEYED:
        _scale_table(src, dst, tbl, r, strides)


if __name__ == "__main__":
    main()
