"""Deterministic 10x scale-up of the driver's sf0.1 tables -> sf1.

VERDICT r03 item 3 asks for scale validation at sf1; the driver only
ships sf{0.001,0.01,0.1}, so this script derives a sf1-shaped dataset
from sf0.1 (seeded, no wall-clock anywhere) under ``.scale/sf1``
inside the repo (gitignored). Each table becomes 10 disjoint copies
with the *per-copy* statistical structure preserved, so operator cost
per row is comparable across scales:

- ``lineitem``: ids offset per copy; measure columns untouched.
- ``documents``: doc_id offset; every word is remapped through a
  copy-seeded bijection over the corpus vocabulary. This preserves
  token counts, lengths, Zipf shape, and the *within-copy* duplicate
  structure (near-dup clusters stay near-dups) while making copies
  mutually dissimilar -- so MinHash/SimHash pair output grows ~10x
  (linearly), not quadratically.
- ``embeddings``: vec_id offset; dimensions rolled by copy index (a
  norm-preserving permutation) so copies are distinct vectors with
  identical geometry.
- ``events``: event_id/user_id offset so per-user series replicate.

Usage::

    python scripts/make_scale_data.py [out_dir]   # default .scale/sf1
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _out_dir(argv: list[str]) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return argv[1] if len(argv) > 1 else os.path.join(repo, ".scale", "sf1")


def _offset(col: pa.ChunkedArray, delta: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(delta, type=col.type))


def _write_copies(name: str, out: str, make_copy) -> None:
    tdir = os.path.join(out, f"{name}.parquet")
    os.makedirs(tdir, exist_ok=True)
    for c in range(COPIES):
        pq.write_table(make_copy(c), os.path.join(tdir, f"part-{c:02d}.parquet"))
    n = pq.ParquetDataset(tdir).read(columns=[]).num_rows
    print(f"{name}: {n} rows in {COPIES} files")


def scale_lineitem(out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    step = pc.max(t["l_orderkey"]).as_py() + 1

    def mk(c: int) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("l_orderkey"), "l_orderkey",
            _offset(t["l_orderkey"], c * step))

    _write_copies("lineitem", out, mk)


def scale_documents(out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t["text"].to_pylist()
    ids = t["doc_id"]
    step = pc.max(ids).as_py() + 1
    vocab = sorted({w for s in texts for w in s.split()})
    v = len(vocab)
    # copy-seeded bijection: word -> vocab[(rank + salt(c)) % v]
    rank = {w: i for i, w in enumerate(vocab)}

    def remap(s: str, salt: int) -> str:
        return " ".join(vocab[(rank[w] + salt) % v] for w in s.split())

    def mk(c: int) -> pa.Table:
        if c == 0:
            new_texts = t["text"]
        else:
            salt = zlib.crc32(f"sf1-copy-{c}".encode()) % (v - 1) + 1
            new_texts = pa.array([remap(s, salt) for s in texts])
        out_t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                             _offset(ids, c * step))
        return out_t.set_column(t.schema.get_field_index("text"), "text",
                                new_texts)

    _write_copies("documents", out, mk)


def scale_embeddings(out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    step = pc.max(t["vec_id"]).as_py() + 1
    mat = np.asarray(t["embedding"].combine_chunks().flatten(),
                     np.float32).reshape(len(t), -1)
    dim = mat.shape[1]

    def mk(c: int) -> pa.Table:
        rolled = np.roll(mat, c * (dim // COPIES + 1), axis=1)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(rolled.ravel(), pa.float32()), dim).cast(
                pa.list_(pa.float32()))
        out_t = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                             _offset(t["vec_id"], c * step))
        return out_t.set_column(t.schema.get_field_index("embedding"),
                                "embedding", emb)

    _write_copies("embeddings", out, mk)


def scale_events(out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    estep = pc.max(t["event_id"]).as_py() + 1
    ustep = pc.max(t["user_id"]).as_py() + 1

    def mk(c: int) -> pa.Table:
        out_t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                             _offset(t["event_id"], c * estep))
        return out_t.set_column(t.schema.get_field_index("user_id"), "user_id",
                                _offset(t["user_id"], c * ustep))

    _write_copies("events", out, mk)


def scale_orders(out: str) -> None:
    """Orders follow lineitem's key offsets: o_orderkey steps by the
    same max+1 (sf0.1 has max(o_orderkey) == max(l_orderkey), checked
    below) and o_custkey steps with the scaled customer table, so
    every FK join (orders-lineitem, orders-customer) stays intact
    within each copy."""
    t = pq.read_table(os.path.join(SRC, "orders.parquet"))
    li_max = pc.max(
        pq.read_table(os.path.join(SRC, "lineitem.parquet"),
                      columns=["l_orderkey"])["l_orderkey"]).as_py()
    o_max = pc.max(t["o_orderkey"]).as_py()
    assert o_max == li_max, (
        f"orderkey ranges diverge (orders {o_max}, lineitem {li_max}) "
        "— offsets would break the orders-lineitem join")
    ostep = o_max + 1
    # the custkey step MUST come from the CUSTOMER table's max, not
    # orders': TPC-H leaves ~1/3 of customers orderless, so
    # max(o_custkey) can sit below max(c_custkey) and a step derived
    # from orders would desynchronize the two offsets, silently
    # breaking the orders->customer FK in every scaled copy
    # (ADVICE round-9). scale_customer uses the same expression.
    c_max = pc.max(
        pq.read_table(os.path.join(SRC, "customer.parquet"),
                      columns=["c_custkey"])["c_custkey"]).as_py()
    oc_max = pc.max(t["o_custkey"]).as_py()
    assert oc_max <= c_max, (
        f"orders references custkey {oc_max} beyond customer max "
        f"{c_max} — source FK already broken")
    cstep = c_max + 1

    def mk(c: int) -> pa.Table:
        out_t = t.set_column(
            t.schema.get_field_index("o_orderkey"), "o_orderkey",
            _offset(t["o_orderkey"], c * ostep))
        return out_t.set_column(
            t.schema.get_field_index("o_custkey"), "o_custkey",
            _offset(t["o_custkey"], c * cstep))

    _write_copies("orders", out, mk)


def scale_customer(out: str) -> None:
    t = pq.read_table(os.path.join(SRC, "customer.parquet"))
    cstep = pc.max(t["c_custkey"]).as_py() + 1

    def mk(c: int) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("c_custkey"), "c_custkey",
            _offset(t["c_custkey"], c * cstep))

    _write_copies("customer", out, mk)


def copy_dims(out: str) -> None:
    """part/supplier/nation/region pass through UNCHANGED: dimensions
    grow slower than facts, and lineitem copies keep their original
    l_partkey/l_suppkey references — offsetting dim keys would orphan
    9 of 10 fact copies."""
    import shutil

    for name in ("part", "supplier", "nation", "region"):
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        shutil.copyfile(src, dst)
        n = pq.ParquetFile(dst).metadata.num_rows
        print(f"{name}: {n} rows (pass-through dim)")


def main() -> None:
    out = _out_dir(sys.argv)
    os.makedirs(out, exist_ok=True)
    scale_lineitem(out)
    scale_documents(out)
    scale_embeddings(out)
    scale_events(out)
    scale_orders(out)
    scale_customer(out)
    copy_dims(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
