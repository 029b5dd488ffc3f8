"""Synthesize an sf1-equivalent benchmark directory (10x sf0.1) — no
external data, fully deterministic.

Fact tables replicate 10x with disjoint key spaces so window partitions,
join fan-outs, and group counts scale with the data instead of piling
onto the sf0.1 keys:

* lineitem / orders: orderkeys offset per replica (custkeys untouched —
  dimensions grow slower than facts, as in TPC-H itself);
* events: user_id AND event_id offset per replica (each replica is a
  disjoint user population, so sessionize/window state scales);
* documents: doc_id offset; replicas k>0 get a replica-unique marker
  token spliced every 7 words, which breaks nearly all cross-replica
  word-3-gram and char-5-gram shingles — the near-dup structure of each
  replica mirrors sf0.1 instead of every doc gaining 9 brand-new exact
  twins (which would quadratically distort the dedup queries' output);
* embeddings: vec_id offset; vectors rolled by k positions (norm
  preserved, cross-replica cosine decorrelated).

Dimension tables copy through unchanged. Usage:
    python scripts/make_scale_dir.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIMS = ("region", "nation", "customer", "supplier", "part")
SPLICE_EVERY = 7


def _write(out_dir: str, name: str, replicas) -> None:
    d = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    for k, tbl in replicas:
        pq.write_table(tbl, os.path.join(d, f"part-{k:02d}.parquet"))


def _splice(text: str | None, tag: str) -> str | None:
    if text is None:
        return None
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        if i and i % SPLICE_EVERY == 0:
            out.append(tag)
        out.append(w)
    return " ".join(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1equiv"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    for name in DIMS:
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        _write(out, name, [(0, tbl)])

    orders = pq.read_table(os.path.join(src, "orders.parquet"))
    okey_span = int(pa.compute.max(orders.column("o_orderkey")).as_py()) + 1
    _write(
        out,
        "orders",
        [
            (
                k,
                orders.set_column(
                    orders.schema.get_field_index("o_orderkey"),
                    "o_orderkey",
                    pa.compute.add(orders.column("o_orderkey"), k * okey_span),
                ),
            )
            for k in range(factor)
        ],
    )

    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    _write(
        out,
        "lineitem",
        [
            (
                k,
                li.set_column(
                    li.schema.get_field_index("l_orderkey"),
                    "l_orderkey",
                    pa.compute.add(li.column("l_orderkey"), k * okey_span),
                ),
            )
            for k in range(factor)
        ],
    )

    ev = pq.read_table(os.path.join(src, "events.parquet"))
    eid_span = int(pa.compute.max(ev.column("event_id")).as_py()) + 1
    uid_span = int(pa.compute.max(ev.column("user_id")).as_py()) + 1
    reps = []
    for k in range(factor):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"),
            "event_id",
            pa.compute.add(ev.column("event_id"), k * eid_span),
        )
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.compute.add(t.column("user_id"), k * uid_span),
        )
        reps.append((k, t))
    _write(out, "events", reps)

    docs = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    did_span = int(docs["doc_id"].max()) + 1
    reps = []
    for k in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * did_span
        if k > 0:
            tag = f"replicamark{k}"
            d["text"] = [_splice(t, tag) for t in d["text"]]
            d["n_chars"] = [len(t) if t is not None else 0 for t in d["text"]]
        reps.append((k, pa.Table.from_pandas(d, preserve_index=False)))
    _write(out, "documents", reps)

    emb = pq.read_table(os.path.join(src, "embeddings.parquet")).to_pandas()
    vid_span = int(emb["vec_id"].max()) + 1
    reps = []
    for k in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * vid_span
        if k > 0:
            e["embedding"] = [
                np.roll(np.asarray(v, dtype=np.float32), k).tolist()
                for v in e["embedding"]
            ]
        reps.append((k, pa.Table.from_pandas(e, preserve_index=False)))
    _write(out, "embeddings", reps)
    print(f"wrote {out} at {factor}x {src}")


if __name__ == "__main__":
    main()
