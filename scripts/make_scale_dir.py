"""Synthesize an sf1-equivalent benchmark directory (10x sf0.1) — no
external data, fully deterministic.

Fact tables replicate 10x with disjoint key spaces so window partitions,
join fan-outs, and group counts scale with the data instead of piling
onto the sf0.1 keys:

* lineitem / orders: orderkeys offset per replica (custkeys untouched —
  dimensions grow slower than facts, as in TPC-H itself);
* events: user_id AND event_id offset per replica (each replica is a
  disjoint user population, so sessionize/window state scales);
* documents: doc_id offset; replicas k>0 are rewritten by a per-replica
  caesar rotation of [a-z] (text length, word boundaries, and all
  per-replica shingle statistics preserved; every word-3-gram and
  char-5-gram shingle maps bijectively to a replica-unique one) — so
  each replica's near-dup/link structure EXACTLY mirrors sf0.1 and
  cross-replica similarity is ~0. The first attempt (a marker token
  spliced every 7 words) left 3-gram windows intact across replicas:
  shared shingles' document frequency grew 10x, the blocking self-join
  went superlinear (measured 35x wall at 10x data), and fuzzy-link keys
  stayed above the verify threshold across replicas (17x wall);
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


def _write(out_dir: str, name: str, replicas) -> None:
    d = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    for k, tbl in replicas:
        pq.write_table(tbl, os.path.join(d, f"part-{k:02d}.parquet"))


def _caesar_table(k: int) -> dict[int, int]:
    lower = {97 + i: 97 + (i + k) % 26 for i in range(26)}
    upper = {65 + i: 65 + (i + k) % 26 for i in range(26)}
    return {**lower, **upper}


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

    # pandas round-trips widen types (float32 list -> double list, int32
    # -> int64); cast every replica back to the SOURCE schema so Spark's
    # vectorized parquet reader sees one physical type across parts
    dtbl = pq.read_table(os.path.join(src, "documents.parquet"))
    docs = dtbl.to_pandas()
    did_span = int(docs["doc_id"].max()) + 1
    reps = []
    for k in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * did_span
        if k > 0:
            tr = _caesar_table(k)
            d["text"] = [t.translate(tr) if t is not None else None for t in d["text"]]
            # length-preserving rewrite: n_chars stays valid as-is
        reps.append(
            (k, pa.Table.from_pandas(d, preserve_index=False).cast(dtbl.schema))
        )
    _write(out, "documents", reps)

    etbl = pq.read_table(os.path.join(src, "embeddings.parquet"))
    emb = etbl.to_pandas()
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
        reps.append(
            (k, pa.Table.from_pandas(e, preserve_index=False).cast(etbl.schema))
        )
    _write(out, "embeddings", reps)
    print(f"wrote {out} at {factor}x {src}")


if __name__ == "__main__":
    main()
