"""Materialize the synthetic pages corpus to parquet (no Spark needed).

Usage: python scripts/make_corpus.py --docs 2000 --out /tmp/pages_2000.parquet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theoremkb_spark.pipeline.extract import write_pages_parquet  # noqa: E402


def _write_part(task):
    """One worker: docs [start, end) -> a parquet part file."""
    start, end, seed, path = task
    import pyarrow as pa
    import pyarrow.parquet as pq

    from theoremkb_spark.corpus.generator import (
        _doc_cite_targets,
        build_doc,
        doc_text,
        externals,
        render_html,
    )

    exts = externals(seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    buf = []
    for i in range(start, end):
        targets = _doc_cite_targets(i, seed, exts, _write_part.n_docs)
        doc = build_doc(i, seed, cite_tags=[t for t, _, _ in targets])
        buf.append(
            {
                "url": doc.url,
                "warc_ts": doc.warc_ts,
                "html": render_html(doc),
                "text": doc_text(doc),
                "lang": doc.lang,
            }
        )
        if len(buf) >= 200:
            writer.write_table(pa.Table.from_pylist(buf, schema=schema))
            buf = []
    if buf:
        writer.write_table(pa.Table.from_pylist(buf, schema=schema))
    writer.close()


def _init_worker(n_docs):
    _write_part.n_docs = n_docs


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--jobs", type=int, default=1)
    args = ap.parse_args()
    if args.jobs > 1:
        # directory of part files, built in parallel (each doc is
        # independently seeded so parts are deterministic regardless of
        # job count)
        import multiprocessing as mp

        os.makedirs(args.out, exist_ok=True)
        chunk = -(-args.docs // args.jobs)
        tasks = [
            (lo, min(lo + chunk, args.docs), args.seed,
             os.path.join(args.out, f"part-{lo:08d}.parquet"))
            for lo in range(0, args.docs, chunk)
        ]
        with mp.Pool(args.jobs, initializer=_init_worker, initargs=(args.docs,)) as pool:
            pool.map(_write_part, tasks)
    else:
        write_pages_parquet(args.out, args.docs, args.seed)

    # materialize the citation dictionary next to the pages so bench runs
    # never regenerate it driver-side (that cost is serial and scales
    # with --docs)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from theoremkb_spark.corpus.generator import entity_dict_rows

    pq.write_table(
        pa.Table.from_pylist(list(entity_dict_rows(args.docs, args.seed))),
        args.out + ".dict.parquet",
    )
    print(f"wrote {args.docs} docs to {args.out} (+ .dict.parquet)")
