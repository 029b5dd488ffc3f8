"""Materialize the synthetic pages corpus to parquet (no Spark needed).

Usage: python scripts/make_corpus.py --docs 76800 --out /tmp/pages.parquet --jobs 24
With --jobs > 1 the output is a directory of part files written in
parallel (identical rows — per-doc seeding is chunking-independent).
Also writes the citation dictionary sidecar ``<out>.dict.parquet``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theoremkb_spark.pipeline.extract import write_pages_parquet  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    ap.add_argument("--jobs", type=int, default=1)
    args = ap.parse_args()
    write_pages_parquet(args.out, args.docs, args.seed, jobs=args.jobs)

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
