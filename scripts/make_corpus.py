"""Materialize the synthetic pages corpus to parquet (no Spark needed).

Usage: python scripts/make_corpus.py --docs 2000 --out /tmp/pages_2000.parquet
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
    args = ap.parse_args()
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
