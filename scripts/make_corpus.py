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
    print(f"wrote {args.docs} docs to {args.out}")
