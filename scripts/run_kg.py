"""KG-pipeline driver for spark-submit.

Usage:
    spark-submit --py-files theoremkb_spark.zip scripts/run_kg.py \
        --docs 100 --out /tmp/kg_out --cpus 8 [--labeler window|arrow]

Synthesizes the deterministic corpus, runs the six-stage pipeline, writes
triples + lineage parquet, prints a one-line JSON summary (docs, triples,
wall seconds, triples/sec).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument(
        "--pages-parquet",
        default=None,
        help="read the pages corpus from this parquet instead of synthesizing"
        " in-process (use scripts/make_corpus.py to materialize it)",
    )
    ap.add_argument("--labeler", default="window", choices=["window", "arrow"])
    ap.add_argument("--warmup", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--join-strategy", default="broadcast", choices=["broadcast", "salted"])
    args = ap.parse_args()

    from theoremkb_spark.pipeline.extract import load_pages
    from theoremkb_spark.pipeline.runner import (
        build_kg,
        lineage_rows,
        load_entity_dict,
    )
    from theoremkb_spark.session import get_spark

    spark = get_spark("run_kg", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    else:
        pages = load_pages(spark, args.docs, args.seed)
    entity_dict = load_entity_dict(spark, args.docs, args.seed)

    if args.warmup:
        # steady-state measurement: one tiny end-to-end pass first so JIT/
        # codegen/python-worker spin-up is not billed to the timed run
        build_kg(
            spark,
            pages.limit(8),
            entity_dict,
            labeler=args.labeler,
            join_strategy=args.join_strategy,
        ).write.mode("overwrite").format("noop").save()

    t0 = time.time()
    triples = build_kg(
        spark,
        pages,
        entity_dict,
        labeler=args.labeler,
        join_strategy=args.join_strategy,
    )
    triples.write.mode("overwrite").parquet(f"{args.out}/triples")
    lineage_rows(triples, "triples").write.mode("overwrite").parquet(
        f"{args.out}/lineage"
    )
    wall = time.time() - t0

    n = spark.read.parquet(f"{args.out}/triples").count()
    print(
        json.dumps(
            {
                "docs": args.docs,
                "triples": n,
                "wall_s": round(wall, 2),
                "triples_per_sec": round(n / wall, 1),
                "labeler": args.labeler,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
