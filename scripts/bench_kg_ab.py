"""Interleaved A/B for the kg triples assembly (round-6 follow-up).

OLD = the round-5 shape: cached fused table, six branch scans +
unionByName + rollup groupBy (reconstructed inline so both forms run in
ONE session and sample the same noise window rep-by-rep).
NEW = current build_kg: single-pass conditional-explode assembly over
the uncached url-partitioned fused output, one broadcast dico join,
rollup exchange-free.

Usage: python scripts/bench_kg_ab.py [--docs 9600] [--reps 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=9600)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from theoremkb_spark.corpus.generator import CORPUS_VERSION, entity_dict_rows
    from theoremkb_spark.pipeline.extract import extract_spans, write_pages_parquet
    from theoremkb_spark.pipeline.runner import (
        build_kg,
        build_triples,
        load_dico,
        release_caches,
    )
    from theoremkb_spark.session import get_spark, warm_python_workers

    spark = get_spark("bench_kg_ab", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, args.cpus)

    pages_path = f"/tmp/bench_pages_v{CORPUS_VERSION}_{args.docs}.parquet"
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path, args.docs, jobs=min(args.cpus, 16))
    pages = spark.read.parquet(pages_path)
    dico = load_dico(spark, list(entity_dict_rows(args.docs))).cache()
    pages.write.mode("overwrite").format("noop").save()

    def _force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def old_form() -> None:
        reg: list = []
        fused = (
            extract_spans(pages, english_only=True)
            .repartition(args.cpus, F.col("url"))
            .cache()
        )
        reg.append(fused)
        spans = fused.filter(F.col("kind") == "span").select(
            "url", "group", "label", "text", "own_name"
        )
        citations = fused.filter(F.col("kind") == "cite").select("url", "tag")
        mentions = fused.filter(F.col("kind") == "mention").select(
            "url", "group", "label", "own_name", "ref_name",
            F.col("ref_kind").alias("kind"), "ref_tag",
        )
        _force(build_triples(spans, mentions, citations, dico, join_strategy="broadcast"))
        release_caches(reg)

    def new_form() -> None:
        reg: list = []
        _force(build_kg(spark, pages, dico=dico, cache_registry=reg))
        release_caches(reg)

    # warm both plans (codegen) on a 16-doc slice
    small = pages.limit(16)
    reg: list = []
    _force(build_kg(spark, small, dico=dico, cache_registry=reg))
    release_caches(reg)

    out = {"old": [], "new": []}
    for i in range(args.reps):
        for name, fn in (("old", old_form), ("new", new_form)):
            spark.sparkContext.setJobDescription(f"kg_ab {name} rep{i}")
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            out[name].append(dt)
            print(f"rep{i} {name}: {dt}", file=sys.stderr)

    print(json.dumps({
        "docs": args.docs,
        "cpus": args.cpus,
        "loadavg_1m": round(os.getloadavg()[0], 1),
        "min": {k: min(v) for k, v in out.items()},
        "reps": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
