"""Reproduce bench.py's kg_pipeline measurement exactly, with per-rep
AND per-stage wall times (the round-2 official bench recorded 28.8 s
min-of-3 where round 1 recorded 12.5 s; the library-level matrix says
the round-2 kernel is ~2x FASTER — this script is the reconciliation
instrument: same corpus path, same warmup, same cache-release
discipline as bench.py, N reps with every rep printed so a co-tenant
burst is visible instead of silently folded into the min).

Usage: python scripts/kg_bench_repro.py [--reps 5] [--cpus 32]
       [--docs 9600] [--stages]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--docs", type=int, default=int(os.environ.get("SPARK_GRAFT_KG_DOCS", "9600")))
    ap.add_argument("--stages", action="store_true", help="also time stage groups per rep")
    ap.add_argument("--n-partitions", type=int, default=None, help="override build_kg n_partitions")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from theoremkb_spark.corpus.generator import entity_dict_rows
    from theoremkb_spark.pipeline.extract import extract_spans, write_pages_parquet
    from theoremkb_spark.pipeline.runner import (
        build_kg,
        build_triples,
        load_dico,
        release_caches,
    )
    from theoremkb_spark.session import get_spark, warm_python_workers

    spark = get_spark("kg_bench_repro", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, args.cpus)

    from theoremkb_spark.corpus.generator import CORPUS_VERSION
    pages_path = f"/tmp/bench_pages_v{CORPUS_VERSION}_{args.docs}.parquet"
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path, args.docs, jobs=min(args.cpus, 16))
    pages = spark.read.parquet(pages_path)
    dico = load_dico(spark, list(entity_dict_rows(args.docs))).cache()

    def _force(df):
        df.write.mode("overwrite").format("noop").save()

    _force(pages)
    caches: list = []
    _force(build_kg(spark, pages.limit(16), dico=dico, cache_registry=caches))
    release_caches(caches)

    kw = {"n_partitions": args.n_partitions} if args.n_partitions else {}
    full, stage_rows = [], []
    for rep in range(args.reps):
        caches = []
        t0 = time.time()
        _force(build_kg(spark, pages, dico=dico, cache_registry=caches, **kw))
        full.append(round(time.time() - t0, 3))
        release_caches(caches)

        if args.stages:
            # mirror runner.build_kg's fused-path default (1x cores since
            # the round-3 fix) so per-stage times reconcile with the full reps
            npart = args.n_partitions or spark.sparkContext.defaultParallelism
            st = {}
            # stage A: the map-only Arrow extraction alone (no repartition)
            t0 = time.time()
            _force(extract_spans(pages, english_only=True))
            st["extract_maponly"] = round(time.time() - t0, 3)
            # stage B: extraction + url-hash repartition + cache materialize
            fused = extract_spans(pages, english_only=True).repartition(
                npart, F.col("url")
            ).cache()
            t0 = time.time()
            fused.count()
            st["extract_repart_cache"] = round(time.time() - t0, 3)
            # stage C: the six triple branches + link joins + rollup over
            # the warm cache (= full minus extraction side)
            spans = fused.filter(F.col("kind") == "span").select(
                "url", "group", "label", "text", "own_name"
            )
            citations = fused.filter(F.col("kind") == "cite").select("url", "tag")
            mentions = fused.filter(F.col("kind") == "mention").select(
                "url", "group", "label", "own_name", "ref_name",
                F.col("ref_kind").alias("kind"), "ref_tag",
            )
            t0 = time.time()
            _force(build_triples(spans, mentions, citations, dico))
            st["link_rollup_warm"] = round(time.time() - t0, 3)
            fused.unpersist()
            stage_rows.append(st)

    n_triples = build_kg(spark, pages, dico=dico).count()
    out = {
        "cpus": args.cpus,
        "docs": args.docs,
        "reps": full,
        "min": min(full),
        "kg_triples": n_triples,
        "triples_per_sec_at_min": round(n_triples / min(full), 1),
    }
    if stage_rows:
        out["stages"] = stage_rows
        out["stages_min"] = {
            k: min(r[k] for r in stage_rows) for k in stage_rows[0]
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
