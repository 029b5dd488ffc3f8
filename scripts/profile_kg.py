"""Per-stage wall-clock profile of the KG pipeline (scaling diagnosis).

Profiles the FUSED plan (the production path): one number per phase so
regressions in any stage are visible at a glance. For stage-level truth
use the Spark event log (unzstd the events file; compare stage wall vs
Executor Run/CPU Time).
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
    ap.add_argument("--pages-parquet", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from theoremkb_spark.pipeline.extract import extract_spans
    from theoremkb_spark.pipeline.runner import build_triples, load_dico, lineage_rows
    from theoremkb_spark.session import get_spark, warm_python_workers

    spark = get_spark("profile_kg", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, args.cpus)
    times = {}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        times[name] = round(time.time() - t0, 2)
        return r

    pages = spark.read.parquet(args.pages_parquet)
    n_docs = clock("load", lambda: pages.count())
    dict_path = args.pages_parquet + ".dict.parquet"
    if os.path.exists(dict_path):
        dict_rows = pq.read_table(dict_path).to_pylist()
    else:  # no sidecar (bench-written corpus) — regenerate from the seed
        from theoremkb_spark.corpus.generator import entity_dict_rows

        dict_rows = list(entity_dict_rows(n_docs))
    dico = clock("dico", lambda: load_dico(spark, dict_rows).cache())

    # map-only extraction (mention mining fused in); repartition the
    # small fused output — mirrors runner.build_kg's production shape
    fused = extract_spans(pages).repartition(args.cpus, F.col("url")).cache()
    clock("fused_extract", lambda: fused.count())
    spans = fused.filter(F.col("kind") == "span").select(
        "url", "group", "label", "text", "own_name"
    )
    citations = fused.filter(F.col("kind") == "cite").select("url", "tag")
    mentions = fused.filter(F.col("kind") == "mention").select(
        "url", "group", "label", "own_name", "ref_name",
        F.col("ref_kind").alias("kind"), "ref_tag",
    )
    clock("mentions", lambda: mentions.write.mode("overwrite").format("noop").save())
    triples = build_triples(spans, mentions, citations, dico).persist()
    clock("triples", lambda: triples.write.mode("overwrite").format("noop").save())
    clock(
        "lineage",
        lambda: lineage_rows(triples, "t").write.mode("overwrite").format("noop").save(),
    )

    times["total"] = round(sum(times.values()), 2)
    print(json.dumps({"cpus": args.cpus, "docs": n_docs, **times}))
    spark.stop()


if __name__ == "__main__":
    main()
