"""Per-stage wall-clock profile of the KG pipeline (scaling diagnosis)."""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-parquet", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from theoremkb_spark.pipeline.canon import canonicalize_dict
    from theoremkb_spark.pipeline.extract import extract_tokens
    from theoremkb_spark.pipeline.label import label_tokens
    from theoremkb_spark.pipeline.mentions import (
        assemble_spans,
        mine_mentions,
        resolve_span_names,
    )
    from theoremkb_spark.pipeline.runner import build_triples, load_entity_dict
    from theoremkb_spark.session import get_spark

    spark = get_spark("profile_kg", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    times = {}

    def mark(name, t0):
        times[name] = round(time.time() - t0, 2)

    t0 = time.time()
    pages = spark.read.parquet(args.pages_parquet)
    n_docs = pages.count()
    ents = load_entity_dict(spark, n_docs)
    mark("load", t0)

    t0 = time.time()
    pages = pages.repartition(args.cpus, F.xxhash64("url"))
    tokens = extract_tokens(pages).cache()
    n_tokens = tokens.count()
    mark("extract", t0)

    t0 = time.time()
    spans = resolve_span_names(assemble_spans(label_tokens(tokens))).cache()
    n_spans = spans.count()
    mark("label+spans", t0)

    t0 = time.time()
    mentions = mine_mentions(spans)
    mentions.write.mode("overwrite").format("noop").save()
    mark("mentions", t0)

    t0 = time.time()
    dico = canonicalize_dict(ents).cache()
    dico.count()
    mark("canon_cc", t0)

    t0 = time.time()
    triples = build_triples(spans, mentions, __import__("theoremkb_spark.pipeline.mentions", fromlist=["paper_citations"]).paper_citations(tokens), dico)
    triples.write.mode("overwrite").format("noop").save()
    mark("triples", t0)

    times["total"] = round(sum(times.values()), 2)
    print(json.dumps({"cpus": args.cpus, "docs": n_docs, "tokens": n_tokens, "spans": n_spans, **times}))
    spark.stop()


if __name__ == "__main__":
    main()
