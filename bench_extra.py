"""Round-6 optimization harness (bench.py stays frozen — guide §1).

Isolates single queries with the noop sink, takes min-of-N reps, and
optionally dumps .explain("formatted") per query. Used for the
before/after evidence in OPTIMIZATION_r06.md; the official numbers still
come from the round-start bench.py.

Usage:
    python bench_extra.py --queries link_fuzzy_lsh,dedup_simhash \
        --sf-dir /tmp/sf1equiv --reps 4 --plans plans/r06 --suffix _before
    python bench_extra.py --queries kg_pipeline --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_pricing_summary",
    "join_broadcast_revenue",
    "join_range_containment",
    "win_gaps_islands",
    "win_deltas",
    "sort_argmax",
    "text_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "link_fuzzy_lsh",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--plans", default=None, help="directory for explain(formatted) dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from theoremkb_spark.queries import QUERIES_CORE
    from theoremkb_spark.queries_docs import QUERIES_DOCS
    from theoremkb_spark.session import get_spark, warm_python_workers

    registry = {name: fn for name, (fn, _sql) in {**QUERIES_CORE, **QUERIES_DOCS}.items()}
    spark = get_spark("bench_extra", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, args.cpus)

    names = [n for n in args.queries.split(",") if n]
    out: dict[str, list[float]] = {}

    kg_ctx = None
    if "kg_pipeline" in names:
        from theoremkb_spark.corpus.generator import CORPUS_VERSION, entity_dict_rows
        from theoremkb_spark.pipeline.extract import write_pages_parquet
        from theoremkb_spark.pipeline.runner import build_kg, load_dico, release_caches

        kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "9600"))
        pages_path = f"/tmp/bench_pages_v{CORPUS_VERSION}_{kg_docs}.parquet"
        if not os.path.exists(pages_path):
            write_pages_parquet(pages_path, kg_docs, jobs=min(args.cpus, 16))
        pages = spark.read.parquet(pages_path)
        dico = load_dico(spark, list(entity_dict_rows(kg_docs))).cache()
        _force(pages)
        kg_ctx = (build_kg, pages, dico, release_caches)

    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if name == "kg_pipeline":
            build_kg, pages, dico, release_caches = kg_ctx
            c: list = []
            _force(build_kg(spark, pages.limit(16), dico=dico, cache_registry=c))
            release_caches(c)
            times = []
            for _ in range(args.reps):
                c = []
                t0 = time.time()
                _force(build_kg(spark, pages, dico=dico, cache_registry=c))
                times.append(round(time.time() - t0, 3))
                release_caches(c)
            out[name] = times
            continue
        fn = registry[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        _force(fn(spark, args.sf_dir))  # warm: codegen + page cache
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            _force(fn(spark, args.sf_dir))
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name:26s} min={min(times):7.3f}  reps={times}", file=sys.stderr)

    print(json.dumps({
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "loadavg_1m": round(os.getloadavg()[0], 1),
        "min": {k: min(v) for k, v in out.items()},
        "reps": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
