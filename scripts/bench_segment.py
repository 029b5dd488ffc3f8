"""segment_tokens scale row (VERDICT r4 item 7).

Measures the distributed U-Net inference stage at two corpus sizes
(default 480 and 4800 docs — 10x the pages) on local[$SPARK_GRAFT_CPUS]:
pages/sec at both, the growth factor, the per-page wall distribution,
and the executed plan's exchange count (the stage contract is exactly
ONE exchange — the (url, page) group hash; tests/test_segmentation.py
freezes that shape, this script re-checks it on the big input).

Token tables are materialized to parquet off the clock so the timed job
is the inference stage alone. Prints one JSON line and appends a row
to BENCH/SEGSCALE_r05.md when --write is passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ensure_tokens(spark, docs: int) -> str:
    from theoremkb_spark.corpus.generator import CORPUS_VERSION
    from theoremkb_spark.pipeline.extract import extract_tokens, write_pages_parquet

    pages_path = f"/tmp/segbench_pages_v{CORPUS_VERSION}_{docs}.parquet"
    tokens_path = f"/tmp/segbench_tokens_v{CORPUS_VERSION}_{docs}.parquet"
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path, docs, jobs=16)
    if not os.path.exists(tokens_path):
        extract_tokens(spark.read.parquet(pages_path)).write.mode(
            "overwrite"
        ).parquet(tokens_path)
    return tokens_path


def _run_level(spark, docs: int, reps: int) -> dict:
    from theoremkb_spark.operators.segmentation import segment_tokens

    tokens = spark.read.parquet(_ensure_tokens(spark, docs))
    n_pages = tokens.select("url", "page").distinct().count()
    seg = segment_tokens(tokens)
    # shape gate on THIS input: exactly one exchange
    plan = seg._jdf.queryExecution().executedPlan().toString()
    exchanges = plan.count("Exchange")
    walls = []
    for _ in range(reps):
        t0 = time.time()
        segment_tokens(tokens).write.mode("overwrite").format("noop").save()
        walls.append(round(time.time() - t0, 2))
    best = min(walls)
    return {
        "docs": docs,
        "pages": n_pages,
        "walls_s": walls,
        "best_s": best,
        "pages_per_sec": round(n_pages / best, 1),
        "ms_per_page": round(1000.0 * best / n_pages, 2),
        "exchanges": exchanges,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=480)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    from theoremkb_spark.session import get_spark, warm_python_workers

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("segbench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark, cpus)

    small = _run_level(spark, args.docs, args.reps)
    big = _run_level(spark, args.docs * args.factor, args.reps)
    out = {
        "cpus": cpus,
        "load_1m": round(os.getloadavg()[0], 1),
        "small": small,
        "big": big,
        "page_growth": round(big["pages"] / small["pages"], 2),
        "wall_growth": round(big["best_s"] / small["best_s"], 2),
    }
    print(json.dumps(out))

    if args.write:
        path = os.path.join(REPO, "BENCH", "SEGSCALE_r05.md")
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write(
                    "# segment_tokens scale rows (round 5)\n\n"
                    "Distributed U-Net inference stage alone (tokens parquet\n"
                    "pre-materialized), local[%d], min-of-%d with per-rep walls\n"
                    "in the JSON lines below. Contract: ONE exchange at every\n"
                    "size; wall growth ~= page growth (per-page cost flat).\n\n"
                    "| docs | pages | best s | pages/s | ms/page | exchanges |\n"
                    "|---|---|---|---|---|---|\n" % (cpus, args.reps)
                )
            for r in (small, big):
                f.write(
                    "| %d | %d | %.2f | %.1f | %.2f | %d |\n"
                    % (
                        r["docs"],
                        r["pages"],
                        r["best_s"],
                        r["pages_per_sec"],
                        r["ms_per_page"],
                        r["exchanges"],
                    )
                )
            f.write("\n```json\n" + json.dumps(out) + "\n```\n")


if __name__ == "__main__":
    main()
