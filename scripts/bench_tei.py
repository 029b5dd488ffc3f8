"""Scale-shape bench for the GROBID TEI stage (S10, round 5).

Times ``pipeline/tei.py::tei_links`` (map-only Arrow parse + single
(url, norm_title) equi-join) end-to-end at two corpus sizes (default
2,400 and 24,000 docs — a 10x pair) in ONE warm session, min-of-reps,
the same protocol as the segment_tokens scale rows in
BENCH/BASELINE.md. Fixtures are generated deterministically by
corpus/generator.py::tei_rows / entity_dict_rows and cached in /tmp.

Usage: python scripts/bench_tei.py [--sizes 2400,24000] [--reps 3]
Prints one JSON line per size: {"docs": N, "rows": R, "reps_sec": [...],
"min_sec": m, "docs_per_sec": d}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_fixture(n_docs: int, seed: int = 42) -> tuple[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from theoremkb_spark.corpus.generator import (
        CORPUS_VERSION,
        entity_dict_rows,
        tei_rows,
    )

    # fixture keyed on corpus version + seed (advisor round-5 note:
    # n_docs alone silently reuses stale fixtures across generator edits
    # — bench.py's pages_path convention)
    tei_path = f"/tmp/tei_bench_v{CORPUS_VERSION}_s{seed}_{n_docs}.parquet"
    dico_path = f"/tmp/tei_bench_dico_v{CORPUS_VERSION}_s{seed}_{n_docs}.parquet"
    if not (os.path.exists(tei_path) and os.path.exists(dico_path)):
        rows = list(tei_rows(n_docs, seed))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in rows], pa.string()),
                    "tei": pa.array([r["tei"] for r in rows], pa.string()),
                }
            ),
            tei_path,
            row_group_size=max(100, n_docs // 240),
        )
        drows = list(entity_dict_rows(n_docs, seed))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in drows], pa.string()),
                    "tag": pa.array([r["tag"] for r in drows], pa.string()),
                    "pdf_to": pa.array([r["pdf_to"] for r in drows], pa.string()),
                    "norm_title": pa.array([r["norm_title"] for r in drows], pa.string()),
                }
            ),
            dico_path,
        )
    return tei_path, dico_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2400,24000")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    fixtures = {n: ensure_fixture(n) for n in sizes}

    from pyspark.sql import SparkSession

    from theoremkb_spark.pipeline.tei import tei_links

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench_tei")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.files.maxPartitionBytes", "4m")  # per-size override below
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for n in sizes:
            tei_path, dico_path = fixtures[n]
            # Emulate a big table's scan fan-out: splits sized so the file
            # spreads over the cores (floored at one ~100-doc row group),
            # the same alignment discipline as the corpus writer (ed2df49).
            fsize = os.path.getsize(tei_path)
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(max(32 * 1024, fsize // args.cpus)),
            )
            reps = []
            rows = tei_links(
                spark.read.parquet(tei_path), spark.read.parquet(dico_path)
            ).count()  # row count for the artifact
            # warm with the SAME plan the timed reps run (advisor round-5
            # note: count() plans differently, so rep 1 otherwise pays
            # one-time codegen and the min is effectively min-of-(reps-1))
            tei_links(
                spark.read.parquet(tei_path), spark.read.parquet(dico_path)
            ).write.format("noop").mode("overwrite").save()
            for _ in range(args.reps):
                t0 = time.monotonic()
                out = tei_links(
                    spark.read.parquet(tei_path), spark.read.parquet(dico_path)
                )
                out.write.format("noop").mode("overwrite").save()
                reps.append(round(time.monotonic() - t0, 3))
            m = min(reps)
            print(
                json.dumps(
                    {
                        "docs": n,
                        "rows": rows,
                        "reps_sec": reps,
                        "min_sec": m,
                        "docs_per_sec": round(n / m, 1),
                        "loadavg_1m": round(os.getloadavg()[0], 1),
                    }
                ),
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
