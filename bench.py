"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Each query is forced end-to-end with the noop writer (computes every
output column — a bare count() would let Catalyst prune the projections
we mean to measure). The KG pipeline is benchmarked on the deterministic
synthetic corpus (fixed docs incl. skew docs) and reported both in
seconds and as triples/sec.

Rep scheduling: this sandbox VM has documented co-tenant CPU bursts
(identical back-to-back runs swing 3-5x, and one burst can span several
minutes — BENCH/BASELINE.md, BENCH/RECONCILE_r03.md). Consecutive
min-of-N reps of one query sample a SINGLE noise window, which produced
round 2's phantom 28.8 s kg number and round 3's phantom 5.8 s
dedup_minhash_lsh number. Since round 4 EVERY query's reps are
round-robined across the whole run (round 3 interleaved only the kg
reps): rep i of every query runs before rep i+1 of any query, so the
min of each query escapes any burst shorter than the full bench run —
at zero extra wall cost. Since round 5 the run additionally REFUSES to
trust an unconfirmed min: any query whose best rep is not reproduced
within 25% by a second rep keeps re-running in extra interleaved
rounds (up to 9 reps total), so a burst spanning the whole base window
must persist across every extra round to survive into the headline
number. Per-rep wall times and the 1-minute load average sampled
before each round are emitted in the JSON so a noisy run is
adjudicable from the artifact alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "9600"))

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


def _force(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from theoremkb_spark.queries import QUERIES_CORE
    from theoremkb_spark.queries_docs import QUERIES_DOCS
    from theoremkb_spark.session import get_spark

    registry = {**QUERIES_CORE, **QUERIES_DOCS}
    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from theoremkb_spark.session import warm_python_workers

    warm_python_workers(spark, CPUS)  # steady state: imports off the clock

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # KG pipeline setup FIRST: corpus materialized to parquet off the
    # clock (a LocalRelation would re-ship the html blobs driver->tasks
    # inside the timed job)
    from theoremkb_spark.corpus.generator import entity_dict_rows
    from theoremkb_spark.pipeline.extract import write_pages_parquet
    from theoremkb_spark.pipeline.runner import build_kg, load_dico, release_caches

    from theoremkb_spark.corpus.generator import CORPUS_VERSION

    pages_path = f"/tmp/bench_pages_v{CORPUS_VERSION}_{KG_DOCS}.parquet"
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path, KG_DOCS, jobs=min(CPUS, 16))
    pages = spark.read.parquet(pages_path)
    dico = load_dico(spark, list(entity_dict_rows(KG_DOCS))).cache()
    _force(pages)  # page cache + scan codegen off the clock
    # tiny end-to-end pass: codegen + broadcast machinery off the clock
    caches: list = []
    _force(build_kg(spark, pages.limit(16), dico=dico, cache_registry=caches))
    release_caches(caches)

    # each timed kg rep releases its stage caches so every rep is a
    # full, self-contained pipeline execution (no cross-run cache hits
    # via canonicalized-plan matching)
    def kg_rep() -> float:
        c: list = []
        t0 = time.time()
        _force(build_kg(spark, pages, dico=dico, cache_registry=c))
        dt = time.time() - t0
        release_caches(c)
        return dt

    # warm sweep: full end-to-end pass per query (codegen + write path +
    # page cache); a bare count() warm left the noop write plan cold and
    # the first timed run paid its compilation
    for name in HEADLINE:
        _force(registry[name][0](spark, SF_DIR))

    n_rounds = max(reps, 3)
    per_rep: dict[str, list[float]] = {name: [] for name in HEADLINE}
    kg_times: list[float] = [kg_rep()]  # one rep up front (warm path just ran)
    load_1m: list[float] = []

    def _timed(name: str) -> None:
        fn = registry[name][0]
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        per_rep[name].append(round(time.time() - t0, 3))

    for _round in range(n_rounds):
        load_1m.append(round(os.getloadavg()[0], 1))
        for name in HEADLINE:
            _timed(name)
        # one kg rep per round keeps the long pole interleaved too
        kg_times.append(kg_rep())
    while len(kg_times) < n_rounds + 2:
        kg_times.append(kg_rep())

    # Adaptive escape (round-5): a query's min is TRUSTED only once a
    # second rep lands within 25% of it. Until then the query re-runs in
    # extra interleaved rounds (bounded), so a co-tenant burst spanning
    # the whole base window can inflate individual reps but cannot fix
    # the reported min — the burst would have to persist across every
    # extra round too. Bound: MAX_REPS total reps per query (>= 6 reps
    # attempted on any query that never settles, per the round-4 ask).
    MAX_REPS = 9

    # Queries with a measured multi-execution warm-up slope: their big
    # codegen stages only reach C2-compiled steady state after several
    # invocations, so an early slow min can be "confirmed" by an equally
    # cold neighbor rep and lock in a 1.3-1.5x-high reading. All three
    # heavy dedup/link queries show it in controlled 6-rep standalone
    # runs (ngram [2.27,1.71,1.84,1.60,1.43,1.69] -> floor 1.43;
    # minhash floor 2.08; link floor 2.08 — vs rep-3-confirmed harness
    # minima of 2.49/3.37/4.32 across the round-5 windows); their min
    # is not trusted until at least this many reps.
    MIN_REPS = {
        "dedup_ngram_jaccard": 6,
        "dedup_minhash_lsh": 6,
        "link_fuzzy_lsh": 6,
    }

    def _settled(ts: list[float]) -> bool:
        lo = min(ts)
        return sum(1 for t in ts if t <= lo * 1.25) >= 2

    extra_rounds = 0
    for _extra in range(MAX_REPS - n_rounds):
        pending = [
            n for n in HEADLINE
            if (not _settled(per_rep[n]) or len(per_rep[n]) < MIN_REPS.get(n, 0))
            and len(per_rep[n]) < MAX_REPS
        ]
        kg_pending = not _settled(kg_times) and len(kg_times) < MAX_REPS
        if not pending and not kg_pending:
            break
        extra_rounds += 1
        load_1m.append(round(os.getloadavg()[0], 1))
        for name in pending:
            _timed(name)
        if kg_pending:
            kg_times.append(kg_rep())
    load_1m.append(round(os.getloadavg()[0], 1))

    timings = {name: min(per_rep[name]) for name in HEADLINE}
    kg_sec = min(kg_times)
    n_triples = build_kg(spark, pages, dico=dico).count()
    timings["kg_pipeline"] = round(kg_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "kg_docs": KG_DOCS,
                "kg_triples": n_triples,
                "kg_triples_per_sec": round(n_triples / kg_sec, 1),
                "cpus": CPUS,
                "rep_schedule": "round_robin_all_queries+adaptive_until_min_confirmed",
                "adaptive_extra_rounds": extra_rounds,
                "per_rep_sec": per_rep,
                "kg_reps_sec": [round(t, 3) for t in kg_times],
                "loadavg_1m_per_round": load_1m,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
