"""Resume-from-checkpoint: kill-and-rerun must neither lose nor duplicate
triples (SURVEY §5.2.6; north rule resumability)."""

import os

from theoremkb_spark.corpus.generator import build_corpus, entity_dict_rows
from theoremkb_spark.corpus.oracle import oracle_triples
from theoremkb_spark.io.catalog import CheckpointedTripleStore, run_incremental
from theoremkb_spark.pipeline.extract import load_pages
from theoremkb_spark.pipeline.runner import load_entity_dict

N = 24


def _expected():
    return oracle_triples(list(build_corpus(N)), entity_dict_rows(N))


def test_incremental_batches_equal_full_run(spark, tmp_path):
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg"))

    b1 = run_incremental(spark, pages, ents, store, limit=10)
    b2 = run_incremental(spark, pages, ents, store, limit=None)
    b3 = run_incremental(spark, pages, ents, store)  # nothing left
    assert b1 == 0 and b2 == 1 and b3 == -1

    got = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert got == _expected()
    # no duplicates in the store
    df = store.read_triples(spark)
    assert df.count() == df.dropDuplicates(["subj", "pred", "obj", "url"]).count()


def test_killed_batch_leaves_no_visible_state(spark, tmp_path):
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg2"))

    run_incremental(spark, pages, ents, store, limit=8)

    # simulate a kill AFTER data write but BEFORE the manifest commit:
    # write a debris directory that was never manifested
    debris = os.path.join(store.out_dir, "triples/batch=1")
    store.read_triples(spark).limit(3).write.mode("overwrite").parquet(debris)
    n_visible = store.read_triples(spark).count()

    # rerun to completion — debris must be ignored/overwritten, not doubled
    run_incremental(spark, pages, ents, store)
    got = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert got == _expected()
    df = store.read_triples(spark)
    assert df.count() == df.dropDuplicates(["subj", "pred", "obj", "url"]).count()
    assert df.count() > n_visible


def test_lineage_reconciles(spark, tmp_path):
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg3"))
    run_incremental(spark, pages, ents, store)
    lineage_total = (
        store.read_lineage(spark)
        .filter("stage = 'triples'")  # round 4: lineage covers every stage
        .groupBy()
        .sum("rows")
        .first()[0]
    )
    assert lineage_total == store.read_triples(spark).count()


def test_looped_incremental_does_not_accumulate_cached_rdds(spark, tmp_path):
    """ADVICE round-1: build_kg's stage caches must be released per batch —
    a long-lived incremental session must not leak persisted blocks."""
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg4"))

    run_incremental(spark, pages, ents, store, limit=6)  # warm-up batch
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(3):
        run_incremental(spark, pages, ents, store, limit=6)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"cached RDDs grew {before} -> {after}"


def test_url_ledger_compaction_bounds_read_paths(spark, tmp_path):
    """VERDICT r1 perf-weak #3: the resume anti-join must not reread
    every historical url batch — after compaction the read side is one
    compacted file + the batches since, and resume stays exact."""
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg5"))

    # 12 tiny batches, compacting every 4
    while True:
        before = store._compaction()
        bid = run_incremental(spark, pages, ents, store, limit=2)
        if bid == -1:
            break
        store.compact_url_ledger(spark, min_batches=4)

    comp = store._compaction()
    assert comp["path"] is not None and comp["upto_batch"] >= 0
    pending = [m for m in store.manifests() if m["batch_id"] > comp["upto_batch"]]
    assert len(pending) < 4  # read path bounded

    # exactness preserved: ledger covers every processed url, resume is done
    assert store.processed_urls(spark).count() == N
    assert run_incremental(spark, pages, ents, store) == -1
    got = {
        (r.subj, r.pred, r.obj, r.url) for r in store.read_triples(spark).collect()
    }
    assert got == _expected()


def test_time_travel_read(spark, tmp_path):
    """as_of_batch reads are the Iceberg VERSION-AS-OF view: batch 0's
    snapshot is stable after batch 1 commits, and the current read is
    the union of both."""
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg"))

    run_incremental(spark, pages, ents, store, limit=10)
    v0 = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark, as_of_batch=0).collect()
    }
    run_incremental(spark, pages, ents, store)
    v0_after = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark, as_of_batch=0).collect()
    }
    assert v0_after == v0  # historical snapshot is immutable
    now = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert v0 < now and now == _expected()


def test_triple_compaction_preserves_reads_and_history(spark, tmp_path):
    """compact_triples folds the per-batch files into one generation:
    current reads are unchanged, time-travel still serves the original
    snapshots, and later batches layer on top of the compacted gen."""
    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg"))

    run_incremental(spark, pages, ents, store, limit=8)
    run_incremental(spark, pages, ents, store, limit=8)
    before = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    v0 = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark, as_of_batch=0).collect()
    }
    assert not store.compact_triples(spark, min_batches=3)  # below threshold
    assert store.compact_triples(spark, min_batches=2)
    after = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert after == before
    # time-travel bypasses the compacted generation
    assert {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark, as_of_batch=0).collect()
    } == v0
    # a post-compaction batch layers on top of the compacted gen
    run_incremental(spark, pages, ents, store)
    final = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert final == _expected()


def test_recommit_supersedes_earlier_triples(spark, tmp_path):
    """A re-crawl batch replaces earlier triples for its urls in current
    reads (no duplicates), pinned time travel still sees the old rows,
    and compaction bakes the supersede in."""
    from pyspark.sql import functions as F

    from theoremkb_spark.io.catalog import recommit_urls

    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg"))
    run_incremental(spark, pages, ents, store)
    expected = _expected()
    urls = pages.select("url").orderBy("url").limit(6)

    # hand-commit a poisoned batch for those urls so replacement is
    # OBSERVABLE (same-content recommit would be invisible)
    poison = (
        store.read_triples(spark)
        .join(urls, "url", "left_semi")
        .withColumn("obj", F.lit("POISON"))
    )
    store.commit_batch(poison, urls, supersedes_urls=urls)
    cur = store.read_triples(spark)
    assert cur.filter("obj = 'POISON'").count() > 0
    # none of the urls' ORIGINAL rows survive in the current view
    originals = {
        (r.subj, r.pred, r.obj, r.url)
        for r in cur.join(urls, "url", "left_semi").filter("obj <> 'POISON'").collect()
    }
    assert originals == set()
    # pinned time travel still serves the pre-re-crawl state
    v0 = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark, as_of_batch=0).collect()
    }
    assert v0 == expected

    # a real recommit (same content) heals the poison — and the current
    # read equals the full expected set again, with zero duplicates
    recommit_urls(spark, pages, ents, store, urls=urls)
    healed = store.read_triples(spark)
    rows = {(r.subj, r.pred, r.obj, r.url) for r in healed.collect()}
    assert rows == expected
    assert healed.count() == len(rows)  # no duplicate physical rows

    # compaction folds the filtered state; reads unchanged
    assert store.compact_triples(spark, min_batches=2)
    after = {
        (r.subj, r.pred, r.obj, r.url)
        for r in store.read_triples(spark).collect()
    }
    assert after == expected

def test_lineage_reconciles_across_stages(spark, tmp_path):
    """Every committed batch carries per-stage, per-partition lineage
    (north rule: per-partition lineage + metrics), and the row counts
    reconcile across the pipeline: fused == spans + mentions + citations
    (the fused pass emits exactly those three kinds), the triples stage
    matches the batch's committed triple file, and every stage records a
    wall-ms."""
    from collections import defaultdict

    pages = load_pages(spark, N)
    ents = load_entity_dict(spark, N)
    store = CheckpointedTripleStore(str(tmp_path / "kg_lin"))
    run_incremental(spark, pages, ents, store, limit=10)
    run_incremental(spark, pages, ents, store)

    totals: dict = defaultdict(int)
    walls: dict = {}
    for r in store.read_lineage(spark).collect():
        totals[(r.batch_id, r.stage)] += r.rows
        walls[(r.batch_id, r.stage)] = r.wall_ms

    batches = {b for b, _s in totals}
    assert batches == {0, 1}
    expected_stages = {"fused", "spans", "mentions", "citations", "triples"}
    for b in batches:
        assert {s for bb, s in totals if bb == b} == expected_stages
        parts = sum(totals[(b, s)] for s in ("spans", "mentions", "citations"))
        assert totals[(b, "fused")] == parts, (b, totals[(b, "fused")], parts)
        # the triples stage reconciles with the committed batch file
        m = next(mm for mm in store.manifests() if mm["batch_id"] == b)
        committed = spark.read.parquet(m["triples_path"]).count()
        assert totals[(b, "triples")] == committed, (b, committed)
        assert all(
            walls[(b, s)] is not None and walls[(b, s)] >= 0 for s in expected_stages
        )


def test_iceberg_adapter_gating_and_factory(spark, tmp_path):
    """The Iceberg binding is env-gated: without the runtime jars the
    factory hands back the parquet emulation for a path location, and
    constructing the Iceberg store raises cleanly instead of failing
    deep inside a SQL call. (The adapter's SQL surface runs only on a
    classpath with the Iceberg runtime — the emulation is the tested
    engine of record here.)"""
    import pytest

    from theoremkb_spark.io.catalog import iceberg_available
    from theoremkb_spark.io.iceberg_adapter import (
        IcebergTripleStore,
        open_triple_store,
    )

    store = open_triple_store(spark, str(tmp_path / "kg_ice"))
    assert isinstance(store, CheckpointedTripleStore)
    # the factory-selected store drives the SAME incremental loop
    pages = load_pages(spark, 6)
    ents = load_entity_dict(spark, 6)
    assert run_incremental(spark, pages, ents, store) == 0
    assert run_incremental(spark, pages, ents, store) == -1

    if not iceberg_available(spark):
        # recorded probe (BENCH/ICEBERG_PROBE_r05.md): the runtime jar
        # cannot exist in this image (none shipped, no network, no
        # package manager) — the emulation above is the engine of record
        with pytest.raises(NotImplementedError):
            IcebergTripleStore(spark, "demo.db.kg")
        return

    # REAL integration path — runs on any classpath carrying
    # iceberg-spark-runtime (e.g. --packages org.apache.iceberg:...):
    # the native store drives the same incremental loop end-to-end
    # (append, resume anti-join, time travel, upsert) through Iceberg SQL
    ice = IcebergTripleStore(spark, "demo.db.kg_it")
    assert run_incremental(spark, pages, ents, ice) == 0
    assert run_incremental(spark, pages, ents, ice) == -1  # resume no-op
    n0 = ice.read_triples(spark).count()
    assert n0 > 0
    first = ice.read_triples(spark, as_of_batch=0).count()
    assert first == n0  # time travel to the first snapshot
    more = load_pages(spark, 8)
    assert run_incremental(spark, more, load_entity_dict(spark, 8), ice) == 1
    assert ice.read_triples(spark).count() >= n0
    assert ice.read_triples(spark, as_of_batch=0).count() == first
