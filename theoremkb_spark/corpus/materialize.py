"""Materialize the sequential reference-semantics oracle as parquet.

The driver's hard correctness gate compares each registered Spark query
against a DuckDB oracle SQL string. The KG pipeline itself is not
SQL-expressible (Arrow-UDF extraction, sequence labeling, connected
components) — but its *expected output* is: this module runs the pure
sequential oracle (corpus/oracle.py, mirroring
Styling/tools/theoremdb/extract_graph.py) over the deterministic
corpus and writes the expected triples/spans to parquet, so the
``kg_triples`` / ``kg_spans`` oracles become plain
``SELECT ... FROM '<parquet>' ORDER BY ...`` — putting the engine's
actual product under the same rows+schema+hash gate as every other
query.

Everything is seeded and pure; regeneration is cheap (test-scale corpus)
and atomic (tmp file + os.replace), so callers just invoke
``ensure_kg_oracle`` and read the returned paths.
"""

from __future__ import annotations

import os

N_DOCS_DEFAULT = 60
SEED_DEFAULT = 42


def ensure_kg_oracle(
    out_dir: str, n_docs: int = N_DOCS_DEFAULT, seed: int = SEED_DEFAULT
) -> dict[str, str]:
    """Write ``oracle_triples.parquet`` / ``oracle_spans.parquet`` under
    ``out_dir`` (always recomputed — the sequential oracle at test scale
    costs well under a second, and stale files would silently detune the
    gate). Returns {"triples": path, "spans": path}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .generator import build_corpus, entity_dict_rows
    from .oracle import oracle_doc_spans, oracle_triples_grouped

    os.makedirs(out_dir, exist_ok=True)
    docs = list(build_corpus(n_docs, seed))

    grouped = oracle_triples_grouped(docs, entity_dict_rows(n_docs, seed))
    trip_rows = sorted((s, p, o, u, g) for (s, p, o, u), g in grouped.items())
    triples_tbl = pa.table(
        {
            "subj": [r[0] for r in trip_rows],
            "pred": [r[1] for r in trip_rows],
            "obj": [r[2] for r in trip_rows],
            "url": [r[3] for r in trip_rows],
            "group": pa.array([r[4] for r in trip_rows], type=pa.int64()),
        }
    )

    span_rows = []
    for doc, _targets in docs:
        for g, label, n_tokens in oracle_doc_spans(doc):
            span_rows.append((doc.url, g, label, n_tokens))
    span_rows.sort()
    spans_tbl = pa.table(
        {
            "url": [r[0] for r in span_rows],
            "group": pa.array([r[1] for r in span_rows], type=pa.int64()),
            "label": [r[2] for r in span_rows],
            "n_tokens": pa.array([r[3] for r in span_rows], type=pa.int64()),
        }
    )

    # gold titles (url, title) for English docs — the expected output of
    # the pipeline's header-layer title extraction (capitalized token
    # rendering, exactly what the title block carries on the page) — and
    # the raw entity dictionary, so the title-link gate can be a plain
    # DuckDB join over the two files
    titles_tbl = pa.table(
        {
            "url": [d.url for d, _t in docs if d.lang == "en"],
            "title": [
                " ".join(w.capitalize() for w in d.title.split())
                for d, _t in docs
                if d.lang == "en"
            ],
        }
    )
    dict_rows = entity_dict_rows(n_docs, seed)
    dict_tbl = pa.table(
        {
            "url": [r["url"] for r in dict_rows],
            "tag": [r["tag"] for r in dict_rows],
            "pdf_to": [r["pdf_to"] for r in dict_rows],
            "title": [r["title"] for r in dict_rows],
            "norm_title": [r["norm_title"] for r in dict_rows],
        }
    )

    out = {}
    for name, tbl in (
        ("triples", triples_tbl),
        ("spans", spans_tbl),
        ("titles", titles_tbl),
        ("dict", dict_tbl),
    ):
        path = os.path.join(out_dir, f"oracle_{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic: readers never see a partial file
        out[name] = path
    return out


def pagerank_expected(
    edges: list[tuple[str, str]], damping: float = 0.85, n_iter: int = 10
) -> list[tuple[str, float]]:
    """Sequential twin of operators/graph.py::pagerank — dict/loop power
    iteration, same fixed rounds, same uniform dangling redistribution.
    Float sums differ from Spark's only in association order (~1e-15);
    both sides round to 6 decimals at the query boundary."""
    e = [(s, d) for s, d in edges if s is not None and d is not None]
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    if n == 0:
        return []
    deg: dict[str, int] = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        sums = {v: 0.0 for v in nodes}
        for s, d in e:
            sums[d] += rank[s] / deg[s]
        dangling = sum(rank[v] for v in nodes if v not in deg)
        rank = {
            v: (1.0 - damping) / n + damping * (sums[v] + dangling / n)
            for v in nodes
        }
    return [(v, rank[v]) for v in nodes]


def ensure_pagerank_oracle(
    out_dir: str, n_docs: int = N_DOCS_DEFAULT, seed: int = SEED_DEFAULT
) -> str:
    """PageRank over the paper-level citation edges of the SAME oracle
    triples the kg_triples gate uses (pred='cites', group=-1, distinct),
    rounded to 6 decimals — the expected output of the kg_pagerank
    query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..corpus.dedup_oracle import _round6
    from .generator import build_corpus, entity_dict_rows
    from .oracle import oracle_triples_grouped

    os.makedirs(out_dir, exist_ok=True)
    docs = list(build_corpus(n_docs, seed))
    grouped = oracle_triples_grouped(docs, entity_dict_rows(n_docs, seed))
    edges = sorted(
        {(s, o) for (s, p, o, u), g in grouped.items() if p == "cites" and g == -1}
    )
    pr = pagerank_expected(edges)
    tbl = pa.table(
        {
            "node": [v for v, _ in pr],
            "rank": pa.array([_round6(r) for _, r in pr], pa.float64()),
        }
    )
    path = os.path.join(out_dir, "oracle_pagerank.parquet")
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def ensure_token_table(
    out_dir: str, n_docs: int = N_DOCS_DEFAULT, seed: int = SEED_DEFAULT
) -> str:
    """Materialize the long token table (English docs, the pipeline's
    extraction semantics, produced by the pure per-doc parser — no
    Spark) to ``tokens.parquet``. This is the shared input fixture for
    the feature-frame query: the Spark operator AND the DuckDB oracle
    both read this one file, so the gate checks the feature math, not
    the parser."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..pipeline.extract import TOKEN_SCHEMA, _parse_tokens
    from .generator import build_corpus, render_html

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "tokens.parquet")

    names = [f.name for f in TOKEN_SCHEMA.fields]
    cols: dict[str, list] = {n: [] for n in names}
    for doc, _targets in build_corpus(n_docs, seed):
        if doc.lang != "en":
            continue
        for row in _parse_tokens(doc.url, render_html(doc)):
            for n, v in zip(names, row):
                cols[n].append(v)

    tbl = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "page": pa.array(cols["page"], pa.int32()),
            "block": pa.array(cols["block"], pa.int32()),
            "line": pa.array(cols["line"], pa.int32()),
            "word": pa.array(cols["word"], pa.int32()),
            "text": pa.array(cols["text"], pa.string()),
            "hpos": pa.array(cols["hpos"], pa.float64()),
            "vpos": pa.array(cols["vpos"], pa.float64()),
            "width": pa.array(cols["width"], pa.float64()),
            "height": pa.array(cols["height"], pa.float64()),
            "font_id": pa.array(cols["font_id"], pa.string()),
            "italic": pa.array(cols["italic"], pa.bool_()),
            "math": pa.array(cols["math"], pa.bool_()),
            "bold": pa.array(cols["bold"], pa.bool_()),
            "font_size": pa.array(cols["font_size"], pa.float64()),
            "link": pa.array(cols["link"], pa.string()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def _tei_regex_parse(tei: str):
    """INDEPENDENT twin of pipeline/tei.py::parse_tei_doc — regex over
    the serialized XML instead of an ElementTree walk, so the gate
    compares two implementations of the get_links.py semantics rather
    than one implementation with itself. A document that does not close
    its root element is the unparseable/GROBID_ERR case."""
    import html as _h
    import re as _re

    if not tei.rstrip().endswith("</TEI>"):
        return [], {}
    bibl, n_item = [], 0
    for m in _re.finditer(r"<biblStruct\b([^>]*)>(.*?)</biblStruct>", tei, _re.S):
        if 'xml:id="' not in m.group(1):
            continue
        tm = _re.search(
            r'<title\b[^>]*type="main"[^>]*>(.*?)</title>', m.group(2), _re.S
        )
        raw = _h.unescape(tm.group(1)) if tm else ""
        bibl.append((n_item, _re.sub(r"[^a-z]", "", raw.lower())))
        n_item += 1
    tags: dict[int, set] = {}
    for m in _re.finditer(r"<ref\b([^>]*)>(.*?)</ref>", tei, _re.S):
        if 'type="bibr"' not in m.group(1):
            continue
        t = _re.search(r'target="#b(\d+)"', m.group(1))
        if not t:
            continue
        tags.setdefault(int(t.group(1)), set()).add(
            _re.sub(r"\W", "", _h.unescape(m.group(2)))
        )
    return bibl, tags


def ensure_tei_oracle(
    out_dir: str, n_docs: int = N_DOCS_DEFAULT, seed: int = SEED_DEFAULT
) -> dict[str, str]:
    """Materialize the TEI fulltext table (the stage's input fixture)
    and the regex twin's expected links (its DuckDB oracle)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .generator import entity_dict_rows, tei_rows

    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "tei": os.path.join(out_dir, "tei.parquet"),
        "tei_links": os.path.join(out_dir, "oracle_tei_links.parquet"),
    }

    rows = list(tei_rows(n_docs, seed))
    tei_tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "tei": pa.array([r["tei"] for r in rows], pa.string()),
        }
    )

    parsed = {r["url"]: _tei_regex_parse(r["tei"]) for r in rows}
    out: dict[str, list] = {k: [] for k in ("url", "tag", "pdf_to", "grobid_index", "tags")}
    for r in entity_dict_rows(n_docs, seed):
        bibl, tags = parsed[r["url"]]
        idx = min((i for i, nt in bibl if nt == r["norm_title"]), default=-1)
        ts = tags.get(idx) if idx >= 0 else None
        out["url"].append(r["url"])
        out["tag"].append(r["tag"])
        out["pdf_to"].append(r["pdf_to"])
        out["grobid_index"].append(idx)
        out["tags"].append("-".join(sorted(ts)) if ts else None)
    links_tbl = pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "tag": pa.array(out["tag"], pa.string()),
            "pdf_to": pa.array(out["pdf_to"], pa.string()),
            "grobid_index": pa.array(out["grobid_index"], pa.int32()),
            "tags": pa.array(out["tags"], pa.string()),
        }
    )

    for path, tbl in ((paths["tei"], tei_tbl), (paths["tei_links"], links_tbl)):
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return paths
