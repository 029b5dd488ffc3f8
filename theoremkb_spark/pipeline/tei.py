"""Stage 0-alt — TEI: GROBID fulltext XML -> bibliography links (S10).

The reference drives a GROBID REST server and walks the returned TEI
(``Styling/tools/references/get_links.py:57-102``): bibliography index =
position among ``biblStruct`` elements carrying an ``xml:id``
(get_links.py:69-72); the matchable title is ``title[type="main"]``
lowercased with everything outside ``[a-z]`` stripped (get_links.py:
74-78, 125-126); in-text anchors are ``ref[type="bibr"]`` with a
``#bN`` target, their text stripped of ``\\W`` and set-deduped per
target (get_links.py:87-96, 146). The REST round-trip itself is out of
scope (SURVEY §2.1 S10) — this stage consumes an already-materialized
``(url, tei)`` table, the shape a fetch stage would land.

Spark shape: the parse is a per-document sequential walk, so it lives in
ONE ``mapInPandas`` Arrow stage (no shuffle — tag aggregation happens
inside the per-document walk); the dictionary link is then a single
equi-join on ``(url, norm_title)``. At corpus scale BOTH sides of that
join are corpus-sized (the dictionary is per-(citing-doc, tag), like the
reference's links.csv), so this is deliberately NOT a broadcast: the
composite url-leading key hash-spreads uniformly and carries no hot-key
skew, the one join shape that needs nothing special at 100x.

Divergences from the reference, both deliberate:

* joined tags are ``"-".join(sorted(set))`` — the reference joins an
  unordered ``set`` (get_links.py:146), nondeterministic across runs;
* unmatched AND parse-failed entries both land ``grobid_index = -1``,
  the value every reachable reference failure path assigns
  (get_links.py:62-66, 98-100; its ``-2`` branch requires a ref absent
  from the very title list that produced it — dead code).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ETree
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEI_NS = "{http://www.tei-c.org/ns/1.0}"
XML_ID = "{http://www.w3.org/XML/1998/namespace}id"

#: one row per xml:id-carrying biblStruct; tags pre-aggregated in-walk
BIBL_SCHEMA = "url string, bibl_idx int, norm_title string, tags string"

_REF_TARGET = re.compile(r"#b\d+")


def parse_tei_doc(tei: str) -> tuple[list[tuple[int, str]], dict[int, set[str]]]:
    """Sequential per-document walk (get_links.py:68-96). Returns
    ``(bibl, tags)``: bibliography entries as ``(idx, norm_title)`` and
    in-text anchor texts per index. An unparseable document (the
    reference's GROBID_ERR branch) recovers to ``([], {})``."""
    try:
        root = ETree.fromstring(tei)
    except ETree.ParseError:
        return [], {}
    bibl: list[tuple[int, str]] = []
    n_item = 0
    for item in root.iter(TEI_NS + "biblStruct"):
        if XML_ID not in item.attrib:
            continue
        norm = ""
        for t in item.iter(TEI_NS + "title"):
            if t.attrib.get("type") == "main":
                norm = re.sub(r"[^a-z]", "", (t.text or "").lower())
                break
        bibl.append((n_item, norm))
        n_item += 1
    tags: dict[int, set[str]] = {}
    for ref in root.iter(TEI_NS + "ref"):
        if ref.attrib.get("type") != "bibr":
            continue
        tgt = ref.attrib.get("target")
        if not tgt or not _REF_TARGET.fullmatch(tgt):
            continue
        tags.setdefault(int(tgt[2:]), set()).add(re.sub(r"\W", "", ref.text or ""))
    return bibl, tags


def parse_tei_references(pages_tei: DataFrame) -> DataFrame:
    """(url, tei) -> one row per indexed bibliography entry, tags joined.

    Map-only Arrow stage: documents never shuffle, and the per-index tag
    sets aggregate inside the walk, so no Spark-side groupBy exists."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            norms: list[str] = []
            tag_strs: list[str | None] = []
            for url, tei in zip(pdf["url"], pdf["tei"]):
                bibl, tags = parse_tei_doc(tei)
                for idx, norm in bibl:
                    urls.append(url)
                    idxs.append(idx)
                    norms.append(norm)
                    ts = tags.get(idx)
                    tag_strs.append("-".join(sorted(ts)) if ts else None)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="string"),
                    "bibl_idx": pd.Series(idxs, dtype="int32"),
                    "norm_title": pd.Series(norms, dtype="string"),
                    "tags": pd.Series(tag_strs, dtype="string"),
                }
            )

    return pages_tei.mapInPandas(walk, schema=BIBL_SCHEMA)


def tei_links(pages_tei: DataFrame, dico: DataFrame) -> DataFrame:
    """Resolve every dictionary row ``(url, tag, pdf_to, norm_title)`` to
    its bibliography position and in-text anchor tags — the reference's
    links_{sub}.csv output (get_links.py:139-162). Unresolved rows stay
    (grobid_index = -1, tags NULL); first bibliography occurrence wins a
    duplicated title (the reference's pop(), get_links.py:80-84)."""
    bibl = parse_tei_references(pages_tei)
    joined = dico.select("url", "tag", "pdf_to", "norm_title").join(
        bibl, ["url", "norm_title"], "left"
    )
    return (
        joined.groupBy("url", "tag")
        .agg(F.min(F.struct("bibl_idx", "tags", "pdf_to")).alias("m"))
        .select(
            "url",
            "tag",
            F.col("m.pdf_to").alias("pdf_to"),
            F.coalesce(F.col("m.bibl_idx"), F.lit(-1)).alias("grobid_index"),
            F.col("m.tags").alias("tags"),
        )
    )
