"""TEI ingestion (S10): get_links.py parser semantics, edge hazards,
Spark-vs-regex-twin parity, and the link resolution contract."""

import pandas as pd
import pytest

from theoremkb_spark.corpus.generator import entity_dict_rows, render_tei, tei_rows
from theoremkb_spark.corpus.materialize import _tei_regex_parse
from theoremkb_spark.pipeline.tei import parse_tei_doc, tei_links

NS = 'xmlns="http://www.tei-c.org/ns/1.0"'


def _tei(body: str = "", bibl: str = "") -> str:
    return (
        f"<TEI {NS}><text><body>{body}</body>"
        f"<back><div><listBibl>{bibl}</listBibl></div></back></text></TEI>"
    )


def test_noid_biblstruct_skipped_without_shifting_index():
    # get_links.py:70-72 — entries without xml:id neither index nor shift
    bibl, _ = parse_tei_doc(
        _tei(
            bibl=(
                '<biblStruct xml:id="b0"><title type="main">Alpha One</title></biblStruct>'
                '<biblStruct><title type="main">Stray NoId</title></biblStruct>'
                '<biblStruct xml:id="b1"><title type="main">Beta Two</title></biblStruct>'
            )
        )
    )
    assert bibl == [(0, "alphaone"), (1, "betatwo")]


def test_non_main_title_skipped_and_missing_title_empty():
    # get_links.py:74-78 — only title[type=main] is matchable
    bibl, _ = parse_tei_doc(
        _tei(
            bibl=(
                '<biblStruct xml:id="b0"><title level="j">Journal of Xyz</title>'
                '<title type="main">Real Title!</title></biblStruct>'
                '<biblStruct xml:id="b1"><title level="j">Only Journal</title></biblStruct>'
            )
        )
    )
    assert bibl == [(0, "realtitle"), (1, "")]


def test_refs_filtered_and_tag_texts_normalized():
    # get_links.py:87-96 — figure refs and target-less bibr refs skipped;
    # tag text stripped of \W; set-dedup per target
    _, tags = parse_tei_doc(
        _tei(
            body=(
                '<p><ref type="bibr" target="#b0">[1]</ref>'
                '<ref type="bibr" target="#b0">[1]</ref>'
                '<ref type="bibr" target="#b0">(Smith et al., 2019)</ref>'
                '<ref type="figure" target="#fig_0">Figure 1</ref>'
                '<ref type="bibr">[9]</ref>'
                '<ref type="bibr" target="#b2">Jones (2020)</ref></p>'
            )
        )
    )
    assert tags == {0: {"1", "Smithetal2019"}, 2: {"Jones2020"}}


def test_malformed_tei_recovers_to_empty():
    # the GROBID_ERR branch (get_links.py:62-66): junk, truncation, and
    # empty input all recover to ([], {}) without raising
    for junk in ("", "not xml at all", "<TEI><unclosed>", _tei()[: len(_tei()) // 2]):
        assert parse_tei_doc(junk) == ([], {})


@pytest.mark.parametrize("i", [0, 3, 7, 11, 19])
def test_etree_and_regex_twins_agree_on_corpus_docs(i):
    tei = render_tei(i, 42, 60)
    assert parse_tei_doc(tei) == _tei_regex_parse(tei)


def test_corpus_has_a_truncated_doc_and_twins_agree_on_it():
    teis = [r["tei"] for r in tei_rows(60)]
    bad = [t for t in teis if not t.rstrip().endswith("</TEI>")]
    assert bad, "corpus should contain >=1 truncated GROBID response"
    for t in bad:
        assert parse_tei_doc(t) == ([], {}) == _tei_regex_parse(t)


def test_tei_links_spark_matches_sequential_twin(spark, tmp_path):
    from theoremkb_spark.corpus.materialize import ensure_tei_oracle

    paths = ensure_tei_oracle(str(tmp_path), n_docs=40)
    tei = spark.read.parquet(paths["tei"])
    dico = spark.createDataFrame(pd.DataFrame(entity_dict_rows(40)))
    got = (
        tei_links(tei, dico)
        .orderBy("url", "tag")
        .toPandas()
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    exp = (
        pq.read_table(paths["tei_links"])
        .to_pandas()
        .sort_values(["url", "tag"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    got["grobid_index"] = got["grobid_index"].astype("int64")
    exp["grobid_index"] = exp["grobid_index"].astype("int64")
    pd.testing.assert_frame_equal(got, exp[got.columns])
    # unresolved rows survive with the reference's -1 sentinel
    assert (got["grobid_index"] == -1).any()
    assert got.loc[got["grobid_index"] == -1, "tags"].isna().all()


def test_tei_parse_stage_is_map_only(spark, tmp_path):
    # the per-doc walk must not shuffle: documents arrive partitioned and
    # the tag aggregation happens inside the walk (pipeline/tei.py)
    from theoremkb_spark.corpus.materialize import ensure_tei_oracle
    from theoremkb_spark.pipeline.tei import parse_tei_references

    paths = ensure_tei_oracle(str(tmp_path), n_docs=20)
    plan = (
        parse_tei_references(spark.read.parquet(paths["tei"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
