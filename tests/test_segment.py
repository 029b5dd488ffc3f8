"""8-label segmentation layer, parent-class constraint, header titles.

Reference semantics under test:
* SegmentationAnnotationClass vocabulary (classes/__init__.py:73-83);
* ResultsAnnotationClass parents = segmentation {body, annex}
  (classes/__init__.py:135; get_box_validator paper/__init__.py:405-428);
* HeaderAnnotationClass title extraction (_refresh_title,
  paper/__init__.py:305-317).
"""

from pyspark.sql import functions as F


def test_segment_blocks_recover_gold(spark):
    """The structural segmenter must recover the generator's GOLD
    per-block segmentation label for EVERY block of every English doc —
    all 8 labels exercised (front/body/annex/acknowledgement/
    bibliography via headings, headnote/footnote/page via marginals)."""
    from theoremkb_spark.corpus.generator import build_corpus
    from theoremkb_spark.pipeline.extract import extract_tokens, load_pages
    from theoremkb_spark.pipeline.segment import segment_blocks

    n = 20
    got = {
        (r.url, r.block): r.segment
        for r in segment_blocks(extract_tokens(load_pages(spark, n))).collect()
    }
    want = {}
    seen_labels = set()
    for doc, _t in build_corpus(n):
        if doc.lang != "en":
            continue
        for bi, b in enumerate(doc.blocks):
            want[(doc.url, bi)] = b.seg
            seen_labels.add(b.seg)
    assert got == want
    # the corpus exercises at least 7 of the 8 labels at n=20
    assert {"front", "body", "bibliography", "headnote", "page"} <= seen_labels


def test_extract_titles_match_gold(spark):
    """Pipeline-extracted titles == the gold title (capitalized token
    rendering) for every English document — the title parity gate."""
    from theoremkb_spark.corpus.generator import build_corpus
    from theoremkb_spark.pipeline.extract import extract_tokens, load_pages
    from theoremkb_spark.pipeline.segment import extract_titles

    n = 20
    got = {
        r.url: r.title
        for r in extract_titles(extract_tokens(load_pages(spark, n))).collect()
    }
    want = {
        doc.url: " ".join(w.capitalize() for w in doc.title.split())
        for doc, _t in build_corpus(n)
        if doc.lang == "en"
    }
    assert got == want


def _lookalike_doc_ids(n: int) -> list[int]:
    from theoremkb_spark.corpus.generator import build_corpus

    out = []
    for doc, _t in build_corpus(n):
        if doc.lang == "en" and any(
            b.kind == "theorem" and b.seg not in ("body", "annex")
            for b in doc.blocks
        ):
            out.append(doc.idx)
    return out


def test_front_matter_lookalikes_rejected(spark):
    """A bold 'Theorem 9.9.' in the abstract (and 'Theorem 9.8.' in the
    acknowledgements) IS matched by the label layer but must produce NO
    triples: the parent constraint rejects result spans outside
    segmentation {body, annex}. Both pipeline paths are checked; the
    unconstrained label layer is probed to prove the lookalike is real
    (i.e. the constraint, not the labeler, is doing the rejection)."""
    from theoremkb_spark.pipeline.extract import extract_tokens, load_pages
    from theoremkb_spark.pipeline.label import label_tokens
    from theoremkb_spark.pipeline.runner import build_kg, load_entity_dict

    n = 20
    ids = _lookalike_doc_ids(n)
    assert ids, "corpus must contain at least one front/ack lookalike at n=20"

    pages = load_pages(spark, n)
    tokens = extract_tokens(pages)

    # the UNCONSTRAINED label layer sees the lookalike spans
    raw = (
        label_tokens(tokens)
        .filter(F.col("label") != "O")
        .filter(F.col("word") == 1)  # the number token of the head
        .filter(F.col("text").isin("9.9.", "9.8."))
        .count()
    )
    assert raw >= len(ids)

    # ... but neither path emits a triple for them
    for lab in ("fused", "window"):
        triples = build_kg(
            spark, pages, load_entity_dict(spark, n), labeler=lab
        ).collect()
        bad = [
            r for r in triples
            if "theorem 9.9" in r.subj or "theorem 9.8" in r.subj
            or "theorem 9.9" in r.obj or "theorem 9.8" in r.obj
        ]
        assert not bad, (lab, bad[:3])


def test_annex_results_kept_and_group_gaps(spark):
    """The constraint must KEEP appendix (annex) results, and a rejected
    open still consumes a group number — the label layer numbers every
    span, the constraint only drops boxes (reference layer split)."""
    from theoremkb_spark.corpus.generator import build_corpus, render_html
    from theoremkb_spark.pipeline.extract import _doc_spans

    from theoremkb_spark.functions.text import RESULT_LABELS, get_pattern

    n = 20
    label_set = frozenset(RESULT_LABELS)
    checked_annex = checked_gap = False
    for doc, _t in build_corpus(n):
        if doc.lang != "en":
            continue
        spans, _tags = _doc_spans(doc.url, render_html(doc))
        groups = [g for g, _l, _t2, _o in spans]

        # gold replay: every open consumes a group number; only opens in
        # {body, annex} are emitted
        expected, g = [], 0
        for b in doc.blocks:
            first = b.lines[0][0] if b.lines and b.lines[0] else None
            if (
                first is not None
                and first.font in ("f1", "f2")
                and get_pattern(first.text) in label_set
            ):
                g += 1
                if b.seg in ("body", "annex"):
                    expected.append(g)
        assert groups == expected, doc.idx

        if any(b.seg == "annex" and b.kind in ("theorem", "lemma") for b in doc.blocks):
            assert any(
                own and lbl in ("theorem", "lemma")
                for _g, lbl, _t2, own in spans
            )
            checked_annex = True
        if expected and expected != list(range(1, len(expected) + 1)):
            checked_gap = True  # a rejected open left a hole in the numbering
    assert checked_annex and checked_gap
