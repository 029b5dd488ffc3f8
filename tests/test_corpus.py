"""Generator determinism + extraction invariant (SURVEY §5.2.2/5.2.5)."""

from theoremkb_spark.corpus.generator import (
    build_corpus,
    doc_text,
    entity_dict_rows,
    pages_rows,
    render_html,
)


def test_generator_deterministic():
    a = list(pages_rows(10, seed=42))
    b = list(pages_rows(10, seed=42))
    for ra, rb in zip(a, b):
        assert ra["html"] == rb["html"]
        assert ra["text"] == rb["text"]
        assert ra["warc_ts"] == rb["warc_ts"]
    assert entity_dict_rows(10, 42) == entity_dict_rows(10, 42)


def test_generator_seed_sensitivity():
    a = list(pages_rows(5, seed=42))
    b = list(pages_rows(5, seed=43))
    assert any(ra["html"] != rb["html"] for ra, rb in zip(a, b))


def test_corpus_shape():
    rows = list(pages_rows(50, seed=42))
    assert len(rows) == 50
    assert len({r["url"] for r in rows}) == 50
    langs = {r["lang"] for r in rows}
    assert "en" in langs
    # skew doc exists and is much larger than median
    sizes = sorted(len(r["html"]) for r in rows)
    assert sizes[-1] > 20 * sizes[len(sizes) // 2]


def test_text_matches_frozen_rule():
    for doc, _ in build_corpus(5, 42):
        text = doc_text(doc)
        # every line ends with \n; words joined by single spaces
        assert text.endswith("\n")
        first_block = doc.blocks[0]
        first_line = " ".join(t.text for t in first_block.lines[0])
        assert text.startswith(first_line + "\n")


def test_html_roundtrip_tokens():
    """Parsing the rendered html recovers exactly the generator's tokens."""
    from theoremkb_spark.pipeline.extract import _parse_tokens

    for doc, _ in build_corpus(4, 42):
        parsed = _parse_tokens(doc.url, render_html(doc))
        flat = [t for block in doc.blocks for line in block.lines for t in line]
        assert len(parsed) == len(flat)
        for p, t in zip(parsed, flat):
            assert p[5] == t.text
            assert p[10] == t.font
            assert p[15] == t.link
