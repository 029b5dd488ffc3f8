"""Property-based robustness gates (hypothesis) over the pure per-doc
functions — the recover-parse posture: arbitrary bytes must never crash
the extractor, and the fused span pass must agree with its own
row-oriented wrapper on any input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from theoremkb_spark.corpus.generator import build_doc, render_html
from theoremkb_spark.functions.text import find_ref_results, get_pattern, normalize_text
from theoremkb_spark.pipeline.extract import _doc_spans, _parse_tokens


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_parse_never_crashes_on_garbage(blob):
    toks = _parse_tokens("u", blob)
    assert isinstance(toks, list)
    spans, tags = _doc_spans("u", blob)
    assert isinstance(spans, list) and isinstance(tags, list)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=512))
def test_text_functions_total(s):
    # total functions: defined for every string, deterministic
    assert get_pattern(s) == get_pattern(s)
    assert normalize_text(s) == normalize_text(s)
    phrases, intra, extra = find_ref_results(None, s)
    assert isinstance(phrases, list)
    assert all(isinstance(t, tuple) and len(t) == 2 for t in extra)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_real_docs_roundtrip_and_span_group_invariants(i):
    doc = build_doc(i)
    html = render_html(doc)
    toks = _parse_tokens(doc.url, html)
    assert toks, "every generated doc has tokens"
    spans, tags = _doc_spans(doc.url, html)
    groups = [g for g, _, _, _ in spans]
    # group ids are 1..n in order, labels from the vocabulary, text non-empty
    assert groups == list(range(1, len(groups) + 1))
    assert all(text for _, _, text, _ in spans)
    assert all(own is None or own == own.lower() for _, _, _, own in spans)
