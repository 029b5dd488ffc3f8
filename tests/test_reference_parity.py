"""De-circularized text-function parity: run the REFERENCE's own
mention-mining functions (Styling/tools/theoremdb/extract_graph.py:21-130,
exec'd from the reference tree with its own LIST_RESULTS) against
``theoremkb_spark/functions/text.py`` over every span text the corpus
generates.

Adjudicated, frozen deltas (each asserted structurally below rather than
papered over):

* find_thm_proof — the repo ADDS the unbracketed webtext form
  ("Proof of Theorem 5.2" without the instrumented-PDF brackets); the
  reference returns None there and falls through to its lastThm
  fallback (extract_graph.py:247-254). Parity therefore holds at the
  RESOLVED-target level (explicit-or-lastThm), which is what the
  pipeline consumes — asserted exactly here.
* casing — the reference lowercases single refs (c[4].lower(),
  extract_graph.py:78,107) but keeps the matched keyword case for
  expanded multi-refs (:76,105); the repo lowercases everywhere because
  entity ids are case-normalized downstream. Compared lowercased.
* occurrences — the reference re-scans every occurrence of a phrase via
  a context findall (:65-69) and classifies each; the repo classifies
  the first occurrence of each distinct phrase. After the set() dedup
  both sides apply (:270-271), this can differ only when the same
  phrase recurs in one span with different link contexts; the corpus
  delta count is asserted == 0, i.e. measured, not assumed.
"""

from __future__ import annotations

import ast
import re

import pytest

from theoremkb_spark.corpus.generator import build_corpus
from theoremkb_spark.corpus.oracle import assemble_span_text, detect_spans
from theoremkb_spark.functions.text import (
    RESULT_KEYWORDS,
    find_ref_results,
    find_thm_proof,
    find_thm_start,
    normalize_text,
)

REF_ROOT = "/root/reference/Styling"
N_DOCS = 150


def _reference_list_results() -> list[str]:
    """Parse LIST_RESULTS out of the reference config as a literal —
    no import of the reference package (it drags in path side effects)."""
    src = open(f"{REF_ROOT}/tools/config/__init__.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "LIST_RESULTS" for t in node.targets
        ):
            return ast.literal_eval(node.value)
    raise AssertionError("LIST_RESULTS not found in reference config")


@pytest.fixture(scope="module")
def ref():
    """The reference's own normalize/find_thm_start/find_thm_proof/
    find_ref_results, exec'd from its source with import lines stripped
    (the module's heavy deps — joblib, the package-relative db/features
    modules — are only needed by the functions BELOW the cut point)."""
    src = open(f"{REF_ROOT}/tools/theoremdb/extract_graph.py").read()
    cut = src.index("# df -> results list")
    head = src[:cut]
    kept = []
    for line in head.splitlines():
        s = line.strip()
        if s.startswith(("import ", "from ")) or "LIST_RESULTS.extend" in line:
            continue
        kept.append(line)
    ns: dict = {"re": re, "unicodedata": __import__("unicodedata")}
    list_results = _reference_list_results() + ["thm.", "lem.", "prop."]
    ns["LIST_RESULTS"] = list_results
    exec(compile("\n".join(kept), "reference/extract_graph.py", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def span_texts():
    out = []
    for doc, _targets in build_corpus(N_DOCS):
        if doc.lang != "en":
            continue
        for _group, label, block in detect_spans(doc):
            out.append((doc.url, label, assemble_span_text(block)))
    assert len(out) > 500  # non-trivial surface
    return out


def test_keyword_list_matches_reference(ref):
    assert list(RESULT_KEYWORDS) == ref["LIST_RESULTS"]


def test_normalize_and_thm_start_parity(ref, span_texts):
    deltas = []
    for url, _label, text in span_texts:
        if ref["normalize"](text) != normalize_text(text):
            deltas.append(("normalize", url, text[:60]))
        if (ref["find_thm_start"](text) or None) != find_thm_start(text):
            deltas.append(("thm_start", url, text[:60]))
    assert not deltas, deltas[:5]


def test_proof_target_parity_resolved(ref, span_texts):
    """Explicit-or-lastThm resolved target, per document in reading
    order — the quantity the pipeline consumes (adjudicated delta:
    the repo's unbracketed 'Proof of X' form, see module docstring)."""
    deltas = []
    last_by_url: dict[str, str | None] = {}
    for url, label, text in span_texts:
        if label == "proof":
            mine = find_thm_proof(text) or last_by_url.get(url)
            theirs = ref["find_thm_proof"](text) or last_by_url.get(url)
            if (mine or "").lower() != (theirs or "").lower():
                deltas.append((url, text[:80], mine, theirs))
        else:
            last_by_url[url] = find_thm_start(text)
    assert not deltas, deltas[:5]


def test_find_ref_results_parity(ref, span_texts):
    """Set-level parity of mined references (lowercased — frozen casing
    delta) over every corpus span text. Delta count must be ZERO: the
    first-occurrence-only simplification is measured safe on this
    corpus, not assumed."""
    deltas = []
    for url, label, text in span_texts:
        if label == "proof":
            own = find_thm_proof(text)
        else:
            own = find_thm_start(text)
        _p, intra_m, extra_m = find_ref_results(own, text)
        _r, intra_r, extra_r = ref["find_ref_results"](own, text)
        mine = ({s.lower() for s in intra_m}, {(t, n.lower()) for t, n in extra_m})
        theirs = ({s.lower() for s in intra_r}, {(t, n.lower()) for t, n in extra_r})
        if mine != theirs:
            deltas.append((url, text[:80], mine, theirs))
    assert not deltas, f"{len(deltas)} deltas, first 3: {deltas[:3]}"
