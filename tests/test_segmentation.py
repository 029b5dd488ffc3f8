"""Distributed U-Net inference (operators/segmentation.py).

Mirrors the reference's in-pipeline CNN application
(Styling/src/lib/extractors/cnn.py:96-126): the trained net runs over
extracted tokens inside the DataFrame pipeline, not as an offline
script. Both tests skip when the full-training artifact is not shipped.
"""

import json
from pathlib import Path

import pytest

ART_DIR = Path(__file__).resolve().parent.parent / "theoremkb_spark" / "ml" / "artifacts"


def _require_artifact():
    if not (ART_DIR / "unet_full.npz").exists():
        pytest.skip("full-training U-Net artifact not shipped")


def test_segment_tokens_matches_local_twin(spark):
    """The Spark applier must reproduce the local raster->forward->vote
    pipeline EXACTLY per token (same rasterize_page, same weights), for
    every page of a small corpus — proves the plumbing (grouping, Arrow
    transfer, broadcast rebuild) adds nothing and loses nothing."""
    _require_artifact()
    from theoremkb_spark.corpus.generator import build_corpus, render_html
    from theoremkb_spark.functions.text import RESULT_LABELS, get_pattern
    from theoremkb_spark.ml.unet import load_unet, rasterize_page, vote_decode
    from theoremkb_spark.operators.segmentation import segment_tokens
    from theoremkb_spark.pipeline.extract import _parse_tokens, extract_tokens, load_pages

    n_docs = 4
    seg_rows = segment_tokens(extract_tokens(load_pages(spark, n_docs))).collect()
    got = {
        (r.url, r.page, r.block, r.line, r.word): r.seg_class for r in seg_rows
    }
    assert len(got) == len(seg_rows)  # (url,page,block,line,word) keys a token

    net = load_unet(str(ART_DIR / "unet_full.npz"))
    label_set = frozenset(RESULT_LABELS)
    want = {}
    for doc, _t in build_corpus(n_docs):
        if doc.lang != "en":
            continue
        toks = _parse_tokens(doc.url, render_html(doc))
        for pg in sorted({t[1] for t in toks}):
            sel = [t for t in toks if t[1] == pg]
            pats = [get_pattern(t[5]) for t in sel]
            geom = [
                (t[6], t[7], t[8], t[9], bool(t[13]), bool(t[11]),
                 p in label_set, p == "proof")
                for t, p in zip(sel, pats)
            ]
            img, boxes = rasterize_page(geom)
            cls = vote_decode(net.forward(img[None])[0], boxes)
            for t, c in zip(sel, cls):
                want[(t[0], t[1], t[2], t[3], t[4])] = c

    assert len(got) == len(want) > 0
    diffs = [k for k in want if got[k] != want[k]]
    assert not diffs, (len(diffs), diffs[:5])
    assert set(got.values()) <= {0, 1, 2}


def test_shipped_unet_generalizes_cross_seed():
    """Accuracy gate on DOCUMENTS THE MODEL NEVER SAW IN ANY SPLIT: a
    seed-7 corpus (different titles, bodies, span placements from the
    seed-42 training corpus). Token vote accuracy vs gold >= 0.9 — a
    stronger generalization claim than the held-out split, at eval-only
    cost."""
    _require_artifact()
    meta = json.loads((ART_DIR / "unet_full.json").read_text())
    assert meta["seed"] == 42  # the cross-seed claim below depends on this

    from theoremkb_spark.ml.unet import load_unet, render_pages, vote_decode

    net = load_unet(str(ART_DIR / "unet_full.npz"))
    pages = render_pages(12, seed=7, max_pages_per_doc=8)
    good = total = 0
    for img, _m, boxes in pages:
        pred = vote_decode(net.forward(img[None])[0], boxes)
        for p, (_, _, _, _, g) in zip(pred, boxes):
            good += int(p == g)
            total += 1
    acc = good / total
    assert acc >= 0.9, (acc, total)


def test_segments_to_spans_matches_sequential_twin(spark):
    """The gaps-islands rollup vs a plain sequential pass over the SAME
    per-token classes in reading order (block, line, word): identical
    span sets, and exactly one exchange in the rollup's plan (the window
    partitioning is reused by the group-by)."""
    _require_artifact()
    import re

    from theoremkb_spark.operators.segmentation import (
        segment_tokens, segments_to_spans,
    )
    from theoremkb_spark.pipeline.extract import extract_tokens, load_pages

    seg = segment_tokens(extract_tokens(load_pages(spark, 6))).cache()
    try:
        rows = sorted(
            seg.collect(), key=lambda r: (r.url, r.page, r.block, r.line, r.word)
        )
        want = set()
        cur = None  # [(url, page, cls), start, end, n]
        for r in rows:
            key = (r.url, r.page, r.seg_class)
            pos = (r.block, r.line, r.word)
            if cur is not None and cur[0] != key:
                if cur[0][2] != 0:
                    want.add((*cur[0][:2], cur[0][2], *cur[1], *cur[2], cur[3]))
                cur = None
            if cur is None:
                cur = [key, pos, pos, 1]
            else:
                cur[2] = pos
                cur[3] += 1
        if cur is not None and cur[0][2] != 0:
            want.add((*cur[0][:2], cur[0][2], *cur[1], *cur[2], cur[3]))

        spans = segments_to_spans(seg)
        got = {
            (r.url, r.page, r.seg_class,
             r.block_start, r.line_start, r.word_start,
             r.block_end, r.line_end, r.word_end, r.n_tokens)
            for r in spans.collect()
        }
        assert got == want, (len(got), len(want))

        # the rollup adds exactly ONE exchange key beyond segment_tokens'
        # own (url, page) repartition: the window's identical hash —
        # grouped-Pandas output doesn't advertise partitioning, and the
        # aggregate reuses the window's. Normalize away expr-ids and AQE
        # stage re-listings before counting.
        plan = spans._jdf.queryExecution().executedPlan().toString()
        keys = {
            re.sub(r"#\d+", "", m)
            for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        }
        assert len(keys) <= 2, keys
        for op in ("Join", "Cartesian"):
            assert op not in plan, op
    finally:
        seg.unpersist()
