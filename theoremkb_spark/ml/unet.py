"""U-Net page segmentation (SURVEY §2.9 M4): the reference's
CNNExtractor/CNNTagger (``Styling/src/lib/extractors/cnn.py``,
``models/cnn.py::unet``) reimplemented from scratch in numpy.

The reference renders each PDF page to a raster, runs a U-Net
(Conv2D/MaxPool/UpSampling with skip concatenations, softmax per pixel)
and then decodes per-token labels by majority vote of the pixels inside
each token's bounding box (cnn.py:96-126 ``_labels_to_annots``). This
twin keeps every piece of that shape:

* **render**: pages rasterized from the extracted token geometry
  (hpos/vpos/width/height) into (size, size, 3) images — channel 0 ink,
  1 bold, 2 italic — exactly the no-external-data analogue of
  ``paper.render()``;
* **segment**: a 3-level U-Net (conv3x3 stacks, 4x/4x/2x max-pools,
  nearest up-samples, skip concats, 1x1 softmax head — the reference
  pools 4x three times at render_size 512; three levels at render_size
  96 give a page-spanning receptive field) with exact im2col backprop;
* **decode**: per-token argmax over summed in-box class probabilities,
  label O when the background class wins — the reference's vote rule.

Classes: 0 = background/other, 1 = result statement (theorem/lemma/...),
2 = proof. Training: Adam on class-weighted per-pixel cross-entropy
against masks painted from the rule-gold span boxes.
"""

from __future__ import annotations

import numpy as np

# Raster size. 96 since round 4: with the paragraph-gap corpus geometry
# (30 lines + inter-block leading per page) a text line maps to ~2.1 px
# and a block gap to ~4.3 px — both unambiguous — where 64 px left the
# gap at 1-2 rows against ~1.4 px line pitch (rounding jitter made the
# two indistinguishable and capped held-out vote accuracy at ~0.8).
# Must stay divisible by 32 (4x, 4x, 2x pools).
SIZE = 96
N_SEG_CLASSES = 3  # background / result-statement / proof


# --------------------------------------------------------------- layers


def _im2col(X: np.ndarray, k: int) -> np.ndarray:
    b, h, w, c = X.shape
    p = k // 2
    # np.zeros + assign, NOT np.pad/np.empty: fresh C-allocated outputs
    # fault their pages one-by-one on this host (measured 50x slower)
    Xp = np.zeros((b, h + 2 * p, w + 2 * p, c), dtype=X.dtype)
    Xp[:, p : p + h, p : p + w] = X
    cols = np.zeros((b, h, w, k * k * c), dtype=X.dtype)
    i = 0
    for dy in range(k):
        for dx in range(k):
            cols[..., i * c : (i + 1) * c] = Xp[:, dy : dy + h, dx : dx + w, :]
            i += 1
    return cols


def _col2im(dcols: np.ndarray, shape, k: int) -> np.ndarray:
    b, h, w, c = shape
    p = k // 2
    dXp = np.zeros((b, h + 2 * p, w + 2 * p, c), dtype=dcols.dtype)
    i = 0
    for dy in range(k):
        for dx in range(k):
            dXp[:, dy : dy + h, dx : dx + w, :] += dcols[..., i * c : (i + 1) * c]
            i += 1
    return dXp[:, p : p + h, p : p + w, :]


def _elu(x):
    # expm1 evaluated only on the non-positive branch: np.where computes
    # both branches eagerly, and expm1 on large positives overflows
    return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))


def _elu_grad(x, y):
    return np.where(x > 0, 1.0, y + 1.0)


class _Conv:
    """3x3 (or 1x1) same-padding conv + optional ELU, exact backprop."""

    def __init__(self, rng, c_in: int, c_out: int, k: int = 3, act: bool = True,
                 dtype=np.float32):
        self.k, self.act = k, act
        self.W = rng.normal(
            0.0, np.sqrt(2.0 / (k * k * c_in)), (k * k * c_in, c_out)
        ).astype(dtype)
        self.b = np.zeros(c_out, dtype=dtype)

    def forward(self, X):
        self._shape = X.shape
        self._cols = _im2col(X, self.k) if self.k > 1 else X[..., None, :].reshape(
            *X.shape[:3], -1
        )
        A = self._cols @ self.W + self.b
        Y = _elu(A) if self.act else A
        self._A, self._Y = A, Y
        return Y

    def backward(self, dY):
        dA = dY * _elu_grad(self._A, self._Y) if self.act else dY
        self.dW = np.tensordot(self._cols, dA, axes=([0, 1, 2], [0, 1, 2]))
        self.db = dA.sum(axis=(0, 1, 2))
        # pre-touched output buffer + out=: matmul's own fresh result
        # allocation pays the per-page fault storm (see _im2col note)
        dcols = np.zeros(self._cols.shape, dtype=self._cols.dtype)
        np.matmul(np.asarray(dA, dtype=self._cols.dtype), self.W.T, out=dcols)
        if self.k > 1:
            return _col2im(dcols, self._shape, self.k)
        return dcols.reshape(self._shape)

    def params_grads(self):
        return [(self.W, self.dW), (self.b, self.db)]


def _maxpool(X, f: int):
    b, h, w, c = X.shape
    Xr = X.reshape(b, h // f, f, w // f, f, c)
    Y = Xr.max(axis=(2, 4))
    mask = Xr == Y[:, :, None, :, None, :]
    # exact ties split the gradient equally (counts in _maxpool_back);
    # continuous conv outputs make ties vanishingly rare in practice
    return Y, mask, (b, h, w, c)


def _maxpool_back(dY, mask, shape, f: int):
    b, h, w, c = shape
    counts = mask.sum(axis=(2, 4), keepdims=True)
    dXr = mask / counts * dY[:, :, None, :, None, :]
    return dXr.reshape(b, h, w, c)


def _upsample(X, f: int):
    b, h, w, c = X.shape
    out = np.zeros((b, h * f, w * f, c), dtype=X.dtype)
    out.reshape(b, h, f, w, f, c)[...] = X[:, :, None, :, None, :]
    return out


def _upsample_back(dY, f: int):
    b, h, w, c = dY.shape
    return dY.reshape(b, h // f, f, w // f, f, c).sum(axis=(2, 4))


class UNetSegmenter:
    """3-level U-Net (round 4 — the reference pools three times at
    render_size 512; two levels at 96 px left the bottleneck's relative
    receptive field at 1/6 of the page, too short for span-extent
    decisions that reference the nearest styled opener many lines
    above): enc1(c_in->16,16) pool4 enc2(->32,32) pool4 enc3(->48,48)
    pool2 bottleneck(->64,64) up2+conv(->48) skip conv(->48,48)
    up4+conv(->32) skip conv(->32,32) up4+conv(->16) skip conv(->16,16)
    head 1x1 softmax. The third level runs on a (SIZE/16)^2 grid —
    negligible compute for a page-spanning receptive field. Input side
    must be divisible by 32."""

    def __init__(self, seed: int = 0, c_in: int = 3, dtype=np.float32):
        rng = np.random.default_rng(seed)
        self.dtype = dtype
        self.e1a = _Conv(rng, c_in, 16, dtype=dtype)
        self.e1b = _Conv(rng, 16, 16, dtype=dtype)
        self.e2a = _Conv(rng, 16, 32, dtype=dtype)
        self.e2b = _Conv(rng, 32, 32, dtype=dtype)
        self.e3a = _Conv(rng, 32, 48, dtype=dtype)
        self.e3b = _Conv(rng, 48, 48, dtype=dtype)
        self.ba = _Conv(rng, 48, 64, dtype=dtype)
        self.bb = _Conv(rng, 64, 64, dtype=dtype)
        self.u3 = _Conv(rng, 64, 48, dtype=dtype)
        self.d3a = _Conv(rng, 96, 48, dtype=dtype)
        self.d3b = _Conv(rng, 48, 48, dtype=dtype)
        self.u2 = _Conv(rng, 48, 32, dtype=dtype)
        self.d2a = _Conv(rng, 64, 32, dtype=dtype)
        self.d2b = _Conv(rng, 32, 32, dtype=dtype)
        self.u1 = _Conv(rng, 32, 16, dtype=dtype)
        self.d1a = _Conv(rng, 32, 16, dtype=dtype)
        self.d1b = _Conv(rng, 16, 16, dtype=dtype)
        self.head = _Conv(rng, 16, N_SEG_CLASSES, k=1, act=False, dtype=dtype)
        self.layers = [
            self.e1a, self.e1b, self.e2a, self.e2b, self.e3a, self.e3b,
            self.ba, self.bb, self.u3, self.d3a, self.d3b,
            self.u2, self.d2a, self.d2b, self.u1, self.d1a, self.d1b, self.head,
        ]

    def forward(self, X, drop_rng=None, p_drop: float = 0.25):
        """``drop_rng`` non-None enables bottleneck dropout (training
        only) — with ~100 training pages the unregularized net memorizes
        layouts (held-out vote accuracy DROPS with more epochs); the
        reference regularizes every conv (l1_l2(1e-2)) for the same
        reason."""
        X = np.asarray(X, dtype=self.dtype)
        s1 = self.e1b.forward(self.e1a.forward(X))
        p1, self._m1, self._s1shape = _maxpool(s1, 4)
        s2 = self.e2b.forward(self.e2a.forward(p1))
        p2, self._m2, self._s2shape = _maxpool(s2, 4)
        s3 = self.e3b.forward(self.e3a.forward(p2))
        p3, self._m3, self._s3shape = _maxpool(s3, 2)
        bt = self.bb.forward(self.ba.forward(p3))
        if drop_rng is not None:
            self._dropmask = (
                drop_rng.random(bt.shape) >= p_drop
            ).astype(self.dtype) / (1.0 - p_drop)
            bt = bt * self._dropmask
        else:
            self._dropmask = None
        up3 = self.u3.forward(_upsample(bt, 2))
        c3 = np.concatenate([s3, up3], axis=3)
        d3 = self.d3b.forward(self.d3a.forward(c3))
        up2 = self.u2.forward(_upsample(d3, 4))
        c2 = np.concatenate([s2, up2], axis=3)
        d2 = self.d2b.forward(self.d2a.forward(c2))
        up1 = self.u1.forward(_upsample(d2, 4))
        c1 = np.concatenate([s1, up1], axis=3)
        d1 = self.d1b.forward(self.d1a.forward(c1))
        logits = self.head.forward(d1)
        m = logits.max(axis=-1, keepdims=True)
        e = np.exp(logits - m)
        self._probs = e / e.sum(axis=-1, keepdims=True)
        return self._probs

    def loss_grads(self, X, gold, class_weights=None, drop_rng=None):
        """Weighted per-pixel cross-entropy; returns (loss, grads list)."""
        probs = self.forward(X, drop_rng=drop_rng)
        b, h, w, c = probs.shape
        if class_weights is None:
            class_weights = np.ones(c)
        wpix = class_weights[gold]  # (b, h, w)
        norm = wpix.sum()
        pg = probs[np.arange(b)[:, None, None], np.arange(h)[None, :, None],
                   np.arange(w)[None, None, :], gold]
        # clamp rather than add: a float32 pg swallows tiny addends by
        # underflow, so `pg + 1e-300` can still hit log(0)
        loss = float(-(wpix * np.log(np.maximum(pg, 1e-30))).sum() / norm)

        dlogits = probs * wpix[..., None]
        onehot = np.zeros_like(probs)
        onehot[np.arange(b)[:, None, None], np.arange(h)[None, :, None],
               np.arange(w)[None, None, :], gold] = 1.0
        dlogits -= onehot * wpix[..., None]
        dlogits /= norm

        d1 = self.head.backward(dlogits)
        dc1 = self.d1a.backward(self.d1b.backward(d1))
        ds1_a, dup1 = dc1[..., :16], dc1[..., 16:]
        dd2 = _upsample_back(self.u1.backward(dup1), 4)
        dc2 = self.d2a.backward(self.d2b.backward(dd2))
        ds2_a, dup2 = dc2[..., :32], dc2[..., 32:]
        dd3 = _upsample_back(self.u2.backward(dup2), 4)
        dc3 = self.d3a.backward(self.d3b.backward(dd3))
        ds3_a, dup3 = dc3[..., :48], dc3[..., 48:]
        dbt = _upsample_back(self.u3.backward(dup3), 2)
        if self._dropmask is not None:
            dbt = dbt * self._dropmask
        dp3 = self.ba.backward(self.bb.backward(dbt))
        ds3 = ds3_a + _maxpool_back(dp3, self._m3, self._s3shape, 2)
        dp2 = self.e3a.backward(self.e3b.backward(ds3))
        ds2 = ds2_a + _maxpool_back(dp2, self._m2, self._s2shape, 4)
        dp1 = self.e2a.backward(self.e2b.backward(ds2))
        ds1 = ds1_a + _maxpool_back(dp1, self._m1, self._s1shape, 4)
        self.e1a.backward(self.e1b.backward(ds1))

        grads = [pg_ for layer in self.layers for pg_ in layer.params_grads()]
        return loss, grads

    def params_grads(self):
        return [pg for layer in self.layers for pg in layer.params_grads()]


# ---------------------------------------------------- rendering + decode


def render_pages(n_docs: int = 24, seed: int = 42, size: int = SIZE,
                 with_doc_ids: bool = False,
                 max_pages_per_doc: int | None = None):
    """Deterministic page rasters from the extracted token geometry —
    the no-external-data analogue of the reference's ``paper.render()``,
    INCLUDING its second input: the reference paints a word-vocabulary
    raster next to the image (cnn.py::_to_features ``input_text`` —
    token pattern ids stamped into the token boxes); channels 3 and 4
    here are that input reduced to the two indicator families that
    matter (result-keyword pattern / proof-keyword pattern).
    Returns [(img (size,size,5), gold_mask (size,size) int8,
    boxes [(y0,y1,x0,x1,gold_cls)])] — one entry per page; with
    ``with_doc_ids=True`` also returns a parallel list of document
    indices so callers can split on document boundaries.

    ``max_pages_per_doc`` truncates each document to its first N pages.
    The corpus deliberately makes doc 0 a 30x long paper (the skew
    target for the join operators, generator.py::build_doc) — untruncated
    it contributes ~157 of a 24-doc corpus's 217 pages, so a page-count
    train/val/held split trains on essentially ONE document's layout
    (the round-4 post-mortem behind the 0.652 held-out collapse).
    Capping restores document diversity per training page."""
    from ..corpus.generator import build_corpus, render_html
    from ..functions.text import RESULT_LABELS, get_pattern
    from ..pipeline.extract import _parse_tokens
    from .crf import gold_bio

    label_set = frozenset(RESULT_LABELS)

    out = []
    doc_ids = []
    for doc_i, (doc, _targets) in enumerate(build_corpus(n_docs, seed)):
        if doc.lang != "en":
            continue
        toks = _parse_tokens(doc.url, render_html(doc))
        if not toks:
            continue
        texts = [t[5] for t in toks]
        line = [t[3] for t in toks]
        word = [t[4] for t in toks]
        italic = [bool(t[11]) for t in toks]
        bold = [bool(t[13]) for t in toks]
        tags = gold_bio(list(zip(line, word, texts, italic, bold)))
        pats = [get_pattern(t) for t in texts]
        # span label per token -> segmentation class
        cls = []
        open_lab = None
        for tag in tags:
            if tag.startswith("B-"):
                open_lab = tag[2:]
            elif tag != "I":
                open_lab = None
            cls.append(0 if open_lab is None else (2 if open_lab == "proof" else 1))

        pages = sorted({t[1] for t in toks})
        if max_pages_per_doc is not None:
            pages = pages[:max_pages_per_doc]
        for pg in pages:
            sel = [i for i, t in enumerate(toks) if t[1] == pg]
            if not sel:
                continue
            geom = [
                (
                    toks[i][6], toks[i][7], toks[i][8], toks[i][9],
                    bold[i], italic[i],
                    pats[i] in label_set, pats[i] == "proof",
                )
                for i in sel
            ]
            img, bxs = rasterize_page(geom, size)
            mask = np.zeros((size, size), dtype=np.int8)
            boxes = []
            for (y0, y1, x0, x1), i in zip(bxs, sel):
                mask[y0:y1, x0:x1] = cls[i]
                boxes.append((y0, y1, x0, x1, cls[i]))
            out.append((img, mask, boxes))
            doc_ids.append(doc_i)
    if with_doc_ids:
        return out, doc_ids
    return out


def rasterize_page(geom, size: int = SIZE):
    """The ONE page raster both the trainer (render_pages) and the
    distributed applier (operators/segmentation.py::segment_tokens)
    consume, so training and Spark-side inference can never drift:
    token boxes scaled to fill (size-1)^2, channels = ink / bold /
    italic / result-keyword pattern / proof-keyword pattern.

    geom: sequence of (x, y, w, h, bold, italic, is_result_pattern,
    is_proof_pattern) per token. Returns (img (size,size,5) float64,
    boxes [(y0, y1, x0, x1)] in input order)."""
    max_x = max((x + w for x, _y, w, _h, *_ in geom), default=0.0) or 1.0
    max_y = max((y + h for _x, y, _w, h, *_ in geom), default=0.0) or 1.0
    sx, sy = (size - 1) / max_x, (size - 1) / max_y
    img = np.zeros((size, size, 5))
    boxes = []
    for x, y, w, h, is_bold, is_italic, is_res, is_proof in geom:
        x0 = int(x * sx)
        x1 = max(x0 + 1, int((x + w) * sx))
        y0 = int(y * sy)
        y1 = max(y0 + 1, int((y + h) * sy))
        img[y0:y1, x0:x1, 0] = 1.0
        if is_bold:
            img[y0:y1, x0:x1, 1] = 1.0
        if is_italic:
            img[y0:y1, x0:x1, 2] = 1.0
        if is_res:
            img[y0:y1, x0:x1, 3] = 1.0
        if is_proof:
            img[y0:y1, x0:x1, 4] = 1.0
        boxes.append((y0, y1, x0, x1))
    return img, boxes


def vote_decode(probs: np.ndarray, boxes) -> list[int]:
    """The reference's _labels_to_annots vote rule: per token, sum class
    probabilities over the pixels of its box, argmax; background class
    wins -> O."""
    out = []
    for y0, y1, x0, x1, *_ in boxes:  # gold tail optional (inference boxes)
        votes = probs[y0:y1, x0:x1].sum(axis=(0, 1))
        out.append(int(np.argmax(votes)))
    return out


def _shift_batch(Xb, Yb, rng, max_dy: int = 3, max_dx: int = 3):
    """Per-sample random translation of image AND mask together,
    zero-filling the vacated border (shifted-in pixels are blank ink =
    background label, so every pixel stays consistent). Round-4
    post-mortem (BENCH/UNET_r04.json): the first version used np.roll
    with max shift 8 — at ~3 px line pitch that WRAPS 2-3 text lines
    across the page edge, planting span bodies whose styled opener sits
    at the opposite page border; trained on that, held-out vote accuracy
    collapsed to 0.652 vs 0.84 unaugmented. Off by default; enable via
    train_unet(augment=True)."""
    Xa = np.zeros_like(Xb)
    Ya = np.zeros_like(Yb)
    h, w = Xb.shape[1:3]
    for i in range(len(Xa)):
        dy = int(rng.integers(-max_dy, max_dy + 1))
        dx = int(rng.integers(-max_dx, max_dx + 1))
        ys, yd = (slice(0, h - dy), slice(dy, h)) if dy >= 0 else (
            slice(-dy, h), slice(0, h + dy))
        xs, xd = (slice(0, w - dx), slice(dx, w)) if dx >= 0 else (
            slice(-dx, w), slice(0, w + dx))
        Xa[i, yd, xd] = Xb[i, ys, xs]
        Ya[i, yd, xd] = Yb[i, ys, xs]
    return Xa, Ya


def train_unet(
    n_docs: int = 24,
    seed: int = 42,
    max_epochs: int = 60,
    lr: float = 2e-3,
    batch: int = 8,
    heldout_frac: float = 0.25,
    weight_decay: float = 1e-3,
    augment: bool = False,
    val_frac: float = 0.0,
    max_pages_per_doc: int | None = None,
    verbose: bool = False,
):
    """Train on the first (1 - heldout_frac) of pages, report token-level
    vote-decode accuracy on both splits.

    augment=True applies per-batch random shifts (_shift_batch).
    val_frac>0 carves a validation slice off the END of the training
    pages, evaluates validation vote accuracy every 5 epochs, and
    restores the best-validation snapshot before reporting — model
    selection never sees the held-out split. Both default off so the
    recorded round-4 numbers stay reproducible."""
    pages, doc_ids = render_pages(
        n_docs, seed, with_doc_ids=True, max_pages_per_doc=max_pages_per_doc
    )
    n_hold = max(1, int(len(pages) * heldout_frac))
    train_pages, held_pages = pages[:-n_hold], pages[-n_hold:]
    val_pages = []
    if val_frac > 0:
        # carve on a DOCUMENT boundary: a page-count carve leaves the
        # straddling document's earlier pages in train, so validation
        # measures within-doc generalization and over-reports (round-4
        # post-mortem: page-carved val 0.927 while truly-unseen held
        # pages scored 0.652 on the same model)
        n_val = max(1, int(len(train_pages) * val_frac))
        cut = len(train_pages) - n_val
        while cut > 0 and doc_ids[cut - 1] == doc_ids[cut]:
            cut -= 1
        if cut == 0:  # single-document corpus: page carve beats no train set
            cut = len(train_pages) - n_val
        train_pages, val_pages = train_pages[:cut], train_pages[cut:]
    X = np.stack([p[0] for p in train_pages])
    Y = np.stack([p[1] for p in train_pages]).astype(np.int64)
    weights = np.array([1.0, 6.0, 6.0])  # background dominates pixels

    net = UNetSegmenter(seed=7, c_in=5)
    params = [p for layer in net.layers for p in (layer.W, layer.b)]
    ms = [np.zeros_like(p) for p in params]
    vs = [np.zeros_like(p) for p in params]
    b1, b2, eps, t = 0.9, 0.999, 1e-8, 0
    rng = np.random.default_rng(seed)

    def token_acc(split, styled_only: bool = False):
        """styled_only=True restricts to tokens inside styled (bold or
        italic channel) boxes — the opener subset whose class is locally
        visible; the unstyled remainder measures span EXTENT, which
        requires the paragraph-gap/indent geometry the corpus carries
        since round 4 (before that, block pitch == line pitch made
        extent unrecoverable from pixels and capped the overall metric
        at 0.65). Splitting the metric keeps both numbers honest."""
        good = total = 0
        for img, _m, boxes in split:
            probs = net.forward(img[None])[0]
            pred = vote_decode(probs, boxes)
            for p, (y0, y1, x0, x1, g) in zip(pred, boxes):
                if styled_only and not (
                    img[y0:y1, x0:x1, 1].any() or img[y0:y1, x0:x1, 2].any()
                ):
                    continue
                good += int(p == g)
                total += 1
        return good / max(total, 1)

    last_loss = float("inf")
    best_val, best_snap, best_epoch = -1.0, None, -1
    for epoch in range(max_epochs):
        order = rng.permutation(len(X))
        total_l, nb = 0.0, 0
        for s0 in range(0, len(order), batch):
            sel = order[s0 : s0 + batch]
            Xb, Yb = X[sel], Y[sel]
            if augment:
                Xb, Yb = _shift_batch(Xb, Yb, rng)
            loss, grads = net.loss_grads(Xb, Yb, weights, drop_rng=rng)
            total_l += loss
            nb += 1
            t += 1
            # AdamW: decoupled weight decay stands in for the reference's
            # per-conv l1_l2 regularizers
            for (p, g), m_s, v_s in zip(grads, ms, vs):
                m_s *= b1
                m_s += (1 - b1) * g
                v_s *= b2
                v_s += (1 - b2) * g * g
                p -= lr * (
                    (m_s / (1 - b1**t)) / (np.sqrt(v_s / (1 - b2**t)) + eps)
                    + weight_decay * p
                )
        last_loss = total_l / nb
        if verbose:
            print(f"epoch {epoch + 1} loss {last_loss:.4f}", flush=True)
        if val_pages and epoch % 5 == 4:
            va = token_acc(val_pages)
            if verbose:
                print(f"epoch {epoch + 1} val_acc {va:.4f}", flush=True)
            if va > best_val:
                best_val, best_epoch = va, epoch + 1
                best_snap = [p.copy() for p in params]
        if epoch >= 9 and epoch % 5 == 4 and token_acc(train_pages) >= 0.999:
            if not val_pages:
                break
            if best_val >= 1.0:  # selection can't improve further
                break
    if best_snap is not None:
        for p, s in zip(params, best_snap):
            p[...] = s
    return {
        "kind": "unet-segmenter",
        "version": 1,
        "epochs": epoch + 1,
        "loss": last_loss,
        "n_train_pages": len(train_pages),
        "n_held_pages": len(held_pages),
        "n_val_pages": len(val_pages),
        "val_token_acc": best_val if val_pages else None,
        "selected_epoch": best_epoch if val_pages else None,
        "max_pages_per_doc": max_pages_per_doc,
        "train_token_acc": token_acc(train_pages),
        "held_token_acc": token_acc(held_pages),
        "held_styled_token_acc": token_acc(held_pages, styled_only=True),
        "model": net,
    }


def save_unet(net: UNetSegmenter, path: str) -> None:
    """Persist trained parameters as a compressed npz (keyed p00..pNN in
    ``params_grads`` order, which is fixed by the ``layers`` list). Full
    training is ~90 min on this host, so the shipped artifact is a
    committed file, unlike the seconds-scale CRF's train-once cache."""
    params = [p for layer in net.layers for p in (layer.W, layer.b)]
    np.savez_compressed(path, **{f"p{i:02d}": p for i, p in enumerate(params)})


def load_unet(path: str) -> UNetSegmenter:
    """Rebuild a UNetSegmenter from ``save_unet`` output."""
    data = np.load(path)
    return net_from_params([data[k] for k in sorted(data.files)])


def net_from_params(arrs) -> UNetSegmenter:
    """Rebuild a UNetSegmenter from an ordered parameter list (e.g. a
    Spark broadcast of the npz arrays — executors reconstruct from the
    broadcast, never from a file path that may not exist cluster-side).
    c_in is inferred from the first encoder conv's flattened-kernel rows
    (k=3 -> 9*c_in). Walks ``layers`` (W, b) pairs rather than
    ``params_grads`` so it works on a fresh net (grads don't exist
    before the first backward)."""
    c_in = arrs[0].shape[0] // 9
    net = UNetSegmenter(seed=0, c_in=c_in, dtype=arrs[0].dtype)
    params = [p for layer in net.layers for p in (layer.W, layer.b)]
    if len(params) != len(arrs):
        raise ValueError(f"artifact has {len(arrs)} arrays, model expects {len(params)}")
    for p, a in zip(params, arrs):
        if p.shape != a.shape:
            raise ValueError(f"shape mismatch: {p.shape} vs {a.shape}")
        p[...] = a
    return net
