"""Transformer text classifier (SURVEY §2.9 M6): the reference's
line/statement classification experiment (``NLP/transformers_tkb.ipynb``
— SciBERT/BERT/DistilBERT via ktrain, maxlen=100, 80/20 stratified
split with random_state=42, balanced classes) re-expressed as a
FROM-SCRATCH numpy transformer encoder, because no TF/torch/HF stack
exists in this image and the notebook itself is an offline experiment,
not a pipeline stage.

Faithful in kind, smaller in scale: token embedding + sinusoidal
positions -> one pre-norm-free encoder block (single-head scaled
dot-product self-attention with padding mask + residual, ELU FFN +
residual) -> masked mean-pool -> dense softmax head; Adam on
cross-entropy. (The notebook fine-tunes 110M-parameter pretrained
encoders; this twin trains ~100k parameters from scratch — the gate is
the evaluation protocol and the attention/backprop math, checked by
finite differences, not pretrained-weight replay.)

Dataset: the corpus's span texts (theorem/lemma/... statements, proofs)
plus non-span filler lines as the negative class — the same kind of
"texts, labels" frame the notebook loads from its CSV.
"""

from __future__ import annotations

import numpy as np

MAXLEN = 32
PAD, UNK = 0, 1


# --------------------------------------------------------------- dataset


def span_dataset(n_docs: int = 40, seed: int = 42) -> list[tuple[str, str]]:
    """[(text, label)] from the deterministic corpus: one row per
    labeled span (label = theorem/lemma/.../proof/definition), plus the
    in-between filler runs as 'other' — the balanced 'texts, labels'
    frame of the reference notebook."""
    from ..corpus.generator import build_corpus, render_html
    from ..pipeline.extract import _parse_tokens
    from .crf import CLASSES, gold_bio

    rows: list[tuple[str, str]] = []
    for doc, _targets in build_corpus(n_docs, seed):
        if doc.lang != "en":
            continue
        toks = _parse_tokens(doc.url, render_html(doc))
        texts = [t[5] for t in toks]
        line = [t[3] for t in toks]
        word = [t[4] for t in toks]
        italic = [bool(t[11]) for t in toks]
        bold = [bool(t[13]) for t in toks]
        tags = gold_bio(list(zip(line, word, texts, italic, bold)))
        cur_label, cur_words = None, []
        for text, tag in zip(texts, tags):
            if tag.startswith("B-"):
                if cur_words:
                    rows.append((" ".join(cur_words), cur_label or "other"))
                cur_label, cur_words = tag[2:], [text]
            elif tag == "I":
                cur_words.append(text)
            else:  # O
                if cur_label is not None:
                    rows.append((" ".join(cur_words), cur_label))
                    cur_label, cur_words = None, []
                cur_words.append(text)
                if len(cur_words) >= MAXLEN:  # cap filler runs
                    rows.append((" ".join(cur_words), "other"))
                    cur_words = []
        if cur_words:
            rows.append((" ".join(cur_words), cur_label or "other"))
    return rows


def stratified_split(rows, test_size: float = 0.2, seed: int = 42):
    """The notebook's protocol: 80/20 stratified by label,
    random_state=42 (deterministic numpy shuffle per class)."""
    rng = np.random.default_rng(seed)
    by_label: dict[str, list] = {}
    for r in rows:
        by_label.setdefault(r[1], []).append(r)
    train, test = [], []
    for label in sorted(by_label):
        items = by_label[label]
        idx = rng.permutation(len(items))
        n_test = max(1, int(round(len(items) * test_size)))
        test.extend(items[i] for i in idx[:n_test])
        train.extend(items[i] for i in idx[n_test:])
    return train, test


def _encode(text: str, vocab: dict[str, int]) -> np.ndarray:
    ids = [vocab.get(w, UNK) for w in text.lower().split()[:MAXLEN]]
    out = np.full(MAXLEN, PAD, dtype=np.int64)
    out[: len(ids)] = ids
    return out


# ---------------------------------------------------------------- model


def _softmax_last(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def _elu(x):
    # expm1 evaluated only on the non-positive branch: np.where computes
    # both branches eagerly, and expm1 on large positives overflows
    return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))


def _elu_grad(x, y):
    return np.where(x > 0, 1.0, y + 1.0)


class TransformerClassifier:
    def __init__(self, vocab, classes, d: int = 32, ffn: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        v = max(vocab.values()) + 1
        self.vocab, self.classes = vocab, classes
        self.d = d
        g = lambda *shape: rng.normal(0.0, 0.08, shape)  # noqa: E731
        self.Emb = g(v, d)
        self.Wq, self.Wk, self.Wv = g(d, d), g(d, d), g(d, d)
        self.U1, self.c1 = g(d, ffn), np.zeros(ffn)
        self.U2, self.c2 = g(ffn, d), np.zeros(d)
        self.Wo, self.bo = g(d, len(classes)), np.zeros(len(classes))
        pos = np.arange(MAXLEN)[:, None] / (
            10000 ** (np.arange(0, d, 2)[None, :] / d)
        )
        self.P = np.zeros((MAXLEN, d))
        self.P[:, 0::2] = np.sin(pos)
        self.P[:, 1::2] = np.cos(pos)

    def params(self):
        return [
            self.Emb, self.Wq, self.Wk, self.Wv,
            self.U1, self.c1, self.U2, self.c2, self.Wo, self.bo,
        ]

    def _forward(self, ids: np.ndarray):
        mask = (ids != PAD).astype(np.float64)  # (B, L)
        X = self.Emb[ids] + self.P[None, :, :]
        X = X * mask[:, :, None]
        Q, K, V = X @ self.Wq, X @ self.Wk, X @ self.Wv
        S = (Q @ K.transpose(0, 2, 1)) / np.sqrt(self.d)
        S = S - 1e9 * (1.0 - mask[:, None, :])  # mask keys
        A = _softmax_last(S)
        H = A @ V
        X2 = X + H
        A1 = X2 @ self.U1 + self.c1
        F1 = _elu(A1)
        F2 = F1 @ self.U2 + self.c2
        X3 = X2 + F2
        # clamp: an all-PAD row (whitespace-only text) has mask.sum()==0
        # and would NaN the pool, loss, and every gradient downstream
        denom = np.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        pool = (X3 * mask[:, :, None]).sum(axis=1) / denom
        logits = pool @ self.Wo + self.bo
        return mask, X, Q, K, V, A, X2, A1, F1, X3, denom, pool, logits

    def predict(self, ids: np.ndarray) -> np.ndarray:
        return np.argmax(self._forward(ids)[-1], axis=1)

    def loss_grads(self, ids: np.ndarray, y: np.ndarray):
        B = len(ids)
        mask, X, Q, K, V, A, X2, A1, F1, X3, denom, pool, logits = self._forward(ids)
        p = _softmax_last(logits)
        loss = float(-np.log(p[np.arange(B), y] + 1e-300).mean())

        dlogits = p
        dlogits[np.arange(B), y] -= 1.0
        dlogits /= B
        dWo = pool.T @ dlogits
        dbo = dlogits.sum(axis=0)
        dpool = dlogits @ self.Wo.T  # (B, d)
        dX3 = (dpool / denom)[:, None, :] * mask[:, :, None]

        # FFN (residual)
        dF2 = dX3
        dU2 = np.einsum("blf,bld->fd", F1, dF2)
        dc2 = dF2.sum(axis=(0, 1))
        dF1 = dF2 @ self.U2.T
        dA1 = dF1 * _elu_grad(A1, F1)
        dU1 = np.einsum("bld,blf->df", X2, dA1)
        dc1 = dA1.sum(axis=(0, 1))
        dX2 = dX3 + dA1 @ self.U1.T

        # attention (residual)
        dH = dX2
        dA = dH @ V.transpose(0, 2, 1)
        dV = A.transpose(0, 2, 1) @ dH
        dS = A * (dA - (dA * A).sum(axis=-1, keepdims=True))
        dS /= np.sqrt(self.d)
        dQ = dS @ K
        dK = dS.transpose(0, 2, 1) @ Q
        dX = dX2 + dQ @ self.Wq.T + dK @ self.Wk.T + dV @ self.Wv.T
        dWq = np.einsum("bld,ble->de", X, dQ)
        dWk = np.einsum("bld,ble->de", X, dK)
        dWv = np.einsum("bld,ble->de", X, dV)

        dX = dX * mask[:, :, None]
        dEmb = np.zeros_like(self.Emb)
        np.add.at(dEmb, ids.ravel(), dX.reshape(-1, self.d))
        grads = (dEmb, dWq, dWk, dWv, dU1, dc1, dU2, dc2, dWo, dbo)
        return loss, grads


def train_transformer(
    n_docs: int = 40,
    seed: int = 42,
    max_epochs: int = 120,
    lr: float = 2e-3,
    batch: int = 64,
) -> dict:
    """Train on the corpus span dataset under the notebook's protocol
    (80/20 stratified, random_state=42) and report held-out accuracy."""
    rows = span_dataset(n_docs, seed)
    # the notebook's frame is balanced ("we can see the data is
    # balanced"); the corpus's filler class dominates raw span rows, so
    # cap it at 2x the largest labeled class (deterministic subsample)
    labeled_max = max(
        sum(1 for _t, l in rows if l == c)
        for c in {l for _t, l in rows if l != "other"}
    )
    rng0 = np.random.default_rng(seed)
    other = [r for r in rows if r[1] == "other"]
    keep = set(rng0.permutation(len(other))[: 2 * labeled_max])
    oi = iter(range(len(other)))
    rows = [r for r in rows if r[1] != "other"] + [
        r for r in other if next(oi) in keep
    ]
    train_rows, test_rows = stratified_split(rows)
    classes = sorted({r[1] for r in rows})
    cls_idx = {c: i for i, c in enumerate(classes)}
    vocab: dict[str, int] = {"<pad>": PAD, "<unk>": UNK}
    for text, _l in train_rows:
        for w in text.lower().split()[:MAXLEN]:
            if w not in vocab:
                vocab[w] = len(vocab)

    Xtr = np.stack([_encode(t, vocab) for t, _ in train_rows])
    ytr = np.array([cls_idx[l] for _, l in train_rows])
    Xte = np.stack([_encode(t, vocab) for t, _ in test_rows])
    yte = np.array([cls_idx[l] for _, l in test_rows])

    model = TransformerClassifier(vocab, classes, seed=7)
    ms = [np.zeros_like(p) for p in model.params()]
    vs = [np.zeros_like(p) for p in model.params()]
    b1, b2, eps, t = 0.9, 0.999, 1e-8, 0
    rng = np.random.default_rng(seed)
    last_loss = float("inf")
    for epoch in range(max_epochs):
        order = rng.permutation(len(Xtr))
        total, nb = 0.0, 0
        for s0 in range(0, len(order), batch):
            sel = order[s0 : s0 + batch]
            loss, grads = model.loss_grads(Xtr[sel], ytr[sel])
            total += loss
            nb += 1
            t += 1
            for p, g, m_s, v_s in zip(model.params(), grads, ms, vs):
                m_s *= b1
                m_s += (1 - b1) * g
                v_s *= b2
                v_s += (1 - b2) * g * g
                p -= lr * (m_s / (1 - b1**t)) / (np.sqrt(v_s / (1 - b2**t)) + eps)
        last_loss = total / nb
        if last_loss < 1e-3 and (model.predict(Xtr) == ytr).all():
            break
    acc_tr = float((model.predict(Xtr) == ytr).mean())
    acc_te = float((model.predict(Xte) == yte).mean())
    return {
        "kind": "transformer-classifier",
        "version": 1,
        "classes": classes,
        "vocab_size": len(vocab),
        "n_train": len(Xtr),
        "n_test": len(Xte),
        "epochs": epoch + 1,
        "loss": last_loss,
        "train_acc": acc_tr,
        "test_acc": acc_te,
        "model": model,
    }
