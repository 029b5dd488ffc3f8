"""LSTM text classifier (SURVEY §2.9 M6, second sub-variant): the
reference's LSTM line/statement classification experiment
(``NLP/lstm_tkb_full.ipynb`` — keras Embedding -> LSTM -> Dense softmax,
80/20 split) re-expressed as a FROM-SCRATCH numpy LSTM, because no
TF/torch stack exists in this image and the notebook is an offline
experiment, not a pipeline stage.

Faithful in kind, smaller in scale: token embedding -> single-layer
LSTM with padding mask (PAD steps carry h/c through unchanged — keras'
mask_zero semantics) -> dense softmax head on the MASKED MEAN of the
hidden states (the keras masked-GlobalAveragePooling1D readout); Adam
on cross-entropy. Exact backprop through time, gated by central finite
differences.

Readout note (round 5): the original final-state readout measured 0.86
held-out on the v2 corpus — the span head tokens ("Theorem 2.3.") are
the ONLY informative positions and their signal must survive ~MAXLEN
recurrence steps of pure-noise body words to reach a final-state head;
train accuracy stayed 1.0 (memorized body embeddings), held-out
collapsed. Mean pooling gives every timestep a direct gradient path to
the classifier and restores >= 0.95 held-out under the same protocol.

Shares the dataset, split protocol, and encoding with the transformer
twin (ml/textformer.py): corpus span texts + capped filler as 'other',
80/20 stratified random_state=42.
"""

from __future__ import annotations

import numpy as np

from .textformer import MAXLEN, PAD, UNK, _encode, span_dataset, stratified_split


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class LSTMClassifier:
    """Embedding (v, d) -> LSTM(H) -> Dense(C). Gate layout in the fused
    pre-activation z = x@Wx + h@Wh + b is [i | f | g | o]."""

    def __init__(self, vocab, classes, d: int = 32, hidden: int = 64, seed: int = 0):
        rng = np.random.default_rng(seed)
        v = max(vocab.values()) + 1
        self.vocab, self.classes = vocab, classes
        self.d, self.H = d, hidden
        g = lambda *shape: rng.normal(0.0, 0.08, shape)  # noqa: E731
        self.Emb = g(v, d)
        self.Wx = g(d, 4 * hidden)
        self.Wh = g(hidden, 4 * hidden)
        self.b = np.zeros(4 * hidden)
        # forget-gate bias 1.0: the standard init that keeps early
        # gradients flowing through the cell path
        self.b[hidden : 2 * hidden] = 1.0
        self.Wo = g(hidden, len(classes))
        self.bo = np.zeros(len(classes))

    def params(self):
        return [self.Emb, self.Wx, self.Wh, self.b, self.Wo, self.bo]

    def _forward(self, ids: np.ndarray):
        B, L = ids.shape
        H = self.H
        mask = (ids != PAD).astype(np.float64)  # (B, L)
        X = self.Emb[ids]  # (B, L, d)
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        steps = []
        hsum = np.zeros((B, H))
        for t in range(L):
            m = mask[:, t][:, None]
            z = X[:, t] @ self.Wx + h @ self.Wh + self.b
            i = _sigmoid(z[:, :H])
            f = _sigmoid(z[:, H : 2 * H])
            gg = np.tanh(z[:, 2 * H : 3 * H])
            o = _sigmoid(z[:, 3 * H :])
            c_full = f * c + i * gg
            tc = np.tanh(c_full)
            h_full = o * tc
            h_new = m * h_full + (1.0 - m) * h
            c_new = m * c_full + (1.0 - m) * c
            steps.append((m, i, f, gg, o, c, h, tc))
            h, c = h_new, c_new
            hsum += h * m  # masked mean-pool accumulator
        lens = np.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        hbar = hsum / lens
        logits = hbar @ self.Wo + self.bo
        return mask, X, steps, (hbar, lens), logits

    def predict(self, ids: np.ndarray) -> np.ndarray:
        return np.argmax(self._forward(ids)[-1], axis=1)

    def loss_grads(self, ids: np.ndarray, y: np.ndarray):
        B, L = ids.shape
        H = self.H
        mask, X, steps, (hbar, lens), logits = self._forward(ids)
        m_ = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - m_)
        p = e / e.sum(axis=1, keepdims=True)
        loss = float(-np.log(p[np.arange(B), y] + 1e-300).mean())

        dlogits = p
        dlogits[np.arange(B), y] -= 1.0
        dlogits /= B
        dWo = hbar.T @ dlogits
        dbo = dlogits.sum(axis=0)

        dEmb = np.zeros_like(self.Emb)
        dWx = np.zeros_like(self.Wx)
        dWh = np.zeros_like(self.Wh)
        db = np.zeros_like(self.b)
        # mean-pool: every masked timestep's post-mask h feeds the head
        # with weight m_t / len, PLUS the usual carry from step t+1
        dhbar = dlogits @ self.Wo.T
        dh = np.zeros((B, H))
        dc = np.zeros((B, H))
        for t in range(L - 1, -1, -1):
            m, i, f, gg, o, c_prev, h_prev, tc = steps[t]
            dh = dh + dhbar * (m / lens)
            # post-mask state: s_t = m*s_full + (1-m)*s_{t-1}
            dh_full = dh * m
            dh_carry = dh * (1.0 - m)
            dc_full = dh_full * o * (1.0 - tc * tc) + dc * m
            dc_carry = dc * (1.0 - m)
            do = dh_full * tc
            di = dc_full * gg
            df = dc_full * c_prev
            dg = dc_full * i
            dz = np.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - gg * gg),
                    do * o * (1.0 - o),
                ],
                axis=1,
            )
            dWx += X[:, t].T @ dz
            dWh += h_prev.T @ dz
            db += dz.sum(axis=0)
            np.add.at(dEmb, ids[:, t], dz @ self.Wx.T)
            dh = dh_carry + dz @ self.Wh.T
            dc = dc_full * f + dc_carry
        return loss, (dEmb, dWx, dWh, db, dWo, dbo)


def train_lstm(
    n_docs: int = 40,
    seed: int = 42,
    max_epochs: int = 400,
    lr: float = 4e-3,
    batch: int = 64,
) -> dict:
    """Train on the corpus span dataset under the notebook's protocol
    (80/20 stratified, random_state=42, filler capped at 2x the largest
    labeled class — identical frame to train_transformer) and report
    held-out accuracy."""
    rows = span_dataset(n_docs, seed)
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

    model = LSTMClassifier(vocab, classes, seed=7)
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
        "kind": "lstm-classifier",
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
