"""Sequential oracles for the hash-based dedup + multimodal queries.

The driver's hard correctness gate needs a DuckDB-runnable oracle per
query. Three queries were rows-only in round 1 because their formulas
aren't SQL-expressible (`xxhash64` and md5-bit-vote SimHash have no
DuckDB twins; the byte-histogram featurizer needs byte-level access):

* ``dedup_minhash_lsh`` — MinHash+banded-LSH candidates, exact-Jaccard
  verified (operators/dedup.py::minhash_lsh_pairs);
* ``dedup_simhash``     — SimHash banding + hamming verification
  (operators/dedup.py::simhash_near_dups);
* ``multimodal_features`` — Arrow byte-histogram featurizer
  (operators/multimodal.py::extract_features).

Same discipline as the KG oracle (corpus/materialize.py): run a pure
sequential implementation of the same *semantics* — dict/set/loops,
zero Spark, zero imports from ``operators/`` — over the driver's
parquet tables and materialize the expected rows to parquet, so each
oracle becomes ``SELECT ... FROM '<parquet>' ORDER BY ...`` under the
same rows+schema+hash gate as every other query. The only shared
"code" is frozen *behavioral constants*: the XXH64 algorithm (public
spec; Spark's ``xxhash64`` builtin is its JVM implementation — the
Python twin below is verified byte-exact against Spark in
tests/test_operators.py) and md5 (hashlib).

Everything is deterministic; regeneration is cheap at test scale and
atomic (tmp file + os.replace).
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal, localcontext

# --------------------------------------------------------------- XXH64
# Pure-Python XXH64 (public algorithm, https://xxhash.com spec),
# matching Spark's `xxhash64(...)` chained-seed semantics exactly.

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _xxh64_int(i: int, seed: int) -> int:
    """XXH64 of a 4-byte int — Spark hashes IntegerType children this way."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _xxh64_long(l: int, seed: int) -> int:
    """XXH64 of an 8-byte long — Spark hashes LongType children this way
    (one full 8-byte round: k = rotl(l*P2, 31)*P1; h ^= k;
    h = rotl(h, 27)*P1 + P4; fmix)."""
    h = (seed + _P5 + 8) & _M
    k = _rotl((l & _M) * _P2 & _M, 31)
    h ^= (k * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def _xxh64_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        while n - off >= 32:
            for vi in range(4):
                w = int.from_bytes(data[off : off + 8], "little")
                v[vi] = (_rotl((v[vi] + w * _P2) & _M, 31) * _P1) & _M
                off += 8
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for x in v:
            h ^= (_rotl((x * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while n - off >= 8:
        w = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if n - off >= 4:
        w = int.from_bytes(data[off : off + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def spark_xxhash64(j: int, s: str, seed: int = 42) -> int:
    """Twin of Spark SQL ``xxhash64(CAST(j AS INT), s)``: the seed chains
    through the children (int literal first, then the UTF-8 string),
    returned as a signed 64-bit long like Spark's LongType output."""
    h = _xxh64_bytes(s.encode("utf-8"), _xxh64_int(j, seed))
    return h - (1 << 64) if h >= (1 << 63) else h


# ------------------------------------------------------------- shingles
# Java-regex semantics, NOT Python's: Spark's regexp_replace '\s+' is
# ASCII [ \t\n\x0B\f\r], and F.trim strips ' ' only.

_JAVA_WS = " \t\n\x0b\f\r"


def _java_norm_ws(text: str) -> str:
    out = []
    in_ws = False
    for ch in text:
        if ch in _JAVA_WS:
            in_ws = True
        else:
            if in_ws and out:
                out.append(" ")
            in_ws = False
            out.append(ch)
    return "".join(out)


def doc_shingles(text: str | None, n: int = 3) -> set[str]:
    """Twin of operators/dedup.py::shingles for one document: distinct
    word n-grams over Java-whitespace-normalized tokens; documents with
    fewer than n tokens contribute their whole token string (the
    `greatest(size - (n-1), 1)` branch); empty grams are dropped."""
    if text is None:
        return set()
    toks = _java_norm_ws(text).split(" ")
    upper = max(len(toks) - (n - 1), 1)
    grams = {" ".join(toks[i : i + n]) for i in range(upper)}
    grams.discard("")
    return grams


# -------------------------------------------------- jaccard (decimal twin)
# Spark computes common::DECIMAL(18,6) / union::DECIMAL(18,6) (result
# scale 20 under the default precision-loss rules), then round(_, 6)
# (HALF_UP) cast to double.


def _jaccard6(common: int, union: int) -> float:
    with localcontext() as ctx:  # never leak prec into the process context
        ctx.prec = 50
        q = Decimal(common) / Decimal(union)
        q = q.quantize(Decimal("1e-20"), rounding=ROUND_HALF_UP)
        return float(q.quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


# ----------------------------------------------------- sequential oracles


def minhash_lsh_expected(
    docs: list[tuple[int, str | None]],
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.12,
    max_doc_freq: int | None = 50,
) -> list[tuple[int, int, float]]:
    """Expected (id_a, id_b, jaccard) rows of minhash_lsh_pairs: banded
    MinHash candidate generation over df-capped shingles, exact full-set
    Jaccard verification."""
    rows = num_hashes // bands
    sh = {i: doc_shingles(t, n) for i, t in docs}

    df_counts: Counter[str] = Counter()
    for grams in sh.values():
        df_counts.update(grams)
    hot = (
        {g for g, c in df_counts.items() if c > max_doc_freq}
        if max_doc_freq is not None
        else set()
    )

    hcache: dict[str, list[int]] = {}

    def hashes(g: str) -> list[int]:
        hv = hcache.get(g)
        if hv is None:
            hv = [spark_xxhash64(j, g) for j in range(num_hashes)]
            hcache[g] = hv
        return hv

    buckets: dict[tuple[int, tuple[int, ...]], list[int]] = {}
    for i, grams in sh.items():
        capped = grams - hot
        if not capped:
            continue
        sig = [min(hashes(g)[j] for g in capped) for j in range(num_hashes)]
        for b in range(bands):
            key = (b, tuple(sig[b * rows : (b + 1) * rows]))
            buckets.setdefault(key, []).append(i)

    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cands.add((ids[x], ids[y]))

    out = []
    for a, b in sorted(cands):
        common = len(sh[a] & sh[b])
        if common == 0:
            continue
        jac = _jaccard6(common, len(sh[a] | sh[b]))
        if jac >= threshold:
            out.append((a, b, jac))
    return out


# --------------------------------------------- fuzzy entity linking twin
# Frozen parameters of the link_fuzzy_lsh query (queries_docs imports
# them from here so the Spark query and this twin can never drift).

LINK_DICT_PREFIX = 64
LINK_MENTION_PREFIX = 48
# n=5 char-grams + 8 bands x 3 rows: measured on the sf0.1 documents,
# the cross-document 5-gram Jaccard of English title prefixes has
# median 0.078 / p99 0.202, giving an expected candidate fraction of
# 0.84% under (r=3, b=8) — vs 32% under the naive (n=3, r=2, b=12),
# which made the candidate join quadratic. A true truncated-title match
# (j ~= 0.73) is still caught with p = 1-(1-0.73^3)^8 ~= 0.98.
LINK_N = 5
LINK_NUM_HASHES = 24
LINK_BANDS = 8
LINK_THRESHOLD = 0.5


def char_shingles_py(s: str | None, n: int = LINK_N) -> set[str]:
    """Twin of pipeline/link.py::char_shingles for one string: distinct
    character n-grams; shorter-than-n strings contribute themselves
    whole; empty strings contribute nothing."""
    if not s:
        return set()
    upper = max(len(s) - (n - 1), 1)
    return {s[i : i + n] for i in range(upper)}


def fuzzy_link_expected(
    mentions: list[tuple[int, str]],
    dictionary: list[tuple[int, str]],
    n: int = LINK_N,
    num_hashes: int = LINK_NUM_HASHES,
    bands: int = LINK_BANDS,
    threshold: float = LINK_THRESHOLD,
) -> list[tuple[int, int, float]]:
    """Expected (src, dst, jaccard) rows of fuzzy_link_lsh: char-ngram
    MinHash banding for candidates, exact full-set Jaccard verification,
    per-mention argmax (jaccard desc, dst asc) over the threshold."""
    rows = num_hashes // bands
    msh = {i: char_shingles_py(t, n) for i, t in mentions}
    dsh = {i: char_shingles_py(t, n) for i, t in dictionary}

    hcache: dict[str, list[int]] = {}

    def hashes(g: str) -> list[int]:
        """Twin of the operator's two-step hashing (round 5): the
        shingle string maps to a long via plain xxhash64(shingle)
        (default seed 42), then each MinHash function is
        xxhash64(CAST(j AS INT), <that long>) — the int literal chains
        the seed, the hashed shingle takes the LongType path."""
        hv = hcache.get(g)
        if hv is None:
            base = _xxh64_bytes(g.encode("utf-8"), 42)
            hv = []
            for j in range(num_hashes):
                h = _xxh64_long(base, _xxh64_int(j, 42))
                hv.append(h - (1 << 64) if h >= (1 << 63) else h)
            hcache[g] = hv
        return hv

    def band_keys(grams: set[str]):
        if not grams:
            return []
        sig = [min(hashes(g)[j] for g in grams) for j in range(num_hashes)]
        return [
            (b, tuple(sig[b * rows : (b + 1) * rows])) for b in range(bands)
        ]

    dict_buckets: dict[tuple[int, tuple[int, ...]], list[int]] = {}
    for i, grams in dsh.items():
        for key in band_keys(grams):
            dict_buckets.setdefault(key, []).append(i)

    out: list[tuple[int, int, float]] = []
    for src in sorted(msh):
        cands: set[int] = set()
        for key in band_keys(msh[src]):
            cands.update(dict_buckets.get(key, ()))
        best: tuple[float, int] | None = None  # (-jaccard, dst) min = argmax
        for dst in cands:
            common = len(msh[src] & dsh[dst])
            if common == 0:
                continue
            jac = _jaccard6(common, len(msh[src] | dsh[dst]))
            if jac < threshold:
                continue
            if best is None or (-jac, dst) < best:
                best = (-jac, dst)
        if best is not None:
            out.append((src, best[1], -best[0]))
    return out


def link_fuzzy_keys(
    docs: list[tuple[int, str | None]]
) -> tuple[list[tuple[int, str]], list[tuple[int, str]]]:
    """The link_fuzzy_lsh query's key derivation, mirrored sequentially:
    dictionary = ASCII-letter/space prefix (LINK_DICT_PREFIX chars,
    lowercased) of every document; mentions = the shorter
    LINK_MENTION_PREFIX prefix of the same key (the deterministic
    'noisy mention' model — a truncated title)."""
    import re

    dict_side, mention_side = [], []
    for i, t in docs:
        key = re.sub(r"[^A-Za-z ]", "", t or "")[:LINK_DICT_PREFIX].lower()
        if not key:
            continue
        dict_side.append((i, key))
        mention_side.append((i, key[:LINK_MENTION_PREFIX]))
    return mention_side, dict_side


def _simhash64(text: str | None) -> int:
    """Unsigned 64-bit SimHash twin: md5 token hashes, per-occurrence
    bit votes, strictly-positive vote -> bit set."""
    toks = text.split() if text else []
    if not toks:
        return 0
    votes = [0] * 64
    for tok, cnt in Counter(toks).items():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += cnt if (h >> b) & 1 else -cnt
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig


def simhash_expected(
    docs: list[tuple[int, str | None]], max_hamming: int = 8, bands: int = 4
) -> list[tuple[int, int, int]]:
    """Expected (id_a, id_b, hamming) rows of simhash_near_dups: pairs
    agreeing on >= 1 of the 16-bit signature bands, hamming-verified."""
    chunk = 64 // bands
    mask = (1 << chunk) - 1
    sigs = {i: _simhash64(t) for i, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in sigs.items():
        for b in range(bands):
            buckets.setdefault((b, (s >> (b * chunk)) & mask), []).append(i)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cands.add((ids[x], ids[y]))
    out = []
    for a, b in sorted(cands):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def _round6(x: float) -> float:
    """Twin of Spark's round(double, 6): HALF_UP over the shortest
    decimal representation (BigDecimal.valueOf == repr here)."""
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def multimodal_expected(
    docs: list[tuple[int, str | None]], width: int = 16, height: int = 16
) -> list[tuple[int, int, int, int, float, float, float, float]]:
    """Expected rows of the multimodal_features query: pixel features
    computed from the document bytes DIRECTLY (bytes -> (h, w, 3) RGB
    grid), never through either container — so the Spark side's
    encode->decode roundtrips (BMP for even ids, PNG for odd) are
    gated, not mirrored. n_bytes is the only container-derived value:
    for BMP, 54-byte header + 4-byte-padded rows (the spec restated
    independently); for PNG, signature + IHDR/IDAT/IEND chunk framing
    (8 + 25 + 12 + 12 = 57) around the zlib-level-6 stream of the
    filter-0 scanlines — zlib output length is deterministic per
    (input, level), so this is spec framing around a library-defined
    payload size, not a copy of the encoder. Same numpy reduction
    order as the Arrow featurizer (np.mean / np.std use pairwise
    summation; a naive sequential sum can differ in the last ulp and
    flip a round-to-6)."""
    import zlib

    import numpy as np

    stride = (width * 3 + 3) & ~3
    bmp_n_bytes = 54 + stride * height
    out = []
    n = width * height * 3
    for i, t in docs:
        b = (t or "").encode("utf-8")[:n]
        arr = np.zeros(n, dtype=np.uint8)
        arr[: len(b)] = np.frombuffer(b, dtype=np.uint8)
        px_u8 = arr.reshape(height, width, 3)
        if i % 2 == 0:
            n_bytes = bmp_n_bytes
        else:
            raw = b"".join(b"\x00" + px_u8[y].tobytes() for y in range(height))
            n_bytes = 57 + len(zlib.compress(raw, 6))
        px = px_u8.astype(np.float64)
        luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        out.append(
            (
                i, n_bytes, width, height,
                round(float(px[:, :, 0].mean()), 6),
                round(float(px[:, :, 1].mean()), 6),
                round(float(px[:, :, 2].mean()), 6),
                round(float(luma.std()), 6),
            )
        )
    return out


# --------------------------------------------------------- materializer


def ensure_dedup_oracles(sf_dir: str, out_dir: str) -> dict[str, str]:
    """Read ``{sf_dir}/documents.parquet`` and write the three expected
    outputs as parquet under ``out_dir`` (atomic replace). Returns
    {"minhash": path, "simhash": path, "multimodal": path}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))

    mh = minhash_lsh_expected(docs)
    minhash_tbl = pa.table(
        {
            "id_a": pa.array([r[0] for r in mh], pa.int64()),
            "id_b": pa.array([r[1] for r in mh], pa.int64()),
            "jaccard": pa.array([r[2] for r in mh], pa.float64()),
        }
    )

    sim = simhash_expected(docs)
    simhash_tbl = pa.table(
        {
            "id_a": pa.array([r[0] for r in sim], pa.int64()),
            "id_b": pa.array([r[1] for r in sim], pa.int64()),
            "hamming": pa.array([r[2] for r in sim], pa.int32()),
        }
    )

    mention_side, dict_side = link_fuzzy_keys(docs)
    lf = fuzzy_link_expected(mention_side, dict_side)
    linkfuzzy_tbl = pa.table(
        {
            "src": pa.array([r[0] for r in lf], pa.int64()),
            "dst": pa.array([r[1] for r in lf], pa.int64()),
            "jaccard": pa.array([r[2] for r in lf], pa.float64()),
        }
    )

    mm = multimodal_expected(docs)
    multimodal_tbl = pa.table(
        {
            "id": pa.array([r[0] for r in mm], pa.int64()),
            "n_bytes": pa.array([r[1] for r in mm], pa.int32()),
            "width": pa.array([r[2] for r in mm], pa.int32()),
            "height": pa.array([r[3] for r in mm], pa.int32()),
            "mean_r": pa.array([r[4] for r in mm], pa.float64()),
            "mean_g": pa.array([r[5] for r in mm], pa.float64()),
            "mean_b": pa.array([r[6] for r in mm], pa.float64()),
            "luma_std": pa.array([r[7] for r in mm], pa.float64()),
        }
    )

    out = {}
    for name, t in (
        ("minhash", minhash_tbl),
        ("simhash", simhash_tbl),
        ("multimodal", multimodal_tbl),
        ("linkfuzzy", linkfuzzy_tbl),
    ):
        path = os.path.join(out_dir, f"oracle_{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        out[name] = path
    return out
