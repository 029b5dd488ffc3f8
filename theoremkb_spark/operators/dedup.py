"""Deduplication operators for web-scale corpora.

Four tiers, cheapest first:

* exact     — fingerprint groupBy (md5 of normalized text);
* n-gram Jaccard — shingle self-join with exact similarity (SQL-
  expressible, oracle-checked);
* MinHash+LSH — banded signature bucketing for approximate candidate
  generation, then exact Jaccard verification (the 100 TB path: cost is
  O(docs x shingles) + bucket-local joins, never all-pairs);
* SimHash   — 64-bit near-dup signatures via an Arrow-batched UDF.

Shingling/minhash/banding are pure DataFrame expressions (xxhash64 is a
JVM builtin, no Python). SimHash uses a vectorized pandas UDF because
bit-vote accumulation has no native expression form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textquality import fingerprint, norm_ws


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (fp, keeper, n_dups): one row per distinct normalized text,
    keeper = min id (the row to retain)."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """-> (id, shingle): distinct word n-grams per document."""
    toks = F.split(norm_ws(F.col(text_col)), " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(trim(regexp_replace({text_col}, '\\\\s+', ' ')), ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(trim(regexp_replace({text_col}, '\\\\s+', ' ')), ' '), i, {n})))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: all pairs sharing >= 1
    shingle, filtered to jaccard >= threshold.

    The shingle equi-join is the blocking step — complexity is bounded
    by shingle co-occurrence, not |docs|^2.
    """
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sza = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = (
        F.col("common").cast("decimal(18,6)")
        / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("decimal(18,6)")
    )
    return (
        common.join(sza, "id_a")
        .join(szb, "id_b")
        .withColumn("jaccard", F.round(jac, 6).cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(id, shingle) -> (id, h0..h{k-1}) MinHash signature via xxhash64
    with per-function seed columns — one shuffle, JVM-only."""
    aggs = [
        F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verified.

    bands x rows = num_hashes; a pair is a candidate iff it agrees on at
    least one full band. Candidates are then verified with the exact
    n-gram Jaccard (no false positives in the output).
    """
    rows = num_hashes // bands
    sh = shingles(df, id_col, text_col, n).cache()
    sig = minhash_signatures(sh, num_hashes)

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                "sig"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    a = banded.select(F.col("id").alias("id_a"), "band", "sig")
    b = banded.select(F.col("id").alias("id_b"), "band", "sig")
    candidates = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # exact verification on the candidate set only
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("id").alias("id_a"), "shingle")
    sb = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = (
        F.col("common").cast("decimal(18,6)")
        / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("decimal(18,6)")
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.round(jac, 6).cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- SimHash

@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens; token hashes from md5
    (stable across processes, unlike Python's salted hash())."""
    import hashlib

    import numpy as np

    out = []
    for t in texts:
        toks = (t or "").split()
        if not toks:
            out.append(0)
            continue
        votes = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in toks:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            )
            bits = (h >> shifts) & np.uint64(1)
            votes += np.where(bits == 1, 1, -1)
        sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="int64")


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 16-bit
    chunks (a pair within hamming distance 3 must agree on >= 1 of 4
    bands), then verify hamming distance exactly via bit_count."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    ).cache()
    chunk = 64 // bands
    banded = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sim", b * chunk)
                        .bitwiseAND(F.lit((1 << chunk) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "sim", F.col("bs.band").alias("band"), F.col("bs.key").alias("key"))

    a = banded.select(F.col("id").alias("id_a"), F.col("sim").alias("sim_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), F.col("sim").alias("sim_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
