"""Deduplication operators for training-data pipelines.

- exact: hash-groupBy on sha256(text) — one shuffle, map-side combinable.
- minhash + LSH: shingle → xxhash64 → k permuted mins (vectorized Arrow
  UDF over the shingle-hash arrays) → band buckets → candidate pairs →
  exact-Jaccard verify → CC over the verified pairs = duplicate clusters.
- simhash: 64-bit sign-of-weighted-bit-sums over token hashes, Hamming
  band buckets for candidates.
- embedding near-dup: random-hyperplane LSH buckets + exact cosine verify.

Scale notes: candidate generation never compares all pairs — only within
LSH buckets; bucket joins are equi-joins on (band, hash) so Catalyst
shuffles once per side; the verify step is a join on the candidate pair
list (linear in candidates). Duplicate *clusters* come from the same
alternating-star CC used for the graph workloads — dedup at 100 TB is a
graph problem, which is exactly why this engine treats it as one.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from imtag_spark.operators.cc import connected_components

# deterministic 64-bit mix constants for the k minhash permutations
_MERSENNE = (1 << 61) - 1


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical docs: (text_sha, n_copies, representative)."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("representative"),
        )
    )


def shingle_hashes(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Char k-shingles → distinct xxhash64 values per doc: (id, sh BIGINT).

    JVM-side: sequence/explode + substring + xxhash64 — no Python.
    """
    t = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return (
        docs.select(F.col(id_col).alias("id"), t.alias("_t"), n.alias("_n"))
        .select("id", F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("pos"), "_t")
        .select("id", F.xxhash64(F.substring(F.col("_t"), F.col("pos"), k)).alias("sh"))
        .distinct()
    )


def _minhash_udf(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            h = np.asarray(arr, dtype=np.uint64)
            # (a*h + b) mod p for all k perms at once: (k, n) matrix min
            hp = (a[:, None].astype(np.uint64) * h[None, :] + b[:, None].astype(np.uint64)) % np.uint64(_MERSENNE)
            out.append(hp.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]) minhash signatures."""
    sh = shingle_hashes(docs, text_col, id_col, shingle_k)
    grouped = sh.groupBy("id").agg(F.collect_list("sh").alias("shingles"))
    mh = _minhash_udf(num_hashes, seed)
    return grouped.select("id", mh("shingles").alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 8
) -> DataFrame:
    """Band the signatures and emit candidate pairs (a, b) with a < b."""
    banded = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(
                        F.slice("sig", i * rows_per_band + 1, rows_per_band).cast("string")
                    ).alias("bh"),
                )
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    left = banded.select("band", "bh", F.col("id").alias("a"))
    right = banded.select("band", "bh", F.col("id").alias("b"))
    return (
        left.join(right, ["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def exact_jaccard(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Verify candidates: exact Jaccard over the shingle sets.

    ``shingles``: (id, sh); ``pairs``: (a, b). Output (a, b, jaccard).
    Intersection via join on shingle hash restricted to candidate pairs;
    sizes via two broadcast-friendly aggregates.
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(shingles.select(F.col("id").alias("a"), "sh"), "a")
        .join(shingles.select(F.col("id").alias("b"), F.col("sh").alias("sh2")), "b")
        .where(F.col("sh") == F.col("sh2"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def minhash_dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 128,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline → (id, cluster) for every doc in a dup pair.

    cluster = min doc id of the near-duplicate group (CC over verified
    pairs — the same labeling contract as the graph CC).
    """
    rows_per_band = num_hashes // bands
    sh = shingle_hashes(docs, text_col, id_col, shingle_k).persist()
    grouped = sh.groupBy("id").agg(F.collect_list("sh").alias("shingles"))
    sigs = grouped.select("id", _minhash_udf(num_hashes, seed)("shingles").alias("sig"))
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    verified = exact_jaccard(sh, cands).where(F.col("jaccard") >= threshold)
    edges = verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    clusters = connected_components(edges).select(
        F.col("vertex").alias("id"), F.col("component").alias("cluster")
    )
    sh.unpersist()
    return clusters


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit simhash over whitespace tokens: (id, simhash BIGINT).

    Vectorized Arrow UDF: per doc, token hashes vote ±1 on each of 64 bits.
    """
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    th = docs.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).select("id", F.xxhash64("tok").alias("th"))
    grouped = th.groupBy("id").agg(F.collect_list("th").alias("hashes"))

    @F.pandas_udf(T.LongType())
    def simhash(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        bitpos = np.arange(64, dtype=np.uint64)
        for i, arr in enumerate(hs):
            h = np.asarray(arr, dtype=np.uint64)
            bits = (h[:, None] >> bitpos[None, :]) & np.uint64(1)  # (n, 64)
            votes = bits.sum(axis=0) * 2 - len(h)  # ±1 votes summed
            out[i] = np.int64(
                np.uint64(((votes > 0).astype(np.uint64) << bitpos).sum(dtype=np.uint64))
            )
        return pd.Series(out)

    return grouped.select("id", simhash("hashes").alias("simhash"))


def simhash_candidates(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by banding the 64-bit simhash into 4×16-bit
    blocks (any pair within Hamming ≤ 3 shares at least one block), then
    verifying Hamming distance with bit_count.
    """
    blocks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.bh")
    left = blocks.select("blk", "bh", F.col("id").alias("a"), F.col("simhash").alias("sa"))
    right = blocks.select("blk", "bh", F.col("id").alias("b"), F.col("simhash").alias("sb"))
    return (
        left.join(right, ["blk", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
