"""Similarity search over embedding columns (array<float>).

- ``knn_bruteforce``: exact top-k cosine. The query set is collected to a
  NumPy matrix and broadcast; the base table streams through a vectorized
  ``mapInPandas`` kernel that emits only each batch's local top-k per
  query, so the shuffle carries O(batches × queries × k) rows, never the
  full similarity matrix. Global top-k = one groupBy + slice.
- ``ivf_index`` / ``knn_ivf``: scale path — deterministic centroid sample,
  one assignment pass, probe the nearest ``n_probe`` centroids per query.
- ``cosine_topk_pairs``: all-pairs top-k via random-hyperplane LSH buckets
  + exact verify (near-dup search shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imtag_spark.functions.polyhash import deterministic_planes, id_mix_sql
from imtag_spark.operators.dedup import cap_lsh_buckets


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def knn_bruteforce(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim) with sim rounded 6dp.

    Self-matches (same id) are excluded. Deterministic tie-break: higher
    sim first, then lower neighbor id.
    """
    spark = base.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame([], "query_id BIGINT, neighbor_id BIGINT, sim DOUBLE")
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_mat = _normalize(np.array([r[vec_col] for r in qrows], dtype=np.float64))
    sc = spark.sparkContext
    b_ids = sc.broadcast(q_ids)
    b_mat = sc.broadcast(q_mat)

    def batch_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = qm @ mat.T  # (nq, nb)
            sims[qi[:, None] == ids[None, :]] = -np.inf  # exclude self
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(qi, kk)
            rows_n = ids[idx.ravel()]
            rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
            keep = np.isfinite(rows_s)
            yield pd.DataFrame(
                {"query_id": rows_q[keep], "neighbor_id": rows_n[keep], "sim": rows_s[keep]}
            )

    partial = base.select(id_col, vec_col).mapInPandas(
        batch_topk, schema="query_id BIGINT, neighbor_id BIGINT, sim DOUBLE"
    )
    ranked = partial.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        ),
    )
    return ranked.where(F.col("rk") <= k).select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim")
    )


def _lloyd_refine(
    base: DataFrame, cents: np.ndarray, id_col: str, vec_col: str
) -> np.ndarray:
    """One Lloyd pass: assign every base vector to its nearest centroid,
    replace each centroid with its cluster's normalized mean.

    Distributed partial sums: each Arrow batch emits at most n_centroids
    rows (centroid, count, vector sum), so the driver-side combine reads
    O(batches × n_centroids) tiny rows — never the vectors themselves.
    Empty clusters keep their previous centroid. Deterministic for a fixed
    input layout (partial order is partition order, batch sums are
    NumPy float64 reductions).
    """
    b_c = base.sparkSession.sparkContext.broadcast(cents)

    def partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            a = (mat @ c.T).argmax(axis=1)
            idx = np.unique(a)
            sums = np.zeros((len(idx), mat.shape[1]), dtype=np.float64)
            counts = np.zeros(len(idx), dtype=np.int64)
            for j, ci in enumerate(idx):
                sel = a == ci
                sums[j] = mat[sel].sum(axis=0)
                counts[j] = int(sel.sum())
            yield pd.DataFrame(
                {"centroid": idx.astype(np.int32), "n": counts, "s": list(sums)}
            )

    partials = base.select(vec_col).mapInPandas(
        partial_sums, schema="centroid INT, n BIGINT, s ARRAY<DOUBLE>"
    ).collect()
    new = cents.copy()
    acc = np.zeros_like(cents)
    cnt = np.zeros(len(cents), dtype=np.int64)
    for row in partials:
        acc[row["centroid"]] += np.asarray(row["s"], dtype=np.float64)
        cnt[row["centroid"]] += row["n"]
    nonempty = cnt > 0
    new[nonempty] = acc[nonempty] / cnt[nonempty, None]
    return _normalize(new)


def ivf_index(
    base: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    lloyd_iters: int = 0,
) -> tuple[np.ndarray, DataFrame]:
    """One-pass IVF: deterministic sampled centroids + assignment.

    Returns (centroid matrix, base annotated with ``centroid`` id). The
    centroid sample takes the n_centroids lowest Knuth-mix(id) rows — a
    deterministic uniform sample that needs no kmeans iterations (coarse
    quantization is all LSH-grade recall needs here). The closed-form mix
    (polyhash.id_mix_sql) lets an external SQL oracle reproduce the exact
    centroid pick; ties broken by id so the order is total.

    ``lloyd_iters`` > 0 runs that many Lloyd refinement passes over the
    sampled seeds (:func:`_lloyd_refine`) before the final assignment —
    better-balanced cells and measurably higher recall at high
    ``n_centroids`` (tests/test_dedup_text.py pins the improvement). Left
    at 0 for the oracle-replayed gate query, whose SQL reproduces the
    closed-form seed pick exactly.
    """
    spark = base.sparkSession
    picked = (
        base.select(id_col, vec_col, F.expr(id_mix_sql(id_col)).alias("h"))
        .orderBy("h", id_col)
        .limit(n_centroids)
        .collect()
    )
    cents = _normalize(np.array([r[vec_col] for r in picked], dtype=np.float64))
    for _ in range(lloyd_iters):
        cents = _lloyd_refine(base, cents, id_col, vec_col)
    b_c = spark.sparkContext.broadcast(cents)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            pdf = pdf.copy()
            pdf["centroid"] = (mat @ c.T).argmax(axis=1).astype(np.int32)
            yield pdf

    assigned = base.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} BIGINT, {vec_col} ARRAY<FLOAT>, centroid INT"
    )
    return cents, assigned


def knn_ivf(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe the n_probe nearest centroids per query, exact rerank inside.

    The probe set join is an equi-join on ``centroid`` — partition pruning
    of the vector table, which is the whole point of IVF at scale.
    """
    spark = assigned.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_mat = _normalize(np.array([r[vec_col] for r in qrows], dtype=np.float64))
    # stable sort on -sim: ties break toward the lower centroid index,
    # matching the oracle's (sim DESC, centroid ASC) ranking
    probes = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")[:, :n_probe]
    probe_rows = [
        (int(q), int(c)) for qi, q in enumerate(q_ids) for c in probes[qi]
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id BIGINT, centroid INT")
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    candidates = assigned.join(F.broadcast(probe_df), "centroid").select(
        "query_id", id_col, vec_col
    )

    def rerank(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qi, qm = b_ids.value, b_mat.value
        qid = key[0]
        qvec = qm[np.nonzero(qi == qid)[0][0]]
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
        sims = mat @ qvec
        sims[ids == qid] = -np.inf
        kk = min(k, len(ids))
        # lexsort: deterministic (sim DESC, id ASC) — plain argsort is an
        # unstable quicksort and would break tie order vs the SQL oracle
        idx = np.lexsort((ids, -sims))[:kk]
        idx = idx[np.isfinite(sims[idx])]
        return pd.DataFrame(
            {"query_id": qid, "neighbor_id": ids[idx], "sim": np.round(sims[idx], 6)}
        )

    return candidates.groupBy("query_id").applyInPandas(
        rerank, schema="query_id BIGINT, neighbor_id BIGINT, sim DOUBLE"
    )


def cosine_pairs_lsh(
    base: DataFrame,
    n_planes: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
    planes: np.ndarray | None = None,
    bucket_cap: int | None = None,
    metrics_out: dict | None = None,
) -> DataFrame:
    """All-pairs near-neighbors: random-hyperplane LSH bucket join + exact
    cosine verify → (a, b, sim) with sim ≥ threshold, a < b.

    ``planes`` — pass an explicit (n_planes, dim) matrix to override the
    Gaussian sample; ``polyhash.deterministic_planes`` gives a closed-form
    integer family an external SQL oracle can reproduce. ``bucket_cap``
    bounds hot hyperplane buckets (dedup.cap_lsh_buckets): a degenerate
    corpus (many identical embeddings) otherwise makes the bucket
    self-join quadratic; dropped counts land in ``metrics_out``."""
    spark = base.sparkSession
    if dim is None:
        dim = len(base.select(vec_col).first()[0])
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_planes, dim))
    else:
        n_planes = planes.shape[0]
    b_p = spark.sparkContext.broadcast(planes)

    def bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = b_p.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (mat @ p.T) > 0
            code = (bits * (1 << np.arange(p.shape[0]))).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": code,
                                "vec": list(pdf[vec_col])})

    bucketed = base.select(id_col, vec_col).mapInPandas(
        bucket, schema="id BIGINT, bucket BIGINT, vec ARRAY<FLOAT>"
    )
    bucketed = cap_lsh_buckets(bucketed, ("bucket",), bucket_cap, metrics_out)
    left = bucketed.select("bucket", F.col("id").alias("a"), F.col("vec").alias("va"))
    right = bucketed.select("bucket", F.col("id").alias("b"), F.col("vec").alias("vb"))
    pairs = left.join(right, "bucket").where(F.col("a") < F.col("b"))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            va = _normalize(np.array(list(pdf["va"]), dtype=np.float64))
            vb = _normalize(np.array(list(pdf["vb"]), dtype=np.float64))
            sims = (va * vb).sum(axis=1)
            out = pdf[["a", "b"]].copy()
            out["sim"] = np.round(sims, 6)
            yield out[out["sim"] >= threshold]

    return pairs.mapInPandas(verify, schema="a BIGINT, b BIGINT, sim DOUBLE").distinct()
