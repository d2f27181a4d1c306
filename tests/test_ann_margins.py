"""Near-tie margin audit for the float-ranked ANN gate queries.

The knn/IVF/LSH oracles (tools/sim_driver replays of ``oracle_sql()``)
assume the engine and DuckDB agree on every ORDER BY / sign / cutoff
decision that involves a floating-point similarity. The computations are
mathematically identical but not bit-identical (NumPy uses pairwise/SIMD
summation, DuckDB's ``list_cosine_similarity`` sums sequentially), so a
decision quantity within ~1e-12 of a tie could flip between engines on an
unlucky fixture even though both are "correct".

This test measures every such decision margin on the actual gate fixture
(sf0.01 embeddings, same parameters as ``__spark_entry__``'s
``knn_top1_embeddings`` / ``knn_ivf_embeddings`` / ``cosine_pairs_
embeddings``) in float64 and asserts each clears 1e-8 — four-plus orders
above realistic cross-engine divergence. If a future fixture regeneration
lands a near-tie, this fails loudly instead of the gate flaking.

Pure NumPy over the parquet — no SparkSession needed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from imtag_spark.functions.polyhash import deterministic_planes

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")

#: four-plus decades above float64 summation divergence at dim=64, three-plus
#: below the smallest margin measured on the current fixture (6.5e-05)
MARGIN = 1e-8

# gate-query parameters (__spark_entry__._q_knn / _q_knn_ivf / _q_cosine_pairs)
N_QUERIES = 20
N_CENTROIDS = 32
N_PROBE = 4
K = 5
N_PLANES = 6
LSH_THRESHOLD = 0.3


@pytest.fixture(scope="module")
def emb():
    path = os.path.join(SF_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture parquet missing: {path}")
    t = pq.read_table(path)
    vid = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    vid, mat = vid[order], mat[order]
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return vid, mat, nrm


def _centroids(vid: np.ndarray, nrm: np.ndarray) -> np.ndarray:
    # ivf_index's deterministic pick: n_centroids lowest Knuth-mix(id) rows
    mix = ((vid % 2147483647) * 2654435761) % 2147483647
    return nrm[np.lexsort((vid, mix))[:N_CENTROIDS]]


def test_lsh_plane_sign_margins(emb):
    """cosine_pairs_embeddings: every (vector, plane) dot is far from 0,
    so the sign bits — hence the LSH buckets — are engine-independent."""
    _, mat, _ = emb
    dots = mat @ deterministic_planes(N_PLANES, mat.shape[1]).T
    assert np.abs(dots).min() > MARGIN


def test_lsh_threshold_margin(emb):
    """cosine_pairs_embeddings: no in-bucket pair similarity sits on the
    0.3 verify cutoff."""
    vid, mat, nrm = emb
    dots = mat @ deterministic_planes(N_PLANES, mat.shape[1]).T
    bucket = ((dots > 0).astype(np.int64) << np.arange(N_PLANES)).sum(axis=1)
    worst = np.inf
    for b in np.unique(bucket):
        idxs = np.flatnonzero(bucket == b)
        if len(idxs) < 2:
            continue
        sims = nrm[idxs] @ nrm[idxs].T
        iu = np.triu_indices(len(idxs), 1)
        worst = min(worst, float(np.abs(sims[iu] - LSH_THRESHOLD).min()))
    assert worst > MARGIN


def test_ivf_assignment_margins(emb):
    """knn_ivf_embeddings: every base vector's best centroid beats the
    second-best by a clear gap (the argmax / rk=1 decision)."""
    vid, _, nrm = emb
    sims = nrm @ _centroids(vid, nrm).T
    srt = np.sort(sims, axis=1)[:, ::-1]
    assert (srt[:, 0] - srt[:, 1]).min() > MARGIN


def test_ivf_probe_cutoff_margins(emb):
    """knn_ivf_embeddings: per query, probe rank N_PROBE is separated from
    rank N_PROBE+1 (the rk <= n_probe cutoff)."""
    vid, _, nrm = emb
    q = nrm[vid < N_QUERIES]
    srt = np.sort(q @ _centroids(vid, nrm).T, axis=1)[:, ::-1]
    assert (srt[:, N_PROBE - 1] - srt[:, N_PROBE]).min() > MARGIN


def test_ivf_rerank_and_top1_margins(emb):
    """knn_ivf_embeddings rank-K cutoff and knn_top1_embeddings rank-1
    margin, per query, over the exact candidate sets each query uses."""
    vid, _, nrm = emb
    cents = _centroids(vid, nrm)
    assign = (nrm @ cents.T).argmax(axis=1)
    qmask = vid < N_QUERIES
    qids, qvecs = vid[qmask], nrm[qmask]
    probes = np.argsort(-(qvecs @ cents.T), axis=1, kind="stable")[:, :N_PROBE]
    for qid, qv, pr in zip(qids, qvecs, probes):
        cand = np.isin(assign, pr) & (vid != qid)
        s = np.sort(nrm[cand] @ qv)[::-1]
        if len(s) > K:
            assert s[K - 1] - s[K] > MARGIN
        full = np.sort(nrm[vid != qid] @ qv)[::-1]
        assert full[0] - full[1] > MARGIN
