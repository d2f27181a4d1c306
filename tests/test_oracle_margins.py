"""Fixture margin assertions for the float-sensitive ANN oracles.

The cosine/IVF/LSH gate queries compare Spark (NumPy pairwise/SIMD
summation) against DuckDB (sequential summation + list_cosine_similarity).
Both are correct to the last ulp or two, so every DISCRETE decision the
pipelines take — an LSH sign bit, a centroid assignment, a probe/k rank
cutoff, a 6dp rounding — must sit far from a tie, or the gate result
becomes engine-dependent on a different fixture. These tests recompute
every such decision in pure NumPy on the driver-gate fixture (sf0.01) and
assert a safety margin of >= ~1e6x the worst-case summation divergence
(dim-64 float dot products agree across summation orders to ~1e-13
relative; we demand 1e-7 absolute). A failure here does NOT mean the
engine is wrong — it means the fixture has a near-tie and the gate's
pass/fail would be luck.

Pure pyarrow+NumPy (no Spark session) — runs in milliseconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from imtag_spark.functions.polyhash import M31, deterministic_planes

SF_DIR = "/root/testdata/sf0.01"
#: worst-case |pairwise-sum - sequential-sum| for dim-64 dots of
#: unit-normalized vectors is ~1e-13; demand a million-fold margin
EPS = 1e-7
_KNUTH = 2654435761


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _normalize(mat):
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def test_lsh_sign_margins(emb):
    # cosine_pairs_embeddings gate: deterministic_planes(6, 64) sign bits
    _, mat = emb
    planes = deterministic_planes(6, 64)
    dots = mat @ planes.T
    min_abs = np.abs(dots).min()
    assert min_abs > EPS, (
        f"LSH plane dot within {min_abs:.2e} of zero — sign bit is "
        "engine-dependent on this fixture"
    )


def test_cosine_pairs_threshold_and_rounding_margins(emb):
    # cosine_pairs_embeddings gate: threshold 0.3 on 6dp-rounded sims
    _, mat = emb
    planes = deterministic_planes(6, 64)
    bits = (mat @ planes.T) > 0
    code = (bits * (1 << np.arange(6))).sum(axis=1)
    nmat = _normalize(mat)
    sims = []
    for bucket in np.unique(code):
        idx = np.nonzero(code == bucket)[0]
        if len(idx) < 2:
            continue
        s = nmat[idx] @ nmat[idx].T
        iu = np.triu_indices(len(idx), k=1)
        sims.append(s[iu])
    sims = np.concatenate(sims)
    # threshold decision on the ROUNDED value: distance from 0.3 after 6dp
    rounded = np.round(sims, 6)
    thr_margin = np.abs(rounded - 0.3).min()
    assert thr_margin > 5e-7, f"pair sim rounds within {thr_margin:.2e} of 0.3"
    # 6dp rounding itself: distance of sim*1e6 from the x.5 boundary.
    # Units: 1e-6 sim per 1.0 of frac, so 1e-5 here = 1e-11 absolute —
    # still ~100x the worst cross-engine dot-product divergence (~1e-13).
    frac = np.abs((sims * 1e6) % 1.0 - 0.5)
    assert frac.min() > 1e-5, (
        f"pair sim sits {frac.min():.2e} (millionths) from a 6dp rounding "
        "boundary"
    )


def _ivf_setup(ids, mat, n_centroids=32):
    # ivf_index: centroids = n_centroids lowest Knuth-mix(id), ties by id
    h = ((ids % M31) * _KNUTH) % M31
    order = np.lexsort((ids, h))[:n_centroids]
    cents = _normalize(mat[order])
    return cents


def test_ivf_assignment_and_probe_margins(emb):
    # knn_ivf_embeddings gate: 32 centroids, n_probe=4, k=5, queries id<20
    ids, mat = emb
    cents = _ivf_setup(ids, mat)
    nmat = _normalize(mat)
    sims = nmat @ cents.T  # (N, 32)
    top2 = np.sort(sims, axis=1)[:, -2:]
    assign_gap = (top2[:, 1] - top2[:, 0]).min()
    assert assign_gap > EPS, (
        f"centroid assignment gap {assign_gap:.2e} — rank-1 centroid is "
        "engine-dependent"
    )
    qmask = ids < 20
    qs = np.sort(sims[qmask], axis=1)
    probe_gap = (qs[:, -4] - qs[:, -5]).min()  # rank n_probe vs n_probe+1
    assert probe_gap > EPS, (
        f"probe cutoff gap {probe_gap:.2e} — probe set is engine-dependent"
    )


def test_ivf_rerank_k_cutoff_margins(emb):
    ids, mat = emb
    cents = _ivf_setup(ids, mat)
    nmat = _normalize(mat)
    sims = nmat @ cents.T
    assigned = sims.argmax(axis=1)
    k, n_probe = 5, 4
    for qi in np.nonzero(ids < 20)[0]:
        probes = np.argsort(-sims[qi], kind="stable")[:n_probe]
        cand = np.nonzero(np.isin(assigned, probes) & (ids != ids[qi]))[0]
        cs = nmat[cand] @ nmat[qi]
        cs_sorted = np.sort(cs)[::-1]
        if len(cs_sorted) > k:
            gap = cs_sorted[k - 1] - cs_sorted[k]
            assert gap > EPS, (
                f"query {ids[qi]}: k-cutoff gap {gap:.2e} — top-{k} set is "
                "engine-dependent"
            )
        # 6dp rounding margin of the exported sims (1e-5 = 1e-11 absolute)
        frac = np.abs((cs_sorted[:k] * 1e6) % 1.0 - 0.5)
        assert frac.min() > 1e-5, (
            f"query {ids[qi]}: exported sim sits {frac.min():.2e} from a "
            "6dp rounding boundary"
        )


def test_knn_top1_margins(emb):
    # knn_top1_embeddings gate: brute-force k=1 over queries id<20
    ids, mat = emb
    nmat = _normalize(mat)
    for qi in np.nonzero(ids < 20)[0]:
        s = nmat @ nmat[qi]
        s[qi] = -np.inf
        top = np.sort(s)[::-1][:2]
        gap = top[0] - top[1]
        assert gap > EPS, (
            f"query {ids[qi]}: top-1 vs top-2 gap {gap:.2e} — nearest "
            "neighbor is engine-dependent"
        )
