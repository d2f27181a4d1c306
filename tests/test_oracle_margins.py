"""Near-tie margin audit for the float-valued gate oracles.

The cosine/IVF/LSH gate queries assume NumPy (pairwise/SIMD summation) and
DuckDB (sequential summation) agree on every DISCRETE decision derived
from a float: an LSH sign bit, a rank cutoff (IVF assignment rk=1, probe
rk<=n_probe, top-k rk<=k), the similarity threshold, and the 6-decimal
output rounding. Agreement on the decisions only needs the inputs to be
far from the decision boundary relative to summation error (~1e-13
relative for 64-term dots), not bit-equal.

This test recomputes every such decision input on the sf0.01 gate fixture
in float64 and asserts its distance to the boundary exceeds MARGIN — so a
regenerated or edited fixture that lands a near-tie fails HERE, loudly,
instead of passing or failing the gate depending on which engine runs it.
No Spark session needed: pure NumPy on the parquet fixture, mirroring the
constants the entry queries use (__spark_entry__.py: _q_cosine_pairs
planes=6x64 threshold=0.3, _q_knn_ivf n_centroids=32 k=5 n_probe=4
n_queries=20).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from imtag_spark.functions.polyhash import M31, _KNUTH, deterministic_planes

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

#: minimum allowed distance of any decision input from its boundary.
#: float64 summation error on a 64-term dot of O(1) values is ~1e-13
#: relative; 1e-6 absolute on O(1)-scale quantities leaves 7 orders of
#: headroom while being far below any gap a healthy fixture produces.
MARGIN = 1e-6

N_PLANES, DIM, THRESHOLD = 6, 64, 0.3
N_CENTROIDS, K, N_PROBE, N_QUERIES = 32, 5, 4, 20


@pytest.fixture(scope="module")
def emb():
    if not os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")):
        pytest.skip(f"no fixture at {SF_DIR}")
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    vecs = np.array(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    order = np.argsort(ids)
    return ids[order], vecs[order]


def _cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    na = a / np.linalg.norm(a, axis=1, keepdims=True)
    nb = b / np.linalg.norm(b, axis=1, keepdims=True)
    return na @ nb.T


def _rank_gap_ok(sims_desc_sorted: np.ndarray, cut: int) -> float:
    """Distance between the last kept and first dropped similarity at a
    row_number cutoff; equal values are safe (neighbor-id tiebreak is
    integer-deterministic) so exact ties pass."""
    if len(sims_desc_sorted) <= cut:
        return np.inf
    gap = sims_desc_sorted[cut - 1] - sims_desc_sorted[cut]
    return np.inf if gap == 0.0 else gap


def test_lsh_plane_signs_have_margin(emb):
    _, vecs = emb
    planes = deterministic_planes(N_PLANES, DIM).astype(np.float64)
    dots = vecs @ planes.T  # (n, n_planes); weights O(1e3) -> dots O(1e3)
    # relative margin: a dot of magnitude d on inputs of scale s flips only
    # if error ~ s*1e-13 exceeds d
    scale = np.abs(vecs) @ np.abs(planes.T)  # worst-case accumulation scale
    assert np.min(np.abs(dots) / np.maximum(scale, 1.0)) > MARGIN


def test_cosine_threshold_and_rounding_margins(emb):
    _, vecs = emb
    sims = _cosine_matrix(vecs, vecs)
    iu = np.triu_indices(len(vecs), k=1)
    s = sims[iu]
    # threshold cut: no pair may sit within MARGIN of 0.3
    assert np.min(np.abs(s - THRESHOLD)) > MARGIN
    # 6-decimal output rounding: reported sims must not straddle a .5 ulp
    # boundary of round(x, 6) — only pairs that can reach the output
    # (>= threshold) matter
    out = s[s >= THRESHOLD]
    frac = np.abs((out * 1e6) % 1.0 - 0.5)
    assert np.min(frac) > MARGIN  # distance from the x.5e-6 tie point


def test_ivf_rank_margins(emb):
    ids, vecs = emb
    mix = ((ids.astype(np.int64) % M31) * _KNUTH) % M31
    order = np.lexsort((ids, mix))[:N_CENTROIDS]
    cents = vecs[order]  # cidx = position in this order

    # assignment rk=1: gap between best and second-best centroid sim
    a_sims = _cosine_matrix(vecs, cents)
    a_sorted = -np.sort(-a_sims, axis=1)
    gaps = a_sorted[:, 0] - a_sorted[:, 1]
    assert np.min(np.where(gaps == 0.0, np.inf, gaps)) > MARGIN

    # probe rk<=n_probe cutoff for each query
    q = vecs[ids < N_QUERIES]
    p_sims = _cosine_matrix(q, cents)
    p_sorted = -np.sort(-p_sims, axis=1)
    for row in p_sorted:
        assert _rank_gap_ok(row, N_PROBE) > MARGIN

    # top-k rk<=k cutoff among each query's probed candidates
    # argmax breaks exact ties by lowest index == the oracle's cidx ASC
    assign = np.argmax(a_sims, axis=1)
    for qi, qid in enumerate(ids[ids < N_QUERIES]):
        probed = set(np.argsort(-p_sims[qi], kind="stable")[:N_PROBE])
        cand = [i for i in range(len(ids)) if assign[i] in probed and ids[i] != qid]
        c_sims = _cosine_matrix(q[qi : qi + 1], vecs[cand])[0]
        c_sorted = -np.sort(-c_sims)
        assert _rank_gap_ok(c_sorted, K) > MARGIN
        # 6-decimal rounding margin on the reported top-k sims
        top = c_sorted[:K]
        frac = np.abs((top * 1e6) % 1.0 - 0.5)
        assert np.min(frac) > MARGIN
