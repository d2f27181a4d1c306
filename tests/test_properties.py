"""Property-based invariants (SURVEY.md §5) on seeded random graphs/grids.

Budgeted for Spark round-trip cost: few examples, no deadline; the random
structure across percolation-ish densities is what buys coverage.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from imtag_spark.operators.cc import connected_components
from imtag_spark.operators.interval_join import CROSS, EIGHT_WAY, adjacent_row_edges
from imtag_spark.operators.rle import grid_to_runs
from imtag_spark.sources.grids import grid_to_cells, make_grid
from tests.oracles import cc_min_label, grid_edges, grid_runs


def _edges_df(spark, pairs):
    if not pairs:
        return spark.createDataFrame([], "src BIGINT, dst BIGINT")
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cc_is_partition_with_min_labels(spark, seed):
    rng = np.random.default_rng(seed)
    n_v = int(rng.integers(5, 60))
    n_e = int(rng.integers(0, 120))
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, n_v, size=(n_e, 2))]
    rows = connected_components(_edges_df(spark, pairs)).collect()
    labels = {r["vertex"]: r["component"] for r in rows}
    if not pairs:
        assert labels == {}
        return
    # every edge endpoint labeled EXACTLY once (a dict comprehension alone
    # would mask duplicate-vertex rows — the bug class the star-forest
    # certificate once had), label == min of component
    assert len(rows) == len(labels)
    verts = {v for p in pairs for v in p}
    assert set(labels) == verts
    oracle = cc_min_label(max(verts) + 1, [(a, b) for a, b in pairs])
    for v in verts:
        assert labels[v] == oracle[v]


@pytest.mark.parametrize("seed,p", [(5, 0.35), (6, 0.5), (7, 0.65)])
def test_grid_cc_idempotent_and_coarsening(spark, seed, p):
    grid = make_grid(24, 24, p, seed)
    runs = grid_to_runs(grid_to_cells(spark, grid)).localCheckpoint(eager=True)
    oracle_runs = grid_runs(grid)
    assert runs.count() == len(oracle_runs)

    by_conn = {}
    for conn in (CROSS, EIGHT_WAY):
        edges = adjacent_row_edges(runs, conn)
        labels = {r["vertex"]: r["component"]
                  for r in connected_components(edges).collect()}
        oracle = cc_min_label(len(oracle_runs), grid_edges(oracle_runs, conn))
        for v, lbl in labels.items():
            assert lbl == oracle[v]
        by_conn[conn] = oracle

    # EIGHT_WAY coarsens CROSS: same CROSS label => same EIGHT label
    cross, eight = by_conn[CROSS], by_conn[EIGHT_WAY]
    import collections

    cross_groups = collections.defaultdict(set)
    for v, lbl in enumerate(cross):
        cross_groups[lbl].add(eight[v])
    assert all(len(s) == 1 for s in cross_groups.values())


def test_cc_idempotent_on_own_output(spark):
    rng = np.random.default_rng(9)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(60, 2))]
    labels1 = connected_components(_edges_df(spark, pairs))
    # re-run CC on the (vertex -> component) star edges: must reproduce itself
    star = labels1.select(F.col("vertex").alias("src"),
                          F.col("component").alias("dst"))
    labels2 = {r["vertex"]: r["component"]
               for r in connected_components(star).collect()}
    for r in labels1.collect():
        assert labels2[r["vertex"]] == r["component"]


def test_cc_invariant_to_input_partitioning(spark):
    rng = np.random.default_rng(13)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 200, size=(400, 2))]
    e = _edges_df(spark, pairs)
    base = {r["vertex"]: r["component"]
            for r in connected_components(e).collect()}
    for n_part in (1, 3, 16):
        shuffled = e.repartition(n_part)
        got = {r["vertex"]: r["component"]
               for r in connected_components(shuffled).collect()}
        assert got == base
