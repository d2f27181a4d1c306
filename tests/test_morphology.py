"""Morphology (M1 invert / M2 dilate / M4 hole adjacencies) vs NumPy oracles.

Dense-semantics oracles: complement is ``grid == 0``; dilation by a
(2mx+1)×(2my+1) rectangle is an OR over shifted copies; hole adjacency is
checked structurally on a handcrafted donut where the answer is known.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from imtag_spark.operators.morphology import complement_runs, dilate, merge_overlapping_runs
from imtag_spark.operators.rle import grid_to_runs
from imtag_spark.plans.pipelines import hole_adjacencies, invert
from imtag_spark.sources.grids import grid_to_cells, named_grid
from tests.oracles import reference_label_image


def _runs_to_mask(rows_list, shape) -> np.ndarray:
    img = np.zeros(shape, dtype=np.uint8)
    for r in rows_list:
        img[r["row"], r["col_begin"]:r["col_end"]] = 1
    return img


def _np_dilate(grid: np.ndarray, mx: int, my: int) -> np.ndarray:
    fg = (grid != 0).astype(np.uint8)
    out = np.zeros_like(fg)
    for dr in range(-my, my + 1):
        for dc in range(-mx, mx + 1):
            shifted = np.zeros_like(fg)
            rs, re = max(dr, 0), fg.shape[0] + min(dr, 0)
            cs, ce = max(dc, 0), fg.shape[1] + min(dc, 0)
            shifted[rs:re, cs:ce] = fg[rs - dr:re - dr, cs - dc:ce - dc]
            out |= shifted
    return out


@pytest.mark.parametrize("name", ["tiny", "small"])
def test_complement_matches_dense_inverse(spark, name):
    grid = named_grid(name)
    runs = grid_to_runs(grid_to_cells(spark, grid))
    comp = complement_runs(runs, *grid.shape).collect()
    got = _runs_to_mask(comp, grid.shape)
    np.testing.assert_array_equal(got, (grid == 0).astype(np.uint8))


def test_complement_handles_empty_and_full_rows(spark):
    grid = np.zeros((4, 6), dtype=np.uint8)
    grid[1, :] = 255          # fully foreground row -> no complement runs
    grid[2, 2:4] = 255        # interior gap row
    runs = grid_to_runs(grid_to_cells(spark, grid))
    comp = complement_runs(runs, 4, 6).collect()
    got = _runs_to_mask(comp, grid.shape)
    np.testing.assert_array_equal(got, (grid == 0).astype(np.uint8))


def test_invert_labels_match_reference_contract(spark):
    grid = named_grid("tiny")
    runs = grid_to_runs(grid_to_cells(spark, grid))
    water_runs, labels = invert(runs, *grid.shape)
    labeled = water_runs.join(
        labels.select(F.col("vertex").alias("id"), "dense_label"), "id"
    ).collect()
    img = np.zeros(grid.shape, dtype=np.uint32)
    for r in labeled:
        img[r["row"], r["col_begin"]:r["col_end"]] = r["dense_label"]
    expected = reference_label_image((grid == 0).astype(np.uint8) * 255, "cross")
    np.testing.assert_array_equal(img, expected)


@pytest.mark.parametrize("mx,my", [(1, 1), (2, 0), (0, 2), (3, 2)])
def test_dilate_matches_numpy(spark, mx, my):
    grid = named_grid("tiny")
    runs = grid_to_runs(grid_to_cells(spark, grid))
    d = dilate(runs, mx, my, *grid.shape).collect()
    got = _runs_to_mask(d, grid.shape)
    np.testing.assert_array_equal(got, _np_dilate(grid, mx, my))


def test_dilate_output_runs_are_maximal(spark):
    grid = named_grid("tiny")
    runs = grid_to_runs(grid_to_cells(spark, grid))
    d = dilate(runs, 1, 1, *grid.shape)
    # maximality: within a row, sorted runs never overlap or touch
    rows = sorted(d.collect(), key=lambda r: (r["row"], r["col_begin"]))
    for a, b in zip(rows, rows[1:]):
        if a["row"] == b["row"]:
            assert a["col_end"] < b["col_begin"]


def test_merge_overlapping_runs(spark):
    df = spark.createDataFrame(
        [(0, 1, 4), (0, 3, 6), (0, 6, 8), (0, 10, 12), (1, 0, 2)],
        "row INT, col_begin INT, col_end INT",
    )
    got = {(r["row"], r["col_begin"], r["col_end"])
           for r in merge_overlapping_runs(df).collect()}
    assert got == {(0, 1, 8), (0, 10, 12), (1, 0, 2)}


def test_hole_adjacencies_donut(spark):
    # 8x8: foreground ring rows/cols 1..6 with a 2x2 hole at rows/cols 3..4
    grid = np.zeros((8, 8), dtype=np.uint8)
    grid[1:7, 1:7] = 255
    grid[3:5, 3:5] = 0
    runs = grid_to_runs(grid_to_cells(spark, grid))
    adj = {(r["component"], r["hole"]) for r in
           hole_adjacencies(runs, 8, 8).collect()}
    # one land component (dense label 1); water components: outer border
    # (contains run (0,0,8) = scan-order min -> dense 1), inner hole (dense 2)
    assert adj == {(1, 1), (1, 2)}


def test_hole_adjacencies_two_lands_share_outer_water(spark):
    # two separate horizontal bars -> two components, one water component
    grid = np.zeros((5, 10), dtype=np.uint8)
    grid[1, 1:4] = 255
    grid[3, 6:9] = 255
    runs = grid_to_runs(grid_to_cells(spark, grid))
    adj = {(r["component"], r["hole"]) for r in
           hole_adjacencies(runs, 5, 10).collect()}
    assert adj == {(1, 1), (2, 1)}
