"""Seeded binary-grid fixtures (FIXTURES.md §2) and cell-table construction.

Exactly the generation formula whose outputs were harvested from the
compiled reference: ``rng = np.random.default_rng(seed);
grid = (rng.random((R, C)) < p).astype(np.uint8) * 255``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

GRID_SPECS = {
    # name: (R, C, p, seed)
    "tiny": (16, 16, 0.45, 42),
    "small": (64, 64, 0.50, 42),
    "medium": (256, 256, 0.55, 42),
    "large": (1024, 1024, 0.60, 42),
    "bench4k": (2160, 3840, 0.60, 42),
}


def make_grid(rows: int, cols: int, p: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.random((rows, cols)) < p).astype(np.uint8) * 255


def named_grid(name: str) -> np.ndarray:
    r, c, p, seed = GRID_SPECS[name]
    return make_grid(r, c, p, seed)


def grid_to_cells(spark: SparkSession, grid: np.ndarray, num_partitions: int | None = None) -> DataFrame:
    """Dense binary grid → foreground-cell DataFrame (row INT, col INT).

    Driver-side extraction (fixtures are small); production-scale dense
    ingest would arrive as parquet of cells or runs already.
    """
    rr, cc = np.nonzero(grid)
    import pandas as pd

    pdf = pd.DataFrame({"row": rr.astype(np.int32), "col": cc.astype(np.int32)})
    df = spark.createDataFrame(pdf)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df
