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
    # (R, C) = (3840, 2160): the orientation whose harvested reference
    # counts are 1,990,781 runs / 1,910,343 edges (FIXTURES.md bench4k)
    "bench4k": (3840, 2160, 0.60, 42),
}


def make_grid(rows: int, cols: int, p: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.random((rows, cols)) < p).astype(np.uint8) * 255


def named_grid(name: str) -> np.ndarray:
    r, c, p, seed = GRID_SPECS[name]
    return make_grid(r, c, p, seed)


def grid_to_cells(spark: SparkSession, grid: np.ndarray, num_partitions: int | None = None) -> DataFrame:
    """Dense binary grid → foreground-cell DataFrame (row INT, col INT).

    The driver ships only a bit-packed row payload (C/8 bytes per image
    row — ~1 MB for a 4K frame); executors unpack bits to cells
    vectorized. A 5M-cell frame never funnels through a driver-side
    pandas DataFrame (measured: 44 s → ~3 s on the 2160×3840 fixture).
    """
    import pandas as pd

    packed = np.packbits(grid != 0, axis=1)  # (R, ceil(C/8)) uint8
    n_cols = grid.shape[1]
    rows_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "row": np.arange(grid.shape[0], dtype=np.int32),
                "bits": [r.tobytes() for r in packed],
            }
        ),
        schema="row INT, bits BINARY",
    )
    if num_partitions:
        rows_df = rows_df.repartition(num_partitions)
    else:
        rows_df = rows_df.repartition(
            spark.sparkContext.defaultParallelism, "row"
        )

    def unpack(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_rows = []
            out_cols = []
            for row, bits in zip(pdf["row"], pdf["bits"]):
                cols = np.flatnonzero(
                    np.unpackbits(np.frombuffer(bits, dtype=np.uint8))[:n_cols]
                )
                out_rows.append(np.full(len(cols), row, dtype=np.int32))
                out_cols.append(cols.astype(np.int32))
            yield pd.DataFrame(
                {
                    "row": np.concatenate(out_rows) if out_rows else [],
                    "col": np.concatenate(out_cols) if out_cols else [],
                }
            )

    return rows_df.mapInPandas(unpack, schema="row INT, col INT")
