"""Dense sinks: scatter run labels back to cell space (S5/S6 analogs).

Generalizes ``to_label_image`` (/root/reference/src/morphology.cpp:10-35):
the engine never materializes a dense array distributed-side — it produces
the *labeled cell table*; densification to a NumPy image is a test/debug
convenience that collects (small fixtures only).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_cells(runs: DataFrame, labels: DataFrame, label_col: str = "dense_label") -> DataFrame:
    """runs(id,row,col_begin,col_end) ⋈ labels(vertex,…) → cells(row,col,label).

    ``sequence``+``explode`` re-densifies runs to cells JVM-side (no UDF).
    """
    lab = labels.select(F.col("vertex").alias("id"), F.col(label_col).alias("label"))
    return (
        runs.join(lab, "id")
        .select(
            "row",
            F.explode(F.sequence(F.col("col_begin"), F.col("col_end") - 1)).alias("col"),
            "label",
        )
    )


def to_label_image(
    cells: DataFrame, rows: int, cols: int, dtype=np.uint32
) -> np.ndarray:
    """Collect a labeled-cell table into a dense array (fixtures/tests only)."""
    pdf = cells.toPandas()
    img = np.zeros((rows, cols), dtype=dtype)
    img[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["label"].to_numpy()
    return img


def label_image_sha256(img: np.ndarray) -> str:
    """sha256 of the raw uint32-LE row-major buffer — the FIXTURES.md golden format."""
    return hashlib.sha256(np.ascontiguousarray(img.astype("<u4")).tobytes()).hexdigest()
