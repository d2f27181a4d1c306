"""Interval (band) joins over run tables.

Generalizes the reference's pass-2 merge join (J1,
/root/reference/src/SegmentImageImpl.cpp:96-115) and the overlap predicates
(P2, src/SegmentImageImpl.cpp:68-76):

- CROSS (4-connectivity): strict overlap  ``a.begin < b.end AND b.begin < a.end``
- EIGHT_WAY:              non-strict      ``a.begin <= b.end AND b.begin <= a.end``
  (non-strict because ``col_end`` is exclusive — a diagonal touch connects)
- HORIZONTAL: no inter-row edges at all (each run is its own component;
  the reference's HORIZONTAL path is latent UB — SURVEY.md §4 — we define
  it cleanly).

Spark-first: this is an equi-join on the row key with a band predicate on
the column interval. Catalyst plans it as a shuffle join on ``row``; the
band predicate is evaluated inside the join. One shuffle, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CROSS = "cross"
EIGHT_WAY = "eight_way"
HORIZONTAL = "horizontal"


def _overlap(a_begin, a_end, b_begin, b_end, connectivity: str):
    if connectivity == CROSS:
        return (a_begin < b_end) & (b_begin < a_end)
    if connectivity == EIGHT_WAY:
        return (a_begin <= b_end) & (b_begin <= a_end)
    raise ValueError(f"unknown connectivity: {connectivity}")


def adjacent_row_edges(
    runs: DataFrame, connectivity: str = CROSS, id_col: str = "id"
) -> DataFrame:
    """Self-join runs of row y-1 with runs of row y on interval overlap.

    Returns the edge table ``(src BIGINT, dst BIGINT)`` with src from the
    upper row — scan-order ids make ``src < dst`` automatically canonical.
    """
    if connectivity == HORIZONTAL:
        schema = "src BIGINT, dst BIGINT"
        return runs.sparkSession.createDataFrame([], schema)
    a = runs.select(
        F.col("row").alias("a_row"),
        F.col("col_begin").alias("a_begin"),
        F.col("col_end").alias("a_end"),
        F.col(id_col).alias("src"),
    )
    b = runs.select(
        F.col("row").alias("b_row"),
        F.col("col_begin").alias("b_begin"),
        F.col("col_end").alias("b_end"),
        F.col(id_col).alias("dst"),
    )
    cond = (a["a_row"] == b["b_row"] - F.lit(1)) & _overlap(
        a["a_begin"], a["a_end"], b["b_begin"], b["b_end"], connectivity
    )
    return a.join(b, cond).select("src", "dst")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on_row: bool = True,
    strict: bool = True,
    left_cols: tuple[str, str, str] = ("row", "col_begin", "col_end"),
    right_cols: tuple[str, str, str] = ("row", "col_begin", "col_end"),
    suffix: str = "_r",
) -> DataFrame:
    """Generic same-row interval join between two run tables.

    ``strict=False`` counts touching intervals (shared boundary under
    exclusive ends) as matches — this is what pairs land runs with the
    water runs of the complement (the reference's J2 positional pairing,
    src/morphology.cpp:264-312, replaced by a plain interval join with
    identical output).
    """
    lr, lb, le = left_cols
    rr, rb, re_ = right_cols
    r = right.select([F.col(c).alias(c + suffix) for c in right.columns])
    cond = _overlap(
        F.col(lb), F.col(le), F.col(rb + suffix), F.col(re_ + suffix),
        CROSS if strict else EIGHT_WAY,
    )
    if on_row:
        cond = (F.col(lr) == F.col(rr + suffix)) & cond
    return left.join(r, cond)
