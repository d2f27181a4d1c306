"""Morphology over run tables: complement (invert), dilate, merge-overlaps.

Generalizes the reference's morphology suite
(/root/reference/src/morphology.cpp):

- M1 ``invert`` (morphology.cpp:101-142): per-row **interval complement**
  of the run set. The reference walks each row's runs emitting the gaps
  (interior gaps :122-128, row-leading gap :115-121, row-trailing gap
  :129-136) and emits a full-width run for empty rows (:112-114). Here the
  same three cases are one ``lag()`` window over ``(row ORDER BY
  col_begin)`` plus a per-row tail aggregate plus an anti-join for empty
  rows — all JVM-side, one shuffle on ``row``.
- M2 ``dilate`` (morphology.cpp:144-170, specified-by-intent only — never
  instantiated in the reference, SURVEY.md §2.6): expand every run ±mx
  columns / ±my rows with border clamps, then merge overlapping runs (the
  step the reference's ``//TODO rectify row`` comment :166 admits it
  skips). Row replication is ``explode(sequence(...))``; the merge is the
  classic islands pattern on a running-max window.

Scale notes: every window here partitions by ``row`` — a single image row
is bounded by the image width, never by the dataset, so no window funnels
unbounded data through one task. Empty-row generation uses a
``spark.range`` anti-join (narrow on the broadcast side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def complement_runs(runs: DataFrame, n_rows: int, n_cols: int) -> DataFrame:
    """Per-row interval complement: runs → background runs (M1's gap scan).

    Input/output schema: (row INT, col_begin INT, col_end INT exclusive).
    Covers: interior gaps, row-leading/trailing gaps, fully-empty rows.
    """
    spark = runs.sparkSession
    w = Window.partitionBy("row").orderBy("col_begin")
    # interior + leading gaps: gap = [prev_end (or 0), next run's begin)
    gaps = (
        runs.select(
            "row",
            F.coalesce(F.lag("col_end").over(w), F.lit(0)).alias("col_begin"),
            F.col("col_begin").alias("col_end"),
        )
        .where(F.col("col_end") > F.col("col_begin"))
    )
    # trailing gap: [max(col_end), n_cols)
    tails = (
        runs.groupBy("row")
        .agg(F.max("col_end").alias("col_begin"))
        .where(F.col("col_begin") < n_cols)
        .select("row", "col_begin", F.lit(n_cols).alias("col_end"))
    )
    # empty rows: full-width run (reference morphology.cpp:112-114)
    occupied = runs.select("row").distinct()
    empty = (
        spark.range(n_rows)
        .select(F.col("id").cast("int").alias("row"))
        .join(occupied, "row", "anti")
        .select("row", F.lit(0).alias("col_begin"), F.lit(n_cols).alias("col_end"))
    )
    out = gaps.unionByName(tails).unionByName(empty)
    return out.select(
        F.col("row").cast("int"),
        F.col("col_begin").cast("int"),
        F.col("col_end").cast("int"),
    )


def merge_overlapping_runs(runs: DataFrame) -> DataFrame:
    """Merge overlapping/touching runs per row (islands on a running max).

    The cleanup the reference's dilate skips (morphology.cpp:166 TODO);
    required so dilated run tables keep the "maximal run" invariant the
    interval joins rely on.
    """
    w = Window.partitionBy("row").orderBy("col_begin", "col_end")
    prev_max = F.max("col_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = runs.withColumn(
        "_new", F.when(prev_max.isNull() | (F.col("col_begin") > prev_max), 1).otherwise(0)
    )
    island = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("_island", island)
        .groupBy("row", "_island")
        .agg(F.min("col_begin").alias("col_begin"), F.max("col_end").alias("col_end"))
        .select("row", "col_begin", "col_end")
    )


def dilate(
    runs: DataFrame, mx: int, my: int, n_rows: int, n_cols: int
) -> DataFrame:
    """Dilate by a (2mx+1)×(2my+1) rectangle with border clamps (M2).

    Row replication via explode(sequence) — one narrow map then the merge
    shuffle on ``row``. Output runs are maximal (merged), unlike the
    reference's specified-by-intent version.
    """
    expanded = runs.select(
        F.explode(
            F.sequence(
                F.greatest(F.col("row") - my, F.lit(0)),
                F.least(F.col("row") + my, F.lit(n_rows - 1)),
            )
        ).alias("row"),
        F.greatest(F.col("col_begin") - mx, F.lit(0)).alias("col_begin"),
        F.least(F.col("col_end") + mx, F.lit(n_cols)).alias("col_end"),
    )
    return merge_overlapping_runs(expanded).select(
        F.col("row").cast("int"),
        F.col("col_begin").cast("int"),
        F.col("col_end").cast("int"),
    )
