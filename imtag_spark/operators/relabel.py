"""Dense canonical relabeling (A4 ``compressed_freeze`` analog).

The reference renumbers components 0..M-1 by first encounter in ascending
provisional-label order (/root/reference/src/disjoint_set.hpp:73-96), which
equals the dense rank of each component's minimum member id (verified
contract, SURVEY.md §2.4).

A naive ``dense_rank() OVER (ORDER BY component)`` funnels every component
through one partition. This implements the scale-safe two-phase ranking:
range-partition the distinct components, rank within partitions, then add
per-partition offsets (a tiny table, broadcast back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_component_ranks(
    labels: DataFrame,
    component_col: str = "component",
    rank_col: str = "dense_label",
    base: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """(component) → (component, dense rank by ascending component id).

    ``base`` is the first rank (the reference exports 1-based labels with
    background 0 when ``inc_labels_for_background_0`` is set,
    src/morphology.cpp:31-35).
    """
    n = num_partitions or labels.sparkSession.sparkContext.defaultParallelism
    comps = (
        labels.select(component_col).distinct().repartitionByRange(n, component_col)
    )
    # Materialize before branching: repartitionByRange samples its
    # boundaries, so two separate evaluations (the offsets branch and the
    # ranking branch) could partition differently and corrupt the ranks.
    comps = comps.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # per-partition counts → cumulative offsets; #partitions rows,
    # broadcastable. Constant partition key = same one-partition execution
    # without WindowExec's warning in every log (the table is tiny by
    # construction — one row per shuffle partition); pmod(_pid, 1) is
    # always 0 but column-dependent, so the optimizer cannot fold it out
    # of the partitionSpec (a bare lit(0) is removed).
    counts = comps.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(component_col)
    return (
        comps.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col,
            (F.row_number().over(w_local) - 1 + F.col("_off") + F.lit(base)).cast("long"),
        )
        .select(component_col, rank_col)
    )


def densely_relabel(
    labels: DataFrame,
    component_col: str = "component",
    rank_col: str = "dense_label",
    base: int = 0,
) -> DataFrame:
    """labels(vertex, component) → (vertex, component, dense_label)."""
    ranks = dense_component_ranks(labels, component_col, rank_col, base)
    return labels.join(ranks, component_col)
