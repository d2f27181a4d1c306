"""Synchronous label propagation for community detection (north-rule operator).

Generalizes the reference's "adopt a neighbor's label" merge
(``disjoint_set::unite``, /root/reference/src/disjoint_set.hpp:125-137) into
synchronous LPA: every superstep each vertex adopts the most frequent label
among its neighbors, ties broken by the minimum label — fully deterministic,
mirroring the reference's ``lt_cmp`` policy (disjoint_set.hpp:22-27).

Scale notes: the frequency count is a map-side-combinable
``groupBy(vertex,label).count()``; the argmax is taken with a single
``max(struct(cnt, -label))`` aggregate rather than a per-vertex window
(windows funnel a hot vertex's whole neighborhood through one task).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imtag_spark.plans.checkpoint import (
    free_local_checkpoint,
    frontier_checkpoint,
    frontier_storage,
)


def label_propagation(
    edges: DataFrame,
    *,
    max_iter: int = 10,
    verbose: bool = False,
) -> DataFrame:
    """Edge table (src, dst) → (vertex, label) after ≤ max_iter synchronous rounds.

    Undirected semantics (edges symmetrized). Isolated/self-loop-only
    vertices keep their own id as label. Stops early when no label changes.

    Loop hygiene (same contract as cc.py / pagerank.py): the symmetrized
    E-row side is persisted hash-partitioned on the per-round join key
    ``src`` — a cached InMemoryRelation advertises its outputPartitioning
    to Catalyst (a localCheckpoint would NOT: LogicalRDD drops it, which
    re-exchanged all E rows every round pre-r5), so each round exchanges
    only the V-row labels side. Superseded label frontiers are freed the
    moment the next round is materialized, keeping block-manager storage
    flat across high-iteration runs instead of hoarding one V-row copy per
    round.
    """
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition(n_part, "src").persist()

    # the vertex universe is joined on ``vertex`` every round: persist it
    # pre-partitioned on that key for the same no-re-exchange reason as sym
    universe = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(n_part, "vertex")
        .persist()
    )
    labels = universe.select("vertex", F.col("vertex").alias("label"))
    labels = frontier_checkpoint(labels)
    prev_ckpt = labels  # the materialized frontier the current round reads

    for it in range(max_iter):
        t0 = time.time()
        neighbor_labels = sym.join(
            labels.select(F.col("vertex").alias("src"), "label"), "src"
        ).select(F.col("dst").alias("vertex"), "label")
        # most frequent neighbor label, min label on ties:
        # max(struct(cnt, -label)) == argmax by (count asc→desc, label desc→asc)
        freq = neighbor_labels.groupBy("vertex", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        best = (
            freq.groupBy("vertex")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("b"))
            .select("vertex", (-F.col("b.neg")).alias("label"))
        )
        new_labels = (
            universe.join(best, "vertex", "left")
            .join(labels.withColumnRenamed("label", "old_label"), "vertex")
            .select("vertex", F.coalesce("label", "old_label").alias("label"),
                    "old_label")
        ).localCheckpoint(eager=False, storageLevel=frontier_storage())
        # One fused action per round (CC's certificate/collect pattern,
        # cc.py::_chained_count): the aggregate both materializes the lazy
        # checkpoint and returns the changed-label count — no separate
        # count() job over a filtered view of the frontier.
        changed = int(
            new_labels.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("label") != F.col("old_label"), 1)
                    ),
                    F.lit(0),
                ).alias("changed")
            ).collect()[0]["changed"]
        )
        if verbose:
            print(f"[lpa] iter {it + 1} changed={changed} {time.time() - t0:.1f}s", flush=True)
        # new_labels is materialized (the agg above ran it): the previous
        # round's frontier blocks can never be read again — free them now
        free_local_checkpoint(prev_ckpt)
        prev_ckpt = new_labels
        labels = new_labels.select("vertex", "label")
        if changed == 0:
            break
    # the returned frame reads only the final materialized frontier — the
    # cached edge table and the vertex universe are dead weight past here
    sym.unpersist(blocking=True)
    universe.unpersist(blocking=True)
    return labels
