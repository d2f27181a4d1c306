"""PageRank via DataFrame power iteration (north-rule operator).

Generalizes the gather-scatter structure of the reference's pass-2
neighbor-aggregation sweep (/root/reference/src/SegmentImageImpl.cpp:96-115)
to repeated sparse matvec over the edge table.

Semantics (matched by the NumPy oracle in tests, allclose 1e-6):
standard power iteration with damping ``alpha``, uniform teleport, and
uniform redistribution of dangling-node mass; vertices = src ∪ dst.

Scale design:
- the transition table (edges pre-joined with 1/out-degree) is built ONCE
  and persisted/checkpointed; every superstep after that is a single
  equi-join + one map-side-combinable sum — the minimum shuffle count per
  superstep for a row-store edge layout;
- ranks are repartitioned to the join key so the superstep join reuses the
  same hash partitioning every round (no extra exchange of the big side
  once AQE caches the layout);
- dangling mass is one scalar agg per round (tiny job), not a broadcast
  join;
- lineage truncated every round (see cc.py for why that is mandatory).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    directed: bool = True,
    checkpointer=None,
    checkpoint_every: int = 5,
    verbose: bool = False,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Edge table (src, dst) → ranks (vertex, rank). Ranks sum to 1.

    ``directed=False`` symmetrizes the edge set first. Self-loops are
    dropped; duplicate edges are counted once (set semantics, matching the
    oracle).
    """
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()

    vertices = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "vertex BIGINT, rank DOUBLE")

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Transition table: one row per edge with its 1/out_deg weight — built
    # once, reused every superstep. CRITICAL for scale: persist it
    # hash-partitioned AND sorted on the superstep join key. A cached
    # InMemoryRelation advertises its child's outputPartitioning/ordering
    # to Catalyst (localCheckpoint does NOT — LogicalRDD drops both, which
    # re-exchanged and re-sorted all E rows every superstep); with the
    # cache, each superstep exchanges only the V-row ranks side while the
    # E-row side never moves again.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    transitions = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition(n_part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    transitions.count()  # materialize the cache before timing supersteps
    has_out = out_deg.select(F.col("src").alias("vertex"), F.lit(True).alias("_has_out"))
    # vertex table annotated with dangling flag (computed once); the flag
    # travels inside the rank table so the loop never joins it again
    ranks = (
        vertices.join(has_out, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("_has_out", F.lit(False)).alias("has_out"),
            F.lit(1.0 / n).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    # dangling mass of the CURRENT ranks; recomputed inside each round's
    # single convergence-check job so every superstep costs exactly one
    # Spark job (join + agg + checkpoint materialization fused).
    dangling = (
        ranks.where(~F.col("has_out")).agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
    ).collect()[0][0]

    base = (1.0 - alpha) / n
    for it in range(max_iter):
        t0 = time.time()
        contribs = (
            transitions.join(
                ranks.select(F.col("vertex").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # scatter-merge: old rank rides along as r0, so the convergence
        # check below is a plain aggregate — no extra V⋈V join per round
        new_ranks = (
            ranks.withColumnRenamed("rank", "r0")
            .join(contribs.withColumnRenamed("dst", "vertex"), "vertex", "left")
            .select(
                "vertex",
                "has_out",
                (
                    F.lit(base)
                    + F.lit(alpha)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
                "r0",
            )
        )
        if checkpointer is not None and (it + 1) % checkpoint_every == 0:
            new_ranks = checkpointer.save(new_ranks, it + 1)
        else:
            # lazy: materialized (and lineage truncated) by the collect below
            new_ranks = new_ranks.localCheckpoint(eager=False)
        # One job: L1 delta + next round's dangling mass together.
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("r0"))).alias("delta"),
            F.coalesce(
                F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("dangling"),
        ).collect()[0]
        delta, dangling = float(row["delta"]), float(row["dangling"])
        new_ranks = new_ranks.drop("r0")
        if verbose:
            print(f"[pagerank] iter {it + 1} delta={delta:.3e} {time.time() - t0:.1f}s", flush=True)
        if checkpointer is not None:
            checkpointer.log_metrics(it + 1, l1_delta=delta)
        if metrics_out is not None:
            metrics_out.setdefault("superstep_times", []).append(time.time() - t0)
            metrics_out["supersteps"] = it + 1
        ranks = new_ranks
        if delta < tol:
            break
    # ranks are checkpointed per round — safe to drop the setup cache
    transitions.unpersist()
    return ranks.select("vertex", "rank")
