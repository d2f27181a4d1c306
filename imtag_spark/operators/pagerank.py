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
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imtag_spark.plans.checkpoint import (
    free_local_checkpoint,
    frontier_checkpoint,
    frontier_storage,
)

#: auto mode takes the broadcast_join path at or below this vertex count
#: (per-superstep rank broadcast ≈ 16B × V per executor — 320 MB at the
#: threshold); the CSR ``broadcast`` mode shares the gate when requested
#: explicitly (ranks array ≈ 8B × V per executor)
BROADCAST_VERTEX_LIMIT = 20_000_000

#: auto mode's cluster-size cap on the broadcast_join choice: the
#: per-superstep broadcast ships O(V) bytes to EVERY executor, so its total
#: network cost is V × executors while the join mode's ranks exchange moves
#: O(V) rows once. Locally (fan-out 1) broadcast_join wins by ~1.2x
#: (BENCH.md r3 A/B); that margin cannot survive a fan-out hundreds of
#: times larger, so past this executor count auto routes to join. The
#: sandbox cannot price a real network — the constant is deliberately
#: conservative (a 16-executor fan-out of a gate-sized V is ~5 GB/round);
#: callers who have measured their cluster can still pass
#: mode='broadcast_join' explicitly.
AUTO_BROADCAST_EXECUTOR_LIMIT = 16


def _cluster_executor_count(spark) -> int:
    """Executor-JVM count = the broadcast fan-out multiplier auto must
    price. ``spark.executor.instances`` when set (static allocation);
    otherwise the scheduler's live executor list (dynamic allocation —
    a point-in-time floor, which is the conservative direction here);
    local mode has no separate executors and reports 1."""
    try:
        inst = spark.sparkContext.getConf().get("spark.executor.instances", None)
        if inst:
            return max(1, int(inst))
    except Exception:
        pass
    try:
        # driver appears in the memory-status map — exclude it
        n = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
        return max(1, n)
    except Exception:
        return 1


def _auto_prefers_broadcast_join(n_vertices: int, executors: int) -> bool:
    """The auto-mode gate, pure so tests can exercise cluster shapes this
    sandbox cannot launch: broadcast_join only while BOTH the per-executor
    broadcast (V) and the cluster fan-out (executors) stay inside the
    measured-win regime."""
    return (
        n_vertices <= BROADCAST_VERTEX_LIMIT
        and executors <= AUTO_BROADCAST_EXECUTOR_LIMIT
    )

#: log2 of the rank-packing block size for the broadcast_join superstep:
#: 2^4 = 16 ranks per packed map row (see the packing comment in
#: ``pagerank``). Chosen so the O(block) map probe per edge stays a few
#: cache-resident int64 comparisons while the driver-side broadcast build
#: shrinks 16x.
_PACK_BITS = 4


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
    mode: str = "auto",
) -> DataFrame:
    """Edge table (src, dst) → ranks (vertex, rank). Ranks sum to 1.

    ``directed=False`` symmetrizes the edge set first. Self-loops are
    dropped; duplicate edges are counted once (set semantics, matching the
    oracle).

    ``mode``:
    - ``"join"`` — fully distributed: every superstep is one gather join +
      one aggregate; scales to any V; per superstep the V-row ranks side
      exchanges to meet the cached src-partitioned transitions, and the
      map-side-combined contributions exchange to the dst aggregate.
    - ``"broadcast_join"`` — the JVM-pipeline sibling of ``broadcast``:
      transitions are cached hash-partitioned by ``dst``; each superstep
      broadcast-hash-joins the V-row ranks into them (no exchange on
      either join side) and the ``groupBy(dst)`` aggregate reuses the
      cached dst partitioning, so the E-row side NEVER exchanges and no
      per-superstep Arrow transit exists — the whole superstep stays in
      whole-stage codegen. Costs one O(V × executors) broadcast per
      round; gated on V ≤ BROADCAST_VERTEX_LIMIT (falls back to join
      above it). Unlike the CSR ``broadcast`` mode, rank state remains a
      DataFrame, so checkpointer/resume works. On a real cluster this
      trades the join mode's two per-superstep shuffles for broadcast
      fan-out; in this sandbox (tmpfs shuffle) see BENCH.md's A/B table.
    - ``"broadcast"`` — CSR-tile gather-scatter: ranks live in a broadcast
      NumPy array, each dst-partitioned edge tile computes its partial
      contribution sums vectorized, and only O(V) aggregated rows shuffle
      per superstep. Wins on small-to-mid graphs (E below ~10^7) while V
      fits a broadcast; above that the per-superstep Arrow transit of the
      E-row tiles loses to the join path (measured: 2x slower at 64M
      edges). No checkpointer support (driver holds the V-sized state).
    - ``"auto"`` (the default since r4) — ``broadcast_join`` when
      V ≤ BROADCAST_VERTEX_LIMIT AND the cluster's executor count is
      within AUTO_BROADCAST_EXECUTOR_LIMIT, else ``join``. The V gate is
      from the r3 interleaved A/B (BENCH.md): the broadcast-join
      superstep beat the join superstep at every measured size (8/16/64M
      transition rows; 64M steady-state 21.4M vs 17.7M edges/s), it is
      checkpointer-safe, and the gate needs no extra edge-count job. The
      executor gate (since r5) prices what this sandbox cannot measure:
      the broadcast fan-out is O(V × executors) per superstep while the
      join mode shuffles only O(V) rows, so on many-executor deployments
      auto routes to ``join`` — callers who have measured their cluster
      can still pick ``broadcast_join`` explicitly. The CSR ``broadcast``
      mode is explicit-only now — its Arrow tile transit loses to
      broadcast_join's all-JVM superstep at every size measured.
    """
    if mode not in ("join", "broadcast", "broadcast_join", "auto"):
        raise ValueError(f"unknown mode: {mode}")
    if mode == "broadcast" and checkpointer is not None:
        raise ValueError(
            "mode='broadcast' holds rank state driver-side and does not "
            "support a checkpointer; use mode='join' or 'auto' (both are "
            "checkpointer-safe — auto's broadcast_join path keeps rank "
            "state in DataFrames)"
        )
    # Clean the edge set ONCE; both paths (and the vertex universe) reuse it.
    e = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=frontier_storage())
    )
    n = vertices.count()
    use_broadcast = mode == "broadcast"
    if use_broadcast:
        return _pagerank_broadcast(
            e,
            alpha=alpha,
            tol=tol,
            max_iter=max_iter,
            verbose=verbose,
            metrics_out=metrics_out,
        )
    if n == 0:
        return edges.sparkSession.createDataFrame([], "vertex BIGINT, rank DOUBLE")

    # broadcast_join keeps rank state in DataFrames (checkpointer-safe)
    # but pays an O(V) broadcast per round — enforce the same V bound as
    # the CSR mode, falling back to the any-scale join path above it.
    # auto: measured at 8/16/64M edges (BENCH.md r3 A/B, per-superstep
    # min over 3 interleaved reps), broadcast_join beats the join mode at
    # every size on this host (64M steady: 21.4M vs 17.7M edges/s), so
    # within the V gate it is the auto choice — no edge-count job needed.
    # auto additionally prices the cluster: the broadcast fan-out is
    # O(V × executors)/superstep vs the join path's O(V)-row exchange, so
    # many-executor deployments route to join (r4 VERDICT "what's wrong"
    # #4 — the naive caller the default exists for runs on that cluster).
    # An explicit mode="broadcast_join" remains the caller's measured call.
    use_bjoin = n <= BROADCAST_VERTEX_LIMIT and (
        mode == "broadcast_join"
        or (
            mode == "auto"
            and _auto_prefers_broadcast_join(
                n, _cluster_executor_count(edges.sparkSession)
            )
        )
    )

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Transition table: one row per edge with its 1/out_deg weight — built
    # once, reused every superstep. CRITICAL for scale: persist it
    # hash-partitioned AND sorted on the superstep join key. A cached
    # InMemoryRelation advertises its child's outputPartitioning/ordering
    # to Catalyst (localCheckpoint does NOT — LogicalRDD drops both, which
    # re-exchanged and re-sorted all E rows every superstep); with the
    # cache, each superstep exchanges only the V-row ranks side while the
    # E-row side never moves again.
    #
    # broadcast_join flips the cached partitioning to ``dst`` (the agg
    # key): the superstep's gather join is then a broadcast hash join (no
    # exchange on either side) whose output still carries the cached dst
    # partitioning, so the groupBy(dst) needs no exchange either — the
    # E-row side never moves AND never re-aggregates across the wire. No
    # sortWithinPartitions: hash join + hash agg don't consume ordering.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    transitions = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    if use_bjoin:
        # Hash-block packing for the per-superstep rank broadcast. A naive
        # broadcast of the V-row ranks serializes the superstep on the
        # driver: BroadcastExchange collects V rows and builds the hashed
        # relation single-threaded — measured 1.7-2.1 s per superstep at
        # V=4M (stage-gap decomposition, BENCH.md r4), an Amdahl term that
        # alone capped N→4N scaling at ~0.55. Packing 2^PACK_BITS ranks
        # per row (block = hash(vertex) mod nblocks, so density is
        # guaranteed for ANY id distribution — dense ranges and sparse
        # 64-bit hash ids alike) shrinks the driver-side build to V/16
        # rows; the per-edge cost moves into the already-parallel join as
        # an O(block) map probe in codegen. The blk column is computed
        # once here, cached with the transitions.
        nblocks = max(1, (n + (1 << _PACK_BITS) - 1) >> _PACK_BITS)
        transitions = transitions.withColumn(
            "blk", F.pmod(F.xxhash64("src"), F.lit(nblocks))
        )
        transitions = transitions.repartition(n_part, "dst").persist()
    else:
        transitions = (
            transitions.repartition(n_part, "src")
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
        .localCheckpoint(eager=True, storageLevel=frontier_storage())
    )
    # dangling mass of the CURRENT ranks; recomputed inside each round's
    # single convergence-check job so every superstep costs exactly one
    # Spark job (join + agg + checkpoint materialization fused).
    dangling = (
        ranks.where(~F.col("has_out")).agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
    ).collect()[0][0]
    # ranks (which embeds the dangling flags) is materialized — the setup
    # vertex-universe checkpoint has no further reader
    free_local_checkpoint(vertices)

    base = (1.0 - alpha) / n
    # handle to the live frontier's bare localCheckpoint — freed as soon as
    # the next round materializes (keeps block-manager storage flat across
    # long runs instead of hoarding one superseded rank copy per round)
    prev_ck = ranks
    for it in range(max_iter):
        t0 = time.time()
        if use_bjoin:
            # parallel packing agg (V rows → V/16 map rows), broadcast of
            # the small packed table, probe inside whole-stage codegen;
            # groupBy(dst) still reuses the cached dst partitioning — the
            # E-row side neither exchanges nor leaves the JVM
            packed = (
                ranks.select(
                    F.pmod(F.xxhash64("vertex"), F.lit(nblocks)).alias("blk"),
                    F.struct(
                        F.col("vertex").alias("k"), F.col("rank").alias("v")
                    ).alias("kv"),
                )
                .groupBy("blk")
                .agg(F.map_from_entries(F.collect_list("kv")).alias("rmap"))
            )
            contribs = (
                transitions.join(F.broadcast(packed), "blk")
                .groupBy("dst")
                .agg(
                    F.sum(
                        F.col("rmap")[F.col("src")] * F.col("w")
                    ).alias("contrib")
                )
            )
        else:
            ranks_side = ranks.select(F.col("vertex").alias("src"), "rank")
            contribs = (
                transitions.join(ranks_side, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            )
        if metrics_out is not None and it == 0:
            # first-superstep physical plan, for the plan-quality tests
            # (asserts the cached E-row side never re-exchanges)
            metrics_out["contribs_plan"] = (
                contribs._jdf.queryExecution().executedPlan().toString()
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
        # lazy: materialized (and lineage truncated) by the collect below
        new_ranks = frontier_checkpoint(new_ranks, eager=False)
        # One job: L1 delta + next round's dangling mass together.
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("r0"))).alias("delta"),
            F.coalesce(
                F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("dangling"),
        ).collect()[0]
        delta, dangling = float(row["delta"]), float(row["dangling"])
        # the fused agg materialized this round's checkpoint — the previous
        # round's rank blocks are dead; release them now
        free_local_checkpoint(prev_ck)
        prev_ck = new_ranks  # the bare checkpoint handle (pre-drop)
        # Durable checkpoint WITHOUT the transient r0 column (it would
        # inflate the frontier parquet ~33% and drift the resume schema);
        # the drop is a projection over the already-materialized
        # localCheckpoint, so the parquet write re-computes nothing.
        new_ranks = new_ranks.drop("r0")
        if checkpointer is not None and (it + 1) % checkpoint_every == 0:
            new_ranks = checkpointer.save(new_ranks, it + 1)
        if verbose:
            print(f"[pagerank] iter {it + 1} delta={delta:.3e} {time.time() - t0:.1f}s", flush=True)
        if checkpointer is not None:
            checkpointer.log_metrics(it + 1, l1_delta=delta)
        if metrics_out is not None:
            metrics_out.setdefault("superstep_times", []).append(time.time() - t0)
            metrics_out["supersteps"] = it + 1
            metrics_out["mode"] = "broadcast_join" if use_bjoin else "join"
        ranks = new_ranks
        if delta < tol:
            break
    # ranks are checkpointed per round — safe to drop the setup cache
    transitions.unpersist()
    return ranks.select("vertex", "rank")


def _pagerank_broadcast(
    e: DataFrame,
    *,
    alpha: float,
    tol: float,
    max_iter: int,
    verbose: bool,
    metrics_out: dict | None,
) -> DataFrame:
    """CSR-tile gather-scatter (SURVEY.md §7 step 6): broadcast ranks array,
    per-partition vectorized contribution sums, O(V)-row shuffle/superstep.

    ``e`` arrives cleaned (no self-loops, deduped, symmetrized if
    undirected). Setup builds the tiles ONCE: edges are mapped into the
    dense [0, V) index space (int32), hash-partitioned by dst index and
    sorted within partitions — a compressed-sparse tile per partition, so
    the per-superstep kernel is a pure gather (``r[src_idx] * w``) plus a
    segmented ``add.reduceat``, and the per-superstep shuffle carries at
    most V aggregated rows instead of the join mode's E.

    Measured tradeoff (this sandbox, 64M edges / 4M vertices): the join
    mode wins here, because local shuffles go through tmpfs (memory
    bandwidth) while this mode pays an Arrow transfer of the tile columns
    into Python each superstep. The shuffle-volume savings matter when
    shuffle crosses a real network — i.e. on the multi-executor clusters
    the north rule targets — and when V ≪ E (dense graphs). Per-superstep
    driver work is O(V) NumPy (one broadcast out, one aggregated collect
    in), which is what bounds this mode's scale.
    """
    spark = e.sparkSession
    sc = spark.sparkContext
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    transitions = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )

    # V-sized driver state: sorted vertex ids, has-out-edges mask
    vids_rows = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .toPandas()
    )
    vids = np.sort(vids_rows["v"].to_numpy(dtype=np.int64))
    n = len(vids)
    if n == 0:
        return spark.createDataFrame([], "vertex BIGINT, rank DOUBLE")
    src_ids = np.sort(out_deg.select("src").toPandas()["src"].to_numpy(dtype=np.int64))
    has_out = np.zeros(n, dtype=bool)
    has_out[np.searchsorted(vids, src_ids)] = True
    b_vids = sc.broadcast(vids)

    # CSR tile build (once): translate to int32 index space, cluster by dst
    def to_index_space(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = b_vids.value
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "src_idx": np.searchsorted(
                        v, pdf["src"].to_numpy(dtype=np.int64)
                    ).astype(np.int32),
                    "dst_idx": np.searchsorted(
                        v, pdf["dst"].to_numpy(dtype=np.int64)
                    ).astype(np.int32),
                    "w": pdf["w"].to_numpy(dtype=np.float64),
                }
            )

    tiles = (
        transitions.mapInPandas(
            to_index_space, schema="src_idx INT, dst_idx INT, w DOUBLE"
        )
        .repartition(n_part, "dst_idx")
        .sortWithinPartitions("dst_idx")
        .persist()
    )
    tiles.count()

    rank = np.full(n, 1.0 / n)
    base = (1.0 - alpha) / n

    for it in range(max_iter):
        t0 = time.time()
        b_rank = sc.broadcast(rank)

        def tile_contribs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            r = b_rank.value
            for pdf in batches:
                if not len(pdf):
                    continue
                src_idx = pdf["src_idx"].to_numpy(dtype=np.int32)
                dst_idx = pdf["dst_idx"].to_numpy(dtype=np.int32)
                w = pdf["w"].to_numpy(dtype=np.float64)
                contrib = r[src_idx] * w
                # dst-sorted within the partition: segmented sum, no re-sort
                starts = np.r_[0, np.flatnonzero(np.diff(dst_idx)) + 1]
                yield pd.DataFrame(
                    {
                        "dst_idx": dst_idx[starts],
                        "c": np.add.reduceat(contrib, starts),
                    }
                )

        agg = (
            tiles.mapInPandas(tile_contribs, schema="dst_idx INT, c DOUBLE")
            .groupBy("dst_idx")
            .agg(F.sum("c").alias("c"))
            .toPandas()
        )
        contrib_full = np.zeros(n)
        contrib_full[agg["dst_idx"].to_numpy(dtype=np.int64)] = agg["c"].to_numpy(
            dtype=np.float64
        )
        dangling = rank[~has_out].sum()
        new_rank = base + alpha * (contrib_full + dangling / n)
        delta = float(np.abs(new_rank - rank).sum())
        rank = new_rank
        b_rank.destroy()
        if verbose:
            print(
                f"[pagerank/bcast] iter {it + 1} delta={delta:.3e} "
                f"{time.time() - t0:.1f}s",
                flush=True,
            )
        if metrics_out is not None:
            metrics_out.setdefault("superstep_times", []).append(time.time() - t0)
            metrics_out["supersteps"] = it + 1
            metrics_out["mode"] = "broadcast"
        if delta < tol:
            break
    tiles.unpersist()
    b_vids.destroy()
    out = spark.createDataFrame(
        pd.DataFrame({"vertex": vids, "rank": rank}),
        schema="vertex BIGINT, rank DOUBLE",
    )
    return out
