"""Distributed connected components: alternating large-star / small-star.

Generalizes the reference's pass-2 union-find label merge
(/root/reference/src/SegmentImageImpl.cpp:78-116 driving
src/disjoint_set.hpp:125-137): the sequential ``unite`` sweep becomes the
O(log n)-round alternating star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), and the in-process
``disjoint_set`` becomes (a) a *partition-local* NumPy union-find
pre-contraction inside an Arrow UDF — the direct analog of the reference's
shared-memory merge, run shuffle-free per partition — plus (b) the global
iterated ``(vertex → label)`` DataFrame.

Labeling contract (verified against the compiled reference, SURVEY.md §2.4):
final ``component = min(vertex_id)`` over the component. The reference's
pseudo-random link policy (disjoint_set.hpp:13-21) only affects its internal
tree shape, never the exported labels, so min-based hooking reproduces its
output exactly once ids follow scan order.

Scale design notes (100 TB / 1000 executors):
- every superstep is one map-side-combinable ``groupBy().min()`` plus one
  equi-join — no windows partitioned by vertex (a hot vertex would funnel
  its whole adjacency into one task; groupBy gets partial aggregation and
  the join gets AQE skew splitting instead);
- the edge set shrinks monotonically toward #vertices (star edges), so AQE
  re-coalesces partitions as rounds progress;
- lineage is truncated every round via localCheckpoint (or durable parquet
  checkpoints through plans.checkpoint for resumability).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imtag_spark.plans.checkpoint import free_local_checkpoint, frontier_checkpoint

EDGE_SCHEMA = "src BIGINT, dst BIGINT"


# ---------------------------------------------------------------------------
# Partition-local union-find pre-contraction (the imtag disjoint_set analog)
# ---------------------------------------------------------------------------

#: per-chunk edge cap for the partition-local union-find. A skewed producer
#: can hand one task a multi-hundred-million-row partition (e.g. a hub star
#: colocated by the upstream join); chunking bounds the union-find working
#: set (≈ 5 int64 arrays × cap) and the O(E log E) np.unique sort to a
#: constant, and streams results out as Arrow batches arrive instead of
#: buffering the whole partition. Cross-chunk merges are absorbed by the
#: global star rounds (the output stays a valid spanning relabeling).
LOCAL_CONTRACT_CHUNK = 8_000_000

#: edge-count bound under which the ``single_partition`` fast path is a
#: safe default for callers holding a static size bound (half a chunk, so
#: the whole graph is one union-find pass and converges in one round)
SMALL_GRAPH_EDGE_LIMIT = LOCAL_CONTRACT_CHUNK // 2

#: frontier-row bound for the adaptive one-task funnel in the solve loop.
#: Deliberately far below LOCAL_CONTRACT_CHUNK: the funnel is a SERIAL
#: tail (one task), so its time must stay under the distributed round's
#: fixed scheduling floor (~2-3 s) or it becomes the Amdahl term that
#: caps N→4N scaling — measured at a 4.0M-row frontier the funnel costs
#: ~6 s at ANY parallelism level (transit + single union-find), barely
#: beating the distributed round at local[32] (7.5 s) while flattening
#: the core-count response entirely. At ≤1M rows (~16 MB) the single
#: pass runs well under the floor and the funnel is a pure win.
FUNNEL_EDGE_LIMIT = 1_000_000

#: vertex-count bound under which the per-round V-row min-aggregates are
#: broadcast instead of shuffle-hash-joined, so the E-row side never
#: exchanges inside a superstep. Broadcast costs O(V × executors) network
#: per round — fine while V × 16B fits comfortably in executor memory
#: (320 MB at the limit), never the default at arbitrary V.
CC_BROADCAST_VERTEX_LIMIT = 20_000_000

#: edge-count bound above which a round uses the oriented exchange-shared
#: star structure (``_star_contract_round_reuse``). It costs two extra
#: scheduled stages per round (the explicit repartitions), a fixed
#: ~0.3 s/round at local scheduling rates — pure loss on gate-sized
#: graphs, decisively won back once the E-row exchanges carry millions of
#: rows (64M edges round 1: 39.3 s flat → 30.7 s oriented, and 2 E-row
#: exchanges instead of the flat round's 4). The count is free: round 1
#: reads it off the init lineage-truncation job, later rounds off the
#: convergence certificate. Rounds at or below FUNNEL_EDGE_LIMIT are
#: caught by the one-task funnel first; this bound routes the band in
#: between to the flat star round.
REUSE_EDGE_LIMIT = 2_000_000


#: rows per emitted Arrow batch from the contraction (bounds JVM-side
#: buffering of one IPC message; 1M × 16B ≈ 16 MB)
_CONTRACT_OUT_BATCH = 1_000_000


def _local_contract_fn(chunk: int):
    """Build the per-partition union-find closure; emits (vertex, local_root).

    Pure NumPy, array-based, path-halving on vectorized lookups. The output
    pairs are a spanning relabeling of this partition's edge set: feeding
    them to the global algorithm preserves connectivity while cutting the
    edge count to ≤ #distinct local vertices. This mirrors the reference's
    single-address-space union-find, scoped to what actually shares an
    address space in Spark: one partition — processed in bounded chunks
    (``chunk`` edges) so a skew-fattened partition cannot blow up one
    task's memory or stall it on a single giant sort. A closure (not a
    module global) so the chunk bound serializes by value to executors.

    Runs under ``mapInArrow`` (not ``mapInPandas``): the kernel is NumPy
    end-to-end, so the pandas Series wrapping/unwrapping on both sides of
    the transit is pure overhead — Arrow int64 arrays view as NumPy for
    free (no nulls), and results go back as sliced RecordBatches. On this
    steal-noisy host the measured 64M-edge round times are statistically
    unchanged (the transit is not the round's bottleneck after the 500k
    Arrow batch fix); the win is structural — one less columnar
    conversion per direction on every contraction at any scale.
    """
    import pyarrow as pa

    def _batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        buffered = 0

        def _emit():
            verts, roots = _contract_arrays(srcs, dsts)
            out = pa.record_batch(
                [pa.array(verts), pa.array(roots)], names=["src", "dst"]
            )
            for off in range(0, out.num_rows, _CONTRACT_OUT_BATCH):
                yield out.slice(off, _CONTRACT_OUT_BATCH)

        for rb in batches:
            if rb.num_rows == 0:
                continue
            # dtype-preserving: the narrow transit arrives int32 and stays
            # int32 through the whole kernel (see _contract_arrays)
            srcs.append(rb.column(0).to_numpy(zero_copy_only=False))
            dsts.append(rb.column(1).to_numpy(zero_copy_only=False))
            buffered += rb.num_rows
            if buffered >= chunk:
                yield from _emit()
                srcs, dsts, buffered = [], [], 0
        if srcs:
            yield from _emit()

    return _batches


def _contract_arrays(
    srcs: list[np.ndarray], dsts: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Dtype-preserving: int32 inputs (the ``narrow`` transit) keep the
    whole working set — the unique sort, the gather loop, the vertex
    array — at 4 bytes/element. Measured per 2M-row task (this host,
    quiet): 1.49 s int64 → 0.46 s int32, 3.2×; the stage is memory-bound
    (``np.minimum.at`` scatter + sort bandwidth), so bytes ARE time.
    Output is upcast to int64 at emit (output is ~V rows, negligible)."""
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    verts, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    # The hooking loop below is pure random-gather (p[a], p[p], minimum.at)
    # over index arrays; its budget is the memory system, not FLOPs. Indices
    # are bounded by len(verts) ≤ 2 × chunk ≪ 2^31, so they fit int32 —
    # halving the gather traffic and the p-array cache footprint. Measured
    # under 32-way task contention (this host's actual execution regime at
    # local[32]): 23 s → 2.7 s per 2M-edge/4M-vertex task, 8.6×; single-task
    # time unchanged (0.83 s → 0.81 s). int64 kept as the (untested-scale)
    # fallback for a >2^31-vertex chunk, which the chunk cap precludes.
    ptr_dtype = np.int32 if len(verts) < 2**31 else np.int64
    idx = idx.astype(ptr_dtype, copy=False)
    a = idx[: len(src)]
    b = idx[len(src):]
    # Shiloach-Vishkin-style vectorized hooking — no per-edge Python.
    # Each round: relabel edges to current roots, min-hook the roots, two
    # pointer-doubling passes, drop intra-component edges. The edge
    # relabeling contracts the graph, so rounds are O(log n) (measured: 3
    # rounds / 1.6 s on a 4M-edge 1M-vertex partition vs ~diameter rounds /
    # 11 s for naive neighbor-min propagation). p holds *indices* into
    # verts; verts is sorted ascending, so index-min == vertex-min (the
    # labeling contract's min-hooking).
    p = np.arange(len(verts), dtype=ptr_dtype)
    while len(a):
        pa, pb = p[a], p[b]
        live = pa != pb
        a, b = pa[live], pb[live]
        if not len(a):
            break
        np.minimum.at(p, a, b)
        np.minimum.at(p, b, a)
        p = p[p]
        p = p[p]
        a, b = p[a], p[b]
        keep = a != b
        a, b = a[keep], b[keep]
    while True:  # final full path compression
        nxt = p[p]
        if np.array_equal(nxt, p):
            break
        p = nxt
    return (
        verts.astype(np.int64, copy=False),
        verts[p].astype(np.int64, copy=False),
    )


def local_contract(
    edges: DataFrame, chunk: int = LOCAL_CONTRACT_CHUNK, narrow: bool = False
) -> DataFrame:
    """Shuffle-free per-partition contraction: edges → (vertex, local_root) pairs.

    ``narrow`` — transit the edge columns to the Python workers as INT32
    instead of INT64, halving the bytes through the round's one
    non-JVM stage (Arrow IPC both ways, the unique sort, the union-find
    gathers — all memory-bound; measured 3.2× per task). The caller must
    hold an id-range bound (``|id| < 2³¹``): ``connected_components``
    measures it once on the init job — min-hooking only ever moves labels
    DOWN to existing vertex ids, so bounds checked at init hold for every
    round — and grid callers hold it statically (run ids ≤ cell count).
    Mirrors the reference's 32-bit label representation
    (/root/reference/src/disjoint_set.hpp:24, uint32_t parents;
    src/SegmentImageImpl.hpp:12 label_t = uint16/uint32): id spaces that
    fit 32 bits never pay 64-bit traffic. Safe by construction: the
    session runs ANSI mode, so an out-of-range id makes the cast THROW —
    a wrong bound can never silently wrap into a wrong label. Full-range
    ids (e.g. xxhash64-derived corpus vertices) take the int64 path.
    """
    if narrow:
        edges = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    return edges.mapInArrow(_local_contract_fn(chunk), schema=EDGE_SCHEMA)


# ---------------------------------------------------------------------------
# Alternating star rounds (global merge)
# ---------------------------------------------------------------------------

def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _mins_side(mins: DataFrame, broadcast: bool) -> DataFrame:
    """How the V-row min-aggregate meets the E-row side in the star joins.

    - ``shuffle_hash`` hint (default): the E-row side must not be SORTED
      just to join the V-row aggregate (SMJ would sort both sides); a
      shuffled hash join builds on the per-partition slice of mins
      (V/parts rows — bounded at any scale) and streams E through it.
      This is the any-scale path: aggregate network cost is O(E + V).
    - ``broadcast``: when V fits a broadcast (≤ CC_BROADCAST_VERTEX_LIMIT),
      the E-row side never exchanges at all — the join becomes a narrow
      map over the cached/incoming partitions. Costs O(V × executors)
      network per round, so it is gated on V, never the default at
      arbitrary scale (same philosophy as pagerank's mode thresholds).
    """
    return F.broadcast(mins) if broadcast else mins.hint("shuffle_hash")


def _large_star(edges: DataFrame, mins_broadcast: bool = False) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    No explicit distinct: duplicate rows don't change the min/join
    semantics, and the fused narrow contraction after each round dedups —
    dropping the distinct saves one shuffle per round.
    """
    sym = _symmetrize(edges)
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    return (
        sym.join(_mins_side(mins, mins_broadcast), "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame, mins_broadcast: bool = False) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u) to the min neighbor."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(_mins_side(mins, mins_broadcast), "src")
    lower = joined.where(F.col("dst") != F.col("m")).select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return lower.union(self_edge)


def _star_contract_round(
    edges: DataFrame, mins_broadcast: bool = False, narrow: bool = False
) -> DataFrame:
    """One CC superstep: large-star → small-star → narrow local contraction.

    The fused ``local_contract`` is shuffle-free (runs on the partitions the
    small-star groupBy produced) and collapses whatever chains happen to be
    co-located — measured on the 1024² p=0.6 grid it cuts rounds from 11 to
    6 and wall time ~2× vs plain alternating stars, while keeping the stars'
    skew safety (all wide ops remain map-side-combinable aggregates and
    equi-joins; the contraction only ever sees one shuffle partition's rows).
    """
    return local_contract(
        _small_star(_large_star(edges, mins_broadcast), mins_broadcast),
        narrow=narrow,
    ).where(F.col("src") != F.col("dst"))


def _oriented_edges(edges: DataFrame, n_part: int) -> DataFrame:
    """Orient each edge once as ``(c=min endpoint, n=max endpoint)``,
    hash(c)-partitioned — the E-row working set the big-graph round builds
    on. NOT persisted: the whole round executes as ONE certificate-driven
    job, so the three consumers of this exchange (the two neighborhood-min
    aggregates and the large-star join) all read the same shuffle output
    via ReusedExchange — a block-manager cache of the same E rows would
    only add a deserialized copy and its GC bill (measured: 27-56 % of
    executor time in GC during the cache-build stages at 64M edges)."""
    return (
        edges.select(
            F.least("src", "dst").alias("c"), F.greatest("src", "dst").alias("n")
        )
        .where(F.col("c") != F.col("n"))
        .repartition(n_part, "c")
    )


def _nside_mins(o: DataFrame) -> DataFrame:
    """Per-vertex min over the c-side of a vertex's n-edges: ``(c, mn)``
    where ``mn(u) = min{c' : (c', u) ∈ o}``, keyed as ``c`` for the join.

    This is the WHOLE neighborhood min: in the oriented set every c-side
    neighbor of u is strictly SMALLER than u and every n-side neighbor
    strictly LARGER, so ``min(Γ(u) ∪ {u}) = least(u, mn(u))`` exactly —
    the c-side aggregate (min over u's n-neighbors, all > u) can never win
    the least and is pure cost. r4 computed it anyway and paid a full
    E-row hash aggregate plus a V-row full-outer merge join per round;
    dropping both (r5) makes the large-star join a LEFT join with
    ``least(c, mn)`` — ``F.least`` skips the null mn of a vertex never
    seen as n, which is precisely the ``min = itself`` case. One E-row
    pass over the reused orientation exchange, partial-aggregated
    map-side, exchanging only ~V partial rows."""
    return o.groupBy("n").agg(F.min("c").alias("mn")).withColumnRenamed("n", "c")


def _star_contract_round_reuse(
    edges: DataFrame,
    n_part: int,
    narrow: bool = False,
) -> tuple[DataFrame, list[DataFrame]]:
    """The default big-graph superstep: large star → partition-local
    union-find over its hash(src)-partitioned output → hash(src)
    re-contraction. Same label output as ``_star_contract_round``
    (fingerprint-verified at 2M and 64M edges, bench/cc_round_lab.py).

    The naive round symmetrizes the edges (2E rows) to compute each
    vertex's full-neighborhood min with one groupBy. Here each edge is
    instead oriented ONCE as ``(c=min endpoint, n=max endpoint)`` — E rows,
    hash(c)-partitioned — and the full-neighborhood min needs ONE E-row
    aggregate: in the oriented set u's c-side neighbors are all < u and
    its n-side neighbors all > u, so ``min(Γ(u) ∪ {u}) = least(u, mn(u))``
    with ``mn = min c over edges where u=n`` (``_nside_mins``; partial
    map-side, ~V partial rows exchanged). r4's second E-row aggregate
    (min over the n side, values all > u) and its V-row full-outer merge
    join were provably dead weight and are gone in r5.

    The large star then falls out without a filter: u's strictly-larger
    neighbors are EXACTLY the n's of its c-edges, so the LEFT join
    ``o ⋈ mn on c → (n, least(c, mn))`` is the whole large-star output,
    already oriented src>dst (a vertex never seen as n joins null and
    ``least`` yields c itself). One more E-row exchange lands it
    hash(src)-partitioned for the union-find contraction.

    NO SMALL-STAR STAGE (removed in r4): with the large-star output
    hash(src)-partitioned, every vertex u's rows ``(u → m(c_i))`` are
    co-located, so the partition-local union-find performs EXACTLY the
    unions the small star's aggregate+join would encode — {u} ∪ {its m's}
    into one component per u, chained across u's sharing a vertex — making
    the small star a pure pre-processing cost: one hash-aggregate pass +
    one shuffle-hash join probe over E rows per round. Worse, the
    ``lower ∪ smins`` union CONCATENATED the two partition lists, so the
    contraction actually saw the smins rows SEPARATED from their lower
    rows (more partition-spread duplication, not less). Interleaved A/B
    at 64M edges / 4M vertices, local[32], per-round min over 3 reps
    (bench/cc_round_lab.py, identical final label fingerprints): round 1
    26.9 → 16.8 s, round-1 output rows 4,316,748 → 4,000,121. The
    single-contraction variant (fold both contractions into one
    hash(src)-partitioned pass) was also measured and REJECTED: without
    the first narrow contraction the exchange carries the raw large-star
    rows and the output keeps 15.4M duplicated pointer rows (round 1
    16.7–89 s, round 2 ~21 s).

    Per round: 2 E-row exchanges (orientation; large-star output), one
    narrow contraction, one contracted-row exchange (≈V rows) feeding the
    dedup contraction. Skew-safe: hash(src) over post-contraction pointer
    rows is ≤ partition-spread per vertex, not degree — a hub's million
    neighbors each carry their OWN src key.

    NOTHING here is persisted. The whole round executes as the single job
    driven by the convergence-certificate action, and every multiply-
    consumed subtree (the oriented exchange: 3 consumers; the large-star
    exchange: 1) sits behind an exchange, which Spark serves to all
    consumers in one job via ReusedExchange. The r2 design persisted the
    E-row sets on top of that; the redundant deserialized copies showed up
    as 27-56 % GC time in the cache-build stages, and dropping them won
    every interleaved 64M-edge A/B pair (41.4→33.1 s, 68.7→40.9 s round 1,
    identical outputs). The empty second return keeps the (stepped,
    caches-to-unpersist) caller contract.
    """
    o = _oriented_edges(edges, n_part)
    mn = _nside_mins(o)
    ls = o.join(mn.hint("shuffle_hash"), "c", "left").select(
        F.col("n").alias("src"), F.least("c", "mn").alias("dst")
    )
    # least(c, mn) <= c < n, so ls is already strictly oriented src > dst
    oriented = ls.repartition(n_part, "src")
    out = local_contract(oriented, narrow=narrow).where(F.col("src") != F.col("dst"))
    # Second, hash(src)-partitioned contraction: the first pass contracts
    # within the large-star partitions, so a vertex seen by k partitions
    # emits k pointer rows, and EVERY downstream cost (certificate
    # aggregate, next round's exchanges and transits) is row-proportional.
    # One exchange of the already-contracted rows co-locates each vertex's
    # pointers and the second union-find fuses them (→ ~V rows; measured
    # r3: 23.2M → 4.34M, round 2 20.8 → 6.3 s).
    out = local_contract(out.repartition(n_part, "src"), narrow=narrow).where(
        F.col("src") != F.col("dst")
    )
    return out, []


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: overflow-proof under ANSI mode at any edge count
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _chained_count(edges: DataFrame) -> tuple[int, int]:
    """(total rows, non-star-forest witnesses) for convergence detection.

    Every round's output edge points strictly downward (src > dst), so the
    output is a TERMINAL disjoint star forest exactly when (a) no dst
    appears as a src (depth 1) and (b) every src carries a single pointer
    — (b) matters because the partition-local contraction can emit
    ``x → rootA`` and ``x → rootB`` from two partitions that both saw x;
    depth-1 alone would accept that while x's labels are still ambiguous.
    Disjoint star forests are fixpoints of the round function and their
    roots are component minima (connectivity is preserved by every round),
    so stopping here is exact and saves the confirmation round that
    fingerprint-equality detection costs.

    Both witness classes fall out of ONE per-vertex tally: with
    ``ns(k)``/``nd(k)`` = k's occurrences as src/dst, the chained rows are
    ``Σ nd(k) over k with ns(k) > 0`` and the duplicate pointers are
    ``Σ (ns(k) − 1)``. A single map-side-combinable groupBy over the
    exploded endpoints replaces the former distinct + shuffle-hash join +
    countDistinct plan — no join, one exchange of partial aggregates,
    measured 3–8× faster on a 23M-row round output (64M-edge graph,
    local[32]) with identical counts.

    The endpoints are unpivoted with ``explode``, NOT ``union``: this
    aggregate is the action that materializes the round's lazily-
    checkpointed output, and a union references that subtree TWICE — the
    narrow chain behind it (both Arrow contractions included) executes
    once per branch before the checkpoint blocks exist. explode doubles
    rows inline in a single scan, guaranteeing one execution per round.
    Interleaved 64M-edge A/B: round 1 39.1 → 25.5 s, identical counts.
    """
    both = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("k"), F.lit(1).alias("s"), F.lit(0).alias("d")
                ),
                F.struct(
                    F.col("dst").alias("k"), F.lit(0).alias("s"), F.lit(1).alias("d")
                ),
            )
        ).alias("e")
    ).select("e.k", "e.s", "e.d")
    per = both.groupBy("k").agg(F.sum("s").alias("ns"), F.sum("d").alias("nd"))
    row = per.agg(
        F.coalesce(F.sum("ns"), F.lit(0)).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("ns") > 0, F.col("nd")).otherwise(0)), F.lit(0)
        ).alias("chained"),
        F.coalesce(F.sum(F.greatest(F.col("ns") - 1, F.lit(0))), F.lit(0)).alias(
            "dup"
        ),
    ).collect()[0]
    return int(row["n"]), int(row["chained"]) + int(row["dup"])


def _cheap_rescan(df: DataFrame) -> bool:
    """True when ``df`` is at most a DETERMINISTIC projection/filter over
    an already-materialized scan (localCheckpoint RDD, local relation, or
    file relation) — i.e. re-reading it per round costs the same as
    reading a fresh checkpoint copy, so the init lineage-truncation copy
    is pure duplication. Conservative: any unrecognized node means False,
    and any non-deterministic expression (rand(), a nondet UDF, ...) in
    the stripped operators means False — re-evaluating those per job
    would desync the init count's n_work from the edges round 1 actually
    reads, and the frontier funnel trusts n_work (r4 ADVICE). A file
    mutated mid-run can still desync a LogicalRelation scan; that is the
    caller's input-stability contract, same as any repeated Spark read."""
    try:
        p = df._jdf.queryExecution().analyzed()
        while p.nodeName() in ("Project", "Filter") and p.children().size() == 1:
            exprs = p.expressions()
            for i in range(exprs.size()):
                if not exprs.apply(i).deterministic():
                    return False
            p = p.children().apply(0)
        return p.nodeName() in ("LogicalRDD", "LocalRelation", "LogicalRelation")
    except Exception:
        return False


#: witness-count bound for the terminal-tail patch. When a round's
#: certificate finds this few non-star-forest witnesses, the violating
#: sub-forest is collected to the driver, solved with the same NumPy
#: union-find, and applied as a broadcast dst-mapping inside the final
#: labels job — replacing an entire distributed round whose cost is pure
#: per-stage floor at any core count (measured at 64M edges: round 1
#: leaves 387 witnesses, and the round 2 that resolves them costs
#: 9.7-17.3 s at every parallelism level — an Amdahl tail for N→4N
#: scaling). The collected candidate set is O(witnesses) rows, so the
#: bound keeps driver traffic ≤ a few MB.
PATCH_WITNESS_LIMIT = 65_536


def _chain_patch(stepped: DataFrame) -> DataFrame | None:
    """Resolve a near-terminal forest's remaining witnesses driver-side.

    Returns a tiny ``(_old BIGINT, _new BIGINT)`` root mapping such that
    rewriting EVERY row ``(s, d) → (s, coalesce(map[d], d))`` yields a
    terminal star forest labeled with exact component minima — or ``None``
    for an empty mapping (witnesses were all duplicate pointers agreeing on
    the same root).

    Exactness argument (relies on the loop invariant that every round
    output points strictly downward, src > dst):

    - Let V = {k : k is both pointed-to and pointing} ∪ {k : k carries
      duplicate pointers}; candidates = rows with either endpoint in V.
      Any vertex on a chain interior is in V, so every chain/duplicate row
      is a candidate: the union-find over the candidate rows sees each
      violating component's ENTIRE violating sub-forest, including its
      global minimum (the last chain link points at it).
    - A non-candidate row (s, d) has s pointing exactly once, s never
      pointed-to, d never pointing: rewriting d to its union-find root (if
      d was dragged into V's components by a candidate row) re-attaches s
      to the true minimum; otherwise d is already terminal.
    - Roots of the mapping cannot themselves point anywhere: a mapped root
      with an outgoing row would be both pointed-to and pointing — i.e. in
      V with all its rows among the candidates — contradicting it being
      its component's minimum.

    Generalizes the reference's final label-resolution sweep
    (/root/reference/src/SegmentImageImpl.cpp:108-116, the ``find`` pass
    that collapses leftover parent chains after the merge pass) to the
    distributed forest: the chains that survive partition-local contraction
    are collapsed in one driver pass over only the violating rows.
    """
    both = stepped.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("k"), F.lit(1).alias("s"), F.lit(0).alias("d")
                ),
                F.struct(
                    F.col("dst").alias("k"), F.lit(0).alias("s"), F.lit(1).alias("d")
                ),
            )
        ).alias("e")
    ).select("e.k", "e.s", "e.d")
    import pandas as pd

    viol = (
        both.groupBy("k")
        .agg(F.sum("s").alias("ns"), F.sum("d").alias("nd"))
        .where(((F.col("ns") > 0) & (F.col("nd") > 0)) | (F.col("ns") > 1))
        .select("k")
        .toPandas()  # ≤ O(witnesses) rows by the PATCH_WITNESS_LIMIT gate
    )
    if viol.empty:
        return None
    spark = stepped.sparkSession
    vdf = spark.createDataFrame(viol, schema="k BIGINT")
    cand = (
        stepped.join(
            F.broadcast(vdf.withColumnRenamed("k", "src")), "src", "leftsemi"
        )
        .unionByName(
            stepped.join(
                F.broadcast(vdf.withColumnRenamed("k", "dst")), "dst", "leftsemi"
            ).select("src", "dst")
        )
        .toPandas()
    )
    if not len(cand):
        return None
    verts, roots = _contract_arrays(
        [cand["src"].to_numpy(dtype=np.int64)], [cand["dst"].to_numpy(dtype=np.int64)]
    )
    changed = roots != verts
    if not changed.any():
        return None
    return spark.createDataFrame(
        pd.DataFrame({"_old": verts[changed], "_new": roots[changed]}),
        schema="_old BIGINT, _new BIGINT",
    )


def connected_components(
    edges: DataFrame,
    *,
    pre_contract: bool | None = None,
    range_partition: bool = False,
    single_partition: bool = False,
    broadcast_mins: bool = False,
    narrow_ids: bool = False,
    max_iter: int = 50,
    checkpoint_every: int = 3,
    checkpointer=None,
    verbose: bool = False,
    metrics_out: dict | None = None,
    _contract_chunk: int = LOCAL_CONTRACT_CHUNK,
) -> DataFrame:
    """Edge table ``(src BIGINT, dst BIGINT)`` → labels ``(vertex, component)``.

    ``component = min(vertex_id)`` of the component (exact-match contract,
    SURVEY.md §2.4). Self-loops are tolerated; isolated vertices (appearing
    only in self-loops) label themselves. Every vertex occurring in
    ``edges`` appears exactly once in the result.

    ``range_partition`` — range-partition the input by ``src`` before the
    local pre-contraction. When vertex ids carry locality (scan-order run
    ids, any id space where neighbors have nearby ids), contiguous id
    stripes land in one partition and the partition-local union-find
    collapses whole regions in round 1 — measured on the 2160×3840 grid:
    13 → 8 global rounds, 80 s → 35 s. Leave off for hash-id graphs
    (no locality to exploit; the extra shuffle is pure cost).

    ``pre_contract`` — run the partition-local union-find over the INPUT
    partitioning before the star rounds. Defaults to ``range_partition``:
    on locality-partitioned inputs it collapses whole regions for ~free,
    but on hash-id graphs the input pass costs a full Arrow transit of the
    edge set (measured: 25–65 s at 32 M edges) while shrinking round 1's
    edge count only ~35 % — and on a skew-colocated producer it hands one
    task the whole hub star (the round-1 stall in BENCH.md's skew section).
    Pass ``True``/``False`` to override the heuristic either way.

    ``checkpointer`` — optional ``plans.checkpoint.SuperstepCheckpointer``
    for durable per-superstep state + resume; defaults to in-memory
    ``localCheckpoint`` lineage truncation.

    ``single_partition`` — small-graph fast path (the broadcast-join
    analog of an execution-strategy hint): coalesce the edges into ONE
    task and let the chunked NumPy union-find solve the whole graph in a
    single pass, certified by the same star-forest check. Cuts the
    fixed per-round scheduling cost that dominates sub-10^7-edge inputs
    (the regime where the reference's single-address-space pass wins on
    overhead, BASELINE.md). Callers opt in only with a size bound in
    hand (e.g. grid pipelines: edges <= n_cells, known without a job).
    Still EXACT if the input is larger than one union-find chunk — the
    certificate loop keeps iterating until the forest is terminal — but
    then the single task is the bottleneck; never use it unbounded.
    Without the hint, the loop reaches the same one-task pass ADAPTIVELY
    (the frontier funnel) as soon as the measured row count drops to
    FUNNEL_EDGE_LIMIT — round 1 included, since the init job counts the
    input; the hint's remaining value is skipping that init job and
    funneling graphs above the adaptive gate when the caller knows
    better.

    ``narrow_ids`` — caller asserts every vertex id fits INT32, routing
    the Arrow contractions through the half-width transit immediately
    (see ``local_contract``); useful on paths that skip the init job
    (``single_partition``) or run a pre-contraction before it
    (grid pipelines: run ids ≤ cell count, known statically). Without the
    hint the loop measures the id range on the init job it already pays
    and narrows automatically. ANSI casts make a violated assertion an
    error, never a wrong label.

    Kill switch: session conf ``spark.imtag.cc.narrowTransit`` — ``auto``
    (default, the behavior above) or ``off`` (never use the int32 transit,
    overriding both the auto gate and a caller's ``narrow_ids``). The
    pre-registered round-5 transfer samples (BENCH.md) could not certify
    that the narrow transit preserves the settled ≥0.8 2→8 scaling ratio
    on this host (n=2, both in PR-control-deflated windows), so per that
    pre-registration the switch exists for deployments that certify
    scaling ratios per engine change: labels are bit-identical either way
    (same union-find, wider dtype), only the Arrow transit width changes.

    ``broadcast_mins`` — broadcast the per-round V-row min-aggregates (and
    the certificate's src set) into the star joins so the E-row side never
    exchanges inside a superstep. OFF by default, deliberately: measured
    A/B at 64M edges / 4M vertices (local[32]) and at 150-300K edges, the
    saved E-exchange is offset by the per-round driver collect + broadcast
    build (2-3 × V rows per round), landing within host noise — because
    the fused local contraction already converges in 2-3 rounds, the
    multiplier that would make broadcast win (many rounds × E-exchange)
    never materializes. The option exists for the case that multiplier
    returns: high-diameter graphs with small V on clusters where shuffle
    (not broadcast fan-out, O(V × executors)/round) is the scarce
    resource. Enforced: when requested, the vertex universe is counted
    once and the option silently falls back to shuffle-hash above
    CC_BROADCAST_VERTEX_LIMIT (a multi-GB per-round broadcast is never
    acceptable, whatever the caller hoped).
    """
    spark = edges.sparkSession
    transit = str(spark.conf.get("spark.imtag.cc.narrowTransit", "auto")).lower()
    if transit not in ("auto", "off"):
        raise ValueError(
            "spark.imtag.cc.narrowTransit must be 'auto' or 'off', got "
            f"{transit!r}"
        )
    if transit == "off":
        narrow_ids = False
    universe = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    ).persist()

    # No input distinct(): duplicates are harmless to every downstream op
    # (min-aggregates, the union-find), and deduping would shuffle the input
    # to hash(src,dst) — destroying any locality the producer's partitioning
    # carries (e.g. grid edges arrive row-partitioned, so the narrow
    # pre-contraction collapses whole spatial regions before any shuffle).
    work = edges.where(F.col("src") != F.col("dst"))
    if single_partition:
        # one task sees every edge; the loop's local_contract round IS the
        # whole solve, so the input-pass pre-contraction and the range
        # shuffle would be pure overhead
        work = work.coalesce(1)
        pre_contract = False
        range_partition = False
    if pre_contract is None:
        pre_contract = range_partition
    if range_partition:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        work = work.repartitionByRange(n_part, "src")
    if pre_contract:
        # runs before the init measurement — only a caller-held bound
        # (narrow_ids) can narrow this pass
        work = local_contract(work, narrow=narrow_ids).where(
            F.col("src") != F.col("dst")
        )

    if broadcast_mins and not single_partition:
        # enforce the documented bound: one count against the persisted
        # universe; above it a per-round V-row broadcast would be multi-GB
        broadcast_mins = universe.count() <= CC_BROADCAST_VERTEX_LIMIT

    start_iter = 0
    resumed = checkpointer.resume() if checkpointer is not None else None
    if resumed is not None:
        work, start_iter = resumed

    # Iterate with persist() (materialized by the fingerprint action — one
    # Spark job per round) and truncate lineage only every
    # ``checkpoint_every`` rounds: plan analysis cost stays bounded without
    # paying a per-round checkpoint job.
    import time as _time

    # Lineage MUST be truncated every round: each star round's plan embeds
    # the previous round's plan several times (sym appears in both the
    # groupBy and the join side), so without truncation Catalyst analysis
    # cost grows exponentially with rounds. Eager localCheckpoint gives a
    # flat plan per round; the durable checkpointer (parquet) replaces it
    # every `checkpoint_every` rounds when resumability is requested.
    _t = _time.time()
    n_work: int | None = None
    narrow = narrow_ids
    owns_frontier = False  # True once `work` is a checkpoint THIS solve made
    if not single_partition:
        # single-partition mode converges in ~1 round off a trivial plan
        # (coalesce of the source) — the init truncation job is pure cost.
        # Lazy checkpoint + count = the SAME single materialization job as
        # the old eager checkpoint, but it also yields the edge count that
        # gates the exchange-shared round structure below.
        #
        # Skip the copy when the input is ALREADY a materialized scan
        # (a caller-side checkpoint/local relation under at most a
        # projection/filter): the plan is as flat as a checkpoint would
        # make it, re-reading it per round is as cheap as reading the
        # copy, and the copy itself is round 1's single largest stage at
        # 64M edges (~160 task-core-seconds of pure block duplication).
        # The init action doubles as the id-range measurement for the
        # narrow Arrow transit: same single materialization job, three
        # ride-along scalar aggregates instead of one. Labels only ever
        # move DOWN to existing vertex ids, so init bounds hold for every
        # round's intermediates.
        if not _cheap_rescan(work):
            work = frontier_checkpoint(work, eager=False)
            owns_frontier = True
        stats = work.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.least("src", "dst")).alias("lo"),
            F.max(F.greatest("src", "dst")).alias("hi"),
        ).collect()[0]
        n_work = int(stats["n"])
        if transit != "off" and not narrow and stats["lo"] is not None:
            narrow = -(2**31) <= int(stats["lo"]) and int(stats["hi"]) < 2**31
    if verbose:
        print(f"[cc] init n={n_work} {_time.time() - _t:.1f}s", flush=True)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    chain_patch: DataFrame | None = None
    for it in range(start_iter, max_iter):
        _t = _time.time()
        round_caches: list[DataFrame] = []
        funneled = False
        patched_chained = 0  # true witness count a terminal-tail patch absorbed
        if single_partition:
            # complete solve in one narrow pass (star rounds would only
            # add shuffles); terminal star forest after round 1 whenever
            # the edges fit one union-find chunk
            stepped = local_contract(
                work, chunk=_contract_chunk, narrow=narrow
            ).where(F.col("src") != F.col("dst"))
        elif n_work is not None and n_work <= min(FUNNEL_EDGE_LIMIT, _contract_chunk):
            # Frontier funnel: the measured frontier is small enough that a
            # distributed round would be pure scheduling floor, and it fits
            # ONE union-find chunk — so a single coalesced task solves the
            # remainder in one pass (the adaptive form of
            # ``single_partition``, gated on the exact row count the
            # previous certificate already paid for), terminal immediately
            # (root = component min over the whole frontier). The gate is
            # intentionally far below the chunk cap: see FUNNEL_EDGE_LIMIT
            # for the Amdahl analysis (a one-task round is a serial tail
            # that must never become the N→4N scaling cap).
            stepped = local_contract(
                work.coalesce(1), chunk=_contract_chunk, narrow=narrow
            ).where(F.col("src") != F.col("dst"))
            funneled = True
        elif broadcast_mins or (n_work is not None and n_work < REUSE_EDGE_LIMIT):
            stepped = _star_contract_round(
                work, mins_broadcast=broadcast_mins, narrow=narrow
            )
        else:
            stepped, round_caches = _star_contract_round_reuse(
                work, n_part, narrow=narrow
            )
        if checkpointer is not None and (it + 1) % checkpoint_every == 0:
            stepped = checkpointer.save(stepped, it + 1)
        else:
            # lazy: the convergence-certificate collect below materializes
            # the checkpoint, so each round costs exactly one Spark job
            stepped = frontier_checkpoint(stepped, eager=False)
        if funneled:
            # the gate (n_work <= chunk) guarantees the ENTIRE frontier went
            # through one union-find pass, whose output is a terminal star
            # forest by construction (unique sorted vertices, root = global
            # component min, full path compression) — the certificate would
            # only re-verify that, over a single partition. A plain count
            # materializes the checkpoint for a fraction of the cost.
            n_edges, chained = stepped.count(), 0
        else:
            n_edges, chained = _chained_count(stepped)
            if 0 < chained <= PATCH_WITNESS_LIMIT:
                # Terminal-tail patch: the few remaining witnesses are
                # resolved driver-side and applied as a broadcast dst
                # mapping in the labels job below — the distributed round
                # they would otherwise force is pure per-stage floor at any
                # core count (see PATCH_WITNESS_LIMIT). Timed inside this
                # round (it is this round's convergence cost).
                chain_patch = _chain_patch(stepped)
                patched_chained, chained = chained, 0
        for c in round_caches:
            c.unpersist()
        # the certificate materialized this round's checkpoint — the
        # previous round's frontier blocks are dead from here on; release
        # them now instead of waiting for driver GC (r3 stage metrics
        # showed the superseded copies accumulating across long runs).
        # NEVER free a caller-owned input (init-copy skipped): its blocks
        # outlive this solve.
        if owns_frontier:
            free_local_checkpoint(work)
        owns_frontier = True  # every loop frontier from here on is ours
        n_work = n_edges  # next round's reuse gate, free off the certificate
        if verbose:
            patch_note = f" (patched {patched_chained})" if patched_chained else ""
            print(
                f"[cc] round {it + 1} edges={n_edges} chained={chained}"
                f"{patch_note} {_time.time() - _t:.1f}s",
                flush=True,
            )
        if checkpointer is not None:
            if patched_chained:
                # A durable checkpoint written THIS round still stores the
                # pre-patch witnesses — record the truth (their count plus
                # patched=True) rather than chained=0, so nothing reading
                # the manifest mistakes the stored frontier for a terminal
                # star forest (r4 ADVICE). Resume stays correct either
                # way: a resumed run re-executes the round.
                checkpointer.log_metrics(
                    it + 1, edges=n_edges, chained=patched_chained, patched=True
                )
            else:
                checkpointer.log_metrics(it + 1, edges=n_edges, chained=chained)
        if metrics_out is not None:
            metrics_out.setdefault("superstep_times", []).append(_time.time() - _t)
            metrics_out["supersteps"] = it + 1
        work = stepped
        if chained == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # work is now a star forest oriented (member -> root) — possibly up to
    # the driver-resolved chain patch, applied here as a broadcast mapping
    # on dst (a narrow projection inside the one labels job).
    bare_forest = work  # the checkpoint handle to free (work may be rewrapped)
    if chain_patch is not None:
        # The mapping's own (_old → _new) pairs ride along as member rows:
        # a pre-patch root r whose component merged downward appears in the
        # forest ONLY as a dst, so remapping those occurrences would erase
        # r entirely (and the universe fallback would mislabel it as its
        # own component) — the union row (r → find(r)) keeps it labeled.
        work = work.join(
            F.broadcast(chain_patch), work["dst"] == F.col("_old"), "left"
        ).select(
            "src", F.coalesce("_new", "dst").alias("dst")
        ).unionByName(
            chain_patch.select(
                F.col("_old").alias("src"), F.col("_new").alias("dst")
            )
        )
    members = work.select(F.col("src").alias("vertex"), F.col("dst").alias("component"))
    roots = work.select(F.col("dst").alias("vertex"), F.col("dst").alias("component"))
    labels = members.union(roots).distinct()
    out = (
        universe.join(labels, "vertex", "left")
        .select("vertex", F.coalesce("component", "vertex").alias("component"))
        .localCheckpoint(eager=True)
    )  # labels are wide-ish and read once by the caller: default storage
    universe.unpersist()
    # the labels are materialized — the terminal star forest is dead too
    free_local_checkpoint(bare_forest)
    return out
