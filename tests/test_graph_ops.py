"""Micro-graph unit tests (FIXTURES.md §3) against independent oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from imtag_spark.operators.cc import connected_components
from imtag_spark.operators.lpa import label_propagation
from imtag_spark.operators.pagerank import pagerank
from imtag_spark.operators.stats import degrees
from imtag_spark.operators.triangles import total_triangles, triangle_count
from oracles import brute_triangles, numpy_pagerank

TWO_TRIANGLES_BRIDGE = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs] or [], "src BIGINT, dst BIGINT"
    )


def test_cc_two_triangles_bridge(spark):
    labels = connected_components(edges_df(spark, TWO_TRIANGLES_BRIDGE))
    rows = {r.vertex: r.component for r in labels.collect()}
    assert rows == {v: 1 for v in range(1, 7)}


def test_cc_path_converges_fast(spark):
    n = 2000
    path = [(i, i + 1) for i in range(n)]
    labels = connected_components(edges_df(spark, path), max_iter=20)
    comps = labels.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0].component == 0


def test_cc_isolated_and_selfloops(spark):
    e = edges_df(spark, [(7, 7), (8, 9), (9, 8), (10, 10)])
    rows = {r.vertex: r.component for r in connected_components(e).collect()}
    assert rows == {7: 7, 8: 8, 9: 8, 10: 10}


def test_cc_single_partition_matches_default(spark):
    # pseudo-random graph: the fast path must agree label-for-label
    rng = np.random.default_rng(7)
    pairs = rng.integers(0, 400, size=(1500, 2)).tolist()
    e = edges_df(spark, pairs)
    base = {r.vertex: r.component for r in connected_components(e).collect()}
    m: dict = {}
    fast = {
        r.vertex: r.component
        for r in connected_components(
            e, single_partition=True, metrics_out=m
        ).collect()
    }
    assert fast == base
    # one union-find pass solves a sub-chunk graph: exactly one round
    assert m["supersteps"] == 1


def test_cc_reuse_round_matches_default(spark, monkeypatch):
    # the exchange-shared round structure (with its second hash(src)
    # contraction) only engages above REUSE_EDGE_LIMIT in production;
    # force it here and require exact label parity on a multi-round graph
    # (random + long path tail)
    import imtag_spark.operators.cc as cc_mod

    rng = np.random.default_rng(23)
    pairs = rng.integers(0, 500, size=(1200, 2)).tolist()
    pairs += [(1000 + i, 1000 + i + 1) for i in range(300)]
    e = edges_df(spark, pairs)
    base = {r.vertex: r.component for r in connected_components(e).collect()}
    monkeypatch.setattr(cc_mod, "REUSE_EDGE_LIMIT", 0)
    m: dict = {}
    reuse = {
        r.vertex: r.component
        for r in connected_components(e, metrics_out=m, max_iter=20).collect()
    }
    assert reuse == base


def test_cc_broadcast_mins_matches_default(spark):
    rng = np.random.default_rng(11)
    pairs = rng.integers(0, 300, size=(900, 2)).tolist()
    e = edges_df(spark, pairs)
    base = {r.vertex: r.component for r in connected_components(e).collect()}
    bc = {
        r.vertex: r.component
        for r in connected_components(e, broadcast_mins=True).collect()
    }
    assert bc == base


def test_cc_single_partition_selfloops_isolated(spark):
    e = edges_df(spark, [(7, 7), (8, 9), (9, 8), (10, 10)])
    rows = {
        r.vertex: r.component
        for r in connected_components(e, single_partition=True).collect()
    }
    assert rows == {7: 7, 8: 8, 9: 8, 10: 10}


def test_cc_single_partition_multichunk_exact(spark):
    # tiny chunk bound forces multi-chunk processing inside the single
    # task: cross-chunk merges must still resolve via the certificate loop
    n = 500
    path = [(i, i + 1) for i in range(n)]  # one long path spans many chunks
    labels = connected_components(
        edges_df(spark, path),
        single_partition=True,
        max_iter=20,
        _contract_chunk=64,
    )
    comps = labels.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0].component == 0


def test_triangles_two_triangles_bridge(spark):
    e = edges_df(spark, TWO_TRIANGLES_BRIDGE)
    assert total_triangles(e) == 2
    per = {r.vertex: r.triangles for r in triangle_count(e).collect()}
    assert per == {v: 1 for v in range(1, 7)}


def test_triangles_random_vs_bruteforce(spark):
    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2))}
    e = edges_df(spark, pairs)
    expected_total, expected_per = brute_triangles(list(pairs))
    assert total_triangles(e) == expected_total
    got = {r.vertex: r.triangles for r in triangle_count(e).collect()}
    for v, c in expected_per.items():
        assert got.get(v, 0) == c


def test_triangles_star_has_none(spark):
    e = edges_df(spark, [(0, i) for i in range(1, 50)])
    assert total_triangles(e) == 0


@pytest.mark.parametrize("directed", [True, False])
def test_pagerank_vs_numpy(spark, directed):
    rng = np.random.default_rng(11)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 25, size=(80, 2)) if a != b})
    e = edges_df(spark, pairs)
    got = {r.vertex: r.rank for r in pagerank(
        e, directed=directed, tol=1e-8, max_iter=200).collect()}
    want = numpy_pagerank(pairs, [], directed=directed)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("directed", [True, False])
def test_pagerank_broadcast_mode_vs_numpy(spark, directed):
    rng = np.random.default_rng(29)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 25, size=(80, 2)) if a != b})
    e = edges_df(spark, pairs)
    got = {r.vertex: r.rank for r in pagerank(
        e, directed=directed, tol=1e-8, max_iter=200, mode="broadcast").collect()}
    want = numpy_pagerank(pairs, [], directed=directed)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


def test_pagerank_modes_agree(spark):
    rng = np.random.default_rng(31)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 60, size=(300, 2)) if a != b})
    e = edges_df(spark, pairs)
    j = {r.vertex: r.rank for r in pagerank(e, tol=0.0, max_iter=15, mode="join").collect()}
    b = {r.vertex: r.rank for r in pagerank(e, tol=0.0, max_iter=15, mode="broadcast").collect()}
    assert set(j) == set(b)
    for v in j:
        assert abs(j[v] - b[v]) < 1e-12


@pytest.mark.parametrize("directed", [True, False])
def test_pagerank_broadcast_join_mode_vs_numpy(spark, directed):
    rng = np.random.default_rng(37)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 25, size=(80, 2)) if a != b})
    e = edges_df(spark, pairs)
    metrics = {}
    got = {r.vertex: r.rank for r in pagerank(
        e, directed=directed, tol=1e-8, max_iter=200, mode="broadcast_join",
        metrics_out=metrics).collect()}
    assert metrics["mode"] == "broadcast_join"
    want = numpy_pagerank(pairs, [], directed=directed)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_broadcast_join_matches_join_mode(spark):
    # identical DataFrame arithmetic, different physical strategy. NOT
    # bit-equal by design: the partial aggregates sum each dst's
    # contributions in a different grouping (src-partitioned vs
    # dst-partitioned input), so float rounding can differ in the last
    # ulp — demand agreement far below the 1e-6 oracle tolerance instead
    rng = np.random.default_rng(41)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 60, size=(300, 2)) if a != b})
    e = edges_df(spark, pairs)
    j = {r.vertex: r.rank for r in pagerank(e, tol=0.0, max_iter=12, mode="join").collect()}
    bj = {r.vertex: r.rank for r in pagerank(
        e, tol=0.0, max_iter=12, mode="broadcast_join").collect()}
    assert set(j) == set(bj)
    for v in j:
        assert abs(j[v] - bj[v]) <= 1e-12 * max(1.0, abs(j[v]))


def test_pagerank_auto_mode_routes_and_matches(spark, monkeypatch):
    # auto = broadcast_join within the V gate, join above it (r3 A/B)
    import imtag_spark.operators.pagerank as pr_mod

    rng = np.random.default_rng(43)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 50, size=(240, 2)) if a != b})
    e = edges_df(spark, pairs)
    j = {r.vertex: r.rank for r in pagerank(e, tol=0.0, max_iter=8, mode="join").collect()}
    m: dict = {}
    a = {r.vertex: r.rank for r in pagerank(
        e, tol=0.0, max_iter=8, mode="auto", metrics_out=m).collect()}
    assert m["mode"] == "broadcast_join"
    assert set(a) == set(j)
    for v in j:
        assert abs(j[v] - a[v]) <= 1e-12 * max(1.0, abs(j[v]))
    monkeypatch.setattr(pr_mod, "BROADCAST_VERTEX_LIMIT", 0)
    m2: dict = {}
    pagerank(e, tol=0.0, max_iter=2, mode="auto", metrics_out=m2).count()
    assert m2["mode"] == "join"


def test_pagerank_broadcast_join_superstep_never_exchanges_edges(spark):
    # the whole point of the mode: the E-row transitions side is cached
    # hash(dst)-partitioned, the ranks side arrives via BroadcastExchange,
    # and the groupBy(dst) reuses the cached partitioning — so the
    # superstep plan must contain NO shuffle Exchange at all
    e = edges_df(spark, [(a, b) for a in range(30) for b in range(a + 1, 30, 3)])
    metrics = {}
    pagerank(e, tol=0.0, max_iter=2, mode="broadcast_join", metrics_out=metrics)
    plan = metrics["contribs_plan"]
    assert "BroadcastHashJoin" in plan
    # the cached InMemoryRelation prints its one-time BUILD plan (which
    # legitimately shuffles) as a subtree; the superstep proper is
    # everything above it: final agg <- partial agg <- project <-
    # broadcast join <- cache scan, and none of that may exchange
    superstep = plan.splitlines()
    cache_at = next(
        (i for i, ln in enumerate(superstep) if "InMemoryRelation" in ln), None
    )
    assert cache_at is not None, (
        "plan no longer prints the cached transitions as an InMemoryRelation "
        "subtree — update the superstep/build split:\n" + plan
    )
    superstep = superstep[:cache_at]
    shuffle_exchanges = [
        ln for ln in superstep
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert shuffle_exchanges == [], shuffle_exchanges


def test_pagerank_broadcast_join_supports_checkpointer(spark, tmp_path):
    # unlike the CSR broadcast mode (which raises), rank state stays a
    # DataFrame here, so durable checkpoint/resume must keep working
    from imtag_spark.plans.checkpoint import SuperstepCheckpointer

    rng = np.random.default_rng(43)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 20, size=(60, 2)) if a != b})
    e = edges_df(spark, pairs)
    ckpt = SuperstepCheckpointer(spark, str(tmp_path / "pr_bjoin"))
    got = {r.vertex: r.rank for r in pagerank(
        e, tol=1e-8, max_iter=100, mode="broadcast_join",
        checkpointer=ckpt, checkpoint_every=2).collect()}
    want = numpy_pagerank(pairs, [], directed=True)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_pagerank_star_closed_form(spark):
    # hub 0 with k spokes, undirected: symmetric closed form
    k = 50
    e = edges_df(spark, [(0, i) for i in range(1, k + 1)])
    got = {r.vertex: r.rank for r in pagerank(
        e, directed=False, tol=1e-8, max_iter=200).collect()}
    want = numpy_pagerank([(0, i) for i in range(1, k + 1)], [], directed=False)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6
    # spokes all equal
    spoke_vals = [got[i] for i in range(1, k + 1)]
    assert max(spoke_vals) - min(spoke_vals) < 1e-12


def test_lpa_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: LPA should give 2 communities
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    e = edges_df(spark, c1 + c2 + [(3, 10)])
    labels = {r.vertex: r.label for r in label_propagation(e, max_iter=10).collect()}
    comm1 = {labels[v] for v in range(4)}
    comm2 = {labels[v] for v in range(10, 14)}
    assert len(comm1) == 1 and len(comm2) == 1 and comm1 != comm2


def test_degrees(spark):
    e = edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 3)])
    got = {r.vertex: r.degree for r in degrees(e).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_cc_frontier_funnel_solves_small_graph_in_one_round(spark):
    # adaptive funnel (r4): the init job measures the edge count; anything
    # that fits one union-find chunk is solved in ONE coalesced pass and
    # certified terminal in the same round — no distributed star rounds
    from imtag_spark.operators.cc import connected_components

    edges = spark.range(3000).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).repartition(8)
    metrics: dict = {}
    out = connected_components(edges, metrics_out=metrics)
    assert metrics["supersteps"] == 1
    rows = out.collect()
    assert len(rows) == 3001
    assert all(r["component"] == 0 for r in rows)  # one path, min id = 0


def test_chain_patch_unit(spark):
    """_chain_patch resolves chains, duplicate pointers, AND re-attaches
    rows whose dst is only dragged downward transitively (the row (6, 2)
    below never touches a violating vertex on its src side, yet 2's root
    moves to 1 through the duplicate-pointer vertex 7)."""
    from imtag_spark.operators.cc import _chain_patch

    rows = [(5, 3), (3, 1), (7, 1), (7, 2), (6, 2), (8, 3), (10, 9)]
    stepped = spark.createDataFrame(rows, "src BIGINT, dst BIGINT")
    patch = _chain_patch(stepped)
    assert patch is not None
    mapping = {r["_old"]: r["_new"] for r in patch.collect()}
    # every mapped value is the true component minimum
    assert all(v == 1 for v in mapping.values()), mapping
    # 2 and 3 must be re-rooted (they are non-terminal dsts); 9 untouched
    assert mapping.get(2) == 1 and mapping.get(3) == 1
    assert 9 not in mapping
    patched = {(s, mapping.get(d, d)) for s, d in rows}
    # terminal star forest: no dst appears as src, each src once
    srcs = [s for s, _ in patched]
    assert len(srcs) == len(set(srcs))
    assert not ({d for _, d in patched} & set(srcs))
    assert patched == {(5, 1), (3, 1), (7, 1), (6, 1), (8, 1), (10, 9)}


def test_cc_patch_round_path_graph(spark, monkeypatch):
    """Force the distributed rounds (funnel off) on a shuffled path graph:
    partition-local contraction leaves cross-partition chains whose tail
    round the terminal patch must replace, bit-identically to the
    min-label contract."""
    import imtag_spark.operators.cc as cc

    monkeypatch.setattr(cc, "FUNNEL_EDGE_LIMIT", 0)
    n = 5000
    ids = spark.range(n).select(
        F.col("id"), F.xxhash64(F.col("id")).alias("h")
    )
    # deterministic pseudo-random permutation of [0, n): rank of the hash
    from pyspark.sql import Window

    perm = ids.select(
        "id",
        (F.row_number().over(Window.orderBy("h")) - 1).alias("p"),
    )
    a = perm.select(F.col("id").alias("i"), F.col("p").alias("src"))
    b = perm.select((F.col("id") - 1).alias("i"), F.col("p").alias("dst"))
    edges = a.join(b, "i").select("src", "dst")  # path p(0)-p(1)-...-p(n-1)
    labels = cc.connected_components(edges).collect()
    assert len(labels) == n
    comps = {r["component"] for r in labels}
    assert comps == {0}, f"single path component must label 0, got {sorted(comps)[:5]}"


def test_pagerank_auto_gate_prices_cluster():
    # r4 VERDICT "what's wrong" #4: the per-superstep broadcast costs
    # O(V × executors) — auto must see the cluster, not just V. Pure
    # function so the many-executor shapes this sandbox cannot launch are
    # still exercised.
    from imtag_spark.operators.pagerank import (
        AUTO_BROADCAST_EXECUTOR_LIMIT,
        BROADCAST_VERTEX_LIMIT,
        _auto_prefers_broadcast_join,
    )

    assert _auto_prefers_broadcast_join(1_000_000, 1)
    assert _auto_prefers_broadcast_join(1_000_000, AUTO_BROADCAST_EXECUTOR_LIMIT)
    # a high-executor conf routes to join even for gate-sized V
    assert not _auto_prefers_broadcast_join(1_000_000, 200)
    assert not _auto_prefers_broadcast_join(BROADCAST_VERTEX_LIMIT + 1, 1)


def test_pagerank_auto_local_mode_unchanged(spark):
    # local mode has no separate executors → fan-out 1 → auto keeps the
    # measured-best broadcast_join path (era continuity for the scaling
    # samples: recorded pagerank_mode must stay broadcast_join)
    from imtag_spark.operators.pagerank import _cluster_executor_count

    assert _cluster_executor_count(spark) == 1
    edges = spark.range(200).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    m: dict = {}
    pagerank(edges, directed=True, tol=0.0, max_iter=2, metrics_out=m).count()
    assert m["mode"] == "broadcast_join"


def test_cheap_rescan_requires_deterministic_projection(spark):
    # r4 ADVICE: a nondeterministic projection/filter over a checkpoint is
    # re-evaluated per job — the init-copy skip must not trust it
    from imtag_spark.operators.cc import _cheap_rescan

    base = (
        spark.range(10)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .localCheckpoint()
    )
    assert _cheap_rescan(base)
    assert _cheap_rescan(base.select("src", "dst"))
    assert _cheap_rescan(base.where(F.col("src") > 2).select("src", "dst"))
    assert not _cheap_rescan(
        base.select((F.col("src") + F.floor(F.rand() * 0)).alias("src"), "dst")
    )
    assert not _cheap_rescan(base.where(F.rand() >= 0.0))


def test_cc_wide_ids_stay_int64_exact(spark, monkeypatch):
    # ids above 2^31: the init measurement must keep the Arrow transit at
    # int64 (narrow gate off) and labels must stay exact — through the
    # reuse round structure, forced on
    import imtag_spark.operators.cc as cc_mod

    monkeypatch.setattr(cc_mod, "REUSE_EDGE_LIMIT", 0)
    monkeypatch.setattr(cc_mod, "FUNNEL_EDGE_LIMIT", 0)
    big = 2**40
    pairs = [(big + a, big + b) for a, b in TWO_TRIANGLES_BRIDGE] + [(5, big + 1)]
    labels = connected_components(edges_df(spark, pairs), max_iter=20)
    rows = {r.vertex: r.component for r in labels.collect()}
    assert rows == {v: 5 for v in [5] + [big + i for i in range(1, 7)]}


def test_cc_negative_ids_narrow_exact(spark, monkeypatch):
    # negative ids inside int32 range: the narrow transit fires (auto
    # measurement) and min-labeling stays exact, reuse round forced on
    import imtag_spark.operators.cc as cc_mod

    monkeypatch.setattr(cc_mod, "REUSE_EDGE_LIMIT", 0)
    monkeypatch.setattr(cc_mod, "FUNNEL_EDGE_LIMIT", 0)
    pairs = [(-3, -2), (-2, 7), (10, 11), (-(2**31), -3)]
    labels = connected_components(edges_df(spark, pairs), max_iter=20)
    rows = {r.vertex: r.component for r in labels.collect()}
    lo = -(2**31)
    assert rows == {lo: lo, -3: lo, -2: lo, 7: lo, 10: 10, 11: 10}


def test_cc_narrow_hint_single_partition(spark):
    # caller-held int32 bound on the path that runs no init job
    e = edges_df(spark, [(7, 7), (8, 9), (9, 8), (10, 10)])
    rows = {
        r.vertex: r.component
        for r in connected_components(
            e, single_partition=True, narrow_ids=True
        ).collect()
    }
    assert rows == {7: 7, 8: 8, 9: 8, 10: 10}


def test_cc_narrow_transit_kill_switch(spark, monkeypatch):
    # spark.imtag.cc.narrowTransit=off must override BOTH the auto gate
    # and a caller's narrow_ids, yielding identical labels through the
    # reuse round structure — the pre-registered round-5 safety valve
    import imtag_spark.operators.cc as cc_mod

    monkeypatch.setattr(cc_mod, "REUSE_EDGE_LIMIT", 0)
    monkeypatch.setattr(cc_mod, "FUNNEL_EDGE_LIMIT", 0)
    e = edges_df(spark, TWO_TRIANGLES_BRIDGE)
    expected = {
        r.vertex: r.component for r in connected_components(e, max_iter=20).collect()
    }
    spark.conf.set("spark.imtag.cc.narrowTransit", "off")
    try:
        rows = {
            r.vertex: r.component
            for r in connected_components(e, narrow_ids=True, max_iter=20).collect()
        }
        assert rows == expected
        spark.conf.set("spark.imtag.cc.narrowTransit", "bogus")
        with pytest.raises(ValueError, match="narrowTransit"):
            connected_components(e, max_iter=20)
    finally:
        spark.conf.unset("spark.imtag.cc.narrowTransit")


def test_cc_narrow_hint_violated_raises(spark):
    # a lying narrow_ids bound must ERROR (ANSI cast overflow), never
    # silently wrap into a wrong label
    e = edges_df(spark, [(2**40, 1)])
    with pytest.raises(Exception, match="(?i)overflow|cast|ansi"):
        connected_components(e, single_partition=True, narrow_ids=True)
