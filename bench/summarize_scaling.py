"""Render the complete scaling-sample distribution as a markdown table.

The north rule asks for throughput scaling efficiency >= 0.8 from N to 4N;
the r2 verdict asked for the DISTRIBUTION of samples, not the best one.
This reads every sample in BENCH_SCALING.json and prints one row per
(pairing, workload) with all sample efficiencies, their median, and best —
so the claim is reproducible from the stored evidence with one command.

Usage: python bench/summarize_scaling.py [--engine-commit PREFIX ...]
  --engine-commit limits rows to samples stamped with one of the given
  engine commits (e.g. the commits of the round under judgment).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

METRICS = [
    ("pagerank_steady", "PageRank steady-state"),
    ("pagerank_min", "PageRank fastest superstep"),
    ("pagerank", "PageRank all supersteps"),
    ("cc", "CC to convergence"),
]


def median(vals: list[float]) -> float:
    s = sorted(vals)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)


def main() -> None:
    commits: list[str] = []
    args = sys.argv[1:]
    while args:
        if args[0] == "--engine-commit":
            commits.append(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown arg: {args[0]}")

    with open(os.path.join(REPO, "BENCH_SCALING.json")) as f:
        store = json.load(f)

    groups: dict[tuple[str, bool], dict[str, dict]] = {}
    for key, run in sorted(store.items()):
        if commits and not any(
            str(run.get("engine_commit", "")).startswith(c) for c in commits
        ):
            continue
        pairing = key.split("_")[0]
        groups.setdefault((pairing, bool(run.get("skew"))), {})[key] = run

    print("| pairing | graph | workload | samples (chronological) | median | best |")
    print("|---|---|---|---|---|---|")
    for (pairing, skew), runs in sorted(groups.items()):
        for mkey, label in METRICS:
            vals = [
                r["scaling_efficiency"][mkey]
                for r in runs.values()
                if mkey in r.get("scaling_efficiency", {})
            ]
            if not vals:
                continue
            graph = "skewed 32M" if skew else "uniform 64M"
            cells = ", ".join(f"{v:.3f}" for v in vals)
            print(
                f"| {pairing} | {graph} | {label} | {cells} "
                f"| **{median(vals):.3f}** | {max(vals):.3f} |"
            )


if __name__ == "__main__":
    main()
