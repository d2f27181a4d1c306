"""Synthetic source-code corpus (the north-rule input shape) + graph build.

Input shape per BASELINE.json ``input_hint``: an Iceberg-style table
``(repo:string, path:string, commit:string, lang:string, content:string)``.
No Iceberg jars ship in this sandbox, so the table is written/read as
parquet with identical schema (see ``iceberg.py`` for the gated connector);
generation follows FIXTURES.md §1 exactly:

- ``repo``: Zipf(a=1.5)-distributed over n_repos — heavy-hitter repos by
  construction (the skew the engine must survive);
- ``commit``: sequential per repo; ``path``: per-repo file set; ``lang``
  keyed to extension;
- ``content``: ``f"{repo}/{path}@{commit}\\n" + body`` with the body a
  deterministic function of (repo, path, commit) — so the generator's
  hashlib sha256 and the engine's ``F.sha2(content, 256)`` must agree
  row-for-row (the per-row invariant).

Scale path: metadata columns are drawn driver-side (cheap int arrays) but
the heavy ``content`` strings are synthesized DISTRIBUTED, inside Spark SQL
expressions — generating a 10^12-row corpus never funnels strings through
the driver.

Graph derivation (FIXTURES.md §1, deterministic):
- vertex id = ``xxhash64(repo, path, commit, lang, content)`` per row,
  plus hub vertices ``xxhash64(repo, commit)``;
- star edges: row-vertex ↔ its (repo, commit) hub (degree skew at heavy
  repos); co-change chain edges: consecutive commits of the same path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["py", "c", "cpp", "java", "js", "rs", "go", "md"]
EXT = {lang: lang for lang in LANGS}

CORPUS_SCHEMA = "repo STRING, path STRING, commit STRING, lang STRING, content STRING"


def generate_corpus(
    spark: SparkSession,
    n_rows: int = 20_000,
    n_repos: int = 50,
    seed: int = 42,
    body_repeats: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus DataFrame; content synthesized Spark-side."""
    rng = np.random.default_rng(seed)
    # Zipf(a=1.5) repo popularity, clipped into [1, n_repos]
    repo_idx = np.minimum(rng.zipf(1.5, size=n_rows), n_repos) - 1
    # files per repo: up to 200 distinct paths; commits sequential per repo,
    # scaled with repo popularity (heavier repos → more commits)
    path_idx = rng.integers(0, 200, size=n_rows)
    lang_idx = path_idx % len(LANGS)  # lang fixed per path
    depth = path_idx % 4
    # commit index: heavy repos accumulate more commits
    commit_idx = rng.integers(0, 1 + np.maximum(1, 50 // (1 + repo_idx)), size=n_rows)

    meta = pd.DataFrame(
        {
            "repo": [f"repo{i:04d}" for i in repo_idx],
            "path": [
                f"src/{d}/f{j:05d}.{LANGS[li]}"
                for d, j, li in zip(depth, path_idx, lang_idx)
            ],
            "commit": [f"c{k:06d}" for k in commit_idx],
            "lang": [LANGS[li] for li in lang_idx],
        }
    ).drop_duplicates(subset=["repo", "path", "commit"])
    n = num_partitions or spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(meta).repartition(n)
    # content = meta line + deterministic body keyed by (repo,path,commit):
    # body = sha2 hex of the key, repeated — computable identically by
    # hashlib in the fixture oracle (tests/test_corpus.py).
    key = F.concat_ws("|", "repo", "path", "commit")
    body = F.repeat(F.sha2(key, 256), body_repeats)
    content = F.concat(
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path")),
        F.lit("@"), F.col("commit"), F.lit("\n"), body,
    )
    return df.select("repo", "path", "commit", "lang", content.alias("content"))


def content_sha_invariant(corpus: DataFrame) -> DataFrame:
    """Per-row invariant column: sha256 of content (hex), engine side."""
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def corpus_vertices(corpus: DataFrame) -> DataFrame:
    """One vertex per row: id = xxhash64 over all five columns."""
    return corpus.select(
        F.xxhash64("repo", "path", "commit", "lang", "content").alias("vertex"),
        "repo", "path", "commit", "lang",
        F.sha2("content", 256).alias("content_sha"),
    )


def corpus_edges(corpus: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """Deterministic edge table: star (row↔commit-hub) + co-change chains.

    Returned canonical (src < dst), deduplicated. Heavy-hitter repos create
    high-degree hubs; the star construction itself is narrow (one edge per
    row — no skewed shuffle here), and downstream groupBys handle hub skew
    via map-side partial aggregation + AQE (see cc.py design notes).
    ``salt_partitions`` optionally repartitions the output by a salted key
    so no single output partition holds a whole heavy repo.
    """
    row_vertex = F.xxhash64("repo", "path", "commit", "lang", "content")
    hub_vertex = F.xxhash64("repo", "commit")
    star = corpus.select(row_vertex.alias("a"), hub_vertex.alias("b"))

    # co-change chain: consecutive commits of the same (repo, path)
    w = Window.partitionBy("repo", "path").orderBy("commit")
    chain_base = corpus.select(
        "repo", "path", "commit", row_vertex.alias("v")
    ).withColumn("prev_v", F.lag("v").over(w))
    chain = chain_base.where(F.col("prev_v").isNotNull()).select(
        F.col("prev_v").alias("a"), F.col("v").alias("b")
    )

    # commit-history chain: consecutive commit hubs of the same repo — this
    # is what makes every repo's subgraph connected by construction (the
    # structural oracle in FIXTURES.md §1)
    wh = Window.partitionBy("repo").orderBy("commit")
    hubs = corpus.select("repo", "commit").distinct().select(
        "repo", "commit", F.xxhash64("repo", "commit").alias("h")
    ).withColumn("prev_h", F.lag("h").over(wh))
    hub_chain = hubs.where(F.col("prev_h").isNotNull()).select(
        F.col("prev_h").alias("a"), F.col("h").alias("b")
    )

    edges = (
        star.union(chain)
        .union(hub_chain)
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if salt_partitions:
        edges = edges.repartition(
            salt_partitions, (F.xxhash64("src", "dst") % salt_partitions)
        )
    return edges
