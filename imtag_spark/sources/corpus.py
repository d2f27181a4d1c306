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

Scale path: metadata AND content are synthesized DISTRIBUTED — every column
derives from ``spark.range`` + ``xxhash64`` arithmetic, so generating a
10^12-row corpus never funnels anything through the driver.

Graph derivation (FIXTURES.md §1, deterministic):
- vertex id = ``xxhash64(repo, path, commit, lang, content)`` per row,
  plus hub vertices ``xxhash64(repo, commit)``;
- star edges: row-vertex ↔ its (repo, commit) hub (degree skew at heavy
  repos); co-change chain edges: consecutive commits of the same path.
"""

from __future__ import annotations

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
    """Deterministic corpus DataFrame, synthesized ENTIRELY Spark-side.

    Metadata and content both derive from ``spark.range`` + ``xxhash64``
    column arithmetic — no driver-side arrays anywhere, so the generator
    runs at any row count the cluster can hold (the 10^12-file north-rule
    scale included); the driver never sees a row.

    Repo popularity is Zipf(a≈1.5) via inverse-CDF of the tail
    P(X ≥ x) = x^(-1/2): X = ceil(u^-2), clipped to [1, n_repos] — the
    heavy-hitter skew the engine must survive, by construction.
    """
    n = num_partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_rows, numPartitions=n)

    def u01(salt: int):
        # uniform in (0, 1]: 30-bit slice of a salted row hash
        return (F.pmod(F.xxhash64(F.col("id"), F.lit(seed * 1000 + salt)),
                       F.lit(1 << 30)) + 1) / F.lit(float(1 << 30))

    repo_idx = (
        F.least(F.floor(F.pow(u01(0), F.lit(-2.0))), F.lit(n_repos)) - 1
    ).cast("int")
    path_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed * 1000 + 1)), F.lit(200))
    lang_idx = F.pmod(path_idx, F.lit(len(LANGS)))
    depth = F.pmod(path_idx, F.lit(4))
    # commit index: heavy repos accumulate more commits
    n_commits = F.lit(1) + F.greatest(
        F.lit(1), F.expr("50 DIV (1 + _repo_idx)")
    )
    meta = (
        ids.select(
            F.col("id"),
            repo_idx.alias("_repo_idx"),
            path_idx.alias("_path_idx"),
            lang_idx.alias("_lang_idx"),
            depth.alias("_depth"),
        )
        .select(
            F.format_string("repo%04d", F.col("_repo_idx")).alias("repo"),
            F.format_string(
                "src/%d/f%05d.%s",
                F.col("_depth"),
                F.col("_path_idx"),
                F.element_at(
                    F.array(*[F.lit(x) for x in LANGS]),
                    F.col("_lang_idx").cast("int") + 1,
                ),
            ).alias("path"),
            F.format_string(
                "c%06d",
                F.pmod(
                    F.xxhash64(F.col("id"), F.lit(seed * 1000 + 2)), n_commits
                ),
            ).alias("commit"),
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                F.col("_lang_idx").cast("int") + 1,
            ).alias("lang"),
        )
        .dropDuplicates(["repo", "path", "commit"])
    )
    # content = meta line + deterministic body keyed by (repo,path,commit):
    # body = sha2 hex of the key, repeated — computable identically by
    # hashlib in the fixture oracle (tests/test_corpus.py).
    key = F.concat_ws("|", "repo", "path", "commit")
    body = F.repeat(F.sha2(key, 256), body_repeats)
    content = F.concat(
        F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path")),
        F.lit("@"), F.col("commit"), F.lit("\n"), body,
    )
    return meta.select("repo", "path", "commit", "lang", content.alias("content"))


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
