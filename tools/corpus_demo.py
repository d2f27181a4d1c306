"""North-star flagship at the real launch surface: source-code corpus →
vertex/edge tables → CC + PageRank + component stats, with the per-row
sha256(content) invariant and per-superstep durable checkpoints.

Run:  spark-submit --master local[32] --py-files /tmp/imtag_spark.zip \
          tools/corpus_demo.py [n_rows]
(or plain `python tools/corpus_demo.py`). Prints RESULT lines.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from imtag_spark.operators.cc import connected_components  # noqa: E402
from imtag_spark.operators.pagerank import pagerank  # noqa: E402
from imtag_spark.plans.checkpoint import SuperstepCheckpointer  # noqa: E402
from imtag_spark.session import get_spark  # noqa: E402
from imtag_spark.sources.corpus import (  # noqa: E402
    content_sha_invariant,
    corpus_edges,
    corpus_vertices,
    generate_corpus,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="corpus_demo")

    t0 = time.time()
    corpus = generate_corpus(spark, n_rows=n_rows, n_repos=200).localCheckpoint(
        eager=True
    )
    n = corpus.count()
    print(f"RESULT corpus_rows={n} gen_s={time.time() - t0:.1f}")

    # per-row invariant: engine sha250 column == recomputed sha (trivially
    # true engine-side; the cross-check vs hashlib lives in test_corpus)
    t0 = time.time()
    inv = content_sha_invariant(corpus)
    bad = inv.where(F.sha2("content", 256) != F.col("content_sha")).count()
    print(f"RESULT sha_invariant_violations={bad} check_s={time.time() - t0:.1f}")

    t0 = time.time()
    vertices = corpus_vertices(corpus).localCheckpoint(eager=True)
    edges = corpus_edges(corpus).localCheckpoint(eager=True)
    n_e = edges.count()
    print(f"RESULT vertices={vertices.count()} edges={n_e} "
          f"build_s={time.time() - t0:.1f}")

    with tempfile.TemporaryDirectory() as ckpt_dir:
        cc_m: dict = {}
        t0 = time.time()
        ckpt = SuperstepCheckpointer(spark, ckpt_dir)
        labels = connected_components(edges, checkpointer=ckpt,
                                      checkpoint_every=1, metrics_out=cc_m)
        n_comp = labels.select("component").distinct().count()
        t_cc = time.time() - t0
        print(f"RESULT components={n_comp} cc_s={t_cc:.1f} "
              f"supersteps={cc_m['supersteps']} "
              f"eps={n_e / (sum(cc_m['superstep_times']) / len(cc_m['superstep_times'])):,.0f}")

    pr_m: dict = {}
    t0 = time.time()
    ranks = pagerank(edges, directed=False, tol=1e-8, max_iter=30,
                     metrics_out=pr_m)
    s = ranks.agg(F.sum("rank")).collect()[0][0]
    print(f"RESULT pagerank_sum={s:.9f} pr_s={time.time() - t0:.1f} "
          f"supersteps={pr_m['supersteps']} "
          f"eps={n_e / (sum(pr_m['superstep_times']) / len(pr_m['superstep_times'])):,.0f}")

    # component stats: size + dominant repo per component
    t0 = time.time()
    stats = (
        labels.join(vertices.select("vertex", "repo"), "vertex", "left")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_vertices"),
             F.countDistinct("repo").alias("n_repos"))
    )
    top = stats.orderBy(F.desc("n_vertices")).limit(3).collect()
    print(f"RESULT top_components={[(r['n_vertices'], r['n_repos']) for r in top]} "
          f"stats_s={time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
