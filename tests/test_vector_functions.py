"""JVM-side vector functions vs NumPy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from imtag_spark.functions.vector import cosine, dot, norm, pairwise_cosine


def _vec_df(spark, mats):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mats)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )


def test_dot_norm_cosine_vs_numpy(spark):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, 8))
    b = rng.standard_normal((6, 8))
    df = spark.createDataFrame(
        [(list(map(float, x)), list(map(float, y))) for x, y in zip(a, b)],
        "va ARRAY<DOUBLE>, vb ARRAY<DOUBLE>",
    )
    out = df.select(
        dot(F.col("va"), F.col("vb")).alias("d"),
        norm(F.col("va")).alias("na"),
        cosine(F.col("va"), F.col("vb")).alias("c"),
    ).collect()
    for i, r in enumerate(out):
        assert abs(r["d"] - float(a[i] @ b[i])) < 1e-9
        assert abs(r["na"] - float(np.linalg.norm(a[i]))) < 1e-9
        want_c = float(a[i] @ b[i] / (np.linalg.norm(a[i]) * np.linalg.norm(b[i])))
        assert abs(r["c"] - want_c) < 1e-9


def test_cosine_zero_vector_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "va ARRAY<DOUBLE>, vb ARRAY<DOUBLE>"
    )
    assert df.select(cosine(F.col("va"), F.col("vb")).alias("c")).collect()[0]["c"] == 0.0


def test_pairwise_cosine_matches_numpy(spark):
    rng = np.random.default_rng(5)
    mats = rng.standard_normal((5, 6))
    df = _vec_df(spark, mats)
    got = {(r["a"], r["b"]): r["sim"]
           for r in pairwise_cosine(df, df, vec_col="embedding").collect()}
    normed = mats / np.linalg.norm(mats, axis=1, keepdims=True)
    sims = normed @ normed.T
    for i in range(5):
        for j in range(5):
            assert abs(got[(i, j)] - float(sims[i, j])) < 1e-9
