"""JVM-side vector math over ``array<float/double>`` columns.

Pure ``pyspark.sql.functions`` higher-order functions (``zip_with`` +
``aggregate``) — whole-stage-codegen'd, no Python, no Arrow transfer. The
Pandas-UDF kernels in ``operators/similarity.py`` win for batch matmul
shapes (BLAS); these win when a similarity is one column expression inside
a larger JVM-side plan (join predicates, filters, projections) and for
moderate fan-outs where shipping vectors to Python would dominate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def pairwise_cosine(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All left×right cosine pairs: (a, b, sim). The caller bounds the
    cross-join (e.g. a small query set against a candidate set — at scale
    the candidate set comes from an LSH/IVF bucket join, never a full
    cross product)."""
    l = left.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    r = right.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return l.crossJoin(r).select(
        "a", "b", cosine(F.col("_va"), F.col("_vb")).alias("sim")
    )
