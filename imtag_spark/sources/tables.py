"""Testdata (TPC-H-ish) loaders and derived graphs for the driver contract.

The driver's tables (/root/testdata/sf*/ — TESTDATA.md) stand in for the
Iceberg corpus at query-verification time. Two deterministic graphs are
derived:

- ``customer_order_edges``: bipartite star graph customer ↔ its orders
  (order vertices offset by ORDER_OFFSET so key spaces don't collide).
  Stars make the CC result expressible in plain SQL for the DuckDB oracle
  while still exercising the full distributed CC machinery.
- ``nation_chain_edges``: suppliers of one nation chained by key order —
  long paths per nation, the multi-round-convergence shape.
- ``part_cooccurrence_edges``: parts sharing an order (thinned modulo
  ``keep_mod``) — has triangles and hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ORDER_OFFSET = 1_000_000_000

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def customer_order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + F.lit(ORDER_OFFSET)).alias("dst"),
    ).distinct()


def nation_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    chained = supplier.select("s_nationkey", "s_suppkey").withColumn(
        "prev", F.lag("s_suppkey").over(w)
    )
    return chained.where(F.col("prev").isNotNull()).select(
        F.col("prev").alias("src"), F.col("s_suppkey").alias("dst")
    )


def part_cooccurrence_edges(
    spark: SparkSession, sf_dir: str, keep_mod: int = 4
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") % keep_mod == 0
    ).select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
