"""Gated Iceberg connector for the corpus table (north-rule input shape).

The production input is an Iceberg table
``(repo STRING, path STRING, commit STRING, lang STRING, content STRING)``.
No Iceberg runtime jars ship in this sandbox, so this module only *wires*
the public Spark catalog configuration (all standard
``spark.sql.catalog.*`` settings) and degrades to parquet-with-identical-
schema when the jar is absent — the rest of the engine is source-agnostic:
every operator takes a DataFrame.

Scale notes: Iceberg gives the engine partition pruning + metadata-level
file skipping on (repo, lang) partition columns and snapshot isolation for
the checkpoint/resume story; the parquet fallback preserves schema and
column pruning but not time travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = "repo STRING, path STRING, commit STRING, lang STRING, content STRING"

ICEBERG_CONFS = {
    # standard public Iceberg-on-Spark catalog wiring; requires the
    # iceberg-spark-runtime jar on the classpath (not present here)
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.corpus": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.corpus.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime classes are loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession, location: str, table: str = "corpus.db.files"
) -> DataFrame:
    """Read the corpus: Iceberg table when the runtime is present, else a
    parquet directory with the identical schema."""
    if iceberg_available(spark):
        return spark.read.table(table)
    return spark.read.schema(CORPUS_SCHEMA).parquet(location)


def write_corpus(
    df: DataFrame, location: str, table: str = "corpus.db.files"
) -> None:
    """Write the corpus, partitioned by (lang) for partition pruning."""
    if iceberg_available(df.sparkSession):
        df.writeTo(table).partitionedBy("lang").createOrReplace()
        return
    df.write.mode("overwrite").partitionBy("lang").parquet(location)
